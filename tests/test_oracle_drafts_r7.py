"""Round-7 rotation prep: DuckDB oracle drafts for operators not yet
inventory-certified, each proven value-equal to its Spark operator on
the smoke corpus HERE so next round's queries()/oracle_sql() wiring is
mechanical. Runs duckdb directly (no driver involvement; the frozen
inventory is untouched).

Twenty drafts ready for the r7 rotation (this list IS the rotation
work-list — every entry needs a queries()/oracle_sql() pair at round
start):
- the seven round-5 holdouts the r5 verdict listed: BPE apply replay,
  HLL estimate-vs-exact tolerance, perplexity_buckets, classifier
  trainer weights, ivf_topk_from_index (vs the s03 SQL), the
  clean-ingest batch form, sample_k_per_group
- the round-6 additions: ivfpq_topk (nprobe 1 and 2),
  ivfpq_topk_from_index (same SQL, partition-pruned path),
  ivfpq by_residual (full IVFADC), normalize_text (corpus + crafted
  unicode corpus), vocab_stats (micro-unit Zipf slope), line_dedup
  (the d09 SQL at line grain), collapse_repeated_lines (corpus +
  crafted runs), epoch_plan (q54 CTE + epoch arithmetic),
  apply_decontamination (t10 derivation + anti-join), gate_metrics
  batch form (windowed fail-reason mix, relaxed gate),
  materialize_mixture (epoch plan made corpus, repeats present),
  chunk_text (sliding windows at 40/30), strip_html (rule-table-built
  SQL, crafted markup + corpus passthrough), and q59v2 — the planned
  stage-0 q59 upgrade (normalize + collapse prefixed), proven by
  injecting the cleaned CTE into the CURRENT certified q59 oracle

r7-rotation note: swapping q59 to the q59v2 stage-0 form changes
certified hashes, so it is an inventory edit for a ROUND START, not
mid-round — the draft below already proves the upgraded oracle.

ROTATION LANDED (round-7 start): every draft above is now wired as a
queries()/oracle_sql() pair in __spark_entry__.py; the entry holds the
single copy of each SQL derivation and
tests/test_r7_rotation_wiring.py asserts the wired strings are
byte-identical to what these tests prove (plus that the frozen
BPE_MERGES literal still equals a fresh train on the smoke corpus)."""

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def ddb():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    yield con
    con.close()


def _rows(df):
    cols = sorted(df.columns)
    out = []
    for r in df.select(*cols).collect():
        out.append(tuple(round(v, 6) if isinstance(v, float) else v for v in r))
    return sorted(out)


def _sql_rows(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in cur.fetchall():
        out.append(
            tuple(
                round(r[i], 6) if isinstance(r[i], float) else r[i] for i in order
            )
        )
    return sorted(out)


# --- 1. BPE apply: merge-list replay via chained greedy replaces ------
#
# SQL's replace() substitutes non-overlapping occurrences left-to-right
# — exactly the greedy scan _greedy_merge implements — so applying the
# learned merges IN ORDER as chained replaces over a separator-joined
# symbol string replays bpe_apply's rank-priority encode loop (for a
# trained list, sequential-in-rank-order and lowest-rank-first agree;
# this test is the proof on the smoke corpus). For the r7 inventory the
# merge list freezes as a literal (the t14 placeholder-weights
# pattern); here it trains fresh (deterministic, pytest-proven).

# unit separator: cannot appear in words because BOTH engines split
# words on [\s\x1f]+ (r8 fix — \x1f is not ASCII whitespace, so a
# plain \s+ split could leave the sentinel inside a word and corrupt
# the framing on the SQL side only)
SEP = "\x1f"


def bpe_apply_sql(merges) -> str:
    init = (
        "'" + SEP + "' || array_to_string(list_transform("
        "range(1, length(word) + 1), "
        "i -> CASE WHEN i = length(word) THEN word[i] || '</w>' "
        "ELSE word[i] END), '" + SEP + "') || '" + SEP + "'"
    )
    enc = init
    for a, b in merges:
        pat = SEP + a + SEP + b + SEP
        rep = SEP + a + b + SEP
        enc = f"replace({enc}, '{pat}', '{rep}')"
    return rf"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(lower(coalesce(text, '')), '[\s\x1f]+') AS ws
  FROM documents),
tok AS (
  SELECT doc_id, i, ws[i+1] AS word
  FROM w, unnest(range(len(ws))) t(i)
  WHERE length(ws[i+1]) > 0),
enc AS (
  SELECT doc_id, i,
         list_filter(regexp_split_to_array({enc}, chr(31)),
                     x -> length(x) > 0) AS toks
  FROM tok),
agg AS (
  SELECT doc_id,
         string_agg(array_to_string(toks, '|'), '|' ORDER BY i) AS tokens,
         sum(len(toks)) AS n
  FROM enc GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.tokens, '') AS tokens,
       coalesce(a.n, 0)::INT AS n_tokens
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def test_oracle_draft_bpe_apply(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import bpe

    docs = spark.table("documents")
    # the corpus must not contain the display separator
    assert docs.filter(F.col("text").contains("|")).count() == 0
    merges, _ = bpe.bpe_train(docs, num_merges=16)
    assert len(merges) == 16
    got = _rows(
        bpe.bpe_apply(docs, merges).select(
            "doc_id", F.concat_ws("|", "tokens").alias("tokens"), "n_tokens"
        )
    )
    assert got == _sql_rows(ddb, bpe_apply_sql(merges))


# --- 2. HLL: estimate within tolerance of the exact distinct ----------
#
# DataSketches binaries are not SQL-replayable, so the CHECKED output
# is the exact per-group distinct plus a within-tolerance flag (the s05
# recall-floor pattern): the oracle computes the exact count and
# asserts the flag true; the Spark side computes BOTH the HLL estimate
# and the exact count and compares them.

def test_oracle_draft_hll_tolerance(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.sketches import (
        hll_estimate,
        hll_sketch_by_group,
    )

    docs = spark.table("documents")
    est = hll_estimate(hll_sketch_by_group(docs, "source", "doc_id"), "source")
    exact = docs.groupBy("source").agg(F.countDistinct("doc_id").alias("exact"))
    got = _rows(
        est.join(exact, "source").select(
            "source",
            "exact",
            (F.abs(F.col("estimate") - F.col("exact")) / F.col("exact") <= 0.02).alias(
                "within_2pct"
            ),
        )
    )
    want = _sql_rows(
        ddb,
        "SELECT source, count(DISTINCT doc_id) AS exact, TRUE AS within_2pct"
        " FROM documents GROUP BY source",
    )
    assert got == want


# --- 3. perplexity buckets: unigram LM score + exact percentile cuts --

PERPLEXITY_SQL = r"""
WITH w AS (SELECT doc_id,
                  unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                     x -> length(x) > 0)) AS word
           FROM documents),
v AS (SELECT word, count(*) AS c FROM w GROUP BY word),
t AS (SELECT sum(c)::DOUBLE AS total FROM v),
m AS (SELECT word, cast(round(ln(c / total) * 1000000) AS BIGINT) AS lp6 FROM v, t),
sc AS (
  SELECT doc_id, count(*) AS n_words,
         round(sum(lp6) / count(*) / 1e6, 4) AS avg_logprob
  FROM w JOIN m USING (word) GROUP BY doc_id),
cuts AS (
  SELECT quantile_cont(avg_logprob, 1 - 1.0/3) AS head_min,
         quantile_cont(avg_logprob, 1 - 2.0/3) AS mid_min
  FROM sc)
SELECT doc_id, n_words, avg_logprob,
       CASE WHEN avg_logprob >= head_min THEN 'head'
            WHEN avg_logprob >= mid_min THEN 'middle'
            ELSE 'tail' END AS bucket
FROM sc, cuts
"""


def test_oracle_draft_perplexity_buckets(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.text import perplexity_buckets

    got = _rows(perplexity_buckets(spark.table("documents")))
    assert got == _sql_rows(ddb, PERPLEXITY_SQL)


# --- 4. classifier trainer: GD iterations unrolled as chained CTEs ----
#
# Every cross-partition sum quantizes to integer micro-units, so each
# iteration's margins/gradients are exact longs and the weight updates
# are a fixed float expression — the whole train replays as one SQL
# chain with one CTE pair per iteration. Positive = even doc_ids,
# negative = odd (a deterministic labeled split of the corpus).

def classifier_sql(iterations: int, num_buckets: int, lr: float) -> str:
    parts = [rf"""
WITH lab AS (
  SELECT 'p:' || doc_id::VARCHAR AS k, 1.0 AS y, text
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'n:' || doc_id::VARCHAR, 0.0, text
  FROM documents WHERE doc_id % 2 <> 0),
tok AS (
  SELECT k, y,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> length(x) > 0)) AS word
  FROM lab),
tb AS (
  SELECT k, y,
         (('0x' || substr(md5(word), 1, 8))::BIGINT % {num_buckets})::INT AS bucket
  FROM tok),
feats AS (
  SELECT k, y, bucket,
         count(*)::DOUBLE / sum(count(*)) OVER (PARTITION BY k) AS x
  FROM tb GROUP BY k, y, bucket),
nd AS (SELECT count(DISTINCT k) AS n FROM feats),
w0 AS (SELECT i::INT AS bucket, 0.0 AS w FROM range({num_buckets}) t(i))"""]
    for i in range(iterations):
        parts.append(f""",
m{i} AS (
  SELECT f.k, f.y,
         1.0 / (1.0 + exp(-(sum(round(f.x * w{i}.w * 1e6)::BIGINT) / 1e6))) - f.y AS r
  FROM feats f JOIN w{i} ON f.bucket = w{i}.bucket
  GROUP BY f.k, f.y),
g{i} AS (
  SELECT f.bucket, sum(round(m{i}.r * f.x * 1e6)::BIGINT) AS s6
  FROM feats f JOIN m{i} ON f.k = m{i}.k
  GROUP BY f.bucket),
w{i + 1} AS (
  SELECT w{i}.bucket,
         w{i}.w - ({lr} * (coalesce(g{i}.s6, 0) / 1e6)) / nd.n AS w
  FROM w{i} LEFT JOIN g{i} USING (bucket), nd)""")
    parts.append(
        f"\nSELECT bucket, round(w, 6) AS w FROM w{iterations}"
    )
    return "".join(parts)


def test_oracle_draft_classifier_weights(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.text import train_quality_classifier

    docs = spark.table("documents")
    pos = docs.filter(F.col("doc_id") % 2 == 0)
    neg = docs.filter(F.col("doc_id") % 2 != 0)
    got = _rows(
        train_quality_classifier(pos, neg, num_buckets=64, iterations=3).select(
            "bucket", F.round("w", 6).alias("w")
        )
    )
    assert got == _sql_rows(ddb, classifier_sql(iterations=3, num_buckets=64, lr=2.0))


# --- 5. persisted-IVF search: hash-checkable via the s03 derivation ---
#
# build_ivf_index stores exactly the s03 assignment (deterministic
# first-8-by-id centroids), so a search against the index replays with
# the SAME SQL the in-memory IVF is certified with — making the
# partition-pruned serving path hash-checkable, not just
# equality-vs-s03 in pytest.

def test_oracle_draft_ivf_from_index(spark, ddb, tmp_path):
    import __spark_entry__ as E
    from datacatalog_tag_engine_spark.pipeline.similarity import (
        build_ivf_index,
        ivf_topk_from_index,
    )

    emb = spark.table("embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, num_cells=8)
    got = _rows(
        ivf_topk_from_index(spark, path, emb.filter(F.col("vec_id") < 5), k=5, nprobe=1)
    )
    assert got == _sql_rows(ddb, E.oracle_sql()["s03_ann_ivf"])


# --- 6. clean-ingest batch form: Gopher gate -> keep-first dedup ------
#
# The stream's batch replay: the relaxed gate (q59's thresholds), then
# dedup_stream's deterministic keep-first per bag-of-words fingerprint
# (documents carry no ts column, so the order is the full row struct —
# doc_id leads and is unique, hence min doc_id per fingerprint).

CLEAN_INGEST_SQL = r"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS text, lang, source, n_chars,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                     x -> length(x) > 0) AS w,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\n'),
                     l -> length(trim(l)) > 0) AS lines
  FROM documents),
gf AS (
  SELECT doc_id, text, lang, source, n_chars,
         len(w) AS nw,
         list_sum(list_transform(w, x -> length(x))) / len(w) AS mwl,
         len(regexp_extract_all(text, '#|\.\.\.|…')) / len(w) AS sym,
         len(list_filter(lines, l -> regexp_matches(l, '^\s*(\*|-|•)\s')))
           / len(lines) AS bullet,
         len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
           / len(lines) AS ell,
         len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) / len(w) AS alpha
  FROM base WHERE len(w) > 0 AND len(lines) > 0),
keep AS (
  SELECT doc_id, text, lang, source, n_chars FROM gf
  WHERE nw BETWEEN 20 AND 100000
    AND mwl BETWEEN 3.0 AND 10.0
    AND sym <= 0.1 AND bullet <= 0.9 AND ell <= 0.3 AND alpha >= 0.8),
fp AS (
  SELECT *,
         md5(array_to_string(list_sort(list_distinct(
             regexp_split_to_array(lower(text), '\s+'))), ' ')) AS fingerprint
  FROM keep)
SELECT doc_id, text, lang, source, n_chars, fingerprint
FROM fp
QUALIFY row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1
"""


def test_oracle_draft_clean_ingest_batch(spark, ddb):
    from datacatalog_tag_engine_spark.streaming.dedup import clean_ingest_stream

    got = _rows(
        clean_ingest_stream(
            spark.table("documents"),
            min_words=20,
            min_stopword_hits=0,
            max_dup_word_frac=1.0,
            max_top_bigram_frac=1.0,
        )
    )
    assert got == _sql_rows(ddb, CLEAN_INGEST_SQL)


# --- 7. k-per-group sampling: rank over the deterministic md5 order ---

SAMPLE_K_SQL = """
SELECT doc_id, source FROM documents
QUALIFY row_number() OVER (PARTITION BY source
                           ORDER BY md5(doc_id::VARCHAR), doc_id) <= 5
"""


def test_oracle_draft_sample_k_per_group(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.sampling import sample_k_per_group

    got = _rows(
        sample_k_per_group(spark.table("documents").select("doc_id", "source"), k=5)
    )
    assert got == _sql_rows(ddb, SAMPLE_K_SQL)


# --- 8. IVF-PQ: the s03 cell CTEs composed with the s07 PQ CTEs ------
#
# The composition reuses both certified derivations verbatim (same
# centroid seeding, same integer micro-unit argmin), adding only the
# cell-pruned candidate join — so the oracle is the s03 SQL's assign/
# probe CTEs feeding the s07 SQL's codes/ADC CTEs.

def ivfpq_sql(nprobe: int) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS cell, v AS cent_v FROM e ORDER BY vec_id LIMIT 8),
ranked AS (
  SELECT e.vec_id, e.v, c.cell,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round(list_cosine_similarity(e.v, c.cent_v), 6) DESC, c.cell) AS rn
  FROM e CROSS JOIN cents c),
assign AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
probe AS (SELECT vec_id AS query_id, cell FROM ranked
          WHERE rn <= {nprobe} AND vec_id < 5),
cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v
  FROM e ORDER BY vec_id LIMIT 16),
ms AS (SELECT unnest(range(4)) AS m),
csub AS (SELECT c, m, v[m*16+1 : m*16+16] AS cv FROM cent, ms),
esub AS (SELECT vec_id, m, v[m*16+1 : m*16+16] AS sv FROM e, ms),
dists AS (
  SELECT vec_id, m, c,
         list_sum(list_transform(range(1, 17),
                  i -> cast(round((sv[i]-cv[i])^2 * 1e6) AS BIGINT))) AS d
  FROM esub JOIN csub USING (m)),
codes AS (
  SELECT vec_id, m, cast(min(d*16 + c) % 16 AS INT) AS code
  FROM dists GROUP BY vec_id, m),
dt AS (
  SELECT es.vec_id AS query_id, es.m, c AS code,
         list_sum(list_transform(range(1, 17),
                  i -> cast(round((es.sv[i]-cv[i])^2 * 1e6) AS BIGINT))) AS d
  FROM esub es JOIN csub USING (m) WHERE es.vec_id < 5),
scored AS (
  SELECT dt.query_id, codes.vec_id AS neighbor_id,
         cast(sum(dt.d) AS BIGINT) AS adist_micro
  FROM codes
  JOIN assign ON codes.vec_id = assign.vec_id
  JOIN probe ON assign.cell = probe.cell
  JOIN dt ON codes.m = dt.m AND codes.code = dt.code
         AND dt.query_id = probe.query_id
  GROUP BY dt.query_id, codes.vec_id)
SELECT query_id, neighbor_id, adist_micro,
       cast(row_number() OVER (PARTITION BY query_id
                               ORDER BY adist_micro, neighbor_id) AS INT) AS rank
FROM scored WHERE neighbor_id <> query_id
QUALIFY rank <= 5
"""


@pytest.mark.parametrize("nprobe", [1, 2])
def test_oracle_draft_ivfpq(spark, ddb, nprobe):
    from datacatalog_tag_engine_spark.pipeline.similarity import ivfpq_topk

    emb = spark.table("embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    got = _rows(ivfpq_topk(emb, q, k=5, num_cells=8, nprobe=nprobe))
    assert got == _sql_rows(ddb, ivfpq_sql(nprobe))
    assert len(got) > 0


# --- 9. normalize_text: the same translate/replace/regexp chain ------
#
# Every step is a built-in string function with identical semantics in
# both engines (translate drops unpaired from-chars in Spark and
# DuckDB/Postgres alike; both regex engines handle the hex classes and
# {3,} quantifiers the same way on these patterns).

NORMALIZE_SQL = (
    r"""
WITH t0 AS (SELECT doc_id, text AS raw, coalesce(text, '') AS t FROM documents),
n AS (
  SELECT doc_id, raw,
    regexp_replace(
     regexp_replace(
      regexp_replace(
       regexp_replace(
        replace(
         translate(
          regexp_replace(
           regexp_replace(t, '\r\n?', chr(10), 'g'),
           '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
          '"""
    + "‘’‚“”„–—−"
    + "     ​"
    + r"""', e'\'\'\'"""
    + '"""'
    + r"""---     '),
         '"""
    + "…"
    + r"""', '...'),
        '[ \t]+', ' ', 'g'),
       ' ?\n ?', chr(10), 'g'),
      '\n{3,}', chr(10) || chr(10), 'g'),
     '^[\n ]+|[\n ]+$', '', 'g') AS norm
  FROM t0)
SELECT doc_id, norm AS text,
       coalesce(length(raw), 0) AS n_chars_raw,
       length(norm) AS n_chars,
       norm IS DISTINCT FROM raw AS changed
FROM n
"""
)


def test_oracle_draft_normalize_text(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.text import normalize_text

    got = _rows(normalize_text(spark.table("documents")))
    assert got == _sql_rows(ddb, NORMALIZE_SQL)


def test_oracle_draft_normalize_text_unicode_corpus(spark, ddb):
    """The smoke corpus is pure ASCII, so the corpus draft exercises
    only the whitespace rules — this one proves the translate/replace
    unicode folding agrees cross-engine on the characters it targets."""
    from datacatalog_tag_engine_spark.pipeline.text import normalize_text

    rows = [
        (1, "a\r\nb\rc"),
        (2, "x\x00y\x07z\x7f!"),
        (3, "‘hi’ “q” — d…"),
        (4, "a  b​c – e−f"),
        (5, "  a\t\tb  \n\n\n\n  c  "),
        (6, None),
        (7, "clean text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _rows(normalize_text(df))
    ddb.execute("CREATE OR REPLACE TABLE _norm_docs (doc_id BIGINT, text VARCHAR)")
    ddb.executemany("INSERT INTO _norm_docs VALUES (?, ?)", rows)
    want = _sql_rows(ddb, NORMALIZE_SQL.replace("FROM documents", "FROM _norm_docs"))
    assert got == want


# --- 10. vocab_stats: rank window + micro-unit Zipf regression -------

VOCAB_STATS_SQL = r"""
WITH w AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> length(x) > 0)) AS word
  FROM documents),
v AS (SELECT word, count(*) AS c FROM w GROUP BY word),
r AS (SELECT c, row_number() OVER (ORDER BY c DESC, word) AS rank FROM v),
a AS (
  SELECT cast(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types,
         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS hx,
         sum(CASE WHEN rank <= 100 THEN c ELSE 0 END) AS tp,
         sum(cast(round(ln(rank) * 1e6) AS BIGINT)) AS sx6,
         sum(cast(round(ln(c) * 1e6) AS BIGINT)) AS sy6,
         sum(cast(round(ln(rank) * ln(c) * 1e6) AS BIGINT)) AS sxy6,
         sum(cast(round(ln(rank) * ln(rank) * 1e6) AS BIGINT)) AS sxx6
  FROM r)
SELECT n_tokens, n_types,
       round(hx::DOUBLE / n_types, 4) AS hapax_frac,
       round(tp::DOUBLE / n_tokens, 4) AS top100_coverage,
       round(CASE WHEN n_types > 1 THEN
               (n_types * (sxy6/1e6) - (sx6/1e6) * (sy6/1e6))
             / (n_types * (sxx6/1e6) - (sx6/1e6) * (sx6/1e6)) END,
             4) AS zipf_slope
FROM a
"""


def test_oracle_draft_vocab_stats(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.text import vocab_stats

    got = _rows(vocab_stats(spark.table("documents")))
    want = _sql_rows(ddb, VOCAB_STATS_SQL)
    assert got == want
    # sanity on the values themselves, not just cross-engine equality
    (row,) = got
    by_col = dict(zip(sorted(["n_tokens", "n_types", "hapax_frac",
                              "top100_coverage", "zipf_slope"]), row))
    assert by_col["n_tokens"] > by_col["n_types"] > 0
    assert 0.0 <= by_col["hapax_frac"] <= 1.0
    assert 0.0 < by_col["top100_coverage"] <= 1.0
    assert by_col["zipf_slope"] < 0  # frequency falls with rank


def test_oracle_draft_ivfpq_from_index(spark, ddb, tmp_path):
    """The persisted IVF-PQ index stores exactly the ivfpq assignment,
    codes, and codebook, so the partition-pruned serving path replays
    with the SAME chained s03+s07 SQL the in-memory form is drafted
    with — hash-checkable, not just equality-vs-ivfpq in pytest."""
    from datacatalog_tag_engine_spark.pipeline.similarity import (
        build_ivfpq_index,
        ivfpq_topk_from_index,
    )

    emb = spark.table("embeddings")
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, path, num_cells=8)
    got = _rows(
        ivfpq_topk_from_index(spark, path, emb.filter(F.col("vec_id") < 5), k=5, nprobe=2)
    )
    assert got == _sql_rows(ddb, ivfpq_sql(2))


# --- 11. line_dedup: the d09 SQL at line grain -----------------------

LINE_DEDUP_SQL = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\n'),
                     s -> length(trim(s)) > 0) AS arr
  FROM documents),
p AS (
  SELECT doc_id,
         unnest(list_transform(range(len(arr)),
                               i -> {'pos': i, 'para': arr[i+1]}),
                recursive := true)
  FROM d),
n AS (
  SELECT doc_id, pos, para,
         lower(regexp_replace(trim(para), '\s+', ' ', 'g')) AS norm
  FROM p),
k AS (
  SELECT doc_id, pos, para,
         row_number() OVER (PARTITION BY norm ORDER BY doc_id, pos) AS rn
  FROM n),
r AS (
  SELECT doc_id,
         string_agg(para, chr(10) ORDER BY pos) AS text,
         count(*) AS kept
  FROM k WHERE rn = 1 GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(r.text, '') AS text,
       len(d.arr)::INT AS n_lines,
       (len(d.arr) - coalesce(r.kept, 0))::INT AS n_removed
FROM d LEFT JOIN r USING (doc_id)
"""


def test_oracle_draft_line_dedup(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.dedup import line_dedup

    got = _rows(line_dedup(spark.table("documents")))
    assert got == _sql_rows(ddb, LINE_DEDUP_SQL)
    # every document comes back (the operator never drops rows); the
    # smoke corpus has no cross-doc duplicate LINES (verified), so the
    # dedup rule itself is exercised by the synthetic test below
    assert len(got) == spark.table("documents").count()


def test_line_dedup_removes_cross_doc_lines(spark):
    from datacatalog_tag_engine_spark.pipeline.dedup import line_dedup

    df = spark.createDataFrame(
        [
            (1, "unique a\nCOOKIE BANNER\nunique b"),
            (2, "cookie   banner\nunique c"),   # normalized match, later doc
            (3, "Unique C\nfresh line"),        # case-insensitive match
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert got[1]["text"] == "unique a\nCOOKIE BANNER\nunique b"
    assert got[2]["text"] == "unique c" and got[2]["n_removed"] == 1
    assert got[3]["text"] == "fresh line" and got[3]["n_removed"] == 1


# --- 12. epoch_plan: the q54 mixture CTE + epoch arithmetic ----------
#
# budget chosen so at least one source is genuinely constrained at
# max_epochs=1.5 (the smoke corpus's sources are near-balanced, so a
# large budget over-asks every source).

EPOCH_PLAN_SQL = r"""
WITH s AS (
  SELECT source, count(*) AS n_docs,
         cast(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
w AS (
  SELECT source, n_docs, n_tokens,
         round(pow(n_tokens::DOUBLE, 0.5) / sum(pow(n_tokens::DOUBLE, 0.5)) OVER (), 6) AS weight
  FROM s),
t AS (
  SELECT *, cast(round(weight * 200000) AS BIGINT) AS target_tokens,
         cast(round(n_tokens * 1.5) AS BIGINT) AS cap
  FROM w)
SELECT source, n_docs, n_tokens, weight, target_tokens,
       CASE WHEN n_tokens > 0
            THEN round(target_tokens / n_tokens::DOUBLE, 4) END AS epochs,
       least(target_tokens, cap) AS planned_tokens,
       target_tokens - least(target_tokens, cap) AS shortfall_tokens,
       target_tokens > cap AS is_constrained
FROM t
"""


def test_oracle_draft_epoch_plan(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.sampling import epoch_plan

    got = _rows(
        epoch_plan(spark.table("documents"), budget_tokens=200_000, max_epochs=1.5)
    )
    want = _sql_rows(ddb, EPOCH_PLAN_SQL)
    assert got == want
    cols = sorted(["source", "n_docs", "n_tokens", "weight", "target_tokens",
                   "epochs", "planned_tokens", "shortfall_tokens",
                   "is_constrained"])
    ic, sf = cols.index("is_constrained"), cols.index("shortfall_tokens")
    # the budget must actually bind somewhere, and constraint <=> shortfall
    assert any(r[ic] for r in got)
    for r in got:
        assert r[ic] == (r[sf] > 0)


# --- 13. collapse_repeated_lines: indexed list_filter replay ---------
#
# DuckDB's lambda index is 1-based where Spark's is 0-based, so "first
# line" is i=1 and "previous line" is arr[i-1].

COLLAPSE_LINES_SQL = r"""
WITH d AS (
  SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS arr
  FROM documents),
k AS (
  SELECT doc_id, arr,
         list_filter(arr, (x, i) -> i = 1
                     OR length(trim(x)) = 0
                     OR lower(trim(x)) <> lower(trim(arr[i-1]))) AS kept
  FROM d)
SELECT doc_id,
       array_to_string(kept, chr(10)) AS text,
       len(arr)::INT AS n_lines,
       (len(arr) - len(kept))::INT AS n_removed
FROM k
"""


def test_oracle_draft_collapse_repeated_lines(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.text import collapse_repeated_lines

    got = _rows(collapse_repeated_lines(spark.table("documents")))
    assert got == _sql_rows(ddb, COLLAPSE_LINES_SQL)


def test_oracle_draft_collapse_repeated_lines_synthetic(spark, ddb):
    """The corpus may not contain consecutive duplicate lines — pin the
    collapse rule itself cross-engine on a crafted table."""
    from datacatalog_tag_engine_spark.pipeline.text import collapse_repeated_lines

    rows = [
        (1, "a\na\na\nb\nA \nc"),
        (2, "x\n\n\nx\ny"),
        (3, None),
        (4, "next\nNEXT\n next \nok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _rows(collapse_repeated_lines(df))
    ddb.execute("CREATE OR REPLACE TABLE _cl_docs (doc_id BIGINT, text VARCHAR)")
    ddb.executemany("INSERT INTO _cl_docs VALUES (?, ?)", rows)
    want = _sql_rows(ddb, COLLAPSE_LINES_SQL.replace("FROM documents", "FROM _cl_docs"))
    assert got == want
    # sorted columns are (doc_id, n_lines, n_removed, text)
    by_id = {r[0]: r for r in got}
    assert by_id[4][3] == "next\nok" and by_id[4][2] == 2


# --- 14. apply_decontamination: the t10 derivation + anti-join -------
#
# Benchmark = every doc with doc_id % 17 == 0 (the DSIR target split —
# an existing deterministic holdout); the training side is the rest.

DECONTAM_SQL = r"""
WITH train AS (SELECT * FROM documents WHERE doc_id % 17 <> 0),
bench AS (SELECT * FROM documents WHERE doc_id % 17 = 0),
bs AS (
  SELECT DISTINCT unnest(CASE WHEN len(w) >= 5
                   THEN list_transform(range(1, len(w) - 3),
                                       i -> array_to_string(w[i:i+4], ' '))
                   ELSE [] END) AS shingle
  FROM (SELECT regexp_split_to_array(lower(text), '\s+') AS w FROM bench)),
ds AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(w) >= 5
                 THEN list_transform(range(1, len(w) - 3),
                                     i -> array_to_string(w[i:i+4], ' '))
                 ELSE [] END)) AS shingle
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS w FROM train)),
flagged AS (
  SELECT DISTINCT ds.doc_id FROM ds JOIN bs USING (shingle))
SELECT t.doc_id, t.text, t.lang, t.source, t.n_chars
FROM train t ANTI JOIN flagged f ON t.doc_id = f.doc_id
"""


def test_oracle_draft_apply_decontamination(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.text import apply_decontamination

    docs = spark.table("documents")
    train = docs.filter(F.col("doc_id") % 17 != 0)
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    got = _rows(apply_decontamination(train, bench, n=5))
    want = _sql_rows(ddb, DECONTAM_SQL)
    assert got == want
    # the rule must actually bite on this corpus (bench docs share
    # 5-grams with training docs) and keep the clean majority
    assert 0 < len(got) < train.count()


# --- 15. IVF-PQ residual mode: the IVFADC derivation -----------------
#
# Residuals are plain double subtractions (IEEE-identical in both
# engines), then the same micro-unit PQ machinery over the residual
# space with one ADC table per (query, probed cell).

def ivfpq_residual_sql(nprobe: int) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS cell, v AS cent_v FROM e ORDER BY vec_id LIMIT 8),
ranked AS (
  SELECT e.vec_id, e.v, c.cell,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round(list_cosine_similarity(e.v, c.cent_v), 6) DESC, c.cell) AS rn
  FROM e CROSS JOIN cents c),
assign AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
resid AS (
  SELECT a.vec_id, a.cell,
         list_transform(range(64), i -> e.v[i+1] - c.cent_v[i+1]) AS rv
  FROM assign a JOIN e ON a.vec_id = e.vec_id JOIN cents c ON a.cell = c.cell),
cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, rv AS v
  FROM resid ORDER BY vec_id LIMIT 16),
ms AS (SELECT unnest(range(4)) AS m),
csub AS (SELECT c, m, v[m*16+1 : m*16+16] AS cv FROM cent, ms),
esub AS (SELECT vec_id, m, rv[m*16+1 : m*16+16] AS sv FROM resid, ms),
dists AS (
  SELECT vec_id, m, c,
         list_sum(list_transform(range(1, 17),
                  i -> cast(round((sv[i]-cv[i])^2 * 1e6) AS BIGINT))) AS d
  FROM esub JOIN csub USING (m)),
codes AS (
  SELECT vec_id, m, cast(min(d*16 + c) % 16 AS INT) AS code
  FROM dists GROUP BY vec_id, m),
probe AS (SELECT vec_id AS query_id, cell FROM ranked
          WHERE rn <= {nprobe} AND vec_id < 5),
qres AS (
  SELECT p.query_id, p.cell,
         list_transform(range(64), i -> e.v[i+1] - c.cent_v[i+1]) AS qr
  FROM probe p JOIN e ON p.query_id = e.vec_id JOIN cents c ON p.cell = c.cell),
qsub AS (SELECT query_id, cell, m, qr[m*16+1 : m*16+16] AS sv FROM qres, ms),
dt AS (
  SELECT query_id, cell, m, c AS code,
         list_sum(list_transform(range(1, 17),
                  i -> cast(round((sv[i]-cv[i])^2 * 1e6) AS BIGINT))) AS d
  FROM qsub JOIN csub USING (m)),
scored AS (
  SELECT dt.query_id, codes.vec_id AS neighbor_id,
         cast(sum(dt.d) AS BIGINT) AS adist_micro
  FROM codes
  JOIN assign ON codes.vec_id = assign.vec_id
  JOIN dt ON dt.cell = assign.cell AND codes.m = dt.m AND codes.code = dt.code
  GROUP BY dt.query_id, codes.vec_id)
SELECT query_id, neighbor_id, adist_micro,
       cast(row_number() OVER (PARTITION BY query_id
                               ORDER BY adist_micro, neighbor_id) AS INT) AS rank
FROM scored WHERE neighbor_id <> query_id
QUALIFY rank <= 5
"""


@pytest.mark.parametrize("nprobe", [1, 2])
def test_oracle_draft_ivfpq_residual(spark, ddb, nprobe):
    from datacatalog_tag_engine_spark.pipeline.similarity import ivfpq_topk

    emb = spark.table("embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    got = _rows(
        ivfpq_topk(emb, q, k=5, num_cells=8, nprobe=nprobe, by_residual=True)
    )
    assert got == _sql_rows(ddb, ivfpq_residual_sql(nprobe))
    assert len(got) > 0


# --- 16. gate_metrics batch form: windowed fail-reason mix -----------
#
# documents carries no timestamp; both engines derive the same
# deterministic one (epoch + doc_id minutes) so the tumbling windows
# are real. The gate is t16's full-threshold form; outcome explodes to
# one row per fail reason (kept docs contribute 'kept').

GATE_METRICS_SQL = r"""
WITH src AS (
  SELECT doc_id, text, source,
         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (doc_id) MINUTE AS ts
  FROM documents),
base AS (
  SELECT doc_id, source, ts, coalesce(text, '') AS text,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                     x -> length(x) > 0) AS w,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
                     x -> length(x) > 0) AS wl,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\n'),
                     l -> length(trim(l)) > 0) AS lines
  FROM src),
bg AS (
  SELECT doc_id, max(c) AS top_bg
  FROM (
    SELECT doc_id, bigram, count(*) AS c
    FROM (
      SELECT doc_id,
             unnest(list_transform(range(len(wl) - 1),
                                   i -> wl[i+1] || ' ' || wl[i+2])) AS bigram
      FROM base WHERE len(wl) >= 2)
    GROUP BY doc_id, bigram)
  GROUP BY doc_id),
f AS (
  SELECT b.doc_id, b.source, b.ts,
         len(b.w) AS n_words,
         CASE WHEN len(b.w) > 0
              THEN list_sum(list_transform(b.w, x -> length(x))) / len(b.w) END AS mwl,
         CASE WHEN len(b.w) > 0
              THEN len(regexp_extract_all(b.text, '#|\.\.\.|…')) / len(b.w) END AS sym,
         CASE WHEN len(b.lines) > 0
              THEN len(list_filter(b.lines, l -> regexp_matches(l, '^\s*(\*|-|•)\s')))
                   / len(b.lines) END AS bullet,
         CASE WHEN len(b.lines) > 0
              THEN len(list_filter(b.lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
                   / len(b.lines) END AS ell,
         CASE WHEN len(b.w) > 0
              THEN len(list_filter(b.w, x -> regexp_matches(x, '[A-Za-z]')))
                   / len(b.w) END AS alpha,
         len(list_filter(['the','be','to','of','and','that','have','with'],
                         s -> list_contains(b.wl, s))) AS stop_hits,
         CASE WHEN len(b.wl) > 0
              THEN 1.0 - len(list_distinct(b.wl)) / len(b.wl) END AS dupw,
         CASE WHEN len(b.wl) >= 2 THEN bg.top_bg / (len(b.wl) - 1) END AS topbg
  FROM base b LEFT JOIN bg USING (doc_id)),
r AS (
  SELECT *,
         list_filter([
           CASE WHEN n_words < 20 OR n_words > 100000 THEN 'word_count' END,
           CASE WHEN mwl < 3.0 OR mwl > 10.0 THEN 'mean_word_len' END,
           CASE WHEN sym > 0.1 THEN 'symbol_ratio' END,
           CASE WHEN bullet > 0.9 THEN 'bullet_lines' END,
           CASE WHEN ell > 0.3 THEN 'ellipsis_lines' END,
           CASE WHEN alpha < 0.8 THEN 'alpha_words' END,
           CASE WHEN stop_hits < 0 THEN 'stopword_hits' END,
           CASE WHEN n_words >= 2 AND dupw > 1.0 THEN 'dup_words' END,
           CASE WHEN n_words >= 2 AND topbg > 1.0 THEN 'top_bigram' END
         ], x -> x IS NOT NULL) AS fails
  FROM f),
oc AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, source,
         unnest(CASE WHEN len(fails) = 0 THEN ['kept'] ELSE fails END) AS outcome
  FROM r)
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       source, outcome, count(*) AS n_docs
FROM oc GROUP BY ALL
"""


def test_oracle_draft_gate_metrics_batch(spark, ddb):
    from datacatalog_tag_engine_spark.streaming.quality import gate_metrics

    src = spark.table("documents").select(
        "doc_id",
        "text",
        "source",
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(mins=F.col("doc_id").cast("int"))
        ).alias("ts"),
    )
    got = _rows(
        gate_metrics(
            src,
            window="1 hour",
            min_words=20,
            min_stopword_hits=0,
            max_dup_word_frac=1.0,
            max_top_bigram_frac=1.0,
        )
    )
    want = _sql_rows(ddb, GATE_METRICS_SQL)
    assert got == want
    # sorted columns: (n_docs, outcome, source, window_end, window_start)
    outcomes = {r[1] for r in got}
    assert "kept" in outcomes and len(outcomes) > 1  # keeps AND fails present
    assert len(got) > 2


# --- 17. materialize_mixture: the epoch plan made corpus -------------
#
# Chains the epoch-plan CTE with the copy expansion: floor(e) full
# copies plus one hash-gated remainder copy, the remainder key salted
# with floor(e).

MATERIALIZE_SQL = r"""
WITH s AS (
  SELECT source, count(*) AS n_docs,
         cast(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
w AS (
  SELECT source, n_docs, n_tokens,
         round(pow(n_tokens::DOUBLE, 0.5) / sum(pow(n_tokens::DOUBLE, 0.5)) OVER (), 6) AS weight
  FROM s),
t AS (
  SELECT source, n_tokens,
         cast(round(weight * 200000) AS BIGINT) AS target_tokens,
         cast(round(n_tokens * 1.5) AS BIGINT) AS cap
  FROM w WHERE n_tokens > 0),
r AS (
  SELECT source,
         least(target_tokens, cap) / n_tokens::DOUBLE AS e
  FROM t),
rates AS (
  SELECT source, cast(floor(e) AS INT) AS nfull,
         cast(floor((e - floor(e)) * 10000 + 0.5) AS BIGINT) AS rem
  FROM r),
j AS (
  SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars, rates.nfull, rates.rem,
         rates.nfull
         + CASE WHEN ('0x' || substr(md5(d.doc_id::VARCHAR || ':' || rates.nfull::VARCHAR), 1, 8))::BIGINT % 10000 < rates.rem
                THEN 1 ELSE 0 END AS n
  FROM documents d JOIN rates USING (source))
SELECT doc_id, text, lang, source, n_chars, unnest(range(n))::INT AS epoch
FROM j WHERE n > 0
"""


def test_oracle_draft_materialize_mixture(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.sampling import (
        epoch_plan,
        materialize_mixture,
    )

    docs = spark.table("documents")
    plan = epoch_plan(docs, budget_tokens=200_000, max_epochs=1.5)
    got = _rows(
        materialize_mixture(docs, plan).select(
            "doc_id", "text", "lang", "source", "n_chars",
            F.col("epoch").cast("int").alias("epoch"),
        )
    )
    want = _sql_rows(ddb, MATERIALIZE_SQL)
    assert got == want
    # at this budget at least one source repeats (epoch 1 rows exist)
    assert any(r[1] == 1 for r in got)  # sorted cols: doc_id, epoch, ...


# --- 18. chunk_text: sliding windows as slice arithmetic -------------

CHUNK_TEXT_SQL = r"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                     x -> length(x) > 0) AS w
  FROM documents),
n AS (
  SELECT doc_id, w, len(w) AS nw,
         CASE WHEN len(w) <= 40 THEN 1
              ELSE 1 + cast(ceil((len(w) - 40) / 30.0) AS INT) END AS nc
  FROM d WHERE len(w) > 0),
c AS (SELECT doc_id, w, nw, unnest(range(nc))::INT AS chunk_id FROM n)
SELECT doc_id, chunk_id,
       array_to_string(w[chunk_id*30 + 1 : chunk_id*30 + 40], ' ') AS text,
       least(40, nw - chunk_id*30)::INT AS n_words,
       (chunk_id * 30)::INT AS start_word
FROM c
"""


def test_oracle_draft_chunk_text(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.text import chunk_text

    got = _rows(
        chunk_text(spark.table("documents"), chunk_words=40, stride=30).select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            "text",
            F.col("n_words").cast("int").alias("n_words"),
            F.col("start_word").cast("int").alias("start_word"),
        )
    )
    want = _sql_rows(ddb, CHUNK_TEXT_SQL)
    assert got == want
    # multi-chunk docs with genuine overlap exist on the corpus
    assert len(got) > spark.table("documents").filter("length(text) > 0").count()


# --- 19. strip_html: the same regexp chain in RE2 --------------------
#
# Both engines run RE2-compatible patterns; DuckDB needs the explicit
# 'g' flag where Spark's regexp_replace is global by default.

def strip_html_sql(src: str) -> str:
    from datacatalog_tag_engine_spark.pipeline.text import (
        _HTML_ENTITIES,
        _HTML_STRIP_RULES,
    )

    t = "coalesce(text, '')"
    for pat, repl in _HTML_STRIP_RULES:
        # DuckDB string literals are NOT C-escaped: the regex pattern
        # passes through verbatim, only quotes double
        p = pat.replace("'", "''")
        r = repl.replace("\n", "' || chr(10) || '")
        t = f"regexp_replace({t}, '{p}', '{r}', 'g')"
    for ent, ch in _HTML_ENTITIES:
        ch_sql = ch.replace("'", "''")
        t = f"replace({t}, '{ent}', '{ch_sql}')"
    return f"""
SELECT doc_id, {t} AS text,
       {t} IS DISTINCT FROM coalesce(text, '') AS had_markup
FROM {src}
"""


def test_oracle_draft_strip_html(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.text import strip_html

    rows = [
        (1, "<html><head><style>p{c}</style><SCRIPT>var x;</script></head>"
            "<body><p>Hello &amp; welcome</p><div>line two</div><br>"
            "<ul><li>item</li></ul><!-- hidden -->tail&nbsp;end</body></html>"),
        (2, "plain text stays"),
        (3, None),
        (4, "<p>broken <b>markup"),
        (5, "a &lt; b &gt; c &quot;q&quot; &#39;s&#39;"),
        (6, "if x < 10 and y > 3: print(y)"),       # prose '<' is not a tag
        (7, "<p>Intro</p><script>var t = {u: 1};"),  # unclosed block bounded
        (8, "use &amp;lt;div&amp;gt; to make a box"),  # stays escaped
        (9, 'one<br class="clear">two &#160;&#8217;x'),  # attr br; raw &#8217 passes through
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ddb.execute("CREATE OR REPLACE TABLE _html_docs (doc_id BIGINT, text VARCHAR)")
    ddb.executemany("INSERT INTO _html_docs VALUES (?, ?)", rows)
    got = _rows(strip_html(df))
    want = _sql_rows(ddb, strip_html_sql("_html_docs"))
    assert got == want
    # the corpus passthrough: markup-free docs come back untouched
    cgot = _rows(strip_html(spark.table("documents")))
    cwant = _sql_rows(ddb, strip_html_sql("documents"))
    assert cgot == cwant


# --- 20. q59v2: the stage-0-extended composition (r7 q59 upgrade) ----
#
# Next round's planned q59 edit prepends normalize_text +
# collapse_repeated_lines; this draft proves the upgraded composition
# value-equal NOW by injecting a `cleaned` stage-0 CTE into the
# CURRENT certified q59 oracle (one string surgery on its single
# `FROM documents`), so the round-7 rotation is again wiring.

def _normalize_expr_sql(col: str) -> str:
    """The normalize_text chain as one SQL expression over ``col`` —
    the same steps NORMALIZE_SQL spells out, reusable inside other
    compositions."""
    return (
        r"""regexp_replace(
     regexp_replace(
      regexp_replace(
       regexp_replace(
        replace(
         translate(
          regexp_replace(
           regexp_replace(coalesce(""" + col + r""", ''), '\r\n?', chr(10), 'g'),
           '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
          '"""
        + "‘’‚“”„–—−"
        + "     ​"
        + r"""', e'\'\'\'"""
        + '"""'
        + r"""---     '),
         '"""
        + "…"
        + r"""', '...'),
        '[ \t]+', ' ', 'g'),
       ' ?\n ?', chr(10), 'g'),
      '\n{3,}', chr(10) || chr(10), 'g'),
     '^[\n ]+|[\n ]+$', '', 'g')"""
    )


def q59v2_sql() -> str:
    # r7 rotation LANDED: the stage-0 injection this draft proved is
    # now performed by oracle_sql() itself (q59_base + q59_stage0 in
    # __spark_entry__.py), so the draft compares against the wired
    # inventory oracle — the test below remains an independent proof
    # that the Spark-side chain the entry runs matches it.
    import __spark_entry__ as E

    return E.oracle_sql()["q59v2_clean_pipeline"]


def test_oracle_draft_q59v2_stage0_composition(spark, ddb):
    import __spark_entry__ as E
    from datacatalog_tag_engine_spark.pipeline.text import (
        collapse_repeated_lines,
        normalize_text,
    )

    # stage 0 on the Spark side, then the CURRENT certified q59 body
    # applied to the cleaned corpus via the same queries() code path:
    # rebuild its chain on a temp view standing in for `documents`
    docs = spark.table("documents")
    cleaned = collapse_repeated_lines(
        normalize_text(docs, passthrough=True)
    ).select("doc_id", "text")
    # q59's callable reads _docs(spark, sf) -> table "documents"; rather
    # than monkeypatch, inline the same chain the entry defines
    from datacatalog_tag_engine_spark.pipeline import dedup as DD
    from datacatalog_tag_engine_spark.pipeline import text as TXT
    from datacatalog_tag_engine_spark.pipeline.export import shard_assignments

    base = cleaned.repartition(8)
    g = TXT.gopher_filter(
        base, min_words=20, min_stopword_hits=0,
        max_dup_word_frac=1.0, max_top_bigram_frac=1.0,
    )
    kept = base.join(g.filter("keep").select("doc_id"), "doc_id", "left_semi")
    para = DD.paragraph_dedup(kept).select("doc_id", "text").localCheckpoint(eager=True)
    spans = DD.remove_repeated_spans(para, n=8, min_docs=2).select("doc_id", "text")
    clean = spans.filter(F.length(F.trim(F.col("text"))) > 0).localCheckpoint(eager=True)
    pairs = DD.minhash_dedup(clean)
    clusters = DD.neardup_clusters(clean, pairs)
    canon = DD.apply_neardup_dedup(clean, clusters)
    nw = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda w: F.length(w) > 0))
    got = _rows(
        shard_assignments(canon.select("doc_id", nw.alias("n_words")), 4).select(
            "doc_id", "shard", "n_words"
        )
    )
    want = _sql_rows(ddb, q59v2_sql())
    assert got == want and len(got) > 0
