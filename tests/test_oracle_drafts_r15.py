"""Round-15 rotation bank: operators built in round 14 AFTER the r14
window froze. Same contract as every drafts file: DuckDB-proven here,
wired into __spark_entry__ at their rotation with the SQL generator
moved verbatim. Every draft passed tools/hof_lint.py at proof time
(the r14 gate; tests/test_hof_lint.py asserts it on this file).

- t45_gopher_rule_quantiles — t16's THRESHOLD-TUNING table
  (text.gopher_rule_quantiles; the d18/t44 decision-table discipline
  applied to the gate's nine knobs): per rule, exact interpolated
  quantiles of its feature on THIS corpus + the fraction the current
  threshold rejects. One staged gate scan, a row-local unpivot, one
  9-row aggregate. Oracle: the wired t16 string + a 9-arm UNION
  unpivot + quantile_cont.

- t46_unicode_profile — encoding-corruption signals at doc grain
  (text.unicode_profile): replacement-char (U+FFFD mojibake), C0
  control junk, non-ASCII mass — the CCNet-style pre-language-ID
  check the Gopher rules structurally miss. Pure regexp scan, t02
  shape. Oracle: the same three character classes in DuckDB RE2.

- d31_copy_cluster_profile — the q73 histogram on the WINNOWING pair
  surface (dedup.cluster_size_profile over qualifying d25 pairs at
  max_df=100, min_overlap=0.8): whether contained-copy structure is a
  long tail of pairs or a few giant mirror families. Oracle: the d25
  derivation nested as a subquery + recursive min-reachable closure +
  the size rollup.

- d32_winnowing_overlap_verify — the d16 certification discipline
  applied to d25 (dedup.winnowing_overlap_verify): every qualifying
  pair carries the fingerprint-sample overlap AND the exact
  distinct-gram containment (same md5 gram hash, no selection, no
  cap), plus abs_err — the evidence the ~2/(w+1) sample ranks drop
  decisions correctly. Exact side computed for pair members only.

- d33_containment_vs_jaccard_grid — the WHY-two-grains table
  (dedup.containment_vs_jaccard_grid): every LSH candidate scored
  with exact Jaccard AND exact containment, rolled onto an 11x11
  decile grid on the 1e4 micro lattice with INTEGER division (floor
  of double*10 flips at representation boundaries; round(x*1e4)//1000
  cannot). The off-diagonal mass is the standing argument for running
  d25/d27 beside d15/q34.

- s38_pq_distortion — per-subspace PQ quantization error
  (similarity.pq_distortion_profile) on the SAME per-dimension micro
  lattice the ADC argmin scores on — prices exactly the surrogate
  s07/s10 rank by. Oracle: the shared _ivfpq_scored_cte chain's
  dists/codes CTEs + one assigned-code join (unreferenced CTEs are
  pruned by the engine; ONE copy of the chain).

- q107_dedup_funnel — the curation funnel (profiling.dedup_funnel):
  docs and tokens surviving gate -> exact dedup -> minhash canonical
  -> winnowing contained-copy, applied SEQUENTIALLY, each stage's
  survivor ids checkpointed once so no lineage re-executes. Oracle:
  the wired t16 string + md5 keep-first + cluster_chain_sql on the
  survivor CTE + the d27 drop rule on winnowing_sql(src=survivors),
  each stage nested as its own subquery (no CTE-name collisions).

- q108_ingest_rate_trend — the ops view over q103's metrics
  (streaming.dedup.ingest_rate_trend): per-batch acceptance micro +
  running accepted/in totals; the window is over a batch-count-sized
  frame. Shares q102/q103's cached replay (one build, three readers).
  Oracle: the wired sigstore metrics derivation + one window select.

- q109_source_quality_quantiles — per-source quality DISTRIBUTION
  (profiling.source_quality_quantiles): exact interpolated quantiles
  of the t02 score per source — the shape q104's mean cannot show,
  read before pinning a curriculum mixture. Oracle: the wired t02
  string + quantile_cont per source.

- d34 (NOT drafted): a winnowing cluster CANONICAL (keep-one-per-copy
  -family) was considered and rejected — d27's pair-decision drop is
  the documented semantics (containment is not symmetric; a cluster
  canonical over containment chains conflates unrelated texts).

r15 WINDOW FORECAST (the ledger computes the binding list at
rotation): 10 bank drafts = 10 rotation slots; expected re-certs
from the r14 post-freeze optimization: NONE beyond what the r14
window already covers (gopher staging re-verified strict pre-record
on all eight consumers; t16/q98/q64/q72/q100/q59v2/q61/q104 of which
q72/q104 sit in the r14 window). The remaining ~40 slots drain the
aging ledger (r10 cohort remainder, then r11 by name order).
"""

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as E
from datacatalog_tag_engine_spark.pipeline import dedup as DD

SF = "/root/testdata/sf0.001"

TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@pytest.fixture()
def ddb():
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    yield con
    con.close()


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _sql_rows(con, sql):
    rel = con.sql(sql)
    cols = sorted(rel.columns)
    return sorted(tuple(r) for r in con.sql(f"SELECT {', '.join(cols)} FROM rel").fetchall())


# --- t45: gopher rule quantiles ---------------------------------------------------


def gopher_rule_quantiles_sql(
    t16_sql: str, probs: tuple = (0.05, 0.25, 0.5, 0.75, 0.95)
) -> str:
    """The wired t16 string + a 9-arm unpivot (rule, value, failed) +
    quantile_cont; fail flags re-read t16's comma-joined fail_reasons."""
    from datacatalog_tag_engine_spark.pipeline.text import GOPHER_RULE_FEATURES

    arms = " UNION ALL ".join(
        f"SELECT '{rule}' AS rule, {feat}::DOUBLE AS value, "
        f"list_contains(string_split(fail_reasons, ','), '{rule}') AS failed FROM g"
        for rule, feat in GOPHER_RULE_FEATURES.items()
    )
    pcols = ", ".join(
        f"round(quantile_cont(value, {p}), 4) AS p{int(round(p * 100)):02d}"
        for p in probs
    )
    return f"""
WITH g AS ({t16_sql}),
long AS ({arms})
SELECT rule,
       count(*)::BIGINT AS n_docs,
       count(value)::BIGINT AS n_measurable,
       sum(failed::INT)::BIGINT AS n_failed,
       round(sum(failed::INT) / count(*), 4) AS fail_frac,
       {pcols}
FROM long GROUP BY rule
"""


def test_oracle_draft_gopher_rule_quantiles(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.text import gopher_rule_quantiles

    got = _rows(gopher_rule_quantiles(spark.table("documents")))
    want = _sql_rows(ddb, gopher_rule_quantiles_sql(E.oracle_sql()["t16_gopher_filter"]))
    assert got == want
    assert len(got) == 9


def test_gopher_rule_quantiles_prices_the_gate(spark):
    """Consistency with the gate itself: per rule, n_failed equals the
    number of docs whose fail_reasons contains that rule; quantiles
    are monotone across probs; n_docs is the corpus size."""
    from datacatalog_tag_engine_spark.pipeline.text import (
        GOPHER_RULE_FEATURES,
        gopher_filter,
        gopher_rule_quantiles,
    )

    docs = spark.table("documents")
    n = docs.count()
    rows = {r["rule"]: r for r in gopher_rule_quantiles(docs).collect()}
    assert set(rows) == set(GOPHER_RULE_FEATURES)
    g = gopher_filter(docs)
    for rule, r in rows.items():
        assert r["n_docs"] == n
        assert r["n_failed"] == g.filter(
            F.array_contains("fail_reasons", rule)
        ).count()
        qs = [r["p05"], r["p25"], r["p50"], r["p75"], r["p95"]]
        qs = [q for q in qs if q is not None]
        assert qs == sorted(qs)


# --- t46: unicode / encoding-corruption profile -----------------------------------


def unicode_profile_sql() -> str:
    """The same three character classes in DuckDB RE2; lengths and
    match counts are code-point counts in both engines."""
    return r"""
WITH b AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
c AS (
  SELECT doc_id,
         length(t)::BIGINT AS n_chars,
         len(regexp_extract_all(t, '[^\x00-\x7F]'))::BIGINT AS n_nonascii,
         len(regexp_extract_all(t, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]'))::BIGINT AS n_control,
         len(regexp_extract_all(t, '�'))::BIGINT AS n_replacement
  FROM b)
SELECT doc_id, n_chars, n_nonascii,
       CASE WHEN n_chars > 0 THEN round(n_nonascii / n_chars, 4) END AS nonascii_frac,
       n_control, n_replacement,
       (n_replacement > 0 OR n_control > 0
        OR coalesce(CASE WHEN n_chars > 0 THEN round(n_nonascii / n_chars, 4) END > 0.5,
                    FALSE)) AS suspect
FROM c
"""


def test_oracle_draft_unicode_profile(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.text import unicode_profile

    got = _rows(unicode_profile(spark.table("documents")))
    want = _sql_rows(ddb, unicode_profile_sql())
    assert got == want
    assert len(got) == 500


def test_unicode_profile_flags_the_planted_corruption(spark):
    """Mojibake (U+FFFD run), binary junk (C0 controls), and a
    majority-CJK doc are suspect; clean ASCII, a newline-rich doc,
    and an empty doc are not; counts are exact."""
    rows = [
        (1, "clean ascii text with words"),
        (2, "mojibake ��� here"),
        (3, "binary\x01\x02junk"),
        (4, "中文文本"),        # all CJK: nonascii_frac 1.0
        (5, "lines\nand\ttabs\r\nonly"),         # formatting is not junk
        (6, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from datacatalog_tag_engine_spark.pipeline.text import unicode_profile

    out = {r["doc_id"]: r for r in unicode_profile(docs).collect()}
    assert not out[1]["suspect"] and out[1]["n_nonascii"] == 0
    assert out[2]["suspect"] and out[2]["n_replacement"] == 3
    assert out[3]["suspect"] and out[3]["n_control"] == 2
    assert out[4]["suspect"] and out[4]["nonascii_frac"] == 1.0
    assert not out[5]["suspect"] and out[5]["n_control"] == 0
    assert not out[6]["suspect"] and out[6]["n_chars"] == 0
    assert out[6]["nonascii_frac"] is None


# --- d31: winnowing copy-cluster size profile -------------------------------------


def winnow_cluster_profile_sql(
    winnow_sql: str,
    max_df: int = 100,
    min_shared: int = 2,
    min_overlap: float = 0.8,
) -> str:
    """The d25 pair derivation nested as a subquery (its WITH scope
    stays private — no CTE-name collisions), qualifying pairs at
    min_overlap, recursive min-reachable closure over documents, q73's
    histogram rollup."""
    overlap = E.winnowing_overlap_sql(winnow_sql, max_df=max_df, min_shared=min_shared)
    return f"""
WITH RECURSIVE wq AS (
  SELECT doc_a, doc_b FROM ({overlap}) WHERE overlap >= {min_overlap}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM wq
          UNION SELECT doc_b, doc_a FROM wq),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
clusters AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
csz AS (SELECT cluster_id, count(*) AS cluster_size FROM clusters GROUP BY cluster_id)
SELECT cluster_size::BIGINT AS cluster_size,
       count(*)::BIGINT AS n_clusters,
       (count(*) * cluster_size)::BIGINT AS n_docs
FROM csz GROUP BY cluster_size
"""


def test_oracle_draft_winnow_cluster_profile(spark, ddb):
    docs = spark.table("documents")
    pairs = DD.winnowing_overlap_pairs(
        docs, max_df=100, min_overlap=0.8
    ).select("doc_a", "doc_b")
    got = _rows(DD.cluster_size_profile(docs, pairs))
    want = _sql_rows(
        ddb, winnow_cluster_profile_sql(E.oracle_sql()["t43_winnowing"])
    )
    assert got == want
    assert len(got) >= 1


def test_winnow_cluster_profile_conserves_the_corpus(spark):
    """sum(n_docs) over the histogram equals the corpus size, and the
    pair mass is consistent: every non-singleton cluster holds at
    least one qualifying pair endpoint."""
    docs = spark.table("documents")
    pairs = DD.winnowing_overlap_pairs(docs, max_df=100, min_overlap=0.8).select(
        "doc_a", "doc_b"
    )
    hist = DD.cluster_size_profile(docs, pairs).collect()
    assert sum(r["n_docs"] for r in hist) == docs.count()
    in_pairs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .count()
    )
    non_singleton = sum(r["n_docs"] for r in hist if r["cluster_size"] > 1)
    assert non_singleton >= in_pairs > 0 or non_singleton == in_pairs == 0


# --- d32: winnowing overlap exact verify ------------------------------------------


def winnowing_overlap_verify_sql(
    winnow_sql: str,
    k: int = 8,
    max_df: int = 1000,
    min_shared: int = 2,
    min_overlap: float = 0.8,
) -> str:
    """The d25 derivation (qualifying pairs) joined to the EXACT
    distinct-gram containment — the same md5 gram hash with no window
    selection and no df cap."""
    overlap = E.winnowing_overlap_sql(winnow_sql, max_df=max_df, min_shared=min_shared)
    return f"""
WITH wq AS (
  SELECT doc_a, doc_b, n_shared, overlap
  FROM ({overlap}) WHERE overlap >= {min_overlap}),
d AS (SELECT doc_id, lower(coalesce(text, '')) AS t FROM documents),
gh AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN length(t) >= {k}
                THEN list_transform(range(1, length(t) - {k} + 2),
                                    i -> ('0x' || substr(md5(substr(t, i, {k})), 1, 8))::BIGINT)
                ELSE [] END) AS gh
  FROM d),
gs AS (SELECT doc_id, count(*) AS gn FROM gh GROUP BY doc_id),
ex AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM gh a JOIN gh b ON a.gh = b.gh AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT w.doc_a, w.doc_b, w.n_shared, w.overlap,
       coalesce(ex.i, 0)::BIGINT AS n_shared_exact,
       round(coalesce(ex.i, 0) / least(ga.gn, gb.gn), 4) AS overlap_exact,
       round(abs(w.overlap - coalesce(ex.i, 0) / least(ga.gn, gb.gn)), 4) AS abs_err
FROM wq w
LEFT JOIN ex ON ex.doc_a = w.doc_a AND ex.doc_b = w.doc_b
JOIN gs ga ON ga.doc_id = w.doc_a
JOIN gs gb ON gb.doc_id = w.doc_b
"""


def test_oracle_draft_winnowing_overlap_verify(spark, ddb):
    got = _rows(
        DD.winnowing_overlap_verify(
            spark.table("documents"), max_df=100, min_overlap=0.8
        )
    )
    want = _sql_rows(
        ddb,
        winnowing_overlap_verify_sql(
            E.oracle_sql()["t43_winnowing"], max_df=100, min_overlap=0.8
        ),
    )
    assert got == want
    assert len(got) > 0


def test_winnowing_overlap_verify_semantics(spark):
    """(a) a verbatim contained copy verifies at overlap_exact ~1.0;
    (b) every qualifying pair has exact intersection >= its
    fingerprint n_shared is NOT implied (fingerprints are df-capped
    and sampled), but n_shared_exact >= 1 always (the guarantee);
    (c) abs_err recomputes from the two overlap columns."""
    import random

    rng = random.Random(23)
    words = lambda n, tag: " ".join(f"{tag}{rng.randrange(10**6)}" for _ in range(n))
    core = "one paragraph that is copied verbatim into the larger document"
    docs = spark.createDataFrame(
        [
            (1, core),
            (2, words(60, "a") + " " + core + " " + words(60, "b")),
            (3, words(90, "c")),
        ],
        "doc_id long, text string",
    )
    rows = DD.winnowing_overlap_verify(docs, min_overlap=0.5).collect()
    pair = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert (1, 2) in pair
    r = pair[(1, 2)]
    assert r["overlap_exact"] >= 0.95
    for r in rows:
        assert r["n_shared_exact"] >= 1
        assert r["abs_err"] == round(abs(r["overlap"] - r["overlap_exact"]), 4)


# --- d33: containment vs jaccard decile grid --------------------------------------


def containment_grid_sql(k: int = 3, num_hashes: int = 8, bands: int = 4) -> str:
    """The d16 candidate chain (threshold 0) with BOTH exact scores,
    rolled onto the micro-lattice decile grid with integer division."""
    sig_exprs = ",\n         ".join(
        f"min(md5('{j}:' || shingle)) AS sig_{j}" for j in range(num_hashes)
    )
    band_cases = " ".join(
        f"WHEN {b} THEN md5(sig_{2*b} || '|' || sig_{2*b+1})" for b in range(bands)
    )
    return f"""
WITH toks AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') w FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN len(w) >= {k}
                THEN list_transform(range(1, len(w) - {k - 2}), i -> array_to_string(w[i:i+{k - 1}], ' '))
                ELSE [array_to_string(w, ' ')] END) AS shingle
  FROM toks),
sigs AS (
  SELECT doc_id, {sig_exprs}
  FROM sh GROUP BY doc_id),
buckets AS (
  SELECT doc_id, band, CASE band {band_cases} END AS bucket
  FROM sigs, (SELECT unnest(range({bands})) AS band)),
cands AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
sc AS (
  SELECT round(i / (sa.n + sb.n - i), 4) AS j,
         round(i / least(sa.n, sb.n), 4) AS c
  FROM cands
  JOIN inter ON inter.da = cands.da AND inter.db = cands.db
  JOIN sizes sa ON sa.doc_id = cands.da
  JOIN sizes sb ON sb.doc_id = cands.db)
SELECT (round(j * 10000)::BIGINT // 1000)::BIGINT AS j_decile,
       (round(c * 10000)::BIGINT // 1000)::BIGINT AS c_decile,
       count(*)::BIGINT AS n_pairs
FROM sc GROUP BY 1, 2
"""


def test_oracle_draft_containment_grid(spark, ddb):
    got = _rows(DD.containment_vs_jaccard_grid(spark.table("documents")))
    want = _sql_rows(ddb, containment_grid_sql())
    assert got == want
    assert len(got) >= 1


def test_containment_grid_semantics(spark):
    """Containment >= jaccard always (shared/min vs shared/union), so
    no cell sits below the diagonal; total pair mass equals the
    candidate-pair count; a planted contained copy lands at high-c
    low-j."""
    import random

    rng = random.Random(31)
    words = lambda n, tag: " ".join(f"{tag}{rng.randrange(10**6)}" for _ in range(n))
    core = words(12, "core")
    docs = spark.createDataFrame(
        [(1, core), (2, core + " " + words(10, "pad")), (3, words(50, "x"))],
        "doc_id long, text string",
    )
    grid = DD.containment_vs_jaccard_grid(docs).collect()
    for r in grid:
        assert r["c_decile"] >= r["j_decile"]
    # the contained pair is a candidate here because the pad is small;
    # with a LARGE pad the same pair never collides in any LSH band —
    # the grid is bounded to the candidate surface, and heavily
    # contained pairs falling OFF it is precisely the d25 motivation
    assert any(r["c_decile"] >= 9 and r["j_decile"] <= 6 for r in grid)

    corpus_grid = DD.containment_vs_jaccard_grid(spark.table("documents"))
    from datacatalog_tag_engine_spark.pipeline.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_table,
    )

    sh = shingle_table(spark.table("documents"))
    n_cands = lsh_candidate_pairs(minhash_signatures(sh, 8), 8, 4).count()
    assert corpus_grid.agg(F.sum("n_pairs")).first()[0] == n_cands


# --- s38: PQ distortion profile ---------------------------------------------------


def pq_distortion_sql() -> str:
    """The shared _ivfpq_scored_cte chain (ONE copy): its dists CTE
    already scores every (vector, subspace, code) on the per-dimension
    micro lattice and codes picks the argmin — the distortion table is
    one assigned-code join away. Unreferenced CTEs (probe/dt/scored)
    are pruned by the engine."""
    return (
        E._ivfpq_scored_cte(1)
        + """,
chosen AS (
  SELECT codes.m, dists.d
  FROM codes JOIN dists ON dists.vec_id = codes.vec_id
                       AND dists.m = codes.m AND dists.c = codes.code)
SELECT m::INT AS subspace,
       count(*)::BIGINT AS n_vectors,
       sum(d)::BIGINT AS sum_sqerr_micro,
       round(sum(d) / count(*))::BIGINT AS mean_sqerr_micro
FROM chosen GROUP BY m
"""
    )


def test_oracle_draft_pq_distortion(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    got = _rows(SIM.pq_distortion_profile(spark.table("embeddings")))
    want = _sql_rows(ddb, pq_distortion_sql())
    assert got == want
    assert len(got) == 4


def test_pq_distortion_semantics(spark):
    """(a) a corpus that IS the codebook has zero distortion (each of
    the first num_codes vectors encodes to itself); (b) on the real
    corpus every subspace's mean is positive and the mean recomputes
    from the sum; (c) n_vectors is the corpus size per subspace."""
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    emb = spark.table("embeddings")
    first16 = emb.orderBy("vec_id").limit(16)
    zero = SIM.pq_distortion_profile(first16).collect()
    assert all(r["sum_sqerr_micro"] == 0 for r in zero) and len(zero) == 4

    n = emb.count()
    rows = SIM.pq_distortion_profile(emb).collect()
    for r in rows:
        assert r["n_vectors"] == n
        assert r["sum_sqerr_micro"] > 0
        assert r["mean_sqerr_micro"] == round(r["sum_sqerr_micro"] / n)


# --- q107: dedup funnel -----------------------------------------------------------


def dedup_funnel_sql(
    max_df: int = 100, min_overlap: float = 0.8, min_shared: int = 2
) -> str:
    """Each stage nested as its own subquery so every chain's CTE
    scope stays private: the RELAXED Gopher gate (q61/q59's certified
    profile — min_words=20, stopword/repetition rules off; the paper
    defaults zero this synthetic corpus, SCALE.md r6), md5 keep-first,
    cluster_chain_sql on the exact-dedup survivors, the d27 drop rule
    on winnowing_sql(src=stage-3 survivors). A stage spine LEFT JOIN
    keeps empty stages visible as zero-doc rows (the Spark aggregate
    always emits one row per stage)."""
    chain = E.cluster_chain_sql("d2")
    winnow_d3 = E.winnowing_sql(src="d3")
    return f"""
WITH tok AS (SELECT doc_id,
                    len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_tokens
             FROM documents),
base AS (
  SELECT doc_id, coalesce(text, '') AS text,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),
                     x -> length(x) > 0) AS w,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\\n'),
                     l -> length(trim(l)) > 0) AS lines
  FROM documents),
gf AS (
  SELECT doc_id,
         len(w) AS nw,
         list_sum(list_transform(w, x -> length(x))) / len(w) AS mwl,
         len(regexp_extract_all(text, '#|\\.\\.\\.|…')) / len(w) AS sym,
         len(list_filter(lines, l -> regexp_matches(l, '^\\s*(\\*|-|•)\\s')))
           / len(lines) AS bullet,
         len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
           / len(lines) AS ell,
         len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) / len(w) AS alpha
  FROM base WHERE len(w) > 0 AND len(lines) > 0),
s1 AS (
  SELECT doc_id FROM gf
  WHERE nw BETWEEN 20 AND 100000
    AND mwl BETWEEN 3.0 AND 10.0
    AND sym <= 0.1 AND bullet <= 0.9 AND ell <= 0.3 AND alpha >= 0.8),
d1 AS (SELECT d.doc_id, d.text FROM documents d JOIN s1 USING (doc_id)),
s2 AS (SELECT doc_id FROM (
         SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         FROM d1) WHERE rn = 1),
d2 AS (SELECT d.doc_id, d.text FROM documents d JOIN s2 USING (doc_id)),
cl AS (SELECT * FROM (WITH RECURSIVE {chain}
       SELECT doc_id, cluster_id FROM clusters)),
s3 AS (SELECT doc_id FROM cl WHERE doc_id = cluster_id),
d3 AS (SELECT d.doc_id, d.text FROM documents d JOIN s3 USING (doc_id)),
wd AS (SELECT * FROM (
  WITH wf AS ({winnow_d3}),
  dfp AS (SELECT DISTINCT doc_id, fp FROM wf),
  kept AS (
    SELECT doc_id, fp FROM dfp
    WHERE fp NOT IN (SELECT fp FROM dfp GROUP BY fp HAVING count(*) > {max_df})),
  wsz AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
  shared AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
    FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= {min_shared}),
  scored AS (
    SELECT s.doc_a, s.doc_b, sa.n AS na, sb.n AS nb
    FROM shared s
    JOIN wsz sa ON sa.doc_id = s.doc_a
    JOIN wsz sb ON sb.doc_id = s.doc_b
    WHERE round(s.n_shared / least(sa.n, sb.n), 4) >= {min_overlap})
  SELECT CASE WHEN na < nb THEN doc_a ELSE doc_b END AS doc_id FROM scored)),
s4 AS (SELECT doc_id FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM wd)),
per AS (
  SELECT 0 AS stage_id, doc_id FROM documents
  UNION ALL SELECT 1, doc_id FROM s1
  UNION ALL SELECT 2, doc_id FROM s2
  UNION ALL SELECT 3, doc_id FROM s3
  UNION ALL SELECT 4, doc_id FROM s4),
agg AS (
  SELECT stage_id, count(*) AS n_docs, sum(n_tokens) AS n_tokens
  FROM per JOIN tok USING (doc_id) GROUP BY stage_id),
spine AS (
  SELECT * FROM (VALUES (0, 'input'), (1, 'gopher_gate'), (2, 'exact_dedup'),
                        (3, 'minhash_canonical'), (4, 'winnowing_contained'))
           AS t(stage_id, stage)),
stg AS (
  SELECT sp.stage_id, sp.stage,
         coalesce(a.n_docs, 0) AS n_docs, a.n_tokens
  FROM spine sp LEFT JOIN agg a USING (stage_id))
SELECT stage_id::INT AS stage_id, stage,
       n_docs::BIGINT AS n_docs, n_tokens::BIGINT AS n_tokens,
       round(n_docs / max(CASE WHEN stage_id = 0 THEN n_docs END) OVER (), 4) AS docs_frac,
       round(n_tokens / max(CASE WHEN stage_id = 0 THEN n_tokens END) OVER (), 4) AS tokens_frac
FROM stg
"""


def test_oracle_draft_dedup_funnel(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.profiling import dedup_funnel

    got = _rows(
        dedup_funnel(
            spark.table("documents"),
            min_words=20,
            min_stopword_hits=0,
            max_dup_word_frac=1.0,
            max_top_bigram_frac=1.0,
        )
    )
    want = _sql_rows(ddb, dedup_funnel_sql())
    assert got == want
    assert len(got) == 5


def test_dedup_funnel_is_monotone_and_composes(spark):
    """Survival is non-increasing; stage 1 equals the gate's own keep
    count; the input row is the corpus; fractions recompute."""
    from datacatalog_tag_engine_spark.pipeline.profiling import dedup_funnel
    from datacatalog_tag_engine_spark.pipeline.text import gopher_filter

    docs = spark.table("documents")
    relaxed = dict(
        min_words=20,
        min_stopword_hits=0,
        max_dup_word_frac=1.0,
        max_top_bigram_frac=1.0,
    )
    rows = sorted(
        dedup_funnel(docs, **relaxed).collect(), key=lambda r: r["stage_id"]
    )
    assert rows[0]["n_docs"] == docs.count()
    counts = [r["n_docs"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert rows[1]["n_docs"] == gopher_filter(docs, **relaxed).filter("keep").count()
    assert rows[1]["n_docs"] > 0  # the relaxed profile keeps this corpus
    for r in rows:
        assert r["docs_frac"] == round(r["n_docs"] / rows[0]["n_docs"], 4)
        if r["n_tokens"] is not None:
            assert r["tokens_frac"] == round(r["n_tokens"] / rows[0]["n_tokens"], 4)


# --- q108: ingest rate trend ------------------------------------------------------


def ingest_rate_trend_sql(n_batches: int = 3, threshold: float = 0.5) -> str:
    """The wired sigstore metrics derivation + one window select."""
    return f"""
WITH m AS ({E.sigstore_metrics_sql(n_batches, threshold)})
SELECT batch::INT AS batch, n_in, n_accepted,
       CASE WHEN n_in > 0
            THEN round(n_accepted * 10000 / n_in) END::BIGINT AS accept_rate_micro,
       sum(n_accepted) OVER (ORDER BY batch
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_accepted,
       sum(n_in) OVER (ORDER BY batch
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_in
FROM m
"""


def test_oracle_draft_ingest_rate_trend(spark, ddb, tmp_path):
    from datacatalog_tag_engine_spark.pipeline.dedup import build_signature_store
    from datacatalog_tag_engine_spark.streaming.dedup import (
        ingest_rate_trend,
        sigstore_ingest_replay,
    )

    docs = spark.table("documents").select("doc_id", "text")
    resident = docs.filter(F.col("doc_id") % 4 == 0)
    batches = [docs.filter(F.col("doc_id") % 4 == i) for i in (1, 2, 3)]
    store = str(tmp_path / "store")
    build_signature_store(resident, store)
    sigstore_ingest_replay(
        spark, store, batches, str(tmp_path / "acc"),
        metrics_sink=str(tmp_path / "metrics"),
    )
    got = _rows(ingest_rate_trend(spark.read.parquet(str(tmp_path / "metrics"))))
    want = _sql_rows(ddb, ingest_rate_trend_sql())
    assert got == want
    assert len(got) == 3


def test_ingest_rate_trend_accounting(spark, tmp_path):
    """cum columns are running sums of the per-batch columns; the rate
    recomputes on the micro lattice; batches are dense from 0."""
    from datacatalog_tag_engine_spark.pipeline.dedup import build_signature_store
    from datacatalog_tag_engine_spark.streaming.dedup import (
        ingest_rate_trend,
        sigstore_ingest_replay,
    )

    docs = spark.table("documents").select("doc_id", "text")
    resident = docs.filter(F.col("doc_id") % 4 == 0)
    batches = [docs.filter(F.col("doc_id") % 4 == i) for i in (1, 2, 3)]
    store = str(tmp_path / "store")
    build_signature_store(resident, store)
    sigstore_ingest_replay(
        spark, store, batches, str(tmp_path / "acc"),
        metrics_sink=str(tmp_path / "metrics"),
    )
    rows = sorted(
        ingest_rate_trend(spark.read.parquet(str(tmp_path / "metrics"))).collect(),
        key=lambda r: r["batch"],
    )
    assert [r["batch"] for r in rows] == [0, 1, 2]
    run_in = run_acc = 0
    for r in rows:
        run_in += r["n_in"]
        run_acc += r["n_accepted"]
        assert r["cum_in"] == run_in and r["cum_accepted"] == run_acc
        assert r["accept_rate_micro"] == round(r["n_accepted"] * 10000 / r["n_in"])


# --- q109: per-source quality quantiles -------------------------------------------


def source_quality_quantiles_sql(
    t02_sql: str, probs: tuple = (0.05, 0.25, 0.5, 0.75, 0.95)
) -> str:
    """The wired t02 string + quantile_cont per source (the q74
    cross-engine equality: DuckDB quantile_cont == Spark percentile)."""
    pcols = ", ".join(
        f"round(quantile_cont(quality_score, {p}), 4) AS p{int(round(p * 100)):02d}"
        for p in probs
    )
    return f"""
WITH q AS ({t02_sql})
SELECT d.source, count(*)::BIGINT AS n_docs, {pcols}
FROM q JOIN documents d USING (doc_id)
GROUP BY d.source
"""


def test_oracle_draft_source_quality_quantiles(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.profiling import (
        source_quality_quantiles,
    )

    got = _rows(source_quality_quantiles(spark.table("documents")))
    want = _sql_rows(ddb, source_quality_quantiles_sql(E.oracle_sql()["t02_quality"]))
    assert got == want
    assert len(got) > 1


def test_source_quality_quantiles_shape(spark):
    """Quantiles are monotone per source, doc counts conserve the
    corpus, and the p50s sit inside the global score range."""
    from datacatalog_tag_engine_spark.pipeline.profiling import (
        source_quality_quantiles,
    )
    from datacatalog_tag_engine_spark.pipeline.text import quality_scores

    docs = spark.table("documents")
    rows = source_quality_quantiles(docs).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    lo, hi = (
        quality_scores(docs)
        .agg(F.min("quality_score"), F.max("quality_score"))
        .first()
    )
    for r in rows:
        qs = [r["p05"], r["p25"], r["p50"], r["p75"], r["p95"]]
        assert qs == sorted(qs)
        assert lo <= r["p50"] <= hi
