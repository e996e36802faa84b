"""Round-9 rotation prep: DuckDB oracle drafts for operators built in
round 8 but NOT wired into the frozen inventory (the freeze policy:
new queries enter only at round start, with a proven draft). This
module's generators are the work-list — at the r9 rotation, move each
SQL generator into __spark_entry__ verbatim (entry becomes the single
copy; this file imports it back) and wire the queries()/oracle_sql()
pairs:

- m03_audio_fp_neardup — chromaprint-shaped temporal-delta audio
  fingerprint (multimodal.audio_fingerprint) + the m02 banding
  machinery; corpus/energies/bits replayed analytically.
- m04_video_frame_neardup — per-sampled-frame perceptual hashes
  (multimodal.video_frame_phashes) + sequence-aware banding
  (dedup.frame_neardup_pairs: temporally-aligned frames, floor on
  matching frames); full analytic replay.
- t27_tokenizer_fertility — per-source tokens/word + chars/token of
  the frozen BPE merge list (bpe.tokenizer_fertility); reuses the
  proven t18 encode CTE chain aggregated at source grain.
- t28_corpus_divergence — per-source unigram JS divergence vs the
  corpus distribution (text.corpus_divergence); nano-unit terms.
- t29_vocab_growth — Heaps'-law vocabulary growth curve over
  id-range buckets (text.vocab_growth).
- q66_length_outliers — per-source median/MAD outlier profile
  (profiling.length_outliers).
- q67_event_funnel — ordered min-ts conversion funnel over events
  (profiling.event_funnel).
- s13_cell_balance — IVF cell-occupancy/skew profile
  (similarity.cell_balance); reuses the s03 assignment CTEs.
- d11_source_dup_profile — per-source exact-clone triage profile
  (dedup.source_dup_profile).
- q68_holdout_split — leakage-guarded eval holdout
  (sampling.holdout_split); hash-bucket rule replayed as in q58.
- d12_containment — n-gram containment inter/min(|A|,|B|) for
  doc-in-doc detection Jaccard misses (dedup.containment_pairs);
  d04's inverted-index derivation with the asymmetric denominator.
- d13_cross_source_overlap — pairwise source content-overlap matrix
  at shingle grain (dedup.cross_source_overlap), the between-source
  complement of d11; fingerprint unit covered by pytest.
- d14_containment_dedup — doc-in-doc dedup in the stress-rung-proven
  production order (dedup.containment_dedup): exact canonicals first,
  then single-pass containment dominance; (doc_id, keep) verdicts.
- s14_ivfpq_rerank — IVF-PQ + exact re-rank, the full FAISS serving
  recipe (similarity.ivfpq_topk_rerank): ADC shortlist, exact cosine
  on shortlisted rows only, brute-force-compatible output schema; at
  rotation parameterize E.ivfpq_sql on (nprobe, k) and build the
  rerank SQL on top of it as the single copy.
- q69_shard_balance — pre-write shard-balance/straggler profile
  (export.shard_balance): the q58 md5 bucket rule at shard grain,
  empty shards kept, doc_skew normalized to 1.0-is-even.
- q70_cohort_retention — first-activity cohort x day-offset return
  matrix over events (profiling.cohort_retention); users count once
  per active day.
- s15_ivfpq_rerank_from_index — the persisted serving path
  (similarity.ivfpq_topk_rerank_from_index): partition-pruned index
  shortlist + exact re-rank against the raw corpus table; replays
  s14's oracle verbatim (the s10/s11 value-identity pattern).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from datacatalog_tag_engine_spark.pipeline import dedup as DD
from datacatalog_tag_engine_spark.pipeline import multimodal as MM

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def ddb():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    yield con
    con.close()


def _rows(df):
    cols = sorted(df.columns)
    out = []
    for r in df.select(*cols).collect():
        out.append(tuple(round(v, 6) if isinstance(v, float) else v for v in r))
    return sorted(out)


def _sql_rows(con, sql):
    rel = con.sql(sql)
    cols = sorted(rel.columns)
    out = []
    for r in con.sql(f"SELECT {', '.join(cols)} FROM rel").fetchall():
        out.append(tuple(round(v, 6) if isinstance(v, float) else v for v in r))
    return sorted(out)


def _band_values() -> str:
    return ", ".join(
        f"({j}, {m}::BIGINT)" for j, m in enumerate(DD.hamming_band_masks(64, 4))
    )


# --- m03: audio fingerprint near-dup ---------------------------------------


def audio_fp_neardup_sql(
    n_groups: int = 6, group_size: int = 3, max_hamming: int = 10
) -> str:
    """Analytic replay of audio_fingerprint + hamming_neardup_pairs:
    fake band energies are integer arithmetic of (dur, seed, t, b);
    bit (t, b) is the temporal delta sign; packing and banding are the
    m02 rules (two's-complement bit 63, AND-mask bands)."""
    fr, nb = MM.AUDIO_FP_FRAMES, MM.AUDIO_FP_BANDS
    ncell = fr * nb
    energy = (
        "((dur*31 + (t*17 + b*41 + 1) * (5 + dur % 11)) % 1024 + "
        "CASE WHEN len(list_filter(range(seed), "
        f"c -> (dur*13 + c*7) % {ncell} = t * {nb} + b)) % 2 = 1 "
        "THEN 512 ELSE 0 END) % 1024"
    )
    return f"""
WITH m AS (
  SELECT (g * {group_size} + j)::BIGINT AS media_id,
         30000 + 700 * g AS dur, j AS seed
  FROM range({n_groups}) tg(g), range({group_size}) tj(j)),
e AS (
  SELECT media_id, t, b, {energy} AS v
  FROM m, range({fr}) tt(t), range({nb}) tb(b)),
bits AS (
  SELECT a.media_id, (a.t * {nb} + a.b) AS bit,
         CASE WHEN n.v > a.v THEN 1 ELSE 0 END AS s
  FROM e a JOIN e n ON n.media_id = a.media_id AND n.t = a.t + 1 AND n.b = a.b
  WHERE a.t < {fr - 1}),
fp AS (
  SELECT media_id,
         sum(CASE WHEN s = 1
                  THEN CASE WHEN bit = 63 THEN -9223372036854775808
                       ELSE (1::BIGINT << bit) END
                  ELSE 0 END)::BIGINT AS afp
  FROM bits GROUP BY media_id),
bk AS (
  SELECT media_id, afp, band, afp & mask AS key
  FROM fp, (VALUES {_band_values()}) bm(band, mask)),
cand AS (
  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                  a.afp AS fp_a, b.afp AS fp_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key
                     AND a.media_id < b.media_id)
SELECT id_a, id_b, bit_count(xor(fp_a, fp_b))::INT AS hamming
FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= {max_hamming}
"""


def _m03(spark):
    fps = MM.audio_fingerprint(MM.make_fake_audio_corpus(spark, 6, 3))
    return DD.hamming_neardup_pairs(
        fps, id_col="media_id", fp_col="afp", bits=64, bands=4, max_hamming=10
    )


def test_oracle_draft_audio_fp_neardup(spark, ddb):
    got = _rows(_m03(spark))
    want = _sql_rows(ddb, audio_fp_neardup_sql())
    assert got == want
    assert len(got) > 0


def test_audio_fp_neardup_semantics(spark):
    rows = [(r["id_a"], r["id_b"], r["hamming"]) for r in _m03(spark).collect()]
    assert len(rows) == 18  # all intra-group variant pairs found
    assert all(a // 3 == b // 3 for a, b, _ in rows)


# --- m04: video frame-sequence near-dup ------------------------------------


def video_frame_neardup_sql(
    n_groups: int = 4,
    group_size: int = 3,
    sample_frames: int = 4,
    max_hamming: int = 10,
    min_matching_frames: int = 3,
) -> str:
    """Analytic replay of video_frame_phashes + frame_neardup_pairs:
    frame t's grid is the image fake with h+7t; banding joins the frame
    index into the key (temporal alignment); the pair floor counts
    distinct matched frames."""
    g = MM.PHASH_GRID
    return f"""
WITH m AS (
  SELECT (gg * {group_size} + j)::BIGINT AS media_id,
         128 + gg AS w, 72 + gg AS h, j AS seed
  FROM range({n_groups}) tg(gg), range({group_size}) tj(j)),
px AS (
  SELECT media_id, t, (cy * {g} + cx) AS cell,
         ((w*37 + (h + 7*t)*53 + (cx*13 + cy*29 + 1) * (3 + w % 13)) % 256 +
          CASE WHEN len(list_filter(range(seed),
                         c -> (w*7 + c*11) % 64 = cy * {g} + cx)) % 2 = 1
               THEN 128 ELSE 0 END) % 256 AS v
  FROM m, range({sample_frames}) tt(t), range({g}) a(cy), range({g}) b(cx)),
s AS (SELECT media_id, t, sum(v) AS sv FROM px GROUP BY media_id, t),
fp AS (
  SELECT px.media_id, px.t,
         sum(CASE WHEN 64 * v > sv
                  THEN CASE WHEN cell = 63 THEN -9223372036854775808
                       ELSE (1::BIGINT << cell) END
                  ELSE 0 END)::BIGINT AS phash
  FROM px JOIN s ON s.media_id = px.media_id AND s.t = px.t
  GROUP BY px.media_id, px.t),
bk AS (
  SELECT media_id, t, phash, band, phash & mask AS key
  FROM fp, (VALUES {_band_values()}) bm(band, mask)),
cand AS (
  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b, a.t AS frame,
                  a.phash AS fp_a, b.phash AS fp_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key AND a.t = b.t
                     AND a.media_id < b.media_id),
matched AS (
  SELECT id_a, id_b, frame FROM cand
  WHERE bit_count(xor(fp_a, fp_b)) <= {max_hamming})
SELECT id_a, id_b, count(DISTINCT frame)::INT AS n_matching_frames
FROM matched GROUP BY id_a, id_b
HAVING count(DISTINCT frame) >= {min_matching_frames}
"""


def _m04(spark):
    vfp = MM.video_frame_phashes(MM.make_fake_video_corpus(spark, 4, 3), sample_frames=4)
    return DD.frame_neardup_pairs(
        vfp, min_matching_frames=3, max_hamming=10
    )


def test_oracle_draft_video_frame_neardup(spark, ddb):
    got = _rows(_m04(spark))
    want = _sql_rows(ddb, video_frame_neardup_sql())
    assert got == want
    assert len(got) > 0


def test_video_frame_neardup_semantics(spark):
    rows = [
        (r["id_a"], r["id_b"], r["n_matching_frames"]) for r in _m04(spark).collect()
    ]
    assert len(rows) == 12  # all intra-group pairs, all 4 frames aligned
    assert all(a // 3 == b // 3 for a, b, _ in rows)
    assert all(n == 4 for _, _, n in rows)


def test_frame_floor_rejects_single_frame_coincidence(spark):
    """The min_matching_frames floor is real: raising it above the
    number of aligned frames empties the result."""
    vfp = MM.video_frame_phashes(MM.make_fake_video_corpus(spark, 2, 2), sample_frames=4)
    assert DD.frame_neardup_pairs(vfp, min_matching_frames=5).count() == 0


# --- t27: tokenizer fertility ----------------------------------------------


def tokenizer_fertility_sql(merges) -> str:
    """The t18 encode chain (bpe_apply_sql's CTEs, same separator
    framing and [\\s\\x1f]+ split) aggregated at source grain, joined
    with word/char counts under the SAME tokenization."""
    sep = E._BPE_SEP
    init = (
        "'" + sep + "' || array_to_string(list_transform("
        "range(1, length(word) + 1), "
        "i -> CASE WHEN i = length(word) THEN word[i] || '</w>' "
        "ELSE word[i] END), '" + sep + "') || '" + sep + "'"
    )
    enc = init
    for a, b in merges:
        pat = (sep + a + sep + b + sep).replace("'", "''")
        rep = (sep + a + b + sep).replace("'", "''")
        enc = f"replace({enc}, '{pat}', '{rep}')"
    return rf"""
WITH w AS (
  SELECT doc_id, source,
         regexp_split_to_array(lower(coalesce(text, '')), '[\s\x1f]+') AS ws
  FROM documents),
tok AS (
  SELECT doc_id, source, ws[i+1] AS word
  FROM w, unnest(range(len(ws))) t(i)
  WHERE length(ws[i+1]) > 0),
enc AS (
  SELECT doc_id, source, length(word) AS nc,
         len(list_filter(regexp_split_to_array({enc}, chr(31)),
                         x -> length(x) > 0)) AS nt
  FROM tok),
per_doc AS (
  SELECT doc_id, any_value(source) AS source,
         count(*) AS nw, sum(nt) AS ntok, sum(nc) AS nchars
  FROM enc GROUP BY doc_id),
alldocs AS (
  SELECT d.doc_id, d.source,
         coalesce(p.nw, 0) AS nw, coalesce(p.ntok, 0) AS ntok,
         coalesce(p.nchars, 0) AS nchars
  FROM documents d LEFT JOIN per_doc p USING (doc_id))
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(nw)::BIGINT AS n_words,
       sum(ntok)::BIGINT AS n_tokens,
       sum(nchars)::BIGINT AS n_word_chars,
       round(sum(ntok) / sum(nw), 6) AS tokens_per_word,
       round(sum(nchars) / sum(ntok), 6) AS chars_per_token
FROM alldocs GROUP BY source
"""


def test_oracle_draft_tokenizer_fertility(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import bpe

    docs = spark.table("documents")
    got = _rows(bpe.tokenizer_fertility(docs, E.BPE_MERGES))
    want = _sql_rows(ddb, tokenizer_fertility_sql(E.BPE_MERGES))
    assert got == want
    assert len(got) > 1  # multiple sources profiled


def test_tokenizer_fertility_sanity(spark):
    """Fertility must sit in the physically meaningful band: >= 1
    token per word (BPE never merges across words) and chars/token
    between 1 and the longest word."""
    from datacatalog_tag_engine_spark.pipeline import bpe

    rows = bpe.tokenizer_fertility(spark.table("documents"), E.BPE_MERGES).collect()
    for r in rows:
        assert r["tokens_per_word"] >= 1.0
        assert 1.0 <= r["chars_per_token"] <= 30.0


# --- t28: corpus divergence ------------------------------------------------


def corpus_divergence_sql() -> str:
    """Analytic replay of text.corpus_divergence: present-pair JSD
    terms quantized to nano-units before the integer sum; absent-word
    mass via the closed form ln(2)/2 * (1 - C_s/N) from exact counts."""
    return r"""
WITH w AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
                            x -> length(x) > 0)) AS word
  FROM documents),
sc AS (SELECT source, word, count(*) AS c_s FROM w GROUP BY source, word),
gc AS (SELECT word, sum(c_s) AS c_g FROM sc GROUP BY word),
tot AS (SELECT sum(c_s)::DOUBLE AS n FROM sc),
st AS (SELECT source, sum(c_s)::DOUBLE AS n_s FROM sc GROUP BY source),
terms AS (
  SELECT sc.source, sc.c_s, gc.c_g, tot.n,
         round(((sc.c_s / st.n_s)
                  * ln(2.0 * (sc.c_s / st.n_s) / (sc.c_s / st.n_s + gc.c_g / tot.n))
                + (gc.c_g / tot.n)
                  * ln(2.0 * (gc.c_g / tot.n) / (sc.c_s / st.n_s + gc.c_g / tot.n)))
               / 2.0 * 1e9)::BIGINT AS t9
  FROM sc JOIN gc USING (word) JOIN st USING (source), tot)
SELECT source,
       sum(c_s)::BIGINT AS n_tokens,
       count(*)::BIGINT AS n_types,
       round(sum(t9) / 1e9
             + (0.6931471805599453 / 2.0) * (max(n) - sum(c_g)) / max(n),
             6) AS js_divergence
FROM terms GROUP BY source
"""


def test_oracle_draft_corpus_divergence(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import text as TXT

    got = _rows(TXT.corpus_divergence(spark.table("documents")))
    want = _sql_rows(ddb, corpus_divergence_sql())
    assert got == want
    assert len(got) > 1


def test_corpus_divergence_bounds(spark):
    """JSD is bounded by ln(2) and non-negative; a source identical to
    the corpus scores ~0."""
    from datacatalog_tag_engine_spark.pipeline import text as TXT

    rows = TXT.corpus_divergence(spark.table("documents")).collect()
    for r in rows:
        assert -1e-6 <= r["js_divergence"] <= 0.6931472
    one = spark.table("documents").withColumn("source", F.lit("all"))
    solo = TXT.corpus_divergence(one).collect()
    assert len(solo) == 1 and abs(solo[0]["js_divergence"]) < 1e-6


# --- t29: vocab growth (Heaps) ---------------------------------------------


def vocab_growth_sql(n_buckets: int = 10) -> str:
    """Analytic replay of text.vocab_growth: id-range buckets (floor,
    not round — Spark's cast truncates), first-seen bucket per type,
    cumulative windows over bucket rows."""
    return rf"""
WITH maxid AS (SELECT max(doc_id) + 1 AS span FROM documents),
b AS (
  SELECT doc_id,
         least(floor(doc_id * {n_buckets} / span)::BIGINT, {n_buckets - 1}) AS bucket,
         text
  FROM documents, maxid),
w AS (
  SELECT bucket,
         unnest(list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
                            x -> length(x) > 0)) AS word
  FROM b),
tok AS (SELECT bucket, count(*) AS n_tokens FROM w GROUP BY bucket),
fs AS (SELECT word, min(bucket) AS bucket FROM w GROUP BY word),
nt AS (SELECT bucket, count(*) AS new_types FROM fs GROUP BY bucket),
nd AS (SELECT bucket, count(*) AS n_docs FROM b GROUP BY bucket)
SELECT nd.bucket,
       n_docs::BIGINT AS n_docs,
       coalesce(n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(new_types, 0)::BIGINT AS new_types,
       sum(coalesce(n_tokens, 0)) OVER (ORDER BY nd.bucket)::BIGINT AS cum_tokens,
       sum(coalesce(new_types, 0)) OVER (ORDER BY nd.bucket)::BIGINT AS cum_types
FROM nd LEFT JOIN tok USING (bucket) LEFT JOIN nt USING (bucket)
"""


def test_oracle_draft_vocab_growth(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import text as TXT

    got = _rows(TXT.vocab_growth(spark.table("documents")))
    want = _sql_rows(ddb, vocab_growth_sql())
    assert got == want
    assert len(got) > 1


def test_vocab_growth_monotone(spark):
    """Cumulative curves are non-decreasing and the last cum_types
    equals the corpus type count."""
    from datacatalog_tag_engine_spark.pipeline import text as TXT

    rows = sorted(
        TXT.vocab_growth(spark.table("documents")).collect(), key=lambda r: r["bucket"]
    )
    for a, b in zip(rows, rows[1:]):
        assert b["cum_tokens"] >= a["cum_tokens"]
        assert b["cum_types"] >= a["cum_types"]
    n_types = (
        spark.table("documents")
        .select(F.explode(F.filter(F.split(F.lower("text"), r"\s+"),
                                   lambda w: F.length(w) > 0)).alias("w"))
        .select("w").distinct().count()
    )
    assert rows[-1]["cum_types"] == n_types


# --- q66: length outliers (median/MAD) -------------------------------------


def length_outliers_sql(k: float = 3.0) -> str:
    return f"""
WITH med AS (SELECT source, median(n_chars) AS m FROM documents GROUP BY source),
dev AS (
  SELECT d.source, d.n_chars, abs(d.n_chars - med.m) AS adev, med.m
  FROM documents d JOIN med USING (source)),
mad AS (SELECT source, median(adev) AS md FROM dev GROUP BY source)
SELECT dev.source,
       count(*)::BIGINT AS n_docs,
       round(any_value(m), 2) AS median_val,
       round(any_value(md), 2) AS mad_val,
       count(*) FILTER (adev > {k} * md)::BIGINT AS n_outliers,
       round(count(*) FILTER (adev > {k} * md) / count(*), 4) AS outlier_frac
FROM dev JOIN mad USING (source) GROUP BY dev.source
"""


def test_oracle_draft_length_outliers(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import profiling as PRO

    got = _rows(PRO.length_outliers(spark.table("documents")))
    want = _sql_rows(ddb, length_outliers_sql())
    assert got == want
    assert len(got) > 1


def test_length_outliers_flags_planted(spark):
    """A planted extreme row is flagged; a constant-length group has
    MAD 0 and flags every deviant."""
    from datacatalog_tag_engine_spark.pipeline import profiling as PRO

    rows = [(i, "s", 100) for i in range(20)] + [(99, "s", 100000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = PRO.length_outliers(df).collect()
    assert len(out) == 1
    assert out[0]["n_outliers"] == 1 and out[0]["mad_val"] == 0.0


# --- q67: event funnel -----------------------------------------------------

FUNNEL_STEPS = ["view", "click", "purchase"]


def event_funnel_sql(steps=tuple(FUNNEL_STEPS)) -> str:
    ctes = []
    for i, s in enumerate(steps):
        if i == 0:
            ctes.append(
                f"s0 AS (SELECT user_id, min(ts) AS t FROM events "
                f"WHERE event_type = '{s}' GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"s{i} AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
                f"JOIN s{i-1} p USING (user_id) "
                f"WHERE e.event_type = '{s}' AND e.ts > p.t GROUP BY e.user_id)"
            )
    unions = " UNION ALL ".join(
        f"SELECT {i} AS step_index, '{s}' AS step, "
        f"(SELECT count(*) FROM s{i}) AS n_users"
        for i, s in enumerate(steps)
    )
    return f"""
WITH {', '.join(ctes)},
u AS ({unions})
SELECT step_index::INT AS step_index, step, n_users::BIGINT AS n_users,
       round(CASE WHEN max(CASE WHEN step_index = 0 THEN n_users END) OVER () > 0
                  THEN n_users / max(CASE WHEN step_index = 0 THEN n_users END) OVER ()
                  ELSE 0 END, 4) AS conversion
FROM u
"""


def test_oracle_draft_event_funnel(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import profiling as PRO

    got = _rows(PRO.event_funnel(spark.table("events"), FUNNEL_STEPS))
    want = _sql_rows(ddb, event_funnel_sql())
    assert got == want
    assert len(got) == 3


def test_event_funnel_ordering_matters(spark):
    """A user whose purchase precedes every click does NOT convert the
    final step."""
    from datacatalog_tag_engine_spark.pipeline import profiling as PRO
    import datetime as dt

    t = dt.datetime(2026, 1, 1)
    rows = [
        (1, t, 7, "view", 0.0, ""),
        (2, t + dt.timedelta(minutes=1), 7, "purchase", 0.0, ""),
        (3, t + dt.timedelta(minutes=2), 7, "click", 0.0, ""),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {r["step"]: r["n_users"] for r in PRO.event_funnel(df, FUNNEL_STEPS).collect()}
    assert out == {"view": 1, "click": 1, "purchase": 0}


# --- s13: IVF cell balance -------------------------------------------------


def cell_balance_sql(num_cells: int = 8) -> str:
    """Reuses the s03 assignment CTE chain, then the occupancy
    aggregate + window ratios."""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS cell, v AS cent_v FROM e ORDER BY vec_id LIMIT {num_cells}),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY round(list_cosine_similarity(e.v, c.cent_v), 6) DESC, c.cell) AS rn
    FROM e CROSS JOIN cents c) WHERE rn = 1),
counts AS (SELECT cell, count(*) AS n_vectors FROM assign GROUP BY cell)
SELECT cell,
       n_vectors::BIGINT AS n_vectors,
       round(n_vectors / sum(n_vectors) OVER (), 6) AS frac,
       round(n_vectors / (sum(n_vectors) OVER () / count(*) OVER ()), 4) AS balance_ratio
FROM counts
"""


def test_oracle_draft_cell_balance(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    got = _rows(SIM.cell_balance(spark.table("embeddings")))
    want = _sql_rows(ddb, cell_balance_sql())
    assert got == want
    assert len(got) > 1


def test_cell_balance_conserves_mass(spark):
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    emb = spark.table("embeddings")
    rows = SIM.cell_balance(emb).collect()
    assert sum(r["n_vectors"] for r in rows) == emb.count()
    assert abs(sum(r["frac"] for r in rows) - 1.0) < 1e-4


# --- d11: source dup profile -----------------------------------------------


def source_dup_profile_sql() -> str:
    return r"""
WITH fams AS (
  SELECT source,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
         count(*) AS n
  FROM documents GROUP BY source, fp)
SELECT source,
       sum(n)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_distinct,
       round(1.0 - count(*) / sum(n), 4) AS dup_frac,
       max(n)::BIGINT AS max_clone
FROM fams GROUP BY source
"""


def test_oracle_draft_source_dup_profile(spark, ddb):
    got = _rows(DD.source_dup_profile(spark.table("documents")))
    want = _sql_rows(ddb, source_dup_profile_sql())
    assert got == want
    assert len(got) > 1


def test_source_dup_profile_normalization(spark):
    """Whitespace-variant copies count as the same family (the
    fingerprints rule), so dup_frac sees them."""
    rows = [(1, "a", "hello  world"), (2, "a", "Hello World"), (3, "a", "other")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = DD.source_dup_profile(df).collect()
    assert out[0]["n_docs"] == 3 and out[0]["n_distinct"] == 2
    assert out[0]["max_clone"] == 2


# --- q68: leakage-guarded holdout split ------------------------------------


def holdout_split_sql(eval_bp: int = 1000, buckets: int = 10000) -> str:
    """hash_bucket replayed as in the q58 oracle; fingerprint collision
    quarantine via IN over the distinct eval fingerprints."""
    return rf"""
WITH t AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % {buckets}) < {eval_bp} AS is_eval
  FROM documents),
ev AS (SELECT DISTINCT fp FROM t WHERE is_eval)
SELECT doc_id,
       CASE WHEN is_eval THEN 'eval'
            WHEN fp IN (SELECT fp FROM ev) THEN 'quarantined'
            ELSE 'train' END AS split
FROM t
"""


def test_oracle_draft_holdout_split(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import sampling as SMP

    got = _rows(SMP.holdout_split(spark.table("documents")))
    want = _sql_rows(ddb, holdout_split_sql())
    assert got == want
    assert len(got) == spark.table("documents").count()


def test_holdout_split_quarantines_clones(spark):
    """A train-side exact clone of an eval doc is quarantined; the
    eval doc itself stays eval."""
    from datacatalog_tag_engine_spark.pipeline import sampling as SMP

    docs = spark.table("documents")
    out = SMP.holdout_split(docs)
    splits = {r["split"] for r in out.collect()}
    assert "eval" in splits and "train" in splits
    # synthetic clone pair straddling the boundary: find one eval doc,
    # clone its text onto a fresh high id that buckets to train
    ev_id = out.filter("split = 'eval'").agg(F.min("doc_id")).first()[0]
    ev_text = docs.filter(F.col("doc_id") == ev_id).first()["text"]
    clone_id = None
    for cand in range(10**6, 10**6 + 200):
        row = spark.createDataFrame([(cand,)], "doc_id long")
        from datacatalog_tag_engine_spark.pipeline.sampling import hash_bucket
        b = row.select(hash_bucket(F.col("doc_id")).alias("b")).first()["b"]
        if b >= 1000:
            clone_id = cand
            break
    extra = spark.createDataFrame(
        [(clone_id, ev_text, "xx", "srcX", len(ev_text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out2 = SMP.holdout_split(docs.unionByName(extra))
    assert out2.filter(F.col("doc_id") == clone_id).first()["split"] == "quarantined"


# --- d12: n-gram containment (doc-in-doc) -----------------------------------


def containment_sql(threshold: float = 0.8) -> str:
    """Same inverted-index derivation as the d04 oracle, with the
    asymmetric denominator: inter / least(|A|, |B|)."""
    return f"""
WITH {E._shingle_cte()},
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
SELECT doc_a, doc_b, round(i / least(sa.n, sb.n), 4) AS containment
FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(i / least(sa.n, sb.n), 4) >= {threshold}
"""


def test_oracle_draft_containment(spark, ddb):
    got = _rows(
        DD.containment_pairs(
            DD.shingle_table(spark.table("documents")), candidates=None, threshold=0.8
        )
    )
    want = _sql_rows(ddb, containment_sql(0.8))
    assert got == want
    assert len(got) > 0  # the corpus has exact clones -> containment 1.0


def test_containment_catches_doc_in_doc(spark):
    """A small doc pasted verbatim into a much larger one: containment
    1.0, Jaccard far below any useful threshold — the pair d12 exists
    to catch."""
    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"filler{i} word{i} pad{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, small), (2, big)], "doc_id long, text string"
    )
    sh = DD.shingle_table(df)
    cont = DD.containment_pairs(sh, threshold=0.9).collect()
    assert len(cont) == 1 and cont[0]["containment"] == 1.0
    jac = DD.jaccard_pairs(sh, threshold=0.5).collect()
    assert jac == []  # symmetric Jaccard misses the pair


def test_containment_max_df_drops_join_side_only(spark):
    """max_df prunes stop-shingles from the join, not from sizes: a
    pair whose only overlap is the stop-shingle disappears, while a
    genuine subset pair keeps its exact score."""
    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"filler{i} word{i} pad{i}" for i in range(40))
    stop = "the common header"
    rows = [(1, small), (2, big)] + [(10 + i, stop + f" tail{i} x{i} y{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = DD.shingle_table(df)
    loose = DD.containment_pairs(sh, threshold=0.15)
    assert loose.filter("doc_a >= 10").count() > 0  # header-only pairs leak through
    pruned = DD.containment_pairs(sh, threshold=0.15, max_df=3).collect()
    assert all(r["doc_a"] < 10 for r in pruned)  # stop-shingle pairs gone
    keep = [r for r in pruned if r["doc_a"] == 1 and r["doc_b"] == 2]
    assert len(keep) == 1 and keep[0]["containment"] == 1.0  # true pair untouched


# --- d13: cross-source clone overlap matrix ---------------------------------


def cross_source_overlap_sql() -> str:
    """Shingle-grain (the queries() default): distinct word 3-shingles
    per source via the d04 shingle rule; Spark joins on xxhash64 of
    the shingle, the oracle on the string — counts equal barring a
    64-bit collision (the d04-certified substitution)."""
    return r"""
WITH toks AS (SELECT source, regexp_split_to_array(text, '\s+') w FROM documents),
sfp AS (
  SELECT DISTINCT source AS src,
         unnest(CASE WHEN len(w) >= 3
                THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
                ELSE [array_to_string(w, ' ')] END) AS fp
  FROM toks),
sizes AS (SELECT src, count(*) AS n FROM sfp GROUP BY src),
shared AS (
  SELECT a.src AS source_a, b.src AS source_b, count(*) AS shared
  FROM sfp a JOIN sfp b ON a.fp = b.fp AND a.src < b.src
  GROUP BY 1, 2)
SELECT source_a, source_b, shared,
       round(shared / sa.n, 4) AS frac_a,
       round(shared / sb.n, 4) AS frac_b
FROM shared JOIN sizes sa ON sa.src = source_a JOIN sizes sb ON sb.src = source_b
"""


def test_oracle_draft_cross_source_overlap(spark, ddb):
    got = _rows(DD.cross_source_overlap(spark.table("documents")))
    want = _sql_rows(ddb, cross_source_overlap_sql())
    assert got == want
    assert len(got) > 0  # phrase-level overlap exists at every sf


def test_cross_source_overlap_fingerprint_unit(spark):
    """unit='fingerprint' (exact clone families across sources): A and
    B share one whitespace-variant clone family, C is disjoint ->
    exactly one pair row with the right fractions."""
    rows = [
        (1, "A", "shared doc body"),
        (2, "A", "a-only one"),
        (3, "B", "Shared  Doc Body"),
        (4, "B", "b-only one"),
        (5, "B", "b-only two"),
        (6, "C", "c-only one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = DD.cross_source_overlap(df, unit="fingerprint").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"], r["shared"]) == ("A", "B", 1)
    assert r["frac_a"] == 0.5 and r["frac_b"] == round(1 / 3, 4)


# --- d14: containment dedup (exact-first production order) ------------------


def containment_dedup_sql(threshold: float = 0.8) -> str:
    """Exact-canonical selection (the d01 raw-md5 rule), then the d12
    containment derivation restricted to canonicals, then the
    single-pass dominance rule: loser = smaller shingle set, tie ->
    doc_b (the higher id, since pairs are emitted doc_a < doc_b)."""
    return f"""
WITH fpt AS (SELECT doc_id, md5(text) AS fp FROM documents),
can AS (
  SELECT doc_id, row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1 AS is_canon
  FROM fpt),
cd AS (
  SELECT d.doc_id, d.text FROM documents d
  JOIN can ON can.doc_id = d.doc_id AND can.is_canon),
{E._shingle_cte("cd")},
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT doc_a, doc_b, sa.n AS na, sb.n AS nb
  FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(i / least(sa.n, sb.n), 4) >= {threshold}),
losers AS (
  SELECT DISTINCT CASE WHEN na < nb THEN doc_a ELSE doc_b END AS doc_id FROM pairs)
SELECT c.doc_id, c.is_canon AND l.doc_id IS NULL AS keep
FROM can c LEFT JOIN losers l ON l.doc_id = c.doc_id
"""


def test_oracle_draft_containment_dedup(spark, ddb):
    got = _rows(DD.containment_dedup(spark.table("documents")))
    want = _sql_rows(ddb, containment_dedup_sql())
    assert got == want
    docs = spark.table("documents")
    assert len(got) == docs.count()  # a verdict for every input doc
    assert sum(1 for _, k in got if k) < docs.count()  # and it drops something


def test_containment_dedup_semantics(spark):
    """Exact clone drops as non-canonical; the doc contained in a
    larger one drops as dominated; the large doc and the unrelated doc
    keep. Tie pair (same text reordered, same shingle count) drops the
    higher id."""
    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"filler{i} word{i} pad{i}" for i in range(40))
    rows = [
        (1, small),
        (2, big),
        (3, small),            # exact clone of 1 -> non-canonical
        (4, "totally different content here okay"),
        # tie pair: doc 6 is doc 5 with a doubled space — different md5
        # (both survive exact dedup) but identical shingle SET (split is
        # on whitespace runs), so containment = 1.0 with equal sizes;
        # the tie rule drops the higher id (doc_b of the ascending pair)
        (5, "omega psi chi phi upsilon tau"),
        (6, "omega psi chi phi upsilon  tau"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["keep"] for r in DD.containment_dedup(df).collect()}
    assert out == {1: False, 2: True, 3: False, 4: True, 5: True, 6: False}


# --- s14: IVF-PQ + exact re-rank --------------------------------------------


def ivfpq_rerank_sql(nprobe: int = 2, shortlist: int = 20, k: int = 5) -> str:
    """The s10 chain (kept textually in sync with E.ivfpq_sql — at the
    r9 rotation parameterize that generator on (nprobe, k) and build
    this on top of it as the single copy) with QUALIFY rank <=
    shortlist, then exact-cosine refinement on the shortlisted ids
    under the s01 determinism contract (round 4, ties to neighbor
    asc)."""
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
  GROUP BY dt.query_id, codes.vec_id),
short AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adist_micro, neighbor_id) AS srank
  FROM scored WHERE neighbor_id <> query_id
  QUALIFY srank <= {shortlist}),
rer AS (
  SELECT s.query_id, s.neighbor_id,
         round(list_cosine_similarity(qe.v, ne.v), 4) AS cosine
  FROM short s
  JOIN e ne ON ne.vec_id = s.neighbor_id
  JOIN e qe ON qe.vec_id = s.query_id)
SELECT query_id, neighbor_id, cosine,
       cast(row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
FROM rer
QUALIFY rank <= {k}
"""


def _s14(spark):
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    emb = spark.table("embeddings")
    return SIM.ivfpq_topk_rerank(
        emb, emb.filter(F.col("vec_id") < 5), k=5, shortlist=20, num_cells=8, nprobe=2
    )


def test_oracle_draft_ivfpq_rerank(spark, ddb):
    got = _rows(_s14(spark))
    want = _sql_rows(ddb, ivfpq_rerank_sql(nprobe=2, shortlist=20, k=5))
    assert got == want
    assert len(got) > 0


def test_rerank_recall_at_least_adc(spark):
    """Exact refinement can only improve recall vs truth within the
    same shortlist: recall@5(rerank) >= recall@5(plain ADC ranking)
    against brute force, on the real sf0.001 corpus."""
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(emb, qs, k=5).collect()
    }
    adc = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ivfpq_topk(emb, qs, k=5, num_cells=8, nprobe=2).collect()
    }
    rer = {(r["query_id"], r["neighbor_id"]) for r in _s14(spark).collect()}
    assert len(rer & truth) >= len(adc & truth)
    assert len(rer) > 0


# --- q69: shard-balance profile ----------------------------------------------


def shard_balance_sql(num_shards: int = 16) -> str:
    """The q58/q68 md5 bucket rule aggregated at shard grain, empty
    shards kept via a generated shard axis; skew normalized against
    the corpus total."""
    return f"""
WITH s AS (
  SELECT (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % {num_shards}) AS shard,
         n_chars
  FROM documents),
per AS (SELECT shard, count(*) AS n_docs, sum(n_chars)::BIGINT AS n_tokens
        FROM s GROUP BY shard),
all_shards AS (SELECT unnest(range({num_shards}))::INT AS shard)
SELECT a.shard,
       coalesce(n_docs, 0)::BIGINT AS n_docs,
       coalesce(n_tokens, 0)::BIGINT AS n_tokens,
       round(coalesce(n_docs, 0) * {num_shards} / (SELECT count(*) FROM documents), 4) AS doc_skew
FROM all_shards a LEFT JOIN per ON per.shard = a.shard
"""


def test_oracle_draft_shard_balance(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.export import shard_balance

    got = _rows(shard_balance(spark.table("documents"), 16, token_col="n_chars"))
    want = _sql_rows(ddb, shard_balance_sql(16))
    assert got == want
    assert len(got) == 16


def test_shard_balance_semantics(spark):
    """Conservation + the empty-shard row + uniform-ish skew on the
    real corpus; a single-doc corpus puts skew num_shards on its one
    shard and 0 elsewhere."""
    from datacatalog_tag_engine_spark.pipeline.export import shard_balance

    docs = spark.table("documents")
    out = shard_balance(docs, 16).collect()
    assert sum(r["n_docs"] for r in out) == docs.count()
    one = spark.createDataFrame([(7, "x")], "doc_id long, text string")
    rows = shard_balance(one, 4).collect()
    assert len(rows) == 4 and sum(r["n_docs"] for r in rows) == 1
    hot = [r for r in rows if r["n_docs"] == 1][0]
    assert hot["doc_skew"] == 4.0
    assert all(r["doc_skew"] == 0.0 for r in rows if r["n_docs"] == 0)


# --- q70: cohort retention ---------------------------------------------------


def cohort_retention_sql() -> str:
    return """
WITH d AS (SELECT user_id, ts::DATE AS d FROM events),
c AS (SELECT user_id, min(d) AS cohort_day FROM d GROUP BY user_id),
x AS (
  SELECT DISTINCT c.cohort_day, date_diff('day', c.cohort_day, d.d) AS day_offset, d.user_id
  FROM d JOIN c USING (user_id))
SELECT cohort_day, day_offset::INT AS day_offset, count(*)::BIGINT AS n_users
FROM x GROUP BY 1, 2
"""


def test_oracle_draft_cohort_retention(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.profiling import cohort_retention

    got = _rows(cohort_retention(spark.table("events")))
    want = _sql_rows(ddb, cohort_retention_sql())
    assert got == want
    assert len(got) > 1


def test_cohort_retention_semantics(spark):
    """Two users, staggered starts: offsets anchor to each user's own
    first day; a user active twice in one day counts once."""
    from datacatalog_tag_engine_spark.pipeline.profiling import cohort_retention

    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 11:00:00"),  # same-day dup
        (1, "2024-01-03 09:00:00"),
        (2, "2024-01-02 08:00:00"), (2, "2024-01-03 08:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.to_timestamp("ts").alias("ts")
    )
    got = {
        (str(r["cohort_day"]), r["day_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,  # user 1 day 0 (once, despite two events)
        ("2024-01-01", 2): 1,  # user 1 returns on offset 2
        ("2024-01-02", 0): 1,  # user 2's own cohort starts Jan 2
        ("2024-01-02", 1): 1,  # user 2 returns next day
    }


# --- s15: persisted-index rerank (value-identity with s14) -------------------


def test_oracle_draft_ivfpq_rerank_from_index(spark, ddb, tmp_path):
    """The persisted form replays s14's oracle EXACTLY (the s10/s11
    pattern: index round-trip must not change a single value), so its
    r9 wiring reuses ivfpq_rerank_sql verbatim."""
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    emb = spark.table("embeddings")
    path = str(tmp_path / "ivfpq_idx")
    SIM.build_ivfpq_index(emb, path, num_cells=8)
    got = _rows(
        SIM.ivfpq_topk_rerank_from_index(
            spark, path, emb, emb.filter(F.col("vec_id") < 5),
            k=5, shortlist=20, nprobe=2,
        )
    )
    want = _sql_rows(ddb, ivfpq_rerank_sql(nprobe=2, shortlist=20, k=5))
    assert got == want
    assert got == _rows(_s14(spark))  # in-memory/persisted value identity


def test_containment_dominates_jaccard_everywhere(spark):
    """Metric invariant: inter/min(|A|,|B|) >= inter/union on EVERY
    pair (min <= union always), and both metrics see the same pair
    set at threshold 0 — a divergence would mean the two operators
    disagree on the inverted index itself."""
    pool = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    rows = [
        (i, " ".join(pool[(i * 3 + j) % len(pool)] for j in range(4 + i % 5)))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = DD.shingle_table(df)
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in DD.jaccard_pairs(sh, threshold=0.0).collect()}
    con = {(r["doc_a"], r["doc_b"]): r["containment"]
           for r in DD.containment_pairs(sh, threshold=0.0).collect()}
    assert set(jac) == set(con) and len(jac) > 0
    assert all(con[p] >= jac[p] for p in jac)
