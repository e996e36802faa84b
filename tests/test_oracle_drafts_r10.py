"""Round-10 rotation prep: DuckDB oracle drafts for operators built in
round 9 but NOT wired into the frozen inventory (the freeze policy:
new queries enter only at round start, with a proven draft). This
module's generators are the work-list — at the r10 rotation, move each
SQL generator into __spark_entry__ verbatim (entry becomes the single
copy; this file imports it back) and wire the queries()/oracle_sql()
pairs:

- s16_range_search — radius search (FAISS range_search): every
  neighbor with cosine >= threshold through the s04 IVF pruning
  (similarity.range_search); no per-query sort at all.
- s17_cell_inertia — per-cell quantization-error profile on the
  micro-unit lattice (similarity.cell_inertia); with cell_balance and
  s18 it completes the quantizer-health trio.
- s18_pq_code_histogram — PQ code-usage balance / dead-code detector
  (similarity.pq_code_histogram); reuses the s07 encode chain.
- t30_char_coverage — per-source out-of-alphabet character profile
  (text.char_coverage), the pre-tokenizer QA number.
- t31_ngram_novelty — per-source exclusive-shingle fraction
  (dedup.ngram_novelty), the complement of d13's overlap matrix.
- q72_gate_mixture_drift — per-source corpus share before/after the
  Gopher gate (text.gate_mixture_drift) under the q59-stage relaxed
  rules; the mixture-QA number for q54/q63 weights.
- q73_cluster_size_profile — near-dup cluster-size histogram
  (dedup.cluster_size_profile); derived from the q34 oracle by final-
  SELECT surgery, so there is one copy of the cluster chain.
- q74_percentile_tolerance — sketched percentiles certified the
  q60-HLL way (profiling.percentile_tolerance_profile): exact
  per-source p50/p90/p99 + a within-tolerance flag for
  percentile_approx.
- q75_session_funnel — the conversion funnel scoped within q32's
  sessions (profiling.session_funnel): a session converts step i only
  strictly after its own step-(i-1) time.
- m05_manifest_stats — per-kind media-manifest rollup
  (multimodal.manifest_stats); derived from the m01 oracle by
  wrapping it as a subquery — one copy of the feature replay.
- s19_embedding_stats — embedding-table health profile on the
  micro-unit norm lattice (similarity.embedding_stats).
- s20_cell_balance_from_index — the s13 occupancy profile read off
  the persisted IVF index's partition column only
  (similarity.cell_balance_from_index, shared _occupancy_profile);
  oracle = E.cell_balance_sql verbatim (the s10/s11 value-identity
  pattern) and the scan is plan-asserted to read struct<> (no data
  pages).
- s21_ivf_append — incremental index growth, the FAISS add() analog
  (similarity.append_to_ivf_index): delta-only assignment under the
  frozen stored quantizer, file-additive append into the cell
  partitions (resident files byte-untouched, asserted); search on
  the grown index is row-identical to a fresh full rebuild, so the
  wiring reuses E.oracle_sql()['s04_ann_ivf_nprobe'] verbatim.
- q76_event_rate_anomaly — hourly event-rate median/MAD anomaly
  profile per type (profiling.event_rate_anomaly), MAD floored at 1.
- q77_lang_source_profile — lang x source contingency with
  independence ratios (profiling.lang_source_profile).
- t32_top_ngrams — top-k word n-grams per source with deterministic
  tie-break, full grams only (text.top_ngrams_per_group) — the
  boilerplate/stop-shingle inspection surface.
- q78_cohort_via_state — the streaming cohort decomposition's batch
  replay (streaming.usage.cohort_user_days + cohort_retention_finish)
  reproducing the certified q70 operator exactly; oracle =
  E.cohort_retention_sql() verbatim — a driver hash on the
  decomposition the stream==batch pytest certifies.
- q79_dirty_shards — the incremental-export planner
  (export.dirty_shards): which shards need rewriting between two
  corpus versions; the md5 bucket's no-resharding-cascade property
  pinned (one added doc dirties exactly its own shard).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from datacatalog_tag_engine_spark.pipeline import dedup as DD
from datacatalog_tag_engine_spark.pipeline import multimodal as MM
from datacatalog_tag_engine_spark.pipeline import profiling as PRO
from datacatalog_tag_engine_spark.pipeline import similarity as SIM
from datacatalog_tag_engine_spark.pipeline import text as TXT

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


# --- s16: IVF range search ---------------------------------------------------


def range_search_sql(threshold: float = 0.2, nprobe: int = 2) -> str:
    """The s04 probe chain with a threshold filter instead of the
    top-k QUALIFY — no ranking at all."""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS cell, v AS cent_v FROM e ORDER BY vec_id LIMIT 8),
ranked AS (
  SELECT e.vec_id, e.v, c.cell,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round(list_cosine_similarity(e.v, c.cent_v), 6) DESC, c.cell) AS rn
  FROM e CROSS JOIN cents c),
assign AS (SELECT vec_id, v, cell FROM ranked WHERE rn = 1),
qprobe AS (SELECT vec_id, v, cell FROM ranked WHERE rn <= {nprobe} AND vec_id < 5),
scored AS (
  SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.v, a.v), 4) AS cosine
  FROM qprobe q JOIN assign a ON q.cell = a.cell AND q.vec_id <> a.vec_id)
SELECT query_id, neighbor_id, cosine FROM scored WHERE cosine >= {threshold}
"""


def _s16(spark):
    emb = spark.table("embeddings")
    return SIM.range_search(
        emb, emb.filter(F.col("vec_id") < 5), threshold=0.2, num_cells=8, nprobe=2
    )


def test_oracle_draft_range_search(spark, ddb):
    got = _rows(_s16(spark))
    want = _sql_rows(ddb, range_search_sql(0.2, 2))
    assert got == want
    assert len(got) > 0


def test_range_search_subsumes_ivf_topk(spark):
    """Every ivf_topk hit above the threshold is in the range result
    (same pruning, same scores), and range returns MORE than top-k
    where neighborhoods are dense."""
    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    topk = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ivf_topk(emb, qs, k=5, num_cells=8, nprobe=2)
        .filter(F.col("cosine") >= 0.2)
        .collect()
    }
    rng = {(r["query_id"], r["neighbor_id"]) for r in _s16(spark).collect()}
    assert topk <= rng
    assert len(rng) > len(topk)


# --- s17: per-cell inertia ---------------------------------------------------


def cell_inertia_sql(num_cells: int = 8) -> str:
    """s03 assignment + exact integer micro-lattice squared-L2 to the
    (quantized) centroid, cell-grain sums."""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS cell, v AS cent_v FROM e ORDER BY vec_id LIMIT {num_cells}),
qc AS (SELECT cell, list_transform(cent_v, x -> round(x * 1e6)::BIGINT) AS qc FROM cents),
assign AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY round(list_cosine_similarity(e.v, c.cent_v), 6) DESC, c.cell) AS rn
    FROM e CROSS JOIN cents c) WHERE rn = 1),
qv AS (SELECT cell, list_transform(v, x -> round(x * 1e6)::BIGINT) AS qsv FROM assign),
d AS (
  SELECT qv.cell,
         list_sum(list_transform(range(1, len(qsv) + 1),
                  i -> (qsv[i] - qc.qc[i]) * (qsv[i] - qc.qc[i]))) AS d
  FROM qv JOIN qc USING (cell))
SELECT cell,
       count(*)::BIGINT AS n_vectors,
       sum(d)::BIGINT AS inertia_micro,
       round(sum(d) / count(*), 2) AS mean_inertia_micro
FROM d GROUP BY cell
"""


def test_oracle_draft_cell_inertia(spark, ddb):
    got = _rows(SIM.cell_inertia(spark.table("embeddings")))
    want = _sql_rows(ddb, cell_inertia_sql())
    assert got == want
    assert len(got) > 1


def test_cell_inertia_conserves_and_trained_is_lower(spark):
    """Counts conserve the corpus, and kmeans-trained centroids give
    strictly-no-worse total inertia than the seeding (Lloyd minimizes
    exactly this integer objective)."""
    emb = spark.table("embeddings")
    seeded = SIM.cell_inertia(emb).collect()
    assert sum(r["n_vectors"] for r in seeded) == emb.count()
    cents = SIM.kmeans_centroids_exact(emb, num_cells=8).select("cell", "cent_v")
    trained = SIM.cell_inertia(emb, cents=cents).collect()
    assert sum(r["inertia_micro"] for r in trained) <= sum(
        r["inertia_micro"] for r in seeded
    )


# --- s18: PQ code histogram --------------------------------------------------


def pq_code_histogram_sql(num_subspaces: int = 4, num_codes: int = 16) -> str:
    """The s07 encode CTEs + a generated (m, code) axis so dead codes
    keep their row; per-subspace balance window."""
    sub = 64 // num_subspaces
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v
  FROM e ORDER BY vec_id LIMIT {num_codes}),
ms AS (SELECT unnest(range({num_subspaces})) AS m),
csub AS (SELECT c, m, v[m*{sub}+1 : m*{sub}+{sub}] AS cv FROM cent, ms),
esub AS (SELECT vec_id, m, v[m*{sub}+1 : m*{sub}+{sub}] AS sv FROM e, ms),
dists AS (
  SELECT vec_id, m, c,
         list_sum(list_transform(range(1, {sub + 1}),
                  i -> cast(round((sv[i]-cv[i])^2 * 1e6) AS BIGINT))) AS d
  FROM esub JOIN csub USING (m)),
codes AS (
  SELECT vec_id, m, cast(min(d*{num_codes} + c) % {num_codes} AS INT) AS code
  FROM dists GROUP BY vec_id, m),
counts AS (SELECT m, code, count(*) AS n FROM codes GROUP BY m, code),
axis AS (SELECT m::INT AS m, code::INT AS code
         FROM range({num_subspaces}) tm(m), range({num_codes}) tc(code))
SELECT a.m, a.code,
       coalesce(n, 0)::BIGINT AS n_vectors,
       round(coalesce(n, 0) / (sum(coalesce(n, 0)) OVER (PARTITION BY a.m) / {num_codes}), 4)
         AS balance_ratio
FROM axis a LEFT JOIN counts c ON c.m = a.m AND c.code = a.code
"""


def test_oracle_draft_pq_code_histogram(spark, ddb):
    got = _rows(SIM.pq_code_histogram(spark.table("embeddings")))
    want = _sql_rows(ddb, pq_code_histogram_sql())
    assert got == want
    assert len(got) == 64


def test_pq_code_histogram_conserves_per_subspace(spark):
    """Every subspace's counts sum to the corpus size and the balance
    ratios to num_codes."""
    emb = spark.table("embeddings")
    rows = SIM.pq_code_histogram(emb).collect()
    n = emb.count()
    for m in range(4):
        sub = [r for r in rows if r["m"] == m]
        assert len(sub) == 16
        assert sum(r["n_vectors"] for r in sub) == n


# --- t30: character coverage -------------------------------------------------


def char_coverage_sql() -> str:
    return r"""
WITH c AS (
  SELECT source,
         length(coalesce(text, '')) AS nc,
         length(regexp_replace(lower(coalesce(text, '')),
                               '[a-z0-9\s.,;:!?''"()\-]', '', 'g')) AS no
  FROM documents)
SELECT source,
       sum(nc)::BIGINT AS n_chars,
       sum(no)::BIGINT AS n_outside,
       round(1.0 - sum(no) / greatest(sum(nc), 1), 6) AS coverage
FROM c GROUP BY source
"""


def test_oracle_draft_char_coverage(spark, ddb):
    got = _rows(TXT.char_coverage(spark.table("documents")))
    want = _sql_rows(ddb, char_coverage_sql())
    assert got == want
    assert len(got) > 1


def test_char_coverage_flags_outside_alphabet(spark):
    """Planted non-ASCII content is counted; pure-alphabet text scores
    coverage 1.0."""
    rows = [(1, "s", "hello world ok"), (2, "s", "héllo wörld 東京")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = TXT.char_coverage(df).collect()[0]
    assert out["n_outside"] == 4  # é, ö, 東, 京 and nothing else
    clean = TXT.char_coverage(df.filter("doc_id = 1")).collect()[0]
    assert clean["coverage"] == 1.0 and clean["n_outside"] == 0


# --- t31: n-gram novelty -----------------------------------------------------


def ngram_novelty_sql() -> str:
    """The d13 sfp derivation + shingle->n_sources spread rollup."""
    return r"""
WITH toks AS (SELECT source, regexp_split_to_array(text, '\s+') w FROM documents),
sfp AS (
  SELECT DISTINCT source AS src,
         unnest(CASE WHEN len(w) >= 3
                THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
                ELSE [array_to_string(w, ' ')] END) AS fp
  FROM toks),
spread AS (SELECT fp, count(*) AS ns FROM sfp GROUP BY fp)
SELECT src AS source,
       count(*)::BIGINT AS n_shingles,
       sum((ns = 1)::INT)::BIGINT AS n_exclusive,
       round(sum((ns = 1)::INT) / count(*), 4) AS novelty_frac
FROM sfp JOIN spread USING (fp) GROUP BY src
"""


def test_oracle_draft_ngram_novelty(spark, ddb):
    got = _rows(DD.ngram_novelty(spark.table("documents")))
    want = _sql_rows(ddb, ngram_novelty_sql())
    assert got == want
    assert len(got) > 1


def test_ngram_novelty_complements_overlap(spark):
    """A source whose every shingle is shared scores 0; a fully
    disjoint source scores 1."""
    rows = [
        (1, "A", "alpha beta gamma delta"),
        (2, "B", "alpha beta gamma delta"),
        (3, "C", "omega psi chi phi"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r["novelty_frac"] for r in DD.ngram_novelty(df).collect()}
    assert out == {"A": 0.0, "B": 0.0, "C": 1.0}


# --- q72: gate mixture drift -------------------------------------------------


def gate_mixture_drift_sql() -> str:
    """The q59-stage relaxed Gopher rules (word count 20..100000, the
    five shape rules, repetition/stopword rules off — the same gf/keep
    derivation as the q59 oracle prefix) + before/after share rollup."""
    return r"""
WITH base AS (
  SELECT doc_id, source, coalesce(text, '') AS text,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                     x -> length(x) > 0) AS w,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\n'),
                     l -> length(trim(l)) > 0) AS lines
  FROM documents),
gf AS (
  SELECT doc_id, source,
         len(w) AS nw,
         list_sum(list_transform(w, x -> length(x))) / len(w) AS mwl,
         len(regexp_extract_all(text, '#|\.\.\.|…')) / len(w) AS sym,
         len(list_filter(lines, l -> regexp_matches(l, '^\s*(\*|-|•)\s')))
           / len(lines) AS bullet,
         len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
           / len(lines) AS ell,
         len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) / len(w) AS alpha
  FROM base WHERE len(w) > 0 AND len(lines) > 0),
kept AS (
  SELECT doc_id, source FROM gf
  WHERE nw BETWEEN 20 AND 100000
    AND mwl BETWEEN 3.0 AND 10.0
    AND sym <= 0.1 AND bullet <= 0.9 AND ell <= 0.3 AND alpha >= 0.8),
b AS (SELECT source, count(*) AS nb FROM documents GROUP BY source),
a AS (SELECT source, count(*) AS na FROM kept GROUP BY source),
j AS (
  SELECT b.source, nb, coalesce(na, 0) AS na
  FROM b LEFT JOIN a USING (source))
SELECT source,
       nb::BIGINT AS n_before,
       na::BIGINT AS n_after,
       round(nb / sum(nb) OVER (), 6) AS share_before,
       round(na / greatest(sum(na) OVER (), 1), 6) AS share_after,
       round(na / greatest(sum(na) OVER (), 1) - nb / sum(nb) OVER (), 6) AS share_drift
FROM j
"""


def _q72(spark):
    return TXT.gate_mixture_drift(
        spark.table("documents"),
        min_words=20,
        min_stopword_hits=0,
        max_dup_word_frac=1.0,
        max_top_bigram_frac=1.0,
    )


def test_oracle_draft_gate_mixture_drift(spark, ddb):
    got = _rows(_q72(spark))
    want = _sql_rows(ddb, gate_mixture_drift_sql())
    assert got == want
    assert len(got) > 1


def test_gate_mixture_drift_shares_sum_to_one(spark):
    rows = _q72(spark).collect()
    assert abs(sum(r["share_before"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["share_after"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["share_drift"] for r in rows)) < 1e-4
    assert any(r["n_after"] < r["n_before"] for r in rows)  # the gate bites


# --- q73: cluster-size profile -----------------------------------------------


def cluster_size_profile_sql() -> str:
    """Derived from the wired q34 oracle by replacing its final SELECT
    with the histogram rollup — ONE copy of the cluster chain."""
    q34 = E.oracle_sql()["q34_dedup_clusters"]
    tail = "SELECT doc_id, cluster_id FROM clusters"
    assert q34.count(tail) == 1
    return q34.replace(
        tail,
        """, csz AS (SELECT cluster_id, count(*) AS cluster_size FROM clusters GROUP BY cluster_id)
SELECT cluster_size::BIGINT AS cluster_size,
       count(*)::BIGINT AS n_clusters,
       (count(*) * cluster_size)::BIGINT AS n_docs
FROM csz GROUP BY cluster_size""",
    )


def _q73(spark):
    docs = spark.table("documents")
    return DD.cluster_size_profile(docs, DD.minhash_dedup(docs))


def test_oracle_draft_cluster_size_profile(spark, ddb):
    got = _rows(_q73(spark))
    want = _sql_rows(ddb, cluster_size_profile_sql())
    assert got == want
    assert len(got) > 1


def test_cluster_size_profile_conserves_corpus(spark):
    """Histogram mass equals the corpus (singletons included) and the
    cluster count matches the distinct labels q34 certifies."""
    docs = spark.table("documents")
    rows = _q73(spark).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    labels = DD.neardup_clusters(docs, DD.minhash_dedup(docs))
    assert sum(r["n_clusters"] for r in rows) == labels.select("cluster_id").distinct().count()


# --- q74: percentile sketch tolerance ----------------------------------------


def percentile_tolerance_sql() -> str:
    """Exact interpolated percentiles (DuckDB quantile_cont == Spark
    percentile); the tolerance flag is the q60 pattern — TRUE on the
    oracle side, computed against percentile_approx on the Spark
    side."""
    return """
SELECT source,
       round(quantile_cont(n_chars, 0.5), 2) AS p50_exact,
       round(quantile_cont(n_chars, 0.9), 2) AS p90_exact,
       round(quantile_cont(n_chars, 0.99), 2) AS p99_exact,
       TRUE AS sketch_within_tol
FROM documents GROUP BY source
"""


def test_oracle_draft_percentile_tolerance(spark, ddb):
    got = _rows(PRO.percentile_tolerance_profile(spark.table("documents")))
    want = _sql_rows(ddb, percentile_tolerance_sql())
    assert got == want
    assert len(got) > 1


def test_percentile_tolerance_flag_is_real(spark):
    """The flag actually compares sketch to exact: an absurdly tight
    tolerance fails on a spread-out group (proving the comparison is
    not vacuous), the default passes."""
    docs = spark.table("documents")
    tight = PRO.percentile_tolerance_profile(docs, rel_tol=0.0).collect()
    default = PRO.percentile_tolerance_profile(docs).collect()
    assert all(r["sketch_within_tol"] for r in default)
    # rel_tol=0 demands bit-equality of sketch and exact at every prob;
    # GK at accuracy 10k on ~25-row groups IS exact, so instead assert
    # the flag flips on a constructed adversarial group: huge spread,
    # tiny accuracy
    wide = spark.createDataFrame(
        [(i, "w", i * i * 1000) for i in range(1, 200)],
        "doc_id long, source string, n_chars long",
    )
    loose = PRO.percentile_tolerance_profile(wide, accuracy=1, rel_tol=0.000001).collect()
    assert not all(r["sketch_within_tol"] for r in loose)


# --- q75: session funnel -----------------------------------------------------


def session_funnel_sql(steps=("view", "click", "purchase"), gap_minutes: int = 30) -> str:
    """The q32 session-labeling rule (floor-epoch gap, RANGE-framed
    running sum) + the q67 ordered-min-ts chain at session grain."""
    gap = gap_minutes * 60
    ctes = [
        rf"""flagged AS (
  SELECT user_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > {gap}
              THEN 1 ELSE 0 END AS ns
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
sess AS (
  SELECT user_id || '#' || cast(sum(ns) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS sid,
         ts, event_type
  FROM flagged)"""
    ]
    for i, s in enumerate(steps):
        if i == 0:
            ctes.append(
                f"s0 AS (SELECT sid, min(ts) AS t FROM sess "
                f"WHERE event_type = '{s}' GROUP BY sid)"
            )
        else:
            ctes.append(
                f"s{i} AS (SELECT e.sid, min(e.ts) AS t FROM sess e "
                f"JOIN s{i-1} p USING (sid) "
                f"WHERE e.event_type = '{s}' AND e.ts > p.t GROUP BY e.sid)"
            )
    unions = " UNION ALL ".join(
        f"SELECT {i} AS step_index, '{s}' AS step, "
        f"(SELECT count(*) FROM s{i}) AS n_sessions"
        for i, s in enumerate(steps)
    )
    return f"""
WITH {', '.join(ctes)},
u AS ({unions})
SELECT step_index::INT AS step_index, step, n_sessions::BIGINT AS n_sessions,
       round(CASE WHEN max(CASE WHEN step_index = 0 THEN n_sessions END) OVER () > 0
                  THEN n_sessions / max(CASE WHEN step_index = 0 THEN n_sessions END) OVER ()
                  ELSE 0 END, 4) AS conversion
FROM u
"""


def test_oracle_draft_session_funnel(spark, ddb):
    got = _rows(PRO.session_funnel(spark.table("events"), list(E.FUNNEL_STEPS)))
    want = _sql_rows(ddb, session_funnel_sql(tuple(E.FUNNEL_STEPS)))
    assert got == want
    assert len(got) == 3


def test_session_funnel_is_stricter_than_event_funnel(spark):
    """Session scoping can only lose conversions relative to the
    lifetime funnel... measured in USERS it could differ, so assert
    the structural property on a constructed fixture: a user who
    views in one session and clicks in a later one converts the
    event_funnel but NOT the session funnel."""
    import datetime as dt

    t = dt.datetime(2026, 1, 1)
    rows = [
        (1, t, 7, "view", 0.0, ""),
        (2, t + dt.timedelta(hours=5), 7, "click", 0.0, ""),  # new session
        (3, t + dt.timedelta(minutes=1), 8, "view", 0.0, ""),
        (4, t + dt.timedelta(minutes=2), 8, "click", 0.0, ""),  # same session
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    ev = {r["step"]: r["n_users"] for r in PRO.event_funnel(df, ["view", "click"]).collect()}
    se = {r["step"]: r["n_sessions"] for r in PRO.session_funnel(df, ["view", "click"]).collect()}
    assert ev == {"view": 2, "click": 2}
    # user 7's second session holds only the click (no view), so the
    # view-session count is 2 (one per user), and only user 8's
    # view+click land in ONE session
    assert se["view"] == 2
    assert se["click"] == 1


# --- m05: media manifest stats -----------------------------------------------


def manifest_stats_sql() -> str:
    """The m01 oracle wrapped as a subquery + per-kind rollup — one
    copy of the feature replay. payload_bytes/width/height/duration
    come straight from m01's columns."""
    m01 = E.oracle_sql()["m01_multimodal_features"]
    return f"""
WITH feats AS ({m01})
SELECT kind,
       count(*)::BIGINT AS n_items,
       sum(payload_bytes)::BIGINT AS total_payload_bytes,
       count(width)::BIGINT AS n_with_dims,
       max(width)::INT AS max_width,
       max(height)::INT AS max_height,
       count(duration_ms)::BIGINT AS n_with_duration,
       sum(duration_ms)::BIGINT AS total_duration_ms,
       max(n_frames)::INT AS max_frames
FROM feats GROUP BY kind
"""


def _m05(spark):
    return MM.manifest_stats(MM.extract_features(MM.make_fake_media(spark, n=16)))


def test_oracle_draft_manifest_stats(spark, ddb):
    got = _rows(_m05(spark))
    want = _sql_rows(ddb, manifest_stats_sql())
    assert got == want
    assert len(got) == 3  # image / audio / video


def test_manifest_stats_handles_missing_attrs(spark):
    """A corrupt payload yields null features; the rollup counts it in
    n_items but not in n_with_dims/n_with_duration."""
    import pandas as pd

    media = MM.make_fake_media(spark, n=6)
    broken = media.withColumn(
        "payload",
        F.when(F.col("media_id") == 0, F.lit(bytearray(b"JUNK"))).otherwise(
            F.col("payload")
        ),
    )
    out = MM.manifest_stats(MM.extract_features(broken)).collect()
    total = sum(r["n_items"] for r in out)
    with_dims = sum(r["n_with_dims"] for r in out)
    assert total == 6 and with_dims == 5


# --- s19: embedding-table stats ----------------------------------------------


def embedding_stats_sql() -> str:
    """Micro-lattice norm envelope: per-vector norms quantize to
    longs before the single-row aggregate, so every statistic is
    exact integer arithmetic (the mean divides once at the end)."""
    return """
WITH n AS (
  SELECT len(embedding) AS dim,
         round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) * 1e6)::BIGINT AS nm
  FROM embeddings)
SELECT count(*)::BIGINT AS n_vectors,
       count(DISTINCT dim)::BIGINT AS n_dims_distinct,
       min(dim)::INT AS dim_min,
       max(dim)::INT AS dim_max,
       sum((nm = 0)::INT)::BIGINT AS n_zero,
       min(nm)::BIGINT AS norm_min_micro,
       max(nm)::BIGINT AS norm_max_micro,
       round(sum(nm) / count(*) / 1e6, 6) AS mean_norm
FROM n
"""


def test_oracle_draft_embedding_stats(spark, ddb):
    got = _rows(SIM.embedding_stats(spark.table("embeddings")))
    want = _sql_rows(ddb, embedding_stats_sql())
    assert got == want
    assert len(got) == 1


def test_embedding_stats_flags_zero_and_mixed_dims(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [3.0, 4.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = SIM.embedding_stats(df).collect()[0]
    assert r["n_zero"] == 1
    assert r["norm_max_micro"] == 5_000_000  # |(3,4)| = 5 exactly
    assert r["n_dims_distinct"] == 1 and r["dim_min"] == r["dim_max"] == 2


# --- s20: cell balance from the persisted index ------------------------------


def test_oracle_draft_cell_balance_from_index(spark, ddb, tmp_path):
    """The persisted-layout profile replays s13's oracle EXACTLY (the
    s10/s11 value-identity pattern: the index write must not change a
    single occupancy number), so its r10 wiring reuses
    cell_balance_sql — already moved to E at the r9 rotation."""
    emb = spark.table("embeddings")
    path = str(tmp_path / "ivf_idx")
    SIM.build_ivf_index(emb, path, num_cells=8)
    got = _rows(SIM.cell_balance_from_index(spark, path))
    want = _sql_rows(ddb, E.cell_balance_sql(8))
    assert got == want
    assert got == _rows(SIM.cell_balance(emb))  # live/persisted identity


def test_cell_balance_from_index_prunes_to_partition_column(spark, tmp_path):
    """The profile scan must read ONLY the partition column — an
    index profile that reads the vectors would be a corpus-sized scan
    at serving time."""
    emb = spark.table("embeddings")
    path = str(tmp_path / "ivf_idx2")
    SIM.build_ivf_index(emb, path, num_cells=8)
    plan = (
        SIM.cell_balance_from_index(spark, path)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ReadSchema: struct<>" in plan  # nothing but the partition col


# --- s21: incremental index append -------------------------------------------


def test_oracle_draft_ivf_append(spark, ddb, tmp_path):
    """Grow-vs-rebuild identity: build on the first half, append the
    rest, search — row-for-row equal to a fresh full build AND to the
    wired s04 oracle (same centroids: ids 0..7 sit in the first half,
    so the frozen quantizer equals the full-corpus seeding). The r10
    wiring therefore reuses E.oracle_sql()['s04_ann_ivf_nprobe']
    verbatim."""
    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "ivf_grow")
    SIM.build_ivf_index(emb.filter(F.col("vec_id") < 100), path, num_cells=8)
    n = SIM.append_to_ivf_index(spark, path, emb.filter(F.col("vec_id") >= 100))
    assert n == emb.count() - 100
    got = _rows(SIM.ivf_topk_from_index(spark, path, qs, k=5, nprobe=2))
    want = _sql_rows(ddb, E.oracle_sql()["s04_ann_ivf_nprobe"])
    assert got == want
    full = str(tmp_path / "ivf_full")
    SIM.build_ivf_index(emb, full, num_cells=8)
    assert got == _rows(SIM.ivf_topk_from_index(spark, full, qs, k=5, nprobe=2))


def test_ivf_append_leaves_resident_files_untouched(spark, tmp_path):
    """The append must be file-additive: every parquet file present
    before the append still exists, byte-identical (mtime+size), after
    it — the property that makes concurrent serving safe."""
    import glob
    import os

    emb = spark.table("embeddings")
    path = str(tmp_path / "ivf_inc")
    SIM.build_ivf_index(emb.filter(F.col("vec_id") < 100), path, num_cells=8)

    def snap():
        return {
            p: (os.path.getsize(p), os.path.getmtime(p))
            for p in glob.glob(os.path.join(path, "cell=*", "*.parquet"))
        }

    before = snap()
    SIM.append_to_ivf_index(spark, path, emb.filter(F.col("vec_id") >= 100))
    after = snap()
    assert set(before) <= set(after)           # nothing deleted
    assert all(after[p] == before[p] for p in before)  # nothing rewritten
    assert len(after) > len(before)            # delta files landed


# --- q76: event-rate anomaly -------------------------------------------------


def event_rate_anomaly_sql(k: float = 3.0) -> str:
    """Hourly tumbling counts per type + the q66 median/MAD rule over
    each type's hourly series (quantile_cont == Spark percentile);
    the MAD floor of 1.0 mirrors the Spark greatest(mad, 1.0)."""
    return f"""
WITH hourly AS (
  SELECT event_type AS t, date_trunc('hour', ts) AS h, count(*) AS n
  FROM events GROUP BY t, h),
med AS (SELECT t, quantile_cont(n, 0.5) AS m FROM hourly GROUP BY t),
dev AS (
  SELECT hourly.t, n, abs(n - med.m) AS adev, med.m
  FROM hourly JOIN med USING (t)),
mad AS (SELECT t, quantile_cont(adev, 0.5) AS md FROM dev GROUP BY t)
SELECT dev.t AS event_type,
       count(*)::BIGINT AS n_hours,
       round(any_value(dev.m), 2) AS median_rate,
       round(any_value(md), 2) AS mad_rate,
       count(*) FILTER (adev > {k} * greatest(md, 1.0))::BIGINT AS n_anomalous,
       max(n)::BIGINT AS max_rate
FROM dev JOIN mad USING (t) GROUP BY dev.t
"""


def test_oracle_draft_event_rate_anomaly(spark, ddb):
    got = _rows(PRO.event_rate_anomaly(spark.table("events")))
    want = _sql_rows(ddb, event_rate_anomaly_sql())
    assert got == want
    assert len(got) > 1


def test_event_rate_anomaly_flags_planted_spike(spark):
    """A planted 100x-rate hour is the ONLY anomalous hour; the flat
    series around it scores zero anomalies."""
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    for h in range(24):
        burst = 200 if h == 12 else 2
        for j in range(burst):
            rows.append(
                (eid, t0 + dt.timedelta(hours=h, seconds=j), 1, "view", 0.0, "")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = PRO.event_rate_anomaly(df).collect()[0]
    assert out["n_anomalous"] == 1 and out["max_rate"] == 200
    assert out["median_rate"] == 2.0


# --- q77: lang x source contingency ------------------------------------------


def lang_source_profile_sql() -> str:
    return """
WITH cells AS (
  SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source),
lt AS (SELECT lang, sum(n) AS lt FROM cells GROUP BY lang),
st AS (SELECT source, sum(n) AS st FROM cells GROUP BY source),
g AS (SELECT sum(n)::DOUBLE AS total FROM cells)
SELECT lang, source,
       n::BIGINT AS n_docs,
       round(lt * st / total, 2) AS expected,
       round(n / (lt * st / total), 4) AS ratio
FROM cells JOIN lt USING (lang) JOIN st USING (source), g
"""


def test_oracle_draft_lang_source_profile(spark, ddb):
    got = _rows(PRO.lang_source_profile(spark.table("documents")))
    want = _sql_rows(ddb, lang_source_profile_sql())
    assert got == want
    assert len(got) > 1


def test_lang_source_profile_independence_baseline(spark):
    """A perfectly independent contingency table scores ratio 1.0 on
    every cell; a lang exclusive to one source scores |sources| on its
    home cell."""
    rows = [(i, ["en", "fr"][i % 2], ["a", "b"][(i // 2) % 2]) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    flat = PRO.lang_source_profile(df).collect()
    assert all(r["ratio"] == 1.0 for r in flat)
    rows2 = [(i, "en", ["a", "b"][i % 2]) for i in range(20)] + [
        (100 + i, "xx", "a") for i in range(10)
    ]
    df2 = spark.createDataFrame(rows2, "doc_id long, lang string, source string")
    home = {
        (r["lang"], r["source"]): r["ratio"]
        for r in PRO.lang_source_profile(df2).collect()
    }
    assert home[("xx", "a")] == 1.5  # 10 / (10 * 20/30)


# --- t32: top n-grams per source ---------------------------------------------


def top_ngrams_sql(n: int = 2, k: int = 3) -> str:
    """Word n-grams per source (full grams only, lowercased) ranked by
    (count desc, gram asc) — both engines agree on ties."""
    return rf"""
WITH toks AS (
  SELECT source,
         list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\s+'),
                     x -> length(x) > 0) AS w
  FROM documents),
grams AS (
  SELECT source,
         unnest(list_transform(range(1, len(w) - {n - 2}),
                               i -> array_to_string(w[i:i+{n - 1}], ' '))) AS ng
  FROM toks WHERE len(w) >= {n}),
counts AS (SELECT source, ng, count(*) AS n FROM grams GROUP BY source, ng)
SELECT source, ng AS ngram, n::BIGINT AS n_occurrences,
       cast(row_number() OVER (PARTITION BY source ORDER BY n DESC, ng) AS INT) AS rank
FROM counts
QUALIFY rank <= {k}
"""


def test_oracle_draft_top_ngrams(spark, ddb):
    got = _rows(TXT.top_ngrams_per_group(spark.table("documents")))
    want = _sql_rows(ddb, top_ngrams_sql())
    assert got == want
    assert len(got) > 1


def test_top_ngrams_deterministic_ties_and_no_partial_tails(spark):
    rows = [
        (1, "s", "a b a b c"),   # bigrams: "a b" x2, "b a", "b c"
        (2, "s", "z"),           # 1 word -> contributes nothing
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = [(r["ngram"], r["n_occurrences"], r["rank"])
           for r in TXT.top_ngrams_per_group(df, k=3).collect()]
    assert out == [("a b", 2, 1), ("b a", 1, 2), ("b c", 1, 3)]


# --- q78: cohort retention via the streaming state decomposition -------------


def test_oracle_draft_cohort_via_state(spark, ddb):
    """The streaming decomposition's batch replay: cohort_user_days
    (the per-user state the stream maintains) + cohort_retention_finish
    (the dashboard query) must reproduce the certified q70 operator —
    and therefore its oracle — exactly. Wiring this as a queries()
    entry at r10 puts a driver hash on the decomposition itself;
    the oracle reuses E.cohort_retention_sql() verbatim."""
    from datacatalog_tag_engine_spark.streaming import usage as U

    events = spark.table("events")
    got = _rows(U.cohort_retention_finish(U.cohort_user_days(events)))
    want = _sql_rows(ddb, E.cohort_retention_sql())
    assert got == want
    assert len(got) > 1


# --- q79: dirty-shard export planner -----------------------------------------


def dirty_shards_sql(num_shards: int = 8) -> str:
    """Both corpus versions bucketed by the q58 md5 rule, FULL JOIN on
    the id, shard-grain rollup with the all-shards axis. Versions:
    old = doc_id % 17 != 0 (the DSIR raw split), new = doc_id % 13 != 0
    — overlapping but distinct, both derived from the documents view."""
    bucket = "(('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % " + str(num_shards) + ")"
    return f"""
WITH o AS (SELECT doc_id, {bucket} AS shard FROM documents WHERE doc_id % 17 != 0),
n AS (SELECT doc_id, {bucket} AS shard FROM documents WHERE doc_id % 13 != 0),
j AS (
  SELECT coalesce(o.shard, n.shard) AS shard,
         o.doc_id AS od, n.doc_id AS nd
  FROM o FULL JOIN n ON o.doc_id = n.doc_id),
per AS (
  SELECT shard,
         sum((od IS NOT NULL AND nd IS NOT NULL)::INT) AS n_kept,
         sum((od IS NULL)::INT) AS n_added,
         sum((nd IS NULL)::INT) AS n_removed
  FROM j GROUP BY shard),
axis AS (SELECT unnest(range({num_shards}))::INT AS shard)
SELECT a.shard,
       coalesce(n_kept, 0)::BIGINT AS n_kept,
       coalesce(n_added, 0)::BIGINT AS n_added,
       coalesce(n_removed, 0)::BIGINT AS n_removed,
       coalesce(n_added, 0) + coalesce(n_removed, 0) > 0 AS needs_rewrite
FROM axis a LEFT JOIN per ON per.shard = a.shard
"""


def _q79(spark):
    from datacatalog_tag_engine_spark.pipeline.export import dirty_shards

    docs = spark.table("documents")
    old = docs.filter(F.col("doc_id") % 17 != 0)
    new = docs.filter(F.col("doc_id") % 13 != 0)
    return dirty_shards(old, new, 8)


def test_oracle_draft_dirty_shards(spark, ddb):
    got = _rows(_q79(spark))
    want = _sql_rows(ddb, dirty_shards_sql(8))
    assert got == want
    assert len(got) == 8


def test_dirty_shards_identical_versions_are_all_clean(spark):
    """No delta -> zero dirty shards; a single added doc dirties
    exactly its own shard (the no-resharding-cascade property)."""
    from datacatalog_tag_engine_spark.pipeline.export import dirty_shards
    from datacatalog_tag_engine_spark.pipeline.export import shard_assignments

    docs = spark.table("documents")
    same = dirty_shards(docs, docs, 8).collect()
    assert all(not r["needs_rewrite"] for r in same)
    assert sum(r["n_kept"] for r in same) == docs.count()
    extra = spark.createDataFrame([(10**7,)], "doc_id long")
    grown = dirty_shards(docs, docs.select("doc_id").unionByName(extra), 8).collect()
    dirty = [r for r in grown if r["needs_rewrite"]]
    assert len(dirty) == 1 and dirty[0]["n_added"] == 1 and dirty[0]["n_removed"] == 0
    home = shard_assignments(extra, 8).collect()[0]["shard"]
    assert dirty[0]["shard"] == home
