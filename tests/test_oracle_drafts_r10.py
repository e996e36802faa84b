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

ROTATION LANDED (round-10 start): all eighteen queries are wired as
queries()/oracle_sql() pairs and the generator functions moved to
__spark_entry__ (one copy; this file imports them back — E.<name>);
the window invariants live in tests/test_r10_rotation_wiring.py,
which also carries the mechanical rounds-since-green aging ledger.
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


def _s16(spark):
    emb = spark.table("embeddings")
    return SIM.range_search(
        emb, emb.filter(F.col("vec_id") < 5), threshold=0.2, num_cells=8, nprobe=2
    )


def test_oracle_draft_range_search(spark, ddb):
    got = _rows(_s16(spark))
    want = _sql_rows(ddb, E.range_search_sql(0.2, 2))
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


def test_oracle_draft_cell_inertia(spark, ddb):
    got = _rows(SIM.cell_inertia(spark.table("embeddings")))
    want = _sql_rows(ddb, E.cell_inertia_sql())
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


def test_oracle_draft_pq_code_histogram(spark, ddb):
    got = _rows(SIM.pq_code_histogram(spark.table("embeddings")))
    want = _sql_rows(ddb, E.pq_code_histogram_sql())
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


def test_oracle_draft_char_coverage(spark, ddb):
    got = _rows(TXT.char_coverage(spark.table("documents")))
    want = _sql_rows(ddb, E.char_coverage_sql())
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


def test_oracle_draft_ngram_novelty(spark, ddb):
    got = _rows(DD.ngram_novelty(spark.table("documents")))
    want = _sql_rows(ddb, E.ngram_novelty_sql())
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
    want = _sql_rows(ddb, E.gate_mixture_drift_sql())
    assert got == want
    assert len(got) > 1


def test_gate_mixture_drift_shares_sum_to_one(spark):
    rows = _q72(spark).collect()
    assert abs(sum(r["share_before"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["share_after"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["share_drift"] for r in rows)) < 1e-4
    assert any(r["n_after"] < r["n_before"] for r in rows)  # the gate bites


# --- q73: cluster-size profile -----------------------------------------------


def _q73(spark):
    docs = spark.table("documents")
    return DD.cluster_size_profile(docs, DD.minhash_dedup(docs))


def test_oracle_draft_cluster_size_profile(spark, ddb):
    got = _rows(_q73(spark))
    want = _sql_rows(ddb, E.cluster_size_profile_sql(E.oracle_sql()["q34_dedup_clusters"]))
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


def test_oracle_draft_percentile_tolerance(spark, ddb):
    got = _rows(PRO.percentile_tolerance_profile(spark.table("documents")))
    want = _sql_rows(ddb, E.percentile_tolerance_sql())
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


def test_oracle_draft_session_funnel(spark, ddb):
    got = _rows(PRO.session_funnel(spark.table("events"), list(E.FUNNEL_STEPS)))
    want = _sql_rows(ddb, E.session_funnel_sql(tuple(E.FUNNEL_STEPS)))
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


def _m05(spark):
    return MM.manifest_stats(MM.extract_features(MM.make_fake_media(spark, n=16)))


def test_oracle_draft_manifest_stats(spark, ddb):
    got = _rows(_m05(spark))
    want = _sql_rows(ddb, E.manifest_stats_sql(E.oracle_sql()["m01_multimodal_features"]))
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


def test_oracle_draft_embedding_stats(spark, ddb):
    got = _rows(SIM.embedding_stats(spark.table("embeddings")))
    want = _sql_rows(ddb, E.embedding_stats_sql())
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


def test_oracle_draft_event_rate_anomaly(spark, ddb):
    got = _rows(PRO.event_rate_anomaly(spark.table("events")))
    want = _sql_rows(ddb, E.event_rate_anomaly_sql())
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


def test_oracle_draft_lang_source_profile(spark, ddb):
    got = _rows(PRO.lang_source_profile(spark.table("documents")))
    want = _sql_rows(ddb, E.lang_source_profile_sql())
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


def test_oracle_draft_top_ngrams(spark, ddb):
    got = _rows(TXT.top_ngrams_per_group(spark.table("documents")))
    want = _sql_rows(ddb, E.top_ngrams_sql())
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


def _q79(spark):
    from datacatalog_tag_engine_spark.pipeline.export import dirty_shards

    docs = spark.table("documents")
    old = docs.filter(F.col("doc_id") % 17 != 0)
    new = docs.filter(F.col("doc_id") % 13 != 0)
    return dirty_shards(old, new, 8)


def test_oracle_draft_dirty_shards(spark, ddb):
    got = _rows(_q79(spark))
    want = _sql_rows(ddb, E.dirty_shards_sql(8))
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


def test_ivf_append_rejects_codes_layout(spark, tmp_path):
    """r10 ADVICE fix: any directory with _centroids used to be
    appendable — including a build_ivfpq_index layout, whose resident
    rows are PQ codes; appending raw (id, vec, cell) rows there would
    silently mix schemas and corrupt the served index. The resident
    schema is validated before any write."""
    emb = spark.table("embeddings")
    path = str(tmp_path / "pq_idx")
    SIM.build_ivfpq_index(emb, path, num_cells=8)
    with pytest.raises(ValueError, match="raw-vector"):
        SIM.append_to_ivf_index(spark, path, emb.filter(F.col("vec_id") >= 100))
