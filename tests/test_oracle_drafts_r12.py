"""Round-12 rotation prep: DuckDB oracle drafts for operators built in
round 11 but NOT wired into the frozen inventory (the freeze policy:
new queries enter only at round start, with a proven draft). This
module's generators are the work-list — at the r12 rotation, move each
SQL generator into __spark_entry__ verbatim (entry becomes the single
copy; this file imports it back) and wire the queries()/oracle_sql()
pairs:

- q86_resharding_plan — shard-manifest consolidation planner
  (export.resharding_plan): contiguous cumsum repacking of the
  small-shard tail that trickle appends under range sharding (q84)
  and retraction rewrites (q79) accumulate. Shard-grain in and out
  (one window over manifest rows); id-range locality survives because
  only neighbors merge; over-target shards are flagged needs_split
  (doc-grain work, executed by write_training_shards over just those
  shards).
- d18_lsh_parameter_table — the LSH S-curve P(candidate|s) for every
  (bands, rows) split of the signature, tabulated on the dyadic
  s = k/16 lattice (dedup.lsh_parameter_table): the inspectable form
  of the grid tune_lsh_params optimizes, as a driver row. Every
  probability is a dyadic rational whose numerator fits a double, so
  both engines compute identical values with NO libm pow discrepancy.
- t34_code_prose_profile — per-source code-vs-prose routing profile
  (text.code_prose_profile): symbol density x indentation x
  statement-line signals, every decision an exact integer comparison
  (no float thresholds). The pre-mixture classifier that keeps
  Gopher-style prose gates (t16) from deleting good code.
- q88_source_dup_rate — per-source near-dup mass through the
  certified q34 cluster chain + lowest-id keep (dedup.source_dup_rate):
  q72 says which sources the QUALITY gate decimates, this says which
  sources are mostly COPIES. Oracle derived from the wired q34 string
  by final-SELECT surgery (one copy of the chain).
- d19_incremental_neardup — daily-batch near-dup against a resident
  corpus at SIGNATURE grain (dedup.incremental_neardup_pairs): the
  d15 estimator composed with the q51/q80 delta discipline — the
  bucket join is delta x both-sides, so the resident x resident
  quadrant is never generated; resident text is never re-read. The
  100 TB daily-dedup shape (resident signatures are a persisted
  artifact via resident_sigs=).
- s28_quantizer_drift — per-cell drift between the stored centroid
  and the CURRENT cell mean on the micro lattice
  (similarity.quantizer_drift): the direct retrain trigger for the
  frozen-quantizer lifecycle (s21/s22/s25 never move centroids;
  drift says when a rebuild would actually change something, and
  where). Exact integer arithmetic end to end.
- q90_curriculum_order — deterministic quality-curriculum ordering
  (sampling.curriculum_order): ntile stages over (score desc, id) +
  the engine's md5 within-stage shuffle — clean-first training order
  that is bit-reproducible, composed with the wired t02 score (oracle
  nests the t02 string as a CTE, the d17 pattern). Above 2M rows the
  staging runs on sampling.global_rank (range partition + offsets)
  instead of a single-task window — bit-identical output, asserted.
- m06_payload_size_profile — per-kind payload-size envelope
  (multimodal.payload_size_profile): exact p50/p90 + min/max over the
  m01 feature rows; oracle nests the wired m01 string (the m05
  pattern), percentiles via the q74 quantile_cont == percentile rule.
- d20_shingle_df_profile — document-frequency histogram of the
  shingle vocabulary on power-of-two buckets
  (dedup.shingle_df_profile): the evidence surface behind max_df —
  n_rows per bucket is exactly the join-side mass a cap would drop.
  Bucketing via length(bin(df)) - 1, integer-exact in both engines
  (floor(log2()) through libm doubles is not).
- s29_quantizer_drift_from_index — the s28 drift read off a PERSISTED
  index's stored cells + stored centroids
  (similarity.quantizer_drift_from_index): the maintenance loop's
  actual watch number. Fresh-index identity: stored assignment ==
  ranked assignment, so the oracle is the s28 string verbatim (the
  s20 persisted-layout pattern).
- q91_stage_mixture — per-(stage, source) composition of a curriculum
  plan (sampling.stage_mixture): the QA check that a quality
  curriculum has not silently become a DOMAIN curriculum; oracle
  nests the wired q90 derivation as a CTE.
- q93_contamination_profile — the decontamination-threshold decision
  table (text.contamination_profile): contamination bands over the
  certified t10 surface + the cumulative drop fraction a threshold at
  each band edge would remove; integer-exact banding. Oracle nests
  the wired t10 string as a CTE.
- t36_langid_margin — confidence surface for the t03 heuristic
  (text.language_id_margin): integer best/second marker scores +
  margin, the routing table for a two-tier language pipeline (low
  margin -> the expensive classifier); lang_pred repeats t03's rule
  verbatim (asserted against language_id).
- q94_verify_shards — shard-export integrity check
  (export.verify_training_shards): recount the disk contents of a
  write_training_shards directory against its own manifest
  (footer-grain for parquet) — the read-side half of the export
  contract, run before a training job trusts the shards and after any
  delete/compact/resharding maintenance. A fresh export verifies
  clean by construction (identity oracle, the s21 pattern); deleted
  and stray files each flip exactly their shard (asserted). Reference
  analog: the job ledger's tasks_ran == task_count completion check.
- q95_source_relative_curriculum — the FIX for the skew q91 flags
  (sampling.source_relative_scores + curriculum_order): quality
  re-expressed as each doc's within-source quantile, so every source
  contributes its best docs to stage 1 and each stage's mixture
  matches the corpus mixture up to integer rounding (asserted on the
  q91 skew fixture: raw stage-1 = 100% one source, relative ~50/50).
  Both normalization windows are source-partitioned (cluster-wide).

- t37_heavy_hitters — EXACT heavy-hitter tokens without a
  vocabulary-grain shuffle (text.heavy_hitter_tokens): per-partition
  Misra-Gries candidate pass (mergeable-summaries form, bounded
  memory) + exact recount of the bounded candidate set; final filter
  is pure integer arithmetic (count * k > N). The scale form of the
  t05/t32 family — their groupBy(token) shuffles the entire
  vocabulary. Output independent of partitioning (asserted).
- q97_snapshot_diff — per-source diff of two corpus snapshots
  (profiling.corpus_snapshot_diff): added/removed/changed/unchanged
  counts + net token delta from ONE full-outer join on the id over
  scan-projection fingerprints. The daily-refresh sanity gate that
  runs before q79/q80/q84 commit to rewriting anything.
- q98_gate_overlap — pairwise co-fire matrix of the Gopher gates
  (text.gate_overlap_matrix): upper-triangle counts incl. the solo
  diagonal, dimension-grain output (<= 45 rows); oracle nests the
  wired t16 string and unnests its fail_reasons. The gate-redundancy
  diagnosis q72's per-source drift can't see.
- s30_knn_graph — cell-restricted k-NN graph + mutuality flag
  (similarity.knn_graph): the SemDeDup building block. Repeats the
  _topk_by_key determinism contract verbatim but joins probe rows to
  cell members WITHOUT broadcasting (the query side IS the corpus) —
  sum-of-cell-squares work, asserted equal to brute_force_topk at
  nprobe == num_cells. Oracle replays the s03 assignment CTE + an
  edge-grain reversed-pair self-join.

- s31_knn_graph_from_index — the s30 graph read off a PERSISTED
  index's stored cells (similarity.knn_graph_from_index): no
  re-assignment, so append/delete/compact touching cells {c...}
  changes ONLY those cells' edges — untouched neighborhoods are
  bit-identical (asserted), making nightly graph refreshes
  delta-priced like the rest of the lifecycle. Fresh-index identity:
  the s30 oracle serves both forms verbatim.

r12 RE-CERT note: quality_scores gained an ANSI division-by-zero
guard late in r11 (value-identical on every non-empty text; t02 and
d17 strict-verified against the oracle after the change) — include
t02_quality as the code-changed module witness in the r12 window.

r12 ROTATION-TIME REFACTOR (self-review finding): _knn_edges repeats
_topk_by_key's scoring/tiebreak block because the latter broadcasts
its query side (wrong when the queries ARE the corpus) and is frozen
certified code this round — at the r12 rotation give _topk_by_key a
broadcast_queries flag and route _knn_edges through it so the
cross-engine determinism contract has ONE definition again. Until
then the brute-parity test (knn_graph at nprobe == num_cells ==
brute_force_topk) makes any drift non-silent.

r12 WINDOW ARITHMETIC (ledger state at r11 close): 20 queue drafts +
the t02 re-cert witness = 21 slots; the remaining 29 come from the
mechanical aging ledger — all 19 r8-last-green rows plus the 10
oldest r9 rows (tools/window_ledger.py; oldest row outside the r11
window is r8). Cap the r12 wiring test's ledger at rounds < 12.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from datacatalog_tag_engine_spark.pipeline import dedup as DD
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


# --- q86: resharding plan ------------------------------------------------------


resharding_plan_sql = E.resharding_plan_sql


def _q86(spark, target: int = 500):
    from datacatalog_tag_engine_spark.pipeline.export import (
        range_shard_assignments,
        resharding_plan,
    )

    docs = spark.table("documents")
    manifest = (
        range_shard_assignments(docs, 100)
        .groupBy("shard")
        .agg(F.count("*").alias("n_docs"))
    )
    return resharding_plan(manifest, target)


def test_oracle_draft_resharding_plan(spark, ddb):
    got = _rows(_q86(spark))
    want = _sql_rows(ddb, resharding_plan_sql(100, 500))
    assert got == want
    assert len(got) > 1


def test_resharding_plan_packs_and_flags(spark):
    """Contract on a constructed manifest: a tail of tiny shards
    coalesces into target-sized new shards (locality: only neighbors
    merge — new_shard is monotone in shard), an over-target shard is
    flagged needs_split, and no docs are lost (group sums == input)."""
    from datacatalog_tag_engine_spark.pipeline.export import resharding_plan

    rows = [(0, 900), (1, 40), (2, 30), (3, 20), (4, 10), (5, 600)]
    m = spark.createDataFrame(rows, "shard int, n_docs long")
    out = sorted(
        resharding_plan(m, 500).collect(), key=lambda r: r["shard"]
    )
    by = {r["shard"]: r for r in out}
    # shard 0 (900 docs) occupies new shards 0.. and is flagged for split
    assert by[0]["new_shard"] == 0 and by[0]["needs_split"]
    # the tiny tail (40+30+20+10 docs, starting at cum 900) packs into
    # new_shard 1 together
    assert by[1]["new_shard"] == by[2]["new_shard"] == by[3]["new_shard"] == by[4]["new_shard"] == 1
    assert all(by[s]["moved"] for s in (2, 3, 4))
    # monotone (locality: merges are contiguous)
    ns = [r["new_shard"] for r in out]
    assert ns == sorted(ns)
    # conservation
    assert sum(r["n_docs"] for r in out) == sum(n for _, n in rows)


# --- d18: LSH parameter table --------------------------------------------------


lsh_parameter_table_sql = E.lsh_parameter_table_sql


def test_oracle_draft_lsh_parameter_table(spark, ddb):
    got = _rows(DD.lsh_parameter_table(spark))
    want = _sql_rows(ddb, lsh_parameter_table_sql())
    assert got == want
    assert len(got) == 4 * 15


def test_lsh_parameter_table_matches_tune_lsh_params_curve(spark):
    """The table IS the curve tune_lsh_params optimizes: every row
    equals the analytic 1-(1-s^r)^b, monotone in s for each split, and
    the default (4x2) split's curve crosses 0.5 near the analytic
    threshold (1/b)^(1/r) = (1/4)^(1/2) = 0.5."""
    rows = DD.lsh_parameter_table(spark).collect()
    for r in rows:
        s = r["s_16ths"] / 16.0
        p = 1.0 - (1.0 - s ** r["rows_per_band"]) ** r["bands"]
        assert abs(r["p_candidate"] - round(p, 6)) < 1e-9
    d42 = sorted(
        (r["s_16ths"], r["p_candidate"])
        for r in rows
        if r["bands"] == 4 and r["rows_per_band"] == 2
    )
    ps = [p for _, p in d42]
    assert ps == sorted(ps)
    crossing = next(s for s, p in d42 if p >= 0.5)
    assert crossing / 16.0 == pytest.approx(0.5, abs=0.0625)


# --- t34: code/prose profile ---------------------------------------------------


code_prose_profile_sql = E.code_prose_profile_sql


def test_oracle_draft_code_prose_profile(spark, ddb):
    got = _rows(TXT.code_prose_profile(spark.table("documents")))
    want = _sql_rows(ddb, code_prose_profile_sql())
    assert got == want
    assert len(got) > 1


def test_code_prose_profile_classifies_code(spark):
    """An obvious code doc (symbols + indentation + statement lines)
    flags is_code; prose does not; math-y prose with symbols but no
    structure does not (the conjunction rule)."""
    code = (
        "def f(x):\n    y = x + 1;\n    if y > 2:\n        return {y};\n"
        "    z = [1, 2, 3];\n    return (z);\n"
    )
    prose = "the quick brown fox jumps over the lazy dog and keeps going\n" * 3
    mathy = "we know that a = b = c holds, and x < y > z; so (obviously) #1\n" * 3
    df = spark.createDataFrame(
        [(1, "code", code), (2, "prose", prose), (3, "mathy", mathy)],
        "doc_id long, source string, text string",
    )
    out = {r["source"]: r for r in TXT.code_prose_profile(df).collect()}
    assert out["code"]["n_code"] == 1
    assert out["prose"]["n_code"] == 0
    assert out["mathy"]["n_code"] == 0  # symbols without structure


# --- q88: per-source dup rate --------------------------------------------------


source_dup_rate_sql = E.source_dup_rate_sql


def test_oracle_draft_source_dup_rate(spark, ddb):
    got = _rows(DD.source_dup_rate(spark.table("documents")))
    want = _sql_rows(ddb, source_dup_rate_sql(E.oracle_sql()["q34_dedup_clusters"]))
    assert got == want
    assert len(got) > 1


def test_source_dup_rate_localizes_the_copying_source(spark):
    """A source that mirrors another's docs shows the dup mass; the
    original source keeps its canonicals (lowest id wins)."""
    # each original is built from its OWN word vocabulary so originals
    # are not near-dups of each other; mirrors are exact copies
    orig = [
        (i, "orig", " ".join(f"w{i}x{j} token{i}y{j}" for j in range(20)))
        for i in range(10)
    ]
    mirror = [(100 + i, "mirror", t) for i, (_, _, t) in enumerate(orig)]
    df = spark.createDataFrame(orig + mirror, "doc_id long, source string, text string")
    out = {r["source"]: r for r in DD.source_dup_rate(df).collect()}
    assert out["orig"]["n_dropped"] == 0
    assert out["mirror"]["n_kept"] == 0 and out["mirror"]["dup_rate"] == 1.0
    assert out["orig"]["n_docs"] == out["mirror"]["n_docs"] == 10


# --- d19: incremental near-dup -------------------------------------------------


incremental_neardup_sql = E.incremental_neardup_sql


def _d19(spark):
    docs = spark.table("documents")
    return DD.incremental_neardup_pairs(
        docs.filter(F.col("doc_id") % 3 == 0),
        docs.filter(F.col("doc_id") % 3 != 0),
    )


def test_oracle_draft_incremental_neardup(spark, ddb):
    got = _rows(_d19(spark))
    want = _sql_rows(ddb, incremental_neardup_sql())
    assert got == want
    assert len(got) > 0


def test_incremental_neardup_restriction_and_persisted_sigs(spark):
    """(a) Every pair touches the delta, and the pair set equals the
    full d15 self-join's pairs MINUS its resident x resident quadrant
    (the restriction drops exactly that quadrant, nothing else).
    (b) Passing precomputed resident signatures (the persisted-artifact
    serving path) is value-identical to recomputing them."""
    docs = spark.table("documents")
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    resident = docs.filter(F.col("doc_id") % 3 != 0)
    got = {(r["doc_a"], r["doc_b"]): r["is_cross"] for r in _d19(spark).collect()}
    delta_ids = {r["doc_id"] for r in delta.select("doc_id").collect()}
    assert got and all(a in delta_ids or b in delta_ids for a, b in got)
    assert all(
        ((a in delta_ids) != (b in delta_ids)) == c for (a, b), c in got.items()
    )
    full = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in DD.minhash_estimate_pairs(docs).collect()
    }
    expected = {
        p for p in full if p[0] in delta_ids or p[1] in delta_ids
    }
    assert set(got) == expected
    sh_r = DD.shingle_table(resident)
    sigs_r = DD.minhash_signatures(sh_r)
    with_sigs = {
        (r["doc_a"], r["doc_b"]): r["is_cross"]
        for r in DD.incremental_neardup_pairs(
            delta, resident, resident_sigs=sigs_r
        ).collect()
    }
    assert with_sigs == got


# --- s28: quantizer drift ------------------------------------------------------


quantizer_drift_sql = E.quantizer_drift_sql


def test_oracle_draft_quantizer_drift(spark, ddb):
    got = _rows(SIM.quantizer_drift(spark.table("embeddings")))
    want = _sql_rows(ddb, quantizer_drift_sql())
    assert got == want
    assert len(got) > 1


def test_quantizer_drift_zero_after_retrain_step(spark):
    """Drift is the Lloyd-update displacement: re-centering each cell
    on its own mean drives drift to ~0 (exactly 0 on the micro
    lattice up to the mean's 1-unit rounding), and an append of mass
    far from a centroid grows THAT cell's drift only."""
    emb = spark.table("embeddings")
    base = SIM.quantizer_drift(emb)
    # retrain step: means become the new centroids
    assigned = SIM._ranked_cells(emb, 8, "vec_id", "embedding").filter("_rn = 1")
    means = (
        assigned.select("cell", F.posexplode("v").alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(F.avg("x").alias("mx"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mx"))).alias("pm"))
        .select("cell", F.transform("pm", lambda s: s["mx"]).alias("cent_v"))
    )
    # drift vs the re-centered quantizer, ASSIGNMENTS HELD FIXED: zero
    # up to the micro lattice's rounding of the mean itself. (A full
    # quantizer_drift re-run would also re-assign vectors to the new
    # centroids — a genuine Lloyd iteration, whose movement is not the
    # claim here.)
    qc = means.select(
        "cell",
        F.posexplode(
            F.transform("cent_v", lambda x: F.round(x * F.lit(1e6), 0).cast("long"))
        ).alias("pos", "qc"),
    )
    qx = assigned.select(
        "cell",
        F.posexplode(
            F.transform("v", lambda x: F.round(x * F.lit(1e6), 0).cast("long"))
        ).alias("pos", "qx"),
    )
    mean_fixed = qx.groupBy("cell", "pos").agg(
        F.round(F.sum("qx") / F.count("*"), 0).cast("long").alias("m")
    )
    resid = (
        mean_fixed.join(qc, ["cell", "pos"])
        .groupBy("cell")
        .agg(F.sum((F.col("m") - F.col("qc")) * (F.col("m") - F.col("qc"))).alias("d"))
    )
    dim = len(emb.select("embedding").first()[0])
    for r in resid.collect():
        assert r["d"] <= 4 * dim  # <= (2 micro-units)^2 per dim of rounding slack
    # base drift is nonzero somewhere (seeded centroids are not means)
    assert sum(r["drift_micro"] for r in base.collect()) > 0


# --- q90: curriculum order -----------------------------------------------------


curriculum_order_sql = E.curriculum_order_sql


def _q90(spark):
    from datacatalog_tag_engine_spark.pipeline.sampling import curriculum_order

    scores = TXT.quality_scores(spark.table("documents")).select(
        "doc_id", "quality_score"
    )
    return curriculum_order(scores)


def test_oracle_draft_curriculum_order(spark, ddb):
    got = _rows(_q90(spark))
    want = _sql_rows(ddb, curriculum_order_sql(E.oracle_sql()["t02_quality"]))
    assert got == want
    assert len(got) == spark.table("documents").count()


def test_global_rank_equals_window_rank_and_avoids_single_task(spark):
    """global_rank (range partition + offsets) is bit-identical to the
    window row_number under the same strict total order, ntile derived
    from it matches F.ntile, and the plan it builds carries NO
    `Exchange SinglePartition` / single-task window — the 100 TB
    property the window form lacks."""
    from pyspark.sql.window import Window

    from datacatalog_tag_engine_spark.pipeline.sampling import (
        _ntile_from_rank,
        global_rank,
    )

    scores = TXT.quality_scores(spark.table("documents")).select(
        "doc_id", "quality_score"
    )
    order = [F.col("quality_score").desc(), F.col("doc_id")]
    got = {
        r["doc_id"]: r["_rank"]
        for r in global_rank(scores, order, rank_col="_rank").collect()
    }
    w = Window.orderBy(*order)
    want_df = scores.select(
        "doc_id",
        F.row_number().over(w).alias("_rank"),
        F.ntile(7).over(w).alias("_nt"),
    )
    want = {r["doc_id"]: (r["_rank"], r["_nt"]) for r in want_df.collect()}
    n = len(want)
    assert got == {k: v[0] for k, v in want.items()}
    # the exact NTILE formula reproduces the engine ntile from the rank
    derived = {
        r["doc_id"]: r["nt"]
        for r in global_rank(scores, order, rank_col="_rank")
        .select("doc_id", _ntile_from_rank(F.col("_rank"), n, 7).alias("nt"))
        .collect()
    }
    assert derived == {k: v[1] for k, v in want.items()}
    # plan property: the scalable form never exchanges to one partition
    # (the pre-checkpoint range stage is rangepartitioning; the window
    # form is SinglePartition)
    ranged_plan = scores.repartitionByRange(8, *order)._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in ranged_plan
    window_plan = want_df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in window_plan  # the hazard global_rank removes
    # the strategy gate: forcing the scale path (window_max=0) yields
    # the SAME rows the small-path window form yields
    from datacatalog_tag_engine_spark.pipeline.sampling import curriculum_order

    small = _rows(curriculum_order(scores))
    scale = _rows(curriculum_order(scores, window_max=0))
    assert small == scale


def test_curriculum_order_is_clean_first_and_mixed_within(spark):
    """Stage 1 holds the top-quality docs (every stage-1 score >= every
    stage-10 score), ranks are a permutation of 1..n contiguous by
    stage, and within a stage the order is NOT score-sorted (the md5
    shuffle actually mixes)."""
    from datacatalog_tag_engine_spark.pipeline.sampling import curriculum_order

    scores = TXT.quality_scores(spark.table("documents")).select(
        "doc_id", "quality_score"
    )
    out = curriculum_order(scores).join(scores, "doc_id").collect()
    n = len(out)
    assert sorted(r["curriculum_rank"] for r in out) == list(range(1, n + 1))
    by_stage: dict[int, list] = {}
    for r in out:
        by_stage.setdefault(r["stage"], []).append(r)
    assert min(r["quality_score"] for r in by_stage[1]) >= max(
        r["quality_score"] for r in by_stage[max(by_stage)]
    )
    # ranks are contiguous per stage (a loader can stream stage by stage)
    hi = 0
    for s in sorted(by_stage):
        ranks = sorted(r["curriculum_rank"] for r in by_stage[s])
        assert ranks[0] == hi + 1 and ranks[-1] == hi + len(ranks)
        hi = ranks[-1]
    # within stage 1, rank order is not score order (the shuffle mixes)
    s1 = sorted(by_stage[1], key=lambda r: r["curriculum_rank"])
    s1_scores = [r["quality_score"] for r in s1]
    assert s1_scores != sorted(s1_scores, reverse=True)


# --- m06: payload size profile -------------------------------------------------


payload_size_profile_sql = E.payload_size_profile_sql


def test_oracle_draft_payload_size_profile(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import multimodal as MM

    feats = MM.extract_features(MM.make_fake_media(spark, n=16))
    got = _rows(MM.payload_size_profile(feats))
    want = _sql_rows(ddb, payload_size_profile_sql(E.oracle_sql()["m01_multimodal_features"]))
    assert got == want
    assert len(got) == 3  # image / audio / video


# --- d20: shingle df profile ---------------------------------------------------


shingle_df_profile_sql = E.shingle_df_profile_sql


def test_oracle_draft_shingle_df_profile(spark, ddb):
    got = _rows(DD.shingle_df_profile(spark.table("documents")))
    want = _sql_rows(ddb, shingle_df_profile_sql())
    assert got == want
    assert len(got) > 1


def test_shingle_df_profile_predicts_the_cap_mass(spark):
    """The histogram's bucket boundaries are exact powers of two, the
    shares sum to 1, and the mass above a cap read FROM the histogram
    equals the rows a real max_df filter drops (the table is the cap's
    evidence, not an approximation) — checked at cap 2^b boundaries
    where buckets align exactly."""
    docs = spark.table("documents")
    rows = DD.shingle_df_profile(docs).collect()
    assert abs(sum(r["rows_share"] for r in rows) - 1.0) < 1e-4
    sh = DD.shingle_table(docs).select(F.xxhash64("shingle").alias("_h"))
    dfq = sh.groupBy("_h").agg(F.count("*").alias("df"))
    for cap_pow in (1, 2, 3):
        cap = 2**cap_pow - 1  # buckets 0..cap_pow-1 hold df <= cap
        hist_mass = sum(r["n_rows"] for r in rows if r["df_bucket"] >= cap_pow)
        real_mass = (
            dfq.filter(F.col("df") > cap).agg(F.sum("df")).first()[0] or 0
        )
        assert hist_mass == real_mass


# --- s29: quantizer drift from index -------------------------------------------


def test_oracle_draft_quantizer_drift_from_index(spark, ddb, tmp_path):
    """Fresh-index identity: the stored assignment equals the ranked
    assignment, so the persisted form replays the s28 oracle verbatim
    (the s20 pattern) AND equals the in-memory quantizer_drift."""
    emb = spark.table("embeddings")
    path = str(tmp_path / "ivf_drift")
    SIM.build_ivf_index(emb, path, num_cells=8)
    got = _rows(SIM.quantizer_drift_from_index(spark, path))
    assert got == _sql_rows(ddb, quantizer_drift_sql())
    assert got == _rows(SIM.quantizer_drift(emb))


def test_quantizer_drift_from_index_localizes_appends(spark, tmp_path):
    """An append under the frozen quantizer grows drift ONLY in the
    cells the new mass landed in; untouched cells keep their exact
    drift value. A codes layout is rejected."""
    import pytest as _pytest

    emb = spark.table("embeddings")
    path = str(tmp_path / "ivf_drift2")
    SIM.build_ivf_index(emb.filter(F.col("vec_id") < 100), path, num_cells=8)
    before = {r["cell"]: r["drift_micro"] for r in SIM.quantizer_drift_from_index(spark, path).collect()}
    n = SIM.append_to_ivf_index(spark, path, emb.filter(F.col("vec_id") >= 100))
    assert n > 0
    touched = {
        r["cell"]
        for r in spark.read.parquet(path)
        .filter(F.col("vec_id") >= 100)
        .select("cell")
        .distinct()
        .collect()
    }
    after = {r["cell"]: r["drift_micro"] for r in SIM.quantizer_drift_from_index(spark, path).collect()}
    untouched = set(before) - touched
    assert all(after[c] == before[c] for c in untouched)
    assert any(after[c] != before.get(c) for c in touched)
    pq_path = str(tmp_path / "pq_drift")
    SIM.build_ivfpq_index(emb, pq_path, num_cells=8)
    with _pytest.raises(ValueError, match="raw-vector"):
        SIM.quantizer_drift_from_index(spark, pq_path)


# --- q91: stage mixture --------------------------------------------------------


stage_mixture_sql = E.stage_mixture_sql


def _q91(spark):
    from datacatalog_tag_engine_spark.pipeline.sampling import stage_mixture

    docs = spark.table("documents")
    cur = _q90(spark)
    return stage_mixture(cur, docs)


def test_oracle_draft_stage_mixture(spark, ddb):
    got = _rows(_q91(spark))
    want = _sql_rows(
        ddb, stage_mixture_sql(curriculum_order_sql(E.oracle_sql()["t02_quality"]))
    )
    assert got == want
    assert len(got) > 5


def test_stage_mixture_sums_and_flags_skew(spark):
    """Per-stage shares sum to 1; a constructed quality-correlated
    corpus (one source strictly cleaner) shows the skew this table
    exists to flag — its top stage is dominated by the clean source."""
    from datacatalog_tag_engine_spark.pipeline.sampling import (
        curriculum_order,
        stage_mixture,
    )

    clean = [(i, "clean", float(100 - i)) for i in range(20)]
    dirty = [(100 + i, "dirty", float(10 - i * 0.1)) for i in range(20)]
    scores = spark.createDataFrame(
        clean + dirty, "doc_id long, source string, quality_score double"
    )
    docs = scores.select("doc_id", "source")
    cur = curriculum_order(scores.select("doc_id", "quality_score"), n_stages=4)
    out = stage_mixture(cur, docs).collect()
    import collections

    per_stage = collections.defaultdict(float)
    for r in out:
        per_stage[r["stage"]] += r["stage_share"]
    assert all(abs(v - 1.0) < 1e-4 for v in per_stage.values())
    top = {r["source"]: r["stage_share"] for r in out if r["stage"] == 1}
    assert top.get("clean", 0) == 1.0  # stage 1 is all clean docs


# --- q93: contamination threshold table ----------------------------------------


contamination_profile_sql = E.contamination_profile_sql


def _q93(spark):
    docs = spark.table("documents")
    conta = TXT.contamination_check(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
        n=5,
    )
    return TXT.contamination_profile(conta)


def test_oracle_draft_contamination_profile(spark, ddb):
    got = _rows(_q93(spark))
    want = _sql_rows(ddb, contamination_profile_sql(E.oracle_sql()["t10_contamination"]))
    assert got == want
    assert len(got) >= 1


def test_contamination_profile_is_a_decision_table(spark):
    """Constructed bands: clean docs (0 matched), half-contaminated,
    fully contaminated — frac sums to 1, the cumulative column is the
    exact drop fraction at each band edge, full containment lands in
    the LAST band (clamped), zero in band 0."""
    rows = [
        (1, 10, 0), (2, 10, 0), (3, 10, 0),   # 0%
        (4, 10, 5), (5, 10, 5),               # 50%
        (6, 10, 10),                          # 100% -> clamped band 9
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_shingles long, n_matched long")
    out = {r["bucket"]: r for r in TXT.contamination_profile(df).collect()}
    assert set(out) == {0, 5, 9}
    assert out[0]["n_docs"] == 3 and out[5]["n_docs"] == 2 and out[9]["n_docs"] == 1
    assert abs(sum(r["frac_docs"] for r in out.values()) - 1.0) < 1e-6
    # dropping at >= 50% removes 3/6; at >= 90% removes 1/6
    assert out[5]["cum_frac_at_or_above"] == 0.5
    assert out[9]["cum_frac_at_or_above"] == round(1 / 6, 6)
    assert out[0]["cum_frac_at_or_above"] == 1.0


# --- t36: language-id margin ---------------------------------------------------


langid_margin_sql = E.langid_margin_sql


def test_oracle_draft_langid_margin(spark, ddb):
    got = _rows(TXT.language_id_margin(spark.table("documents")))
    want = _sql_rows(ddb, langid_margin_sql())
    assert got == want
    assert len(got) == spark.table("documents").count()


def test_langid_margin_is_the_routing_surface(spark):
    """Margin semantics: a clearly-English doc scores a wide margin; a
    doc mixing equal en/de markers has margin 0 with the tie-broken
    'en' label (exactly the doc to route onward); a doc with no
    markers is 'und' with zeros; lang_pred always equals t03's."""
    rows = [
        (1, "the cat and the dog is in the house with food for it"),
        (2, "der code und the stack is ein mess mit bugs for now"),
        (3, "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in TXT.language_id_margin(df).collect()}
    assert out[1]["lang_pred"] == "en" and out[1]["margin"] >= 3
    assert out[2]["margin"] <= 1  # contested
    assert out[3]["lang_pred"] == "und" and out[3]["best_hits"] == 0
    t03 = {r["doc_id"]: r["lang_pred"] for r in TXT.language_id(df).collect()}
    assert {k: v["lang_pred"] for k, v in out.items()} == t03


# --- q94: shard-export verification --------------------------------------------


verify_shards_sql = E.verify_shards_sql


def test_oracle_draft_verify_training_shards(spark, ddb, tmp_path):
    from datacatalog_tag_engine_spark.pipeline.export import (
        verify_training_shards,
        write_training_shards,
    )

    docs = spark.table("documents").select("doc_id", "text")
    path = str(tmp_path / "export_v")
    write_training_shards(docs, path, 8)
    got = _rows(verify_training_shards(spark, path))
    want = _sql_rows(ddb, verify_shards_sql(8))
    assert got == want
    assert len(got) == 8


def test_verify_training_shards_catches_corruption(spark, tmp_path):
    """A deleted shard file and a stray extra file each flip exactly
    their own shard's ok to False (missing rows / surplus rows), every
    other shard stays green; the json layout verifies too."""
    import glob
    import os
    import shutil

    from datacatalog_tag_engine_spark.pipeline.export import (
        verify_training_shards,
        write_training_shards,
    )

    docs = spark.table("documents").select("doc_id", "text")
    path = str(tmp_path / "export_c")
    write_training_shards(docs, path, 8)
    # corrupt shard 3: delete its data file; corrupt shard 5: copy
    # shard 2's file in as a stray duplicate
    victim = glob.glob(os.path.join(path, "shard=3", "*.parquet"))[0]
    os.remove(victim)
    donor = glob.glob(os.path.join(path, "shard=2", "*.parquet"))[0]
    shutil.copy(donor, os.path.join(path, "shard=5", "stray.parquet"))
    spark.catalog.refreshByPath(path)
    out = {r["shard"]: r for r in verify_training_shards(spark, path).collect()}
    assert not out[3]["ok"] and out[3]["disk_docs"] == 0
    assert not out[5]["ok"] and out[5]["disk_docs"] > out[5]["manifest_docs"]
    assert all(out[s]["ok"] for s in out if s not in (3, 5))
    # json layout round-trip
    jpath = str(tmp_path / "export_j")
    write_training_shards(docs, jpath, 4, data_format="json", compression="gzip")
    jout = verify_training_shards(spark, jpath, data_format="json").collect()
    assert len(jout) == 4 and all(r["ok"] for r in jout)


# --- q95: source-relative curriculum -------------------------------------------


source_relative_curriculum_sql = E.source_relative_curriculum_sql


def _q95(spark):
    from datacatalog_tag_engine_spark.pipeline.sampling import (
        curriculum_order,
        source_relative_scores,
    )

    docs = spark.table("documents")
    scored = TXT.quality_scores(docs).select("doc_id", "quality_score").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return curriculum_order(source_relative_scores(scored))


def test_oracle_draft_source_relative_curriculum(spark, ddb):
    got = _rows(_q95(spark))
    want = _sql_rows(
        ddb, source_relative_curriculum_sql(E.oracle_sql()["t02_quality"])
    )
    assert got == want
    assert len(got) == spark.table("documents").count()


def test_source_relative_curriculum_fixes_the_stage_skew(spark):
    """The q91 skew fixture (one source strictly out-scores the other
    wholesale): the RAW curriculum's stage 1 is 100% clean docs; the
    source-relative curriculum's stages mix both sources at the corpus
    ratio (up to per-stage integer rounding) while still putting each
    source's own best docs first."""
    from datacatalog_tag_engine_spark.pipeline.sampling import (
        curriculum_order,
        source_relative_scores,
        stage_mixture,
    )

    clean = [(i, "clean", float(100 - i)) for i in range(20)]
    dirty = [(100 + i, "dirty", float(10 - i * 0.1)) for i in range(20)]
    scored = spark.createDataFrame(
        clean + dirty, "doc_id long, source string, quality_score double"
    )
    docs = scored.select("doc_id", "source")
    raw_top = {
        r["source"]: r["stage_share"]
        for r in stage_mixture(
            curriculum_order(scored.select("doc_id", "quality_score"), n_stages=4),
            docs,
        ).collect()
        if r["stage"] == 1
    }
    assert raw_top.get("clean", 0) == 1.0  # the skew
    rel = stage_mixture(
        curriculum_order(source_relative_scores(scored), n_stages=4), docs
    ).collect()
    for r in rel:
        assert abs(r["stage_share"] - 0.5) <= 0.11, r  # corpus ratio +/- rounding
    # within each source, earlier stages hold the higher raw scores
    cur = curriculum_order(source_relative_scores(scored), n_stages=4)
    j = {r["doc_id"]: r["stage"] for r in cur.collect()}
    by_src = {"clean": clean, "dirty": dirty}
    for src, rows in by_src.items():
        ordered = sorted(rows, key=lambda t: -t[2])  # best raw first
        stages = [j[i] for i, _, _ in ordered]
        assert stages == sorted(stages), src


def test_quality_scores_survive_emptied_docs(spark):
    """Surgery stages (span removal, line dedup) can empty a doc's
    text; quality_scores must score it all-zero instead of dying on
    ANSI division-by-zero — the corpus_prep example composes exactly
    this chain. Non-empty values are untouched (guarded denominator
    only engages at n_chars == 0)."""
    rows = [(1, ""), (2, None), (3, "a normal document with the usual words in it")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in TXT.quality_scores(df).collect()}
    assert out[1]["punct_ratio"] == 0.0 and out[1]["alpha_ratio"] == 0.0
    assert out[1]["quality_score"] is not None
    # NULL text composite was 0.0 BEFORE the guard too (the
    # null-skipping greatest(0.0, NULL)) — pinned as-is
    assert out[2]["quality_score"] == 0.0
    assert out[3]["alpha_ratio"] > 0.5


# --- t37: heavy hitters ----------------------------------------------------


heavy_hitters_sql = E.heavy_hitters_sql


def test_oracle_draft_heavy_hitters(spark, ddb):
    got = _rows(TXT.heavy_hitter_tokens(spark.table("documents"), k=100))
    assert got == _sql_rows(ddb, heavy_hitters_sql(100))
    assert len(got) > 0


def test_heavy_hitters_partition_independent_and_complete(spark):
    """The Misra-Gries candidate union is a GUARANTEE, not a
    heuristic: the exact output is identical across partitionings
    (budget at its k floor included), and a planted token just over
    the threshold is found while one just under is not."""
    docs = spark.table("documents")
    base = _rows(TXT.heavy_hitter_tokens(docs, k=100, candidate_budget=1024))
    assert base == _rows(
        TXT.heavy_hitter_tokens(docs.repartition(13), k=100, candidate_budget=100)
    )
    assert base == _rows(
        TXT.heavy_hitter_tokens(docs.repartition(1), k=100, candidate_budget=100)
    )
    # planted boundary: 40 filler singletons + one token x11 and one
    # token x10 -> N=61, k=6: threshold N/k ~ 10.17 (count*6 > 61)
    rows = [(i, f"filler{i}") for i in range(40)]
    rows.append((100, " ".join(["hot"] * 11)))
    rows.append((101, " ".join(["warm"] * 10)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # _rows sorts columns alphabetically: (n_occurrences, token)
    got = {r[1]: r[0] for r in _rows(TXT.heavy_hitter_tokens(df, k=6, candidate_budget=6))}
    assert got == {"hot": 11}


# --- q97: corpus snapshot diff ----------------------------------------------


snapshot_diff_sql = E.snapshot_diff_sql


def _q97(spark):
    from datacatalog_tag_engine_spark.pipeline.profiling import corpus_snapshot_diff

    docs = spark.table("documents")
    old = docs.filter(F.col("doc_id") % 17 != 0)
    new = docs.filter(F.col("doc_id") % 13 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return corpus_snapshot_diff(old, new)


def test_oracle_draft_snapshot_diff(spark, ddb):
    got = _rows(_q97(spark))
    assert got == _sql_rows(ddb, snapshot_diff_sql())
    assert len(got) > 0


def test_snapshot_diff_identity_and_disjoint(spark):
    """Diffing a corpus against itself is all-unchanged with zero
    token delta; diffing against the empty corpus is all-removed with
    the full (negative) token mass."""
    from datacatalog_tag_engine_spark.pipeline.profiling import corpus_snapshot_diff

    docs = spark.table("documents")
    same = corpus_snapshot_diff(docs, docs).collect()
    n_docs = docs.count()
    assert sum(r["n_unchanged"] for r in same) == n_docs
    assert all(
        r["n_added"] == r["n_removed"] == r["n_changed"] == r["token_delta"] == 0
        for r in same
    )
    gone = corpus_snapshot_diff(docs, docs.filter(F.lit(False))).collect()
    assert sum(r["n_removed"] for r in gone) == n_docs
    assert sum(r["token_delta"] for r in gone) < 0


# --- q98: gate overlap matrix ------------------------------------------------


gate_overlap_sql = E.gate_overlap_sql


def test_oracle_draft_gate_overlap(spark, ddb):
    got = _rows(TXT.gate_overlap_matrix(spark.table("documents")))
    assert got == _sql_rows(ddb, gate_overlap_sql(E.oracle_sql()["t16_gopher_filter"]))
    assert len(got) > 0


def test_gate_overlap_diagonal_is_the_marginal(spark):
    """The diagonal equals each gate's solo firing count from the t16
    surface, and every off-diagonal pair count is bounded by both of
    its marginals (co-fire can't exceed either gate alone)."""
    docs = spark.table("documents")
    mat = {
        (r["gate_a"], r["gate_b"]): r["n_docs"]
        for r in TXT.gate_overlap_matrix(docs).collect()
    }
    solo = {
        r["g"]: r["n"]
        for r in TXT.gopher_filter(docs)
        .select(F.explode("fail_reasons").alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {g: mat[(g, g)] for g in solo} == solo
    for (a, b), n in mat.items():
        assert n <= solo[a] and n <= solo[b]


# --- s30: knn graph -----------------------------------------------------------


knn_graph_sql = E.knn_graph_sql


def test_oracle_draft_knn_graph(spark, ddb):
    got = _rows(SIM.knn_graph(spark.table("embeddings"), k=5, num_cells=8))
    assert got == _sql_rows(ddb, knn_graph_sql(5, 8))
    assert len(got) > 0


def test_knn_graph_brute_parity_and_mutual_symmetry(spark):
    """nprobe == num_cells degenerates to exact brute force — the
    determinism-contract parity that keeps the non-broadcast self-join
    from drifting off _topk_by_key; and the mutual flag is symmetric
    by construction (edge (a,b) mutual iff (b,a) exists AND is also
    flagged)."""
    emb = spark.table("embeddings")
    brute = _rows(
        SIM.brute_force_topk(emb, emb, k=5).select(
            F.col("query_id").alias("vec_id"), "neighbor_id", "cosine", "rank"
        )
    )
    graph = SIM.knn_graph(emb, k=5, num_cells=8, nprobe=8)
    assert _rows(graph.select("vec_id", "neighbor_id", "cosine", "rank")) == brute
    edges = {(r["vec_id"], r["neighbor_id"]): r["mutual"] for r in graph.collect()}
    for (a, b), m in edges.items():
        assert m == ((b, a) in edges)
        if m:
            assert edges[(b, a)]


# --- s31: knn graph from a persisted index -------------------------------------


def test_oracle_draft_knn_graph_from_index(spark, ddb, tmp_path):
    """Fresh-index identity: the stored assignment equals the ranked
    assignment, so the persisted form replays the s30 oracle verbatim
    (the s20/s29 pattern — one oracle serves both forms)."""
    p = str(tmp_path / "ivf_knn")
    SIM.build_ivf_index(spark.table("embeddings"), p, num_cells=8)
    got = _rows(SIM.knn_graph_from_index(spark, p, k=5))
    assert got == _sql_rows(ddb, knn_graph_sql(5, 8))
    assert len(got) > 0


def test_knn_graph_from_index_append_localizes(spark, tmp_path):
    """The delta-priced-refresh property: after append_to_ivf_index,
    only the appended-into cells' edges change — every untouched
    cell's neighborhood is bit-identical, so a nightly graph refresh
    rewrites exactly the dirty cells (the q79/s21 discipline applied
    to the graph)."""
    emb = spark.table("embeddings")
    p = str(tmp_path / "ivf_knn_app")
    SIM.build_ivf_index(emb.filter(F.col("vec_id") < 400), p, num_cells=8)
    assign = {
        r["vec_id"]: r["cell"]
        for r in spark.read.parquet(p).select("vec_id", "cell").collect()
    }
    before = SIM.knn_graph_from_index(spark, p, k=5).collect()
    delta = emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 403))
    SIM.append_to_ivf_index(spark, p, delta)
    appended_cells = {
        r["cell"]
        for r in spark.read.parquet(p)
        .filter(F.col("vec_id") >= 400)
        .select("cell")
        .distinct()
        .collect()
    }
    assert appended_cells and len(appended_cells) < 8  # a genuine partial touch
    after = SIM.knn_graph_from_index(spark, p, k=5).collect()

    def clean_edges(rows):
        return sorted(
            (r["vec_id"], r["neighbor_id"], float(r["cosine"]), r["rank"], r["mutual"])
            for r in rows
            if assign.get(r["vec_id"]) not in appended_cells
            and r["vec_id"] in assign
        )

    assert clean_edges(before) == clean_edges(after)
    # and the appended cells DID change (new members join the graph)
    assert {r["vec_id"] for r in after} > {r["vec_id"] for r in before}


def test_knn_graph_from_index_nprobe_parity(spark, tmp_path):
    """nprobe > 1 on a FRESH index equals the live form at the same
    nprobe (stored assignment == ranked assignment, and the persisted
    centroids are the ones the live form seeds), so the serving form's
    spill-cell ranking cannot drift off the s03/s04 probe semantics."""
    emb = spark.table("embeddings")
    p = str(tmp_path / "ivf_knn_np")
    SIM.build_ivf_index(emb, p, num_cells=8)
    got = _rows(SIM.knn_graph_from_index(spark, p, k=5, nprobe=2))
    live = _rows(SIM.knn_graph(emb, k=5, num_cells=8, nprobe=2))
    assert got == live and len(got) > 0
