"""Round-14 optimization pins: internals changed for speed must stay
bit-identical to the expression forms they replaced.

- _cogroup_scored_pairs (the corpus-scale kNN scoring path) vs the
  shuffle-join + dot_expr form it replaced: every raw cosine equal.
- winnowing_contamination's localCheckpoint barrier: same output as a
  barrier-free reference composition.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline import similarity as S


def _vecs(spark, n=120, dim=7, cells=5):
    # deterministic ragged-magnitude vectors across a handful of cells
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, {d}), i -> "
            "cast(pmod(id * 31 + i * 17, 97) as double) / 97.0 - 0.5)".format(d=dim)
        ).alias("embedding"),
    )


def test_cogroup_scoring_bit_identical_to_join_expression(spark):
    emb = _vecs(spark)
    ranked = S._ranked_cells(emb, 5, "vec_id", "embedding")
    members = ranked.filter(F.col("_rn") == 1).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), "cell"
    )
    probes = ranked.filter(F.col("_rn") <= 1).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cell"
    )
    qn = probes.withColumn("_qn", S.norm_expr(F.col("qv")))
    cn = members.withColumn("_cn", S.norm_expr(F.col("cv")))
    via_cogroup = S._cogroup_scored_pairs(qn, cn, "cell")
    via_join = (
        qn.join(cn, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                S.dot_expr(F.col("qv"), F.col("cv")) / (F.col("_qn") * F.col("_cn")),
                4,
            ).alias("cosine"),
        )
    )
    a = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in via_cogroup.collect()}
    b = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in via_join.collect()}
    assert a == b and len(a) > 0


def test_topk_by_key_paths_agree(spark):
    # broadcast (expression) vs corpus-scale (cogroup) branch on the
    # same keyed inputs must produce the same edges
    emb = _vecs(spark)
    ranked = S._ranked_cells(emb, 5, "vec_id", "embedding")
    members = ranked.filter(F.col("_rn") == 1).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"), "cell"
    )
    probes = ranked.filter(F.col("_rn") <= 1).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cell"
    )
    bc = S._topk_by_key(probes, members, 4, "cell", broadcast_queries=True)
    cg = S._topk_by_key(probes, members, 4, "cell", broadcast_queries=False)
    rows = lambda df: sorted(map(tuple, df.collect()))
    assert rows(bc) == rows(cg)


def test_winnowing_contamination_barrier_value_identical(spark):
    from datacatalog_tag_engine_spark.pipeline.dedup import winnowing_contamination
    from datacatalog_tag_engine_spark.pipeline.text import winnowing_fingerprints

    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("shared boilerplate header line the quick brown fox "),
            F.lit("document body segment "),
            (F.col("id") % 7).cast("string"),
            F.lit(" trailing shared benchmark answer forty two exactly"),
        ).alias("text"),
    )
    train = docs.filter(F.col("doc_id") % 10 != 0)
    test = docs.filter(F.col("doc_id") % 10 == 0)
    got = winnowing_contamination(train, test, max_df=30, min_shared=2)

    # reference composition without the checkpoint barrier
    tr = winnowing_fingerprints(train).select("doc_id", "fp").distinct()
    te = winnowing_fingerprints(test).select("doc_id", "fp").distinct()
    both = tr.select("fp").unionAll(te.select("fp"))
    hot = (
        both.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > 30)
        .select("fp")
    )
    trf = tr.join(F.broadcast(hot), "fp", "left_anti")
    tef = te.join(F.broadcast(hot), "fp", "left_anti")
    hits = (
        trf.select(F.col("doc_id").alias("train_id"), "fp")
        .join(tef.select(F.col("doc_id").alias("test_id"), "fp"), "fp")
        .groupBy("train_id", "test_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    want = (
        hits.groupBy("train_id")
        .agg(
            F.countDistinct("test_id").cast("long").alias("n_test_docs"),
            F.max("n_shared").alias("n_shared_max"),
            F.sum("n_shared").alias("n_shared_total"),
        )
        .select(
            F.col("train_id").alias("doc_id"),
            "n_test_docs",
            "n_shared_max",
            "n_shared_total",
        )
    )
    rows = lambda df: sorted(map(tuple, df.collect()))
    assert rows(got) == rows(want) and got.count() > 0

def test_nprobe_sweep_fused_matches_per_arm_reference(spark):
    # the fused sweep (one scoring pass at the widest arm, per-arm
    # filter + re-rank) must reproduce the per-arm ivf_topk +
    # recall_profile composition row for row
    emb = _vecs(spark, n=90, dim=6, cells=4)
    qs = emb.filter(F.col("vec_id") < 7)
    got = S.nprobe_recall_sweep(emb, qs, k=3, num_cells=4)

    exact = S.brute_force_topk(emb, qs, k=3)
    cents = S._default_cents(emb, 4, "vec_id", "embedding")
    assign = S._ranked_cells(emb, 4, "vec_id", "embedding", cents=cents).filter(
        F.col("_rn") == 1
    )
    sizes = assign.groupBy("cell").agg(F.count("*").alias("_sz"))
    qcells = S._ranked_cells(qs, 4, "vec_id", "embedding", cents=cents).select(
        F.col("vec_id").alias("_qid"), "cell", "_rn"
    )
    corpus_ids = assign.select(F.col("vec_id").alias("_qid"), "cell")
    want_rows = []
    for p in range(1, 5):
        probed = qcells.filter(F.col("_rn") <= p)
        rec = S.recall_profile(
            exact, S.ivf_topk(emb, qs, k=3, num_cells=4, nprobe=p, cents=cents)
        )
        agg = rec.agg(
            F.count("*").cast("long").alias("n_queries"),
            F.round(
                F.sum(F.round(F.col("recall_at_k") * 10000).cast("long"))
                / F.count("*")
            )
            .cast("long")
            .alias("mean_recall_micro"),
        ).collect()[0]
        scanned = probed.join(sizes, "cell").agg(
            F.coalesce(F.sum("_sz"), F.lit(0)).cast("long")
        ).collect()[0][0]
        self_hits = probed.join(corpus_ids, ["_qid", "cell"], "left_semi").count()
        want_rows.append(
            (p, agg["n_queries"], agg["mean_recall_micro"], scanned - self_hits)
        )
    assert sorted(map(tuple, got.collect())) == sorted(want_rows)


def test_winnowing_parameter_table_fused_matches_per_pair_reference(spark):
    # the one-scan table must equal the per-(k, w) composition over
    # winnowing_fingerprints (including a short-doc and a NULL text)
    from datacatalog_tag_engine_spark.pipeline.text import (
        winnowing_fingerprints,
        winnowing_parameter_table,
    )

    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 0, F.lit(None).cast("string"))
        .when(F.col("id") == 1, F.lit("tiny"))
        .otherwise(
            F.concat(
                F.lit("the quick brown fox jumps over the lazy dog segment "),
                (F.col("id") % 5).cast("string"),
                F.lit(" shared tail content for winnowing parameter pricing"),
            )
        )
        .alias("text"),
    )
    params = ((8, 4), (8, 8), (12, 4), (12, 8))
    got = sorted(map(tuple, winnowing_parameter_table(docs, params).collect()))
    want = []
    for k, w in params:
        n_fp = winnowing_fingerprints(docs, k=k, w=w).count()
        t = F.lower(F.coalesce(F.col("text"), F.lit("")))
        n_grams = docs.select(
            F.when(F.length(t) >= k, F.length(t) - k + 1)
            .otherwise(F.lit(0))
            .cast("long")
            .alias("_g")
        ).agg(F.sum("_g")).collect()[0][0]
        # HALF_UP like Spark's round() — python round() is half-even
        density = int(n_fp * 1e6 / n_grams + 0.5) if n_grams else None
        want.append(
            (k, w, w + k - 1, n_grams, n_fp, round(2 / (w + 1) * 1e6), density)
        )
    assert got == sorted(want) and len(got) == 4
