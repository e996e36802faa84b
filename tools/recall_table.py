"""ANN recall@k: trained vs deterministic quantizers (r8 ask #1).

Measures recall against the exact ground truth for every quantizer
configuration the module ships, on the driver-generated embeddings
table. Ground truth matches each surface's own metric: ivf_topk ranks
by cosine, so its truth is brute_force_topk (exact cosine); the PQ
family scores asymmetric L2, so its truth is the exact squared-L2
top-k. 20 queries (first by vec_id), k=5, num_cells=8, nprobe=2 — the
same harness shape as the r6 residual measurement this table
supersedes.

Prints a markdown table (pasted into SCALE.md) plus one JSON line.

Usage: python tools/recall_table.py [sf_dir ...]
(default /root/testdata/sf0.001)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline import similarity as SIM
from datacatalog_tag_engine_spark.session import get_spark, load_parquet

K = 5
N_QUERIES = 20
NUM_CELLS = 8
NPROBE = 2


def exact_l2_topk(emb, qs, k):
    """Exact squared-L2 top-k (the PQ family's ground truth)."""
    c = emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").cast("array<double>").alias("cv"))
    q = qs.select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").cast("array<double>").alias("qv"))
    d = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    scored = (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", d.alias("d"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def recall(approx, truth):
    """Mean fraction of the true top-k recovered, over all queries."""
    t = {(r["query_id"], r["neighbor_id"]) for r in truth.select("query_id", "neighbor_id").collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.select("query_id", "neighbor_id").collect()}
    by_q: dict = {}
    for qid, nid in t:
        by_q.setdefault(qid, [0, 0])
        by_q[qid][1] += 1
        if (qid, nid) in a:
            by_q[qid][0] += 1
    return round(sum(h / n for h, n in by_q.values()) / len(by_q), 3)


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001"]
    spark = get_spark("recall-table")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for sf in sf_dirs:
        emb = load_parquet(spark, os.path.join(sf, "embeddings.parquet")).localCheckpoint(eager=True)
        qs = emb.orderBy("vec_id").limit(N_QUERIES).localCheckpoint(eager=True)
        truth_cos = SIM.brute_force_topk(emb, qs, k=K)
        truth_l2 = exact_l2_topk(emb, qs, K)

        cents_exact = SIM.kmeans_centroids_exact(emb, num_cells=NUM_CELLS).select(
            "cell", "cent_v"
        ).localCheckpoint(eager=True)
        cents_mllib = SIM.kmeans_centroids(emb, num_cells=NUM_CELLS).localCheckpoint(eager=True)

        def ivf(cents=None):
            return SIM.ivf_topk(emb, qs, k=K, num_cells=NUM_CELLS, nprobe=NPROBE, cents=cents)

        def ivfpq(**kw):
            return SIM.ivfpq_topk(emb, qs, k=K, num_cells=NUM_CELLS, nprobe=NPROBE, **kw)

        rows = [
            ("ivf_topk", "seeded", "cosine", recall(ivf(), truth_cos)),
            ("ivf_topk", "kmeans-exact", "cosine", recall(ivf(cents_exact), truth_cos)),
            ("ivf_topk", "kmeans-mllib", "cosine", recall(ivf(cents_mllib), truth_cos)),
            ("ivfpq global", "seeded", "L2", recall(ivfpq(), truth_l2)),
            ("ivfpq global", "kmeans cents", "L2", recall(ivfpq(cents=cents_exact), truth_l2)),
            ("ivfpq global", "kmeans cents+codebook", "L2",
             recall(ivfpq(cents=cents_exact, train_codebook=True), truth_l2)),
            ("ivfpq residual", "seeded", "L2", recall(ivfpq(by_residual=True), truth_l2)),
            ("ivfpq residual", "kmeans cents", "L2",
             recall(ivfpq(by_residual=True, cents=cents_exact), truth_l2)),
            ("ivfpq residual", "kmeans cents+codebook", "L2",
             recall(ivfpq(by_residual=True, cents=cents_exact, train_codebook=True), truth_l2)),
        ]
        n = emb.count()
        print(f"\n### recall@{K} at {sf} ({n} vectors, {N_QUERIES} queries, "
              f"num_cells={NUM_CELLS}, nprobe={NPROBE})\n")
        print("| surface | quantizers | truth metric | recall@5 |")
        print("|---|---|---|---|")
        for surface, quant, metric, r in rows:
            print(f"| {surface} | {quant} | {metric} | {r} |")
        out[sf] = {f"{s}/{q}": r for s, q, _, r in rows}

        # --- r9 composition: does exact re-ranking mask codebook
        # quality? {seeded, trained} x {ADC, rerank}, all against the
        # serving-relevant truth (brute-force cosine, the contract
        # rerank shares with s01) ---
        def rerank(**kw):
            return SIM.ivfpq_topk_rerank(
                emb, qs, k=K, shortlist=4 * K, num_cells=NUM_CELLS,
                nprobe=NPROBE, **kw,
            )

        comp = [
            ("ADC ranking", "seeded", recall(ivfpq(), truth_cos)),
            ("ADC ranking", "trained (cents+codebook)",
             recall(ivfpq(cents=cents_exact, train_codebook=True), truth_cos)),
            ("exact rerank", "seeded", recall(rerank(), truth_cos)),
            ("exact rerank", "trained (cents+codebook)",
             recall(rerank(cents=cents_exact, train_codebook=True), truth_cos)),
        ]
        print(f"\n### rerank x trained-codebook composition at {sf} "
              f"(truth = brute-force cosine, shortlist={4 * K})\n")
        print("| ranking | quantizers | recall@5 |")
        print("|---|---|---|")
        for surface, quant, r in comp:
            print(f"| {surface} | {quant} | {r} |")
        out[sf + "/composition"] = {f"{s}/{q}": r for s, q, r in comp}

        # --- r9 sweep: which knob buys recall — nprobe (more cells in
        # the shortlist pool) or shortlist (more ADC candidates kept
        # for exact scoring)? seeded quantizers (the serving default) ---
        sweep = {}
        print(f"\n### rerank recall@{K} sweep at {sf} "
              f"(seeded quantizers, rows=nprobe, cols=shortlist)\n")
        shortlists = [K, 4 * K, 8 * K]
        print("| nprobe \\ shortlist | " + " | ".join(str(s) for s in shortlists) + " |")
        print("|---|" + "---|" * len(shortlists))
        for np_ in (1, 2, 4):
            vals = []
            for sl in shortlists:
                r = recall(
                    SIM.ivfpq_topk_rerank(
                        emb, qs, k=K, shortlist=sl, num_cells=NUM_CELLS, nprobe=np_
                    ),
                    truth_cos,
                )
                vals.append(r)
                sweep[f"nprobe={np_}/shortlist={sl}"] = r
            print(f"| {np_} | " + " | ".join(str(v) for v in vals) + " |")
        out[sf + "/sweep"] = sweep
    print(json.dumps(out))


if __name__ == "__main__":
    main()
