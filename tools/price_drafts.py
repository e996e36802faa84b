"""Price the r13 bank operators at sf0.1 (single warm pass each) —
the baseline the r13 rotation will be judged against, and the early
check that none of the queued operators is a scale-killer before it
enters the certified inventory. (The r12 queue graduated into the
inventory at the r12 rotation; bench.py prices it now. d23 and the
heavy-hitter replay graduated early, same round.)

Usage: python tools/price_drafts.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline import dedup as DD
from datacatalog_tag_engine_spark.pipeline import similarity as SIM
from datacatalog_tag_engine_spark.pipeline import text as TXT
from datacatalog_tag_engine_spark.session import get_spark, register_testdata


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("price-drafts")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, sf)
    docs = spark.table("documents")
    emb = spark.table("embeddings")


    cases = {
        # --- r13 bank (built after the r12 window was sized) ---
        "d22_clusters_star": lambda: DD.neardup_clusters_star(
            docs, DD.minhash_dedup(docs)
        ),
        "t39_line_lang_profile": lambda: TXT.line_language_profile(docs),
        "t40_line_repetition": lambda: TXT.line_repetition_signals(docs),
        "t41_ngram_coverage": lambda: TXT.ngram_coverage_signals(docs),
        "s32_mutual_knn_clusters": lambda: SIM.mutual_knn_clusters(
            emb, k=5, num_cells=8
        ),
        "q100_score_gate_calibration": lambda: __import__(
            "datacatalog_tag_engine_spark.pipeline.profiling",
            fromlist=["score_gate_calibration"],
        ).score_gate_calibration(docs),
        "t42_pii_incidence": lambda: TXT.pii_incidence(docs),
        "t43_winnowing": lambda: TXT.winnowing_fingerprints(docs),
        "d24_threshold_sweep": lambda: DD.candidate_threshold_sweep(docs),
        "d25_winnowing_overlap": lambda: DD.winnowing_overlap_pairs(docs),
        "d26_cluster_purity": lambda: DD.cluster_purity(
            docs, DD.neardup_clusters(docs, DD.minhash_dedup(docs))
        ),
        "q101_shard_skew": lambda: __import__(
            "datacatalog_tag_engine_spark.pipeline.export",
            fromlist=["shard_skew_profile"],
        ).shard_skew_profile(
            docs.select(
                __import__(
                    "datacatalog_tag_engine_spark.pipeline.sampling",
                    fromlist=["hash_bucket"],
                ).hash_bucket(F.col("doc_id"), 16).alias("shard")
            )
            .groupBy("shard")
            .agg(F.count("*").alias("n_docs"))
        ),
    }
    out = {}
    for name, fn in cases.items():
        t0 = time.time()
        fn().count()
        out[name] = round(time.time() - t0, 3)
    print(json.dumps({"sf_dir": sf, "single_warm_pass_sec": out}))


if __name__ == "__main__":
    main()
