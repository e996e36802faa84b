"""Per-query driver-job census (r15, guide §1.1/§7): how many Spark
jobs does one pass of a query run, and how much of its wall is
per-job fixed overhead rather than data work?

At sf0.1 the corpus is tiny (documents.parquet = 0.6 MB), so multi-
second queries are usually JOB-BOUND: eager checkpoints, collects,
broadcast builds and MLlib iterations each pay scheduler + task-wave
latency that dwarfs the data math. This probe runs each query once
(after one untimed warm pass of q01 machinery) inside a job group and
reports (#jobs, wall, wall/job) so the optimization loop can rank
"cut a job" against "cut a byte".

Usage: python tools/job_probe.py [query ...]   (default: top of bench)
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "q71_export_pipeline",
    "q59v2_clean_pipeline",
    "s06_ann_ivf_kmeans",
    "d17_quality_canonical",
    "q80_incremental_pipeline",
    "s34_ivfpq_recall_from_index",
    "s36_topk_regret",
    "m07_multimodal_dup_rates",
    "d30_threshold_sweep_vs_exact",
    "t15_dsir_weights",
    "d07_semantic_dedup",
    "q104_corpus_health",
    "q47_embedding_quantize",
    "s37_nprobe_sweep",
    "s15_ivfpq_rerank_from_index",
    "s09_ivf_from_index",
    "d25_winnowing_overlap",
    "d27_winnowing_dedup",
    "d29_incremental_winnowing",
    "d28_winnowing_contamination",
    "t44_winnowing_params",
    "q106_copy_audit_profile",
    "t20_classifier_weights",
    "d22_clusters_star",
    "s12_ivfpq_residual",
    "q88_source_dup_rate",
    "d26_cluster_purity",
    "s33_recall_from_index",
    "s32_mutual_knn_clusters",
    "d16_minhash_estimate_vs_exact",
    "s26_ivfpq_compact",
    "s23_ivf_compact",
]


def main() -> None:
    import __spark_entry__ as E
    from datacatalog_tag_engine_spark.session import get_spark, register_testdata

    qs = E.queries()
    names = sys.argv[1:] or DEFAULT
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {', '.join(unknown)}")

    spark = get_spark("job-probe")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF_DIR)
    for t in ("lineitem", "documents", "embeddings"):
        if spark.catalog.tableExists(t):
            spark.table(t).count()
    tracker = spark.sparkContext.statusTracker()

    print(f"{'query':36s} {'jobs':>5s} {'wall_s':>7s} {'ms/job':>7s}")
    for name in names:
        # warm pass (plan compile + page cache), untimed
        for timed in (False, True):
            group = f"{name}-{'t' if timed else 'w'}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            wall = time.time() - t0
            jobs = len(tracker.getJobIdsForGroup(group))
            spark.sparkContext.setJobGroup(None, None)
            df = None
            spark.catalog.clearCache()
            gc.collect()
        per = (wall / jobs * 1000) if jobs else 0.0
        print(f"{name:36s} {jobs:5d} {wall:7.2f} {per:7.0f}", flush=True)


if __name__ == "__main__":
    main()
