"""Price the r15 bank operators at sf0.1 (single warm pass each) —
the baseline the r15 rotation will be judged against, and the early
check that none of the queued operators is a scale-killer before it
enters the certified inventory. (The r14 bank graduated into the
inventory at the r14 rotation; bench.py prices it now.)

Usage: python tools/price_drafts.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline import dedup as DD
from datacatalog_tag_engine_spark.pipeline import multimodal as MM
from datacatalog_tag_engine_spark.pipeline import similarity as SIM
from datacatalog_tag_engine_spark.session import get_spark, register_testdata


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("price-drafts")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, sf)
    docs = spark.table("documents")
    emb = spark.table("embeddings")
    tmp = tempfile.mkdtemp(prefix="price_r14_")

    from datacatalog_tag_engine_spark.pipeline.profiling import corpus_health_report
    from datacatalog_tag_engine_spark.pipeline.sampling import (
        curriculum_token_budget,
        hash_bucket,
    )
    from datacatalog_tag_engine_spark.pipeline.dedup import build_signature_store
    from datacatalog_tag_engine_spark.streaming.dedup import sigstore_ingest_replay

    def q108():
        d = tempfile.mkdtemp(dir=tmp, prefix="q108_")
        resident = docs.select("doc_id", "text").filter(F.col("doc_id") % 4 == 0)
        batches = [
            docs.select("doc_id", "text").filter(F.col("doc_id") % 4 == i)
            for i in (1, 2, 3)
        ]
        build_signature_store(resident, f"{d}/store")
        sigstore_ingest_replay(
            spark, f"{d}/store", batches, f"{d}/accepted",
            metrics_sink=f"{d}/metrics",
        )
        from datacatalog_tag_engine_spark.streaming.dedup import ingest_rate_trend

        return ingest_rate_trend(spark.read.parquet(f"{d}/metrics"))

    from datacatalog_tag_engine_spark.pipeline.profiling import (
        dedup_funnel,
        source_quality_quantiles,
    )
    from datacatalog_tag_engine_spark.pipeline.text import (
        gopher_rule_quantiles,
        unicode_profile,
    )

    cases = {
        # --- r15 bank (built after the r14 window was sized) ---
        "t45_gopher_rule_quantiles": lambda: gopher_rule_quantiles(docs),
        "t46_unicode_profile": lambda: unicode_profile(docs),
        "d31_copy_cluster_profile": lambda: DD.cluster_size_profile(
            docs,
            DD.winnowing_overlap_pairs(docs, max_df=100, min_overlap=0.8).select(
                "doc_a", "doc_b"
            ),
        ),
        "d32_winnowing_overlap_verify": lambda: DD.winnowing_overlap_verify(
            docs, max_df=100, min_overlap=0.8
        ),
        "d33_containment_vs_jaccard_grid": lambda: DD.containment_vs_jaccard_grid(
            docs
        ),
        "s38_pq_distortion": lambda: SIM.pq_distortion_profile(emb),
        "q107_dedup_funnel": lambda: dedup_funnel(docs),
        "q108_ingest_rate_trend": q108,
        "q109_source_quality_quantiles": lambda: source_quality_quantiles(docs),
    }

    out = {}
    for name, fn in cases.items():
        # warm pass builds caches; timed pass measures steady state
        fn().write.mode("overwrite").format("noop").save()
        t0 = time.time()
        fn().write.mode("overwrite").format("noop").save()
        out[name] = round(time.time() - t0, 3)
        print(f"{name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"sf_dir": sf, "drafts": out}))


if __name__ == "__main__":
    main()
