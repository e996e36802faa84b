"""Price the r14 bank operators at sf0.1 (single warm pass each) —
the baseline the r14 rotation will be judged against, and the early
check that none of the queued operators is a scale-killer before it
enters the certified inventory. (The r13 queue graduated into the
inventory at the r13 rotation; bench.py prices it now.)

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

    def s34():
        # fresh dir per call: index/store builds refuse to overwrite,
        # and the warm + timed passes each run the FULL build+serve
        p = tempfile.mkdtemp(dir=tmp, prefix="s34_") + "/ivfpq"
        SIM.build_ivfpq_index(emb, p, num_cells=8)
        qs = emb.filter(F.col("vec_id") < 5)
        return SIM.recall_profile(
            SIM.brute_force_topk(emb, qs, k=5),
            SIM.ivfpq_topk_from_index(spark, p, qs, k=5, nprobe=2),
        )

    def q103():
        d = tempfile.mkdtemp(dir=tmp, prefix="q103_")
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
        return spark.read.parquet(f"{d}/metrics")

    def m07():
        img = MM.make_fake_image_corpus(spark, 6, 3)
        aud = MM.make_fake_audio_corpus(spark, 6, 3)
        vid = MM.make_fake_video_corpus(spark, 4, 3)
        return MM.neardup_rate_profile([
            ("image", img, DD.hamming_neardup_pairs(
                MM.image_phash(img), id_col="media_id", fp_col="phash",
                bits=64, bands=4, max_hamming=10), "media_id"),
            ("audio", aud, DD.hamming_neardup_pairs(
                MM.audio_fingerprint(aud), id_col="media_id", fp_col="afp",
                bits=64, bands=4, max_hamming=10), "media_id"),
            ("video", vid, DD.frame_neardup_pairs(
                MM.video_frame_phashes(vid, sample_frames=4),
                min_matching_frames=3, max_hamming=10), "media_id"),
        ])

    def _d29():
        from datacatalog_tag_engine_spark.pipeline.dedup import (
            build_winnowing_store,
            incremental_winnowing_overlap,
        )

        d2 = tempfile.mkdtemp(dir=tmp, prefix="d29_")
        build_winnowing_store(docs.filter(F.col("doc_id") % 3 != 0), f"{d2}/s")
        return incremental_winnowing_overlap(
            spark, f"{d2}/s", docs.filter(F.col("doc_id") % 3 == 0)
        )

    cases = {
        # --- r14 bank (built after the r13 window was sized) ---
        # max_df=100: the winnow-ladder knee for this fixture (SCALE.md)
        "d27_winnowing_dedup": lambda: DD.winnowing_dedup(docs, max_df=100),
        "d28_winnowing_contamination": lambda: DD.winnowing_contamination(
            docs.filter(hash_bucket(F.col("doc_id"), 10) != 0),
            docs.filter(hash_bucket(F.col("doc_id"), 10) == 0),
            max_df=100,
        ),
        "d30_threshold_sweep_vs_exact": lambda: DD.threshold_sweep_vs_exact(docs),
        "s34_ivfpq_recall_from_index": s34,
        "s35_knn_rank_profile": lambda: SIM.knn_rank_profile(
            SIM.knn_graph(emb, k=5, num_cells=8)
        ),
        "q103_sigstore_metrics": q103,
        "q104_corpus_health": lambda: corpus_health_report(docs),
        "q105_curriculum_token_budget": lambda: curriculum_token_budget(docs),
        "m07_multimodal_dup_rates": m07,
        "q106_copy_audit_profile": lambda: DD.copy_audit_profile(
            docs, max_df=100
        ),
        "d29_incremental_winnowing": _d29,
        "s37_nprobe_sweep": lambda: SIM.nprobe_recall_sweep(
            emb, emb.filter(F.col("vec_id") < 5), k=5, num_cells=8
        ),
        "s36_topk_regret": lambda: SIM.topk_regret_profile(
            emb,
            SIM.brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=5),
            SIM.ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=5, num_cells=8),
        ),
        "t44_winnowing_params": lambda: __import__(
            "datacatalog_tag_engine_spark.pipeline.text",
            fromlist=["winnowing_parameter_table"],
        ).winnowing_parameter_table(docs),
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
