"""Price the r12 draft operators (and the r13 bank) at sf0.1 (single warm pass each) —
the baseline the r12 rotation will be judged against, and the early
check that none of the queued operators is a scale-killer before it
enters the certified inventory. (The r11 queue graduated into the
inventory at the r11 rotation; bench.py prices it now.)

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

    def _q86():
        from datacatalog_tag_engine_spark.pipeline.export import (
            range_shard_assignments,
            resharding_plan,
        )

        manifest = (
            range_shard_assignments(docs, 100)
            .groupBy("shard")
            .agg(F.count("*").alias("n_docs"))
        )
        return resharding_plan(manifest, 500)

    def _d19():
        return DD.incremental_neardup_pairs(
            docs.filter(F.col("doc_id") % 3 == 0),
            docs.filter(F.col("doc_id") % 3 != 0),
        )

    def _q90():
        from datacatalog_tag_engine_spark.pipeline.sampling import curriculum_order

        return curriculum_order(
            TXT.quality_scores(docs).select("doc_id", "quality_score")
        )

    def _m06():
        from datacatalog_tag_engine_spark.pipeline import multimodal as MM

        return MM.payload_size_profile(
            MM.extract_features(MM.make_fake_media(spark, n=16))
        )

    def _s29():
        import shutil
        import tempfile

        p = tempfile.mkdtemp(prefix="price_drift_")
        try:
            SIM.build_ivf_index(emb, p, num_cells=8)
            n = SIM.quantizer_drift_from_index(spark, p).count()
        finally:
            shutil.rmtree(p, ignore_errors=True)
        return spark.range(n)

    def _q95():
        from datacatalog_tag_engine_spark.pipeline.sampling import (
            curriculum_order,
            source_relative_scores,
        )

        scored = TXT.quality_scores(docs).select("doc_id", "quality_score").join(
            docs.select("doc_id", "source"), "doc_id"
        )
        return curriculum_order(source_relative_scores(scored))

    def _q94():
        import shutil
        import tempfile

        from datacatalog_tag_engine_spark.pipeline.export import (
            verify_training_shards,
            write_training_shards,
        )

        p = tempfile.mkdtemp(prefix="price_export_")
        try:
            write_training_shards(docs.select("doc_id", "text"), p, 8)
            n = verify_training_shards(spark, p).count()
        finally:
            shutil.rmtree(p, ignore_errors=True)
        return spark.range(n)

    def _q91():
        from datacatalog_tag_engine_spark.pipeline.sampling import stage_mixture

        return stage_mixture(_q90(), docs)

    def _s31():
        import shutil
        import tempfile

        p = tempfile.mkdtemp(prefix="price_knn_")
        try:
            SIM.build_ivf_index(emb, p, num_cells=8)
            n = SIM.knn_graph_from_index(spark, p, k=5).count()
        finally:
            shutil.rmtree(p, ignore_errors=True)
        return spark.range(n)

    def _d23():
        import shutil
        import tempfile

        root = tempfile.mkdtemp(prefix="price_sigstore_")
        try:
            p = root + "/store"
            DD.build_signature_store(docs.filter(F.col("doc_id") % 3 != 0), p)
            n = DD.incremental_neardup_from_store(
                spark, p, docs.filter(F.col("doc_id") % 3 == 0)
            ).count()
        finally:
            shutil.rmtree(root, ignore_errors=True)
        return spark.range(n)

    def _q97():
        from datacatalog_tag_engine_spark.pipeline.profiling import corpus_snapshot_diff

        old = docs.filter(F.col("doc_id") % 17 != 0)
        new = docs.filter(F.col("doc_id") % 13 != 0).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text")),
        )
        return corpus_snapshot_diff(old, new)

    cases = {
        "q86_resharding_plan": _q86,
        "d18_lsh_parameter_table": lambda: DD.lsh_parameter_table(spark),
        "t34_code_prose_profile": lambda: TXT.code_prose_profile(docs),
        "q88_source_dup_rate": lambda: DD.source_dup_rate(docs),
        "d19_incremental_neardup": _d19,
        "s28_quantizer_drift": lambda: SIM.quantizer_drift(emb),
        "q90_curriculum_order": _q90,
        "m06_payload_size_profile": _m06,
        "d20_shingle_df_profile": lambda: DD.shingle_df_profile(docs),
        "s29_quantizer_drift_from_index": _s29,
        "q91_stage_mixture": _q91,
        "q93_contamination_profile": lambda: TXT.contamination_profile(
            TXT.contamination_check(
                docs.filter(F.col("doc_id") % 20 != 0),
                docs.filter(F.col("doc_id") % 20 == 0),
                n=5,
            )
        ),
        "t36_langid_margin": lambda: TXT.language_id_margin(docs),
        "q94_verify_shards": _q94,
        "q95_source_relative_curriculum": _q95,
        "t37_heavy_hitters": lambda: TXT.heavy_hitter_tokens(docs, k=100),
        "q97_snapshot_diff": _q97,
        "q98_gate_overlap": lambda: TXT.gate_overlap_matrix(docs),
        "s30_knn_graph": lambda: SIM.knn_graph(emb, k=5, num_cells=8),
        "s31_knn_graph_from_index": _s31,
        # --- r13 bank (built after the r12 window was sized) ---
        "d22_clusters_star": lambda: DD.neardup_clusters_star(
            docs, DD.minhash_dedup(docs)
        ),
        "t39_line_lang_profile": lambda: TXT.line_language_profile(docs),
        "t40_line_repetition": lambda: TXT.line_repetition_signals(docs),
        "t41_ngram_coverage": lambda: TXT.ngram_coverage_signals(docs),
        "d23_signature_store": _d23,
        "s32_mutual_knn_clusters": lambda: SIM.mutual_knn_clusters(
            emb, k=5, num_cells=8
        ),
        "q100_score_gate_calibration": lambda: __import__(
            "datacatalog_tag_engine_spark.pipeline.profiling",
            fromlist=["score_gate_calibration"],
        ).score_gate_calibration(docs),
    }
    out = {}
    for name, fn in cases.items():
        t0 = time.time()
        fn().count()
        out[name] = round(time.time() - t0, 3)
    print(json.dumps({"sf_dir": sf, "single_warm_pass_sec": out}))


if __name__ == "__main__":
    main()
