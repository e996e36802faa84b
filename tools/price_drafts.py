"""Price the r11 draft operators at sf0.1 (single warm pass each) —
the baseline the r11 rotation will be judged against, and the early
check that none of the queued operators is a scale-killer before it
enters the certified inventory. (The r10 queue graduated into the
inventory at the r10 rotation; bench.py prices it now.)

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
from datacatalog_tag_engine_spark.pipeline import similarity as SIM
from datacatalog_tag_engine_spark.pipeline import text as TXT
from datacatalog_tag_engine_spark.pipeline.export import dirty_shards
from datacatalog_tag_engine_spark.session import get_spark, register_testdata
from datacatalog_tag_engine_spark.streaming.dedup import clean_ingest_stream


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("price-drafts")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, sf)
    docs = spark.table("documents")
    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    roots: list[str] = []

    def _idx():
        p = tempfile.mkdtemp(prefix="price_ivf_")
        roots.append(p)
        return p

    def deleted_index():
        p = _idx()
        SIM.build_ivf_index(emb, p, num_cells=8)
        SIM.remove_from_ivf_index(
            spark, p,
            emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") % 7 == 0))
            .select("vec_id"),
        )
        return SIM.ivf_topk_from_index(spark, p, qs, k=5, nprobe=2)

    def compacted_index():
        p = _idx()
        SIM.build_ivf_index(emb.filter(F.col("vec_id") < 100), p, num_cells=8)
        for lo, hi in ((100, 200), (200, 300), (300, 10**12)):
            SIM.append_to_ivf_index(
                spark, p,
                emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            )
        SIM.compact_ivf_index(spark, p, max_files_per_cell=2)
        return SIM.ivf_topk_from_index(spark, p, qs, k=5, nprobe=2)

    def incremental_pipeline():
        prior = docs.filter(F.col("doc_id") % 3 != 0)
        batch = docs.filter(F.col("doc_id") % 3 == 0)
        delta = DD.incremental_delta(batch, prior).select("doc_id")
        fresh = batch.join(delta, "doc_id", "left_semi")
        cleaned = clean_ingest_stream(
            fresh, min_words=20, min_stopword_hits=0,
            max_dup_word_frac=1.0, max_top_bigram_frac=1.0,
        )
        new_ids = prior.select("doc_id").unionByName(cleaned.select("doc_id"))
        return dirty_shards(prior.select("doc_id"), new_ids, 8)

    def pq_deleted_index():
        p = _idx()
        SIM.build_ivfpq_index(emb, p, num_cells=8)
        SIM.remove_from_ivfpq_index(
            spark, p,
            emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") % 7 == 0))
            .select("vec_id"),
        )
        return SIM.ivfpq_topk_from_index(spark, p, qs, k=5, nprobe=2)

    def _q84():
        from datacatalog_tag_engine_spark.pipeline.export import (
            dirty_shards_assigned,
            range_shard_assignments,
        )

        return dirty_shards_assigned(
            range_shard_assignments(docs, 100),
            range_shard_assignments(docs.filter(F.col("doc_id") % 17 != 0), 100),
        )

    def rebalance():
        drift = TXT.gate_mixture_drift(
            docs, min_words=20, min_stopword_hits=0,
            max_dup_word_frac=1.0, max_top_bigram_frac=1.0,
        )
        return TXT.mixture_rebalance(drift)

    def pq_grown_index():
        p = _idx()
        SIM.build_ivfpq_index(emb.filter(F.col("vec_id") < 100), p, num_cells=8)
        SIM.append_to_ivfpq_index(spark, p, emb.filter(F.col("vec_id") >= 100))
        return SIM.ivfpq_topk_from_index(spark, p, qs, k=5, nprobe=2)

    def pq_compacted_index():
        p = _idx()
        SIM.build_ivfpq_index(emb.filter(F.col("vec_id") < 100), p, num_cells=8)
        for lo, hi in ((100, 200), (200, 300), (300, 10**12)):
            SIM.append_to_ivfpq_index(
                spark, p,
                emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            )
        SIM.compact_ivfpq_index(spark, p, max_files_per_cell=2)
        return SIM.ivfpq_topk_from_index(spark, p, qs, k=5, nprobe=2)

    cases = {
        "s22_ivf_delete_and_search": deleted_index,
        "s23_ivf_compact_and_search": compacted_index,
        "s24_ivfpq_delete_and_search": pq_deleted_index,
        "s25_ivfpq_append_and_search": pq_grown_index,
        "s26_ivfpq_compact_and_search": pq_compacted_index,
        "q80_incremental_pipeline": incremental_pipeline,
        "d15_minhash_estimate": lambda: DD.minhash_estimate_pairs(docs),
        "d16_minhash_estimate_vs_exact": lambda: DD.minhash_estimate_vs_exact(docs),
        "d17_quality_canonical": lambda: DD.quality_canonical_dedup(docs),
        "t33_token_entropy": lambda: TXT.token_entropy(docs),
        "q82_mixture_rebalance": rebalance,
        "s27_cluster_balanced_sample": lambda: SIM.cluster_balanced_sample(emb),
        "q84_dirty_shards_assigned": lambda: _q84(),
    }
    out = {}
    for name, fn in cases.items():
        t0 = time.time()
        fn().count()
        out[name] = round(time.time() - t0, 3)
    import shutil

    for p in roots:
        shutil.rmtree(p, ignore_errors=True)
    print(json.dumps({"sf_dir": sf, "single_warm_pass_sec": out}))


if __name__ == "__main__":
    main()
