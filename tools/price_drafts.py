"""Price the r10 draft operators at sf0.1 (single warm pass each) —
the baseline the r10 rotation will be judged against, and the early
check that none of the queued operators is a scale-killer before it
enters the certified inventory.

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
from datacatalog_tag_engine_spark.pipeline import profiling as PRO
from datacatalog_tag_engine_spark.pipeline import similarity as SIM
from datacatalog_tag_engine_spark.pipeline import text as TXT
from datacatalog_tag_engine_spark.session import get_spark, register_testdata
from datacatalog_tag_engine_spark.streaming import usage as U

FUNNEL_STEPS = ["view", "click", "purchase"]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("price-drafts")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, sf)
    docs = spark.table("documents")
    emb = spark.table("embeddings")
    events = spark.table("events")
    qs = emb.filter(F.col("vec_id") < 5)
    idx = tempfile.mkdtemp(prefix="price_ivf_")

    def grown_index():
        SIM.build_ivf_index(emb.filter(F.col("vec_id") < 100), idx, num_cells=8)
        SIM.append_to_ivf_index(spark, idx, emb.filter(F.col("vec_id") >= 100))
        return SIM.ivf_topk_from_index(spark, idx, qs, k=5, nprobe=2)

    cases = {
        "s16_range_search": lambda: SIM.range_search(emb, qs, threshold=0.2, nprobe=2),
        "s17_cell_inertia": lambda: SIM.cell_inertia(emb),
        "s18_pq_code_histogram": lambda: SIM.pq_code_histogram(emb),
        "s19_embedding_stats": lambda: SIM.embedding_stats(emb),
        "s21_ivf_append_and_search": grown_index,
        "t30_char_coverage": lambda: TXT.char_coverage(docs),
        "t31_ngram_novelty": lambda: DD.ngram_novelty(docs),
        "t32_top_ngrams": lambda: TXT.top_ngrams_per_group(docs),
        "q72_gate_mixture_drift": lambda: TXT.gate_mixture_drift(
            docs, min_words=20, min_stopword_hits=0,
            max_dup_word_frac=1.0, max_top_bigram_frac=1.0,
        ),
        "q73_cluster_size_profile": lambda: DD.cluster_size_profile(
            docs, DD.minhash_dedup(docs)
        ),
        "q74_percentile_tolerance": lambda: PRO.percentile_tolerance_profile(docs),
        "q75_session_funnel": lambda: PRO.session_funnel(events, FUNNEL_STEPS),
        "q76_event_rate_anomaly": lambda: PRO.event_rate_anomaly(events),
        "q77_lang_source_profile": lambda: PRO.lang_source_profile(docs),
        "q78_cohort_via_state": lambda: U.cohort_retention_finish(
            U.cohort_user_days(events)
        ),
        "m05_manifest_stats": lambda: MM.manifest_stats(
            MM.extract_features(MM.make_fake_media(spark, 16))
        ),
        "q79_dirty_shards": lambda: __import__(
            "datacatalog_tag_engine_spark.pipeline.export", fromlist=["dirty_shards"]
        ).dirty_shards(
            docs.filter(F.col("doc_id") % 17 != 0),
            docs.filter(F.col("doc_id") % 13 != 0),
            8,
        ),
    }
    out = {}
    for name, fn in cases.items():
        t0 = time.time()
        fn().count()
        out[name] = round(time.time() - t0, 3)
    import shutil

    shutil.rmtree(idx, ignore_errors=True)
    print(json.dumps({"sf_dir": sf, "single_warm_pass_sec": out}))


if __name__ == "__main__":
    main()
