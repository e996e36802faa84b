"""r10 rung for the q80 draft: incremental daily refresh vs full
re-clean, measured. The full path re-runs the clean-ingest gate over
the whole accumulated corpus every day; the incremental path
anti-joins the day's batch against the prior fingerprints, gates ONLY
the surviving delta, and re-exports only the dirty shards. At a fixed
batch size the full path's cost grows with the accumulated corpus
while the incremental path's stays flat — this rung measures both on
growing corpus multiples (sf0.1 documents replicated with suffixed
text so fingerprints stay distinct).

Usage: python tools/stress_incremental.py [multiples ...]  (default 1 4 8)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline import dedup as DD
from datacatalog_tag_engine_spark.pipeline.export import dirty_shards
from datacatalog_tag_engine_spark.session import get_spark, load_parquet
from datacatalog_tag_engine_spark.streaming.dedup import clean_ingest_stream

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
GATE = dict(
    min_words=20, min_stopword_hits=0, max_dup_word_frac=1.0,
    max_top_bigram_frac=1.0,
)


def corpus_times(spark, mult: int):
    base = load_parquet(spark, os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    nb = base.count()
    copies = spark.range(mult).select(F.col("id").alias("_c"))
    prior = (
        base.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") + F.col("_c") * (10 ** len(str(nb)))).alias("doc_id"),
            F.concat("text", F.lit(" prior"), F.col("_c")).alias("text"),
            "lang", "source", "n_chars",
        )
        .localCheckpoint(eager=True)
    )
    # today's batch: one base-corpus worth of docs, ~half genuinely new
    batch = base.select(
        (F.col("doc_id") + F.lit(10 ** (len(str(nb)) + 2))).alias("doc_id"),
        F.when(F.col("doc_id") % 2 == 0, F.concat("text", F.lit(" fresh")))
        .otherwise(F.concat("text", F.lit(" prior0")))  # dup of prior copy 0
        .alias("text"),
        "lang", "source", "n_chars",
    ).localCheckpoint(eager=True)

    t0 = time.time()
    full = clean_ingest_stream(prior.unionByName(batch), **GATE)
    n_full = full.count()
    t_full = round(time.time() - t0, 2)

    t0 = time.time()
    delta = DD.incremental_delta(batch, prior).select("doc_id")
    fresh = batch.join(delta, "doc_id", "left_semi")
    cleaned = clean_ingest_stream(fresh, **GATE)
    new_ids = prior.select("doc_id").unionByName(cleaned.select("doc_id"))
    dirty = dirty_shards(prior.select("doc_id"), new_ids, 64)
    n_dirty = dirty.filter("needs_rewrite").count()
    t_inc = round(time.time() - t0, 2)
    return prior.count(), t_full, n_full, t_inc, n_dirty


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    spark = get_spark("stress-incremental")
    spark.sparkContext.setLogLevel("ERROR")
    print("| prior corpus | full re-clean sec | kept | incremental sec | dirty shards/64 |")
    print("|---|---|---|---|---|")
    out = {}
    for m in mults:
        n, t_full, n_full, t_inc, n_dirty = corpus_times(spark, m)
        print(f"| {n} | {t_full} | {n_full} | {t_inc} | {n_dirty} |")
        out[n] = {"full_sec": t_full, "incremental_sec": t_inc,
                  "dirty_shards": n_dirty}
        spark.catalog.clearCache()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
