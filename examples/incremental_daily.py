"""The 100 TB DAILY-REFRESH shape, end to end: what actually runs when
a crawl batch lands on a mature training corpus. Every stage touches
delta-sized data only — the accumulated corpus is read at fingerprint
or signature grain, never re-shingled, never re-gated, never
re-exported — so the daily cost is flat in the archive's size (the
round-10 incremental rung measured the full-re-clean alternative
growing linearly).

Stages (each prints its accounting):

1. delta detect        incremental_delta — fingerprint anti-join drops
                       re-crawled identical docs (q51)
2. near-dup vs archive incremental_neardup_from_store — the d23
                       persisted signature store: signature-grain,
                       the resident x resident quadrant never
                       generated; resident TEXT never read (d19)
3. quality gate        clean_ingest_stream batch form over the
                       surviving delta only (q61)
4. dirty-shard plan    dirty_shards under md5 sharding AND
                       dirty_shards_assigned under range (locality)
                       sharding — the balance-vs-locality trade,
                       planned before any byte is written (q79/q84)
5. consolidation plan  resharding_plan — when the range layout's
                       small-shard tail crosses the threshold, which
                       neighbors coalesce (q86)

Run: python examples/incremental_daily.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline.dedup import (
    incremental_delta,
)
from datacatalog_tag_engine_spark.pipeline.export import (
    dirty_shards,
    dirty_shards_assigned,
    range_shard_assignments,
    resharding_plan,
)
from datacatalog_tag_engine_spark.session import get_spark, register_testdata
from datacatalog_tag_engine_spark.streaming.dedup import clean_ingest_stream

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("incremental-daily", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF)
    docs = spark.table("documents")

    # yesterday's accumulated corpus vs today's crawl batch. Crawl ids
    # are monotone in ingest order (sequence numbers), so the batch is
    # the TAIL of the id space — the shape that makes range sharding's
    # locality real in stage 4.
    top = docs.agg(F.max("doc_id")).first()[0]
    cut = (top * 2) // 3
    resident = docs.filter(F.col("doc_id") <= cut)
    batch = docs.filter(F.col("doc_id") > cut)
    print(f"resident corpus: {resident.count()}   today's batch: {batch.count()}")

    # 1. delta detect: drop re-crawls whose normalized fingerprint
    # already exists in the archive (archive read at fingerprint grain)
    delta = batch.join(
        incremental_delta(batch, resident).select("doc_id"), "doc_id", "left_semi"
    )
    print(f"1. genuinely new after fingerprint anti-join: {delta.count()}")

    # 2. near-dup against the archive at SIGNATURE grain, served from
    # the PERSISTED signature store (d23): built once from the deduped
    # archive, appended per accepted delta — the daily call shingles
    # only today's crawl and joins stored signatures; resident text
    # never reappears in a plan (measured 3.7x at 9:1 in SCALE.md).
    import shutil
    import tempfile

    from datacatalog_tag_engine_spark.pipeline.dedup import (
        build_signature_store,
        incremental_neardup_from_store,
    )

    # try/finally so a mid-run failure cleans the temp store up too
    # (r11 review finding: the happy-path-only rmtree leaked it)
    store_root = tempfile.mkdtemp(prefix="sigstore_")
    try:
        store = store_root + "/store"
        build_signature_store(resident, store)  # one-time, maintained thereafter
        pairs = incremental_neardup_from_store(spark, store, delta)
        cross = pairs.filter("is_cross")
        dup_new = pairs.select(
            F.greatest("doc_a", "doc_b").alias("doc_id")
        ).distinct().join(delta.select("doc_id"), "doc_id", "left_semi")
        survivors = delta.join(dup_new, "doc_id", "left_anti")
        print(
            f"2. near-dup pairs touching the delta: {pairs.count()} "
            f"({cross.count()} against the archive); delta after drop: "
            f"{survivors.count()}"
        )

        # 3. gate only the surviving delta
        cleaned = clean_ingest_stream(
            survivors,
            min_words=20,
            min_stopword_hits=0,
            max_dup_word_frac=1.0,
            max_top_bigram_frac=1.0,
        )
        print(f"3. past the quality gate: {cleaned.count()}")

        # 4. plan the export delta under both sharding policies
        new_ids = resident.select("doc_id").unionByName(cleaned.select("doc_id"))
        md5_plan = dirty_shards(resident.select("doc_id"), new_ids, 8)
        n_dirty_md5 = md5_plan.filter("needs_rewrite").count()
        ranged = dirty_shards_assigned(
            range_shard_assignments(resident, 100),
            range_shard_assignments(new_ids, 100),
        )
        n_dirty_rng = ranged.filter("needs_rewrite").count()
        n_rng = ranged.count()
        print(
            f"4. dirty shards: md5 {n_dirty_md5}/8 (balance, no locality) vs "
            f"range {n_dirty_rng}/{n_rng} (locality — appends hit the tail)"
        )

        # 5. consolidation: the range layout's long small-shard tail
        manifest = ranged.select("shard", (F.col("n_kept") + F.col("n_added")).alias("n_docs"))
        plan = resharding_plan(manifest, target_docs_per_shard=120)
        moved = plan.filter("moved").count()
        print(
            f"5. resharding plan at target 120 docs/shard: "
            f"{plan.count()} shards -> {plan.select('new_shard').distinct().count()}, "
            f"{moved} move (neighbors only; id locality preserved)"
        )
    finally:
        shutil.rmtree(store_root, ignore_errors=True)


if __name__ == "__main__":
    main()
