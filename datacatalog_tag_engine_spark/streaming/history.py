"""Tag history as a stream (SURVEY.md T2; reference:
BigQueryUtils.py:110-192, call sites DataCatalogController.py:325-328).

Every successful tag mutation appends an audit event. The batch engine
(engine.TagEngine._append_history) produces these rows synchronously;
this module is the streaming consumer side: readStream over the history
directory -> day-partitioned sink plus an incremental mutation-counts
rollup (creates/updates/deletes per template per day) — the reference's
history reporting queries, kept continuously up to date.

At-least-once delivery + idempotent MERGE upstream (SURVEY T4/R6) means
duplicate events are possible on retry; the rollup dedups on
(job_uuid, asset_name, field_id, action) before counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model.schemas import TAG_HISTORY_SCHEMA

# the at-least-once delivery identity of one history event: retry
# dedup anywhere in the CDC pipeline MUST use this one key (asset_name
# embeds the /column/<c> suffix, so column-level tags are covered)
EVENT_DEDUP_KEYS = ["job_uuid", "asset_name", "field_id", "action"]


def write_history_stream(history: DataFrame, path: str, checkpoint: str):
    """Append-mode day-partitioned sink — the Spark shape of the
    reference's day-partitioned history table (BigQueryUtils.py:344-387)."""
    return (
        history.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("event_date")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def read_history_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(TAG_HISTORY_SCHEMA).parquet(path)


def mutation_counts(history: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Creates/updates/deletes per (day, template) with retry dedup —
    runs on streaming or static frames.

    Retry dedup keys on the event identity (EVENT_DEDUP_KEYS). A retry
    that RE-STAMPS event_time still counts once: the batch form keeps
    the EARLIEST timestamp per identity deterministically (the original
    event precedes its retries); the streaming form's dropDuplicates
    keeps the first delivery within the watermark — same event, and
    the same day window for any same-day retry."""
    if history.isStreaming:
        deduped = history.withWatermark("event_time", watermark).dropDuplicates(
            EVENT_DEDUP_KEYS
        )
    else:
        deduped = history.groupBy(*EVENT_DEDUP_KEYS, "template_id").agg(
            F.min("event_time").alias("event_time")
        )
    return (
        deduped.groupBy(F.window("event_time", "1 day").alias("w"), "template_id", "action")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("date").alias("event_date"), "template_id", "action", "n")
    )
