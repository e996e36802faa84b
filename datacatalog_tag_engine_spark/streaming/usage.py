"""Usage-event streaming aggregation (SURVEY.md T3; reference:
extensions/usage_tracking/README.md:1-11).

The reference derives entry_clicks / tag_creates / tag_updates /
tag_deletes summary rows from audit-log events on a daily schedule.
Structured Streaming expresses the same thing incrementally: readStream
over the event source -> watermark for late data -> tumbling daily
window counts -> append sink. The identical transformation runs in
batch mode (the functions take either a static or streaming DataFrame —
Spark's unified API), which is how the correctness oracle checks it.

Scale: the aggregation state is bounded by (window x event_type x
action) cardinality; the watermark expires state after `late` so a
100 TB/day stream holds only ~2 days of tiny counter state per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(
    spark: SparkSession,
    directory: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming source over the driver's events parquet. Streaming file
    sources take a directory; ``glob`` narrows it to the events file(s).

    Streaming sources need an explicit schema, so we sniff the parquet
    footer of one matching file (driver-side, no data read — same
    pattern as the batch loader ``session.load_parquet``) to decide the
    ``ts`` flavor: TIMESTAMP(NANOS) files are read as raw longs via the
    legacy conf and truncated to micros; micro-precision files are read
    natively (no tz -> TIMESTAMP_NTZ), byte-identical to the batch path
    so stream output == batch output."""
    import glob as globmod
    import os

    import pyarrow.parquet as pq

    ts_str = ""
    matches = globmod.glob(os.path.join(directory, glob)) + globmod.glob(
        os.path.join(directory, "**", glob), recursive=True
    )
    errors: list[str] = []
    for path in matches:
        try:
            ts_str = str(pq.read_schema(path).field("ts").type)
            break
        except Exception as ex:
            errors.append(f"{path}: {type(ex).__name__}: {ex}")
    if not ts_str:
        # a silent fallback would mis-schema the stream (NTZ vs nanos is
        # a 1000x timestamp skew) — fail clearly instead
        raise FileNotFoundError(
            f"cannot sniff a parquet footer for {glob!r} under {directory!r}: "
            + (f"all {len(matches)} candidate(s) unreadable: {errors}" if matches else "no file matches")
        )

    # any nanos precision takes the raw-long path regardless of tz —
    # reading timestamp[ns, tz=...] through the native reader without
    # the legacy conf would mis-scale values
    if ts_str.startswith("timestamp[ns"):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        reader = spark.readStream.schema(_events_schema(T.LongType())).option(
            "pathGlobFilter", glob
        )
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        raw = reader.parquet(directory)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

    ts_type: T.DataType = (
        T.TimestampType() if ts_str.startswith("timestamp[") and "tz=" in ts_str else T.TimestampNTZType()
    )
    reader = spark.readStream.schema(_events_schema(ts_type)).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(directory)
    # Watermarks require TIMESTAMP (not NTZ); with the session pinned to
    # UTC the cast is an identity reinterpretation, and the usage aggs
    # emit only dates, so stream output still equals the NTZ batch path.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def daily_usage(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Tumbling daily window counts per event_type — works on both
    streaming (with watermark-bounded state) and static frames."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.approx_count_distinct("user_id").alias("approx_users"))
        .select(
            F.col("w.start").cast("date").alias("event_date"),
            "event_type",
            "n",
            "approx_users",
        )
    )


def user_activity(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Per-user daily activity rollup (the usage-tracking per-principal
    summary shape)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(F.count("*").alias("events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").cast("date").alias("event_date"), "user_id", "events", "total_value")
    )


def run_available_now(stream_df: DataFrame, sink_name: str):
    """Drain everything currently available into an in-memory sink
    (complete mode) and return the finished query — the test/CI shape of
    a production ``writeStream.trigger(processingTime=...)`` job."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
