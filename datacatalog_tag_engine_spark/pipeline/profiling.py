"""Column and corpus profiling operators.

The tag engine's core purpose is computing profile metrics per asset
(the dynamic-tag expression corpus). These operators generalize that to
whole-schema numeric profiling and corpus-level document statistics —
the summaries a training-data pipeline publishes per snapshot.

All metrics are single-pass aggregations (one shuffle of partial
aggregates regardless of row count); inexact-sum metrics (mean/stddev)
are rounded to 2 decimals for cross-engine comparability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def profile_numeric_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column numeric profile: (column, n, n_null, n_distinct,
    min_value, max_value, mean_value, stddev_value) — one aggregation
    pass for ALL columns (the per-column metrics are parallel aggregate
    expressions, not per-column jobs), then unpivoted to long rows."""
    if columns is None:
        # every numeric family, including DecimalType — the common
        # warehouse type for money/quantity measures (a decimal column
        # silently skipped would profile as absent, not as an error)
        columns = [
            f.name
            for f in df.schema.fields
            if isinstance(
                f.dataType,
                (T.IntegerType, T.LongType, T.FloatType, T.DoubleType,
                 T.ShortType, T.ByteType, T.DecimalType),
            )
        ]
    if not columns:
        # nothing numeric: an empty profile, not an empty-agg crash
        return df.sparkSession.createDataFrame(
            [],
            "column string, n double, n_null double, n_distinct double, "
            "min_value double, max_value double, mean_value double, stddev_value double",
        )
    aggs = []
    for c in columns:
        col = F.col(c).cast("double")
        aggs.extend(
            [
                F.count(col).alias(f"{c}__n"),
                F.count(F.when(col.isNull(), 1)).alias(f"{c}__n_null"),
                F.countDistinct(col).alias(f"{c}__n_distinct"),
                F.min(col).alias(f"{c}__min"),
                F.max(col).alias(f"{c}__max"),
                F.round(F.avg(col), 2).alias(f"{c}__mean"),
                F.round(F.stddev_samp(col), 2).alias(f"{c}__stddev"),
            ]
        )
    wide = df.agg(*aggs)
    stack_args = []
    for c in columns:
        stack_args.append(F.lit(c))
        for metric in ["n", "n_null", "n_distinct", "min", "max", "mean", "stddev"]:
            stack_args.append(F.col(f"{c}__{metric}").cast("double"))
    return wide.select(
        F.stack(F.lit(len(columns)), *stack_args).alias(
            "column", "n", "n_null", "n_distinct", "min_value", "max_value", "mean_value", "stddev_value"
        )
    )


def corpus_stats(docs: DataFrame, group_col: str = "source", text_col: str = "text") -> DataFrame:
    """Per-group corpus summary: documents, total/mean token counts and
    char counts — the per-snapshot stats a data pipeline publishes."""
    words = F.size(F.split(F.col(text_col), r"\s+"))
    chars = F.length(F.col(text_col))
    # Output types pinned to bigint/double: DuckDB's sum(INTEGER) yields
    # HUGEINT (float64 in pandas) and min/max(length) yield BIGINT, so
    # every integer metric is cast to long on BOTH engines for the
    # driver's dtype-sensitive value hasher.
    return docs.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(words).cast("long").alias("total_words"),
        F.round(F.avg(words), 2).alias("mean_words"),
        F.sum(chars).cast("long").alias("total_chars"),
        F.min(chars).cast("long").alias("min_chars"),
        F.max(chars).cast("long").alias("max_chars"),
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    user's previous event exceeds ``gap_minutes``. Classic
    lag -> boundary-flag -> running-sum window pattern; session_id is
    (user, session_index). Returns per-session rollups.

    The streaming form of the same semantics is
    streaming.sessions.sessionize_stream (applyInPandasWithState).
    """
    from pyspark.sql import Window

    from ..model.timeutil import ts_epoch_long

    w = Window.partitionBy(user_col).orderBy(ts_col)
    sec = ts_epoch_long(F.col(ts_col))
    gap = sec - F.lag(sec).over(w)
    flagged = events.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    flagged = flagged.withColumn("session_index", F.sum("_new_session").over(w))
    return (
        flagged.groupBy(user_col, "session_index")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .withColumn(
            "duration_sec",
            ts_epoch_long(F.col("session_end")) - ts_epoch_long(F.col("session_start")),
        )
    )
