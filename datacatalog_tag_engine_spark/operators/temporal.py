"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are implemented as compositions of existing DataFrame ops (the
preferred route before reaching for Pandas UDFs):

* as-of join — the union-window technique: tag both sides, union, one
  shuffle partitioned by key and sorted by (time, side-marker), then
  ``last(right_value, ignorenulls)`` over the preceding-rows window
  carries the most recent right row forward onto each left row. Cost is
  ONE shuffle of left+right (no range blow-up, no per-key loops) —
  this is how as-of joins scale to 100 TB tick data.

* range join — time-bucketed: bin both sides into fixed-width buckets,
  equi-join on (key, bucket±1 on the probe side), then apply the exact
  range predicate. The equi-join prunes candidate pairs to adjacent
  buckets, so the cross-product term is bounded by per-bucket density
  instead of per-key row counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..model.timeutil import ts_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row of the same
    key with right_ts <= left_ts (ties: the right row wins — DuckDB
    ASOF `>=` semantics). Left rows with no prior right row keep nulls.

    The right row is carried as ONE struct (non-null for every right
    row, even when its fields are null), so the attached columns are
    always row-atomic — carrying each column independently with
    last(ignorenulls) would stitch together fields from DIFFERENT right
    rows whenever right value columns contain nulls.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(
            *[F.col(c).alias(c) for c in right_cols],
            F.col(right_ts).alias("_rts"),
        ).alias("_rrow"),
    )
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tag.schema["_rrow"].dataType).alias("_rrow"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    r_tag = r_tag.withColumn("_lrow", F.lit(None).cast(l_tag.schema["_lrow"].dataType))
    # right rows sort before left rows at equal timestamps so an
    # equal-ts right row is visible to the left row (ASOF >=)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tag.unionByName(r_tag)
    carried = unioned.select(
        "_side",
        "_lrow",
        F.last("_rrow", ignorenulls=True).over(w).alias("_c"),
    )
    out = carried.filter(F.col("_side") == 1).select(
        "_lrow.*",
        *[F.col(f"_c.{c}").alias(f"{c}{suffix}") for c in right_cols],
        F.col("_c._rts").alias(f"{right_ts}{suffix}"),
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_sec: int = 0,
    upper_sec: int = 60,
    bucket_sec: int | None = None,
) -> DataFrame:
    """Pairs (left, right) with the same key and
    left_ts + lower_sec <= right_ts <= left_ts + upper_sec.

    The bucketed equi-join bounds candidates: right rows bucket once,
    left rows probe every bucket their window overlaps (window/bucket
    +1 buckets each). Returns left.* plus right's ts as ``match_ts``
    and other right columns suffixed ``_m``.
    """
    bucket_sec = bucket_sec or max(upper_sec - lower_sec, 1)
    l_b = left.withColumn("_lsec", ts_seconds(F.col(left_ts)))
    r_b = right.withColumn("_rsec", ts_seconds(F.col(right_ts))).withColumn(
        "_bucket", F.floor(F.col("_rsec") / bucket_sec)
    )
    # the window [l+lower, l+upper] can overlap at most
    # ceil((upper-lower)/bucket) + 1 buckets (the +1 covers the window
    # straddling a bucket boundary); probing more is pure wasted join
    # fan-out on the big side
    n_probe = -((lower_sec - upper_sec) // bucket_sec) + 1
    probes = F.array(
        *[
            F.floor((F.col("_lsec") + lower_sec) / bucket_sec) + i
            for i in range(int(n_probe))
        ]
    )
    l_exp = l_b.withColumn("_bucket", F.explode(F.array_distinct(probes)))

    right_cols = [c for c in right.columns if c not in (on, right_ts)]
    r_sel = r_b.select(
        F.col(on).alias("_rk"),
        F.col("_bucket").alias("_rbucket"),
        "_rsec",
        F.col(right_ts).alias("match_ts"),
        *[F.col(c).alias(f"{c}_m") for c in right_cols],
    )
    joined = l_exp.join(
        r_sel,
        (l_exp[on] == r_sel["_rk"]) & (l_exp["_bucket"] == r_sel["_rbucket"]),
    )
    exact = joined.filter(
        (F.col("_rsec") >= F.col("_lsec") + lower_sec)
        & (F.col("_rsec") <= F.col("_lsec") + upper_sec)
    )
    return exact.drop("_lsec", "_rsec", "_bucket", "_rbucket", "_rk")
