"""Skew levers for hot keys (SURVEY section 4 scale notes).

Uniform hash keys (fingerprints, md5 buckets) never skew, but
real-world group keys do: one giant source/domain/template dominates
its shuffle partition and the stage runs at the speed of that straggler.
Two standard levers, DataFrame-native:

* ``salted_agg`` — two-stage aggregation: group on (key, salt) first
  (spreads the hot key over S partitions), then re-aggregate by key.
  Works for any algebraic aggregate expressed as (partial, final).
* ``salted_broadcast_join`` — replicate the SMALL side S times with an
  explicit salt column and join on (key, salt): the big side's hot key
  spreads across S tasks. (When the small side fits in a broadcast,
  plain broadcast() is better — this is for the in-between case where
  AQE's skew-join split is unavailable, e.g. non-AQE sinks or
  deterministic-partitioning requirements.)

AQE's skewedJoin handles most of this automatically (enabled in
session.get_spark); these explicit forms exist for aggregations (AQE
does not split skewed aggregation keys) and for plans that must stay
deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partials: list[tuple[Column, str]],
    finals: list[tuple[str, str]],
    salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``partials`` — (aggregate expression, alias) computed per
    (key, salt); ``finals`` — (merge SQL over the partial aliases,
    output alias) computed per key. Example (count + sum):

        salted_agg(df, ["k"],
                   partials=[(F.count("*"), "c"), (F.sum("v"), "s")],
                   finals=[("sum(c)", "n"), ("sum(s)", "total")])

    The salt is deterministic (md5 of a row-identifying column when
    ``salt_source`` given, else a hash of the whole row via
    ``monotonically_increasing_id`` is avoided — spark_partition_id is
    layout-dependent). Deterministic salts keep the result identical on
    any cluster AND make retried tasks idempotent.
    """
    if salt_source is not None:
        salt = (
            F.conv(F.substring(F.md5(F.col(salt_source).cast("string")), 1, 8), 16, 10)
            .cast("long") % salts
        )
    else:
        salt = (F.crc32(F.to_json(F.struct(*df.columns))) % salts)
    staged = df.withColumn("_salt", salt)
    partial = staged.groupBy(*key_cols, "_salt").agg(
        *[expr.alias(name) for expr, name in partials]
    )
    return partial.groupBy(*key_cols).agg(
        *[F.expr(sql).alias(name) for sql, name in finals]
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Join a skewed big side to a small side by replicating the small
    side across ``salts`` salt values. Output columns = big's columns +
    small's non-key columns (inner join semantics).

    The salt must VARY WITHIN a key to spread it — salting by the key
    itself would put the hot key's rows back into one task and the
    whole construction would be a no-op. With no row-identifying
    ``salt_source``, the whole-row hash (same rule as salted_agg's
    default) is used; rows that are full duplicates share a salt, which
    only matters if the hot key's rows are mostly identical."""
    if salt_source is not None:
        if salt_source == key:
            raise ValueError(
                "salt_source must vary within the join key — salting by "
                "the key itself leaves the hot key in a single task"
            )
        salt = (
            F.conv(F.substring(F.md5(F.col(salt_source).cast("string")), 1, 8), 16, 10)
            .cast("long") % salts
        )
    else:
        salt = F.crc32(F.to_json(F.struct(*big.columns))) % salts
    big_s = big.withColumn("_salt", salt)
    small_s = small.crossJoin(
        F.broadcast(big.sparkSession.range(salts).select(F.col("id").alias("_salt")))
    )
    out = big_s.join(small_s, [key, "_salt"], "inner").drop("_salt")
    return out
