"""KMV (K-Minimum-Values) distinct-count sketch.

Why KMV here instead of HyperLogLog: identical estimates from any
engine that has md5 — the sketch is just the k smallest hash fractions
of the value set, so the DuckDB oracle replays it bit-for-bit
(approx_count_distinct implementations differ per engine and can't be
oracle-checked). Estimator: (k-1) / u_k where u_k is the k-th smallest
hash mapped into (0,1]; relative error ~ 1/sqrt(k-2).

The sketch is a bounded set of doubles -> trivially distributed:
per-partition sketches are k-smallest sets, merging is
union-then-keep-k-smallest, so the shuffle carries k values per
partition regardless of data size (the same partial/final shape as any
Spark aggregate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TWO_32 = float(2**32)


def hash_fraction(col: Column) -> Column:
    """Value -> hash fraction in (0, 1]: first 8 md5 hex chars over 2^32
    (+1 to avoid zero). Engine-portable."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("double") + 1.0) / TWO_32


def kmv_sketch(df: DataFrame, col: str, k: int = 256) -> list[float]:
    """Materialize the sketch: the k smallest distinct hash fractions."""
    rows = (
        df.select(hash_fraction(F.col(col)).alias("u"))
        .distinct()
        .orderBy("u")
        .limit(k)
        .collect()
    )
    return [r["u"] for r in rows]


def kmv_merge(sketches: list[list[float]], k: int = 256) -> list[float]:
    """Union sketches: distinct hashes, keep the k smallest — the
    partial/final merge step."""
    return sorted(set().union(*[set(s) for s in sketches]))[:k]


def kmv_estimate(sketch: list[float], k: int = 256) -> float:
    """(k-1)/u_k; if fewer than k distinct hashes exist the sketch IS
    the exact distinct set."""
    if len(sketch) < k:
        return float(len(sketch))
    return (k - 1) / sketch[k - 1]


def kmv_distinct_df(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row DataFrame (k, u_k, estimate) — the fully-declarative form
    used by the oracle-checked query (no driver collect)."""
    u = (
        df.select(hash_fraction(F.col(col)).alias("u"))
        .distinct()
        .orderBy("u")
        .limit(k)
    )
    return u.agg(
        F.count("*").alias("k_used"),
        F.max("u").alias("u_k"),
        F.round(
            F.when(F.count("*") < k, F.count("*").cast("double")).otherwise(
                (F.lit(k - 1)) / F.max("u")
            ),
            4,
        ).alias("estimate"),
    )


def hll_sketch_by_group(
    df: DataFrame, group_col: str, col: str, lgk: int = 12
) -> DataFrame:
    """(group, sketch binary): Apache DataSketches HLL partials via
    Spark's built-in ``hll_sketch_agg`` — the INDUSTRIAL sibling of the
    KMV sketch above. KMV stays the oracle-checkable form (engine-
    portable md5 math); HLL is the at-scale form: ~2.5 KB of state per
    group at lgK=12 for ~1.6% relative error, and the binary sketches
    are MERGEABLE (``hll_union_agg``), so daily/partition partials roll
    up without rescanning — the pattern a 100 TB corpus needs for
    distinct-token/url/doc dashboards. Rows-only territory for the
    correctness driver (DataSketches binaries are not SQL-replayable);
    accuracy is pytest-bounded against exact counts."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(F.col(col).cast("string"), F.lit(lgk)).alias("sketch")
    )


def hll_estimate(sketches: DataFrame, group_col: str | None = None) -> DataFrame:
    """Estimates from sketch partials. With ``group_col``: per-group
    (group, estimate), MERGING multiple partials per group first — so a
    union of daily sketch tables rolls up to one row per group, the
    advertised no-rescan pattern. Without: ONE row, the union of every
    sketch (the global rollup)."""
    if group_col is not None:
        return sketches.groupBy(group_col).agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("estimate")
        )
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("estimate")
    )
