"""Reproducible sampling and distribution summaries for training-data
pipelines.

``deterministic_sample`` is hash-bucket sampling: membership depends
only on the key (md5 bucket), never on partitioning, executor count, or
seed plumbing — re-running on any cluster, any engine, yields the SAME
sample. That property is what makes pipeline snapshots auditable
(Spark's ``sample()`` is seed+partition dependent and irreproducible
across layouts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(key: Column, buckets: int = BUCKETS) -> Column:
    """Engine-portable bucket in [0, buckets): first 8 md5 hex chars of
    the stringified key, mod buckets."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long") % buckets


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, buckets: int = BUCKETS
) -> DataFrame:
    """Keep rows whose key bucket falls below fraction*buckets. Same
    keys in -> same sample out, anywhere."""
    return df.filter(hash_bucket(F.col(key_col), buckets) < int(fraction * buckets))


def stratified_deterministic_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float], buckets: int = BUCKETS
) -> DataFrame:
    """Per-stratum fractions (e.g. downsample 'en' to 10%, keep 'de'),
    same hash-bucket reproducibility."""
    bucket = hash_bucket(F.col(key_col), buckets)
    thresh = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in (kv[0], int(kv[1] * buckets))]
    )
    return df.filter(bucket < F.coalesce(thresh[F.col(strata_col)], F.lit(buckets)))


def train_val_test_split(
    df: DataFrame,
    key_col: str = "doc_id",
    strata_col: str = "source",
    train_bp: int = 8000,
    val_bp: int = 1000,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Deterministic train/val/test assignment: the key's md5 bucket
    decides the split (< train_bp -> train, next val_bp -> val, rest ->
    test). Membership depends only on the key, so the split is stable
    across reruns, engines, and cluster layouts — and documents can
    never leak between splits when the corpus is re-partitioned or
    appended to (new keys land in splits at the same ratios; existing
    keys never move). Returns (key, strata, split) — a codegen
    projection, no shuffle."""
    bucket = hash_bucket(F.col(key_col), buckets)
    split = (
        F.when(bucket < train_bp, F.lit("train"))
        .when(bucket < train_bp + val_bp, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.select(key_col, strata_col, split.alias("split"))


def histogram(
    df: DataFrame, value: Column, bucket_width: float, max_buckets: int = 100
) -> DataFrame:
    """Fixed-width histogram: (bucket, lo, n); values past the last
    bucket clamp into it. One aggregation pass."""
    b = F.least(F.floor(value / bucket_width), F.lit(max_buckets - 1)).cast("long")
    return (
        df.select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .select("bucket", (F.col("bucket") * F.lit(float(bucket_width))).alias("lo"), "n")
    )
