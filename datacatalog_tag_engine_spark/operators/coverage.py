"""Tag coverage reporting (SURVEY.md J6/A9; reference:
TagEngineStoreHandler.py:209-253 / generate_coverage_report).

The reference lists every table per dataset, looks up per-asset tag
counts from catalog search, applies dataset/table exclusions, and rolls
up per-dataset sums. One left join + one aggregation here; exclusions
are anti-join predicates (P9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coverage_report(
    assets: DataFrame,
    tags: DataFrame,
    excluded_datasets: list[str] | None = None,
    excluded_tables: list[str] | None = None,
) -> DataFrame:
    """Per-dataset coverage: table_count, tagged_tables, tag_count, plus
    the per-table breakdown the reference renders (collect_list of
    (table, tag_count) sorted by table)."""
    # NULL-valued dataset/table rows (dataset-level assets have
    # table=NULL) must SURVIVE an exclusion filter that doesn't name
    # them: a bare ~isin() evaluates to NULL for them and silently
    # drops rows the exclusion never mentioned
    a = assets
    if excluded_datasets:
        a = a.filter(F.col("dataset").isNull() | ~F.col("dataset").isin(excluded_datasets))
    if excluded_tables:
        a = a.filter(F.col("table").isNull() | ~F.col("table").isin(excluded_tables))

    per_asset = tags.groupBy("asset_uri").agg(F.count("*").alias("tag_count"))
    joined = a.join(per_asset, "asset_uri", "left").withColumn(
        "tag_count", F.coalesce(F.col("tag_count"), F.lit(0))
    )
    return (
        joined.groupBy("project", "dataset")
        .agg(
            F.count("*").alias("table_count"),
            F.count(F.when(F.col("tag_count") > 0, 1)).alias("tagged_tables"),
            F.sum("tag_count").alias("tag_count"),
            F.array_sort(
                F.collect_list(F.struct(F.col("table"), F.col("tag_count").alias("n")))
            ).alias("tables"),
        )
    )
