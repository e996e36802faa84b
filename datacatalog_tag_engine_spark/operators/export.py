"""Tag export to reporting tables (SURVEY.md S9/S11/S12; reference:
BigQueryUtils.py:234-313 report tables, DataCatalogController.py export
path :1100-1250).

The reference exports every tag as stringified rows into three
day-partitioned BQ tables (dataset / table / column grain) after an
optional truncate. Here: one projection from the long tags table per
grain — the value render is the typed-columns coalesce (SURVEY F10
becomes trivial), asset uri parsing is string splitting, and the write
is ``mode=append`` (or ``overwrite`` for truncate semantics,
BigQueryUtils.py:54-63) partitioned by export date.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model.coercion import render_tag_value, richtext_export_swap


def _rendered(tags: DataFrame) -> DataFrame:
    value = render_tag_value(
        F.col("field_type"),
        F.col("field_value_string"),
        F.col("field_value_double"),
        F.col("field_value_bool"),
        F.col("field_value_ts"),
    )
    # richtext <br> separators export as ', ' (reference :301)
    value = F.when(
        F.col("field_type") == "richtext", richtext_export_swap(value)
    ).otherwise(value)
    parts = F.split(F.col("asset_uri"), "/")
    return tags.select(
        parts.getItem(0).alias("project"),
        F.element_at(parts, 3).alias("dataset"),
        F.element_at(parts, 5).alias("table"),
        F.col("column"),
        F.col("template_id").alias("tag_template"),
        F.col("field_id").alias("tag_field"),
        value.alias("tag_value"),
    )


def export_column_tags(tags: DataFrame) -> DataFrame:
    """Column-grain report (reference BigQueryUtils.py:292-305)."""
    return (
        _rendered(tags.filter(F.col("column").isNotNull()))
        .withColumn("export_time", F.current_timestamp())
    )


def export_table_tags(tags: DataFrame) -> DataFrame:
    """Table-grain report (reference :277-289): table-level tags only."""
    return (
        _rendered(tags.filter(F.col("column").isNull() & F.col("asset_uri").contains("/tables/")))
        .drop("column")
        .withColumn("export_time", F.current_timestamp())
    )


def export_dataset_tags(tags: DataFrame) -> DataFrame:
    """Dataset-grain report (reference :263-274): tags on dataset-level
    asset uris (no /tables/ component)."""
    return (
        _rendered(tags.filter(~F.col("asset_uri").contains("/tables/")))
        .drop("column", "table")
        .withColumn("export_time", F.current_timestamp())
    )


def write_report(df: DataFrame, path: str, truncate: bool = False) -> None:
    """Append (or truncate-then-load, S12) a report table, partitioned by
    export date — the Spark shape of the reference's day-partitioned BQ
    tables."""
    out = df.withColumn("export_date", F.to_date("export_time"))
    out.write.mode("overwrite" if truncate else "append").partitionBy("export_date").parquet(path)
