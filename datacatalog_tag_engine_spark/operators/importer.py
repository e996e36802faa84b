"""CSV tag import (SURVEY.md S5/J5/P8; reference: CsvParser.py:23-62,
DataCatalogController.py:1297-1412 / apply_import_config).

Reference semantics:

* the CSV header names key columns (project, dataset, table[, column],
  entry_group, fileset, instance, database, schema) plus one column per
  template field (reference key-column list :1343-1348);
* values are right-stripped (CsvParser.py:45-60);
* every non-key column must name a template field or the row errors
  (:1343-1361);
* empty values are skipped, not written (:1364-1365); a row whose field
  values are ALL empty deletes the existing tag (:1584-1586) — that
  semantics lives in TagStore.merge;
* bool fields use the 'TRUE' string rule, richtext ','->'<br>'
  (:1510-1537).

Spark-first: the CSV becomes one DataFrame; the per-row field loop
becomes a melt (stack) to long rows and one broadcast join against the
template's field list. One scan, one tiny join, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model.coercion import richtext_import_swap

KEY_COLUMNS = (
    "project",
    "dataset",
    "table",
    "column",
    "entry_group",
    "fileset",
    "instance",
    "database",
    "schema",
)


def read_tag_csv(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """S5/U3: one CSV path, a glob, or a list of paths.

    A list reads each file independently and concatenates by column
    name with missing columns null-filled (the reference concatenates
    per-file extracts, main.py:3433-3436) — files may carry different
    field-column subsets; a null melts to skip semantics downstream. A
    glob string stays a single multi-file scan (same header expected),
    which is the scale path: one job, splittable across executors.
    """
    if isinstance(path, (list, tuple)):
        if not path:
            raise ValueError("no CSV paths to import")
        dfs = [read_tag_csv(spark, p) for p in path]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out
    df = spark.read.option("header", True).csv(path)
    return df.select([F.rtrim(F.col(c)).alias(c) for c in df.columns])


def build_asset_uri(df: DataFrame) -> DataFrame:
    """Derive the catalog resource uri from whichever key columns the
    CSV carries (reference uri forms, Resources.py:131-147)."""
    cols = set(df.columns)
    if {"project", "dataset", "table"} <= cols:
        uri = F.concat_ws(
            "/", F.col("project"), F.lit("datasets"), F.col("dataset"), F.lit("tables"), F.col("table")
        )
    elif {"project", "dataset"} <= cols:
        uri = F.concat_ws("/", F.col("project"), F.lit("datasets"), F.col("dataset"))
    elif {"project", "entry_group", "fileset"} <= cols:
        uri = F.concat_ws(
            "/", F.col("project"), F.lit("entry_groups"), F.col("entry_group"), F.lit("filesets"), F.col("fileset")
        )
    else:
        raise ValueError(f"cannot derive asset uri from columns {sorted(cols)}")
    return df.withColumn("asset_uri", uri)


def melt_to_tag_rows(
    csv_df: DataFrame,
    template_fields: DataFrame,
    template_id: str,
) -> DataFrame:
    """J5: melt non-key CSV columns to long rows and type them via the
    template's field list (broadcast join on field_id).

    template_fields: TEMPLATES_SCHEMA rows for one template.
    Returns raw long rows (asset_uri, column, template_id, field_id,
    field_type, raw_value) ready for coerce_long_rows(bool_mode='csv');
    empty-string values become nulls (skip semantics; an all-null tag
    group triggers delete-when-empty in TagStore.merge).

    Raises ValueError when a CSV column matches no template field
    (reference errors the row; we fail the batch loudly, :1343-1361).
    """
    df = build_asset_uri(csv_df)
    field_cols = [c for c in csv_df.columns if c not in KEY_COLUMNS]
    if not field_cols:
        raise ValueError("CSV has no tag field columns")
    known = {r["field_id"]: r["field_type"] for r in template_fields.collect()}
    unknown = [c for c in field_cols if c not in known]
    if unknown:
        raise ValueError(f"CSV columns not in template {template_id!r}: {unknown}")

    column_col = F.col("column") if "column" in csv_df.columns else F.lit(None).cast("string")

    stack_args = []
    for c in field_cols:
        stack_args.append(F.lit(c))
        stack_args.append(F.col(c))
    long_df = df.select(
        "asset_uri",
        column_col.alias("column"),
        F.stack(F.lit(len(field_cols)), *stack_args).alias("field_id", "raw_value"),
    )
    type_map = F.create_map(*[F.lit(x) for kv in known.items() for x in kv])
    long_df = long_df.select(
        "asset_uri",
        "column",
        F.lit(template_id).alias("template_id"),
        "field_id",
        type_map[F.col("field_id")].alias("field_type"),
        F.when(F.col("raw_value") == "", None).otherwise(F.col("raw_value")).alias("raw_value"),
    )
    # richtext ',' separators import as '<br>' (reference :1533-1537)
    return long_df.withColumn(
        "raw_value",
        F.when(
            (F.col("field_type") == "richtext") & F.col("raw_value").isNotNull(),
            richtext_import_swap(F.col("raw_value")),
        ).otherwise(F.col("raw_value")),
    )
