"""Sensitive-column classification from DLP-style findings (SURVEY.md
J2-J4; reference: DataCatalogController.py:873-984 /
apply_sensitive_column_config).

Reference pipeline, per asset, as three generated BigQuery statements:

1. dlp_sql (:882-886): unnest nested findings records ->
   ``array_agg(distinct infotype) per field``;
2. is_sql (:909-941): for each field, find the SMALLEST
   infotype_selection row whose ``field_infotypes`` array contains ALL
   of the field's infotypes (dynamically generated N-way unnest
   conjunction + ``order by array_length limit 1``);
3. c_sql (:948-984): same containment pattern over the deduped set of
   the table's notable infotypes -> one classification_result.

Spark-first: the N-way unnest conjunction collapses to an
array-containment predicate ``size(array_except(needed, have)) == 0``
against the broadcast selection/classification tables, and "smallest
superset" is ``min_by(row, size(arr))`` — one pass, no per-asset SQL
generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def field_infotypes(findings: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """J2: per-field distinct infotypes, sorted for determinism.

    findings: (field STRING, infotype STRING) — the already-unnested
    shape of the reference's dlp_sql output (the nested-record unnest
    itself is ``explode`` on the struct path when findings arrive raw).
    Returns (field, infotypes ARRAY<STRING> sorted). ``keys`` widens the
    grain for multi-asset batches (e.g. ['asset_uri', 'field']) — the
    engine's one-pass replacement for the reference's per-asset dlp_sql.
    """
    return findings.groupBy(*(keys or ["field"])).agg(
        F.array_sort(F.collect_set("infotype")).alias("infotypes")
    )


def unnest_raw_findings(raw: DataFrame) -> DataFrame:
    """Unnest the reference's raw DLP findings shape
    (location.content_locations[].record_location.field_id.name,
    info_type.name) into (field, infotype) rows."""
    return raw.select(
        F.explode(F.col("location")["content_locations"]).alias("cl"),
        F.col("info_type")["name"].alias("infotype"),
    ).select(F.col("cl")["record_location"]["field_id"]["name"].alias("field"), "infotype")


def select_notable_infotype(
    per_field: DataFrame, selection: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """J3: for each field, the notable_infotype of the smallest selection
    row whose field_infotypes superset-contains the field's infotypes.

    per_field: (field, infotypes ARRAY) from field_infotypes().
    selection: (field_infotypes ARRAY<STRING>, notable_infotype STRING).
    Returns (field, notable_infotype) — fields with no containing row drop.
    """
    joined = per_field.join(
        F.broadcast(selection),
        F.size(F.array_except(per_field["infotypes"], selection["field_infotypes"])) == 0,
        "inner",
    )
    return joined.groupBy(*(keys or ["field"])).agg(
        F.min_by(
            F.col("notable_infotype"),
            F.struct(F.size("field_infotypes"), F.col("notable_infotype")),
        ).alias("notable_infotype")
    )


def classify_table(notables: DataFrame, classification: DataFrame) -> DataFrame:
    """J4: one classification_result for the table: smallest
    classification row whose notable_infotypes contains ALL the table's
    distinct notable infotypes (reference c_sql :948-984).

    notables: (field, notable_infotype) from select_notable_infotype().
    classification: (notable_infotypes ARRAY<STRING>, classification_result STRING).
    Returns a 1-row DataFrame (classification_result STRING).
    """
    table_set = notables.agg(
        F.array_sort(F.collect_set("notable_infotype")).alias("have")
    )
    joined = table_set.join(
        F.broadcast(classification),
        F.size(F.array_except(F.col("have"), F.col("notable_infotypes"))) == 0,
        "inner",
    )
    return joined.agg(
        F.min_by(
            F.col("classification_result"),
            F.struct(F.size("notable_infotypes"), F.col("classification_result")),
        ).alias("classification_result")
    )
