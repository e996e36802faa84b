"""JSONL backup restore (SURVEY.md S6/P7; reference:
BackupFileParser.py:18-126 / extract_tags).

The backup export is jsonlines, one object per catalog entry, with
table-level ``tags`` and column-level ``columns[].tags`` arrays. The
reference filters objects to one (templateId, projectId), prunes
non-matching tag elements, and drops createTime/updateTime/snapshotTime
(:74-121).

Spark-first: ``spark.read.json`` parses the file distributed; the
object/element filters become array ``filter`` expressions and two
``explode`` passes (table tags, column tags) emit long tag rows. The
field values arrive typed by name ('BOOL'|'STRING'|'DOUBLE'|'ENUM'|
'RICHTEXT'|'TIMESTAMP' per FIXTURES.md section 8) and map onto the
engine's lowercase field types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BACKUP_SCHEMA = (
    "entryGroupId string, id string, locationId string, projectId string, "
    "tags array<struct<templateId:string, projectId:string, "
    "fields:array<struct<name:string, type:string, value:string>>>>, "
    "columns array<struct<name:string, tags:array<struct<templateId:string, projectId:string, "
    "fields:array<struct<name:string, type:string, value:string>>>>>>, "
    "createTime string, updateTime string, snapshotTime string"
)

_TYPE_MAP = {
    "BOOL": "bool",
    "STRING": "string",
    "DOUBLE": "double",
    "ENUM": "enum",
    "RICHTEXT": "richtext",
    "TIMESTAMP": "timestamp",
}


def read_backup(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(BACKUP_SCHEMA).json(path)


def _tag_matches(tag_col, template_id: str, project_id: str):
    return (tag_col["templateId"] == template_id) & (tag_col["projectId"] == project_id)


def restore_tag_rows(backup: DataFrame, template_id: str, project_id: str) -> DataFrame:
    """Filter + prune + flatten a backup to raw long tag rows for one
    (template, project) — the engine-side shape of the reference's
    per-object loop (BackupFileParser.py:74-121).

    Column names in the backup are 'entry:col' qualified; the part after
    the last ':' is the column (reference :100-104 keeps the raw name —
    we normalize since the tags table keys on the bare column).
    """
    entries = backup.filter(F.col("projectId") == project_id)
    asset_uri = F.concat_ws(
        "/", F.col("projectId"), F.lit("datasets"), F.col("entryGroupId"), F.lit("tables"), F.col("id")
    )

    table_tags = (
        entries.select(
            asset_uri.alias("asset_uri"),
            F.explode(
                F.filter(F.col("tags"), lambda t: _tag_matches(t, template_id, project_id))
            ).alias("tag"),
        )
        .select("asset_uri", F.lit(None).cast("string").alias("column"), F.explode(F.col("tag")["fields"]).alias("f"))
    )

    col_tags = (
        entries.select(
            asset_uri.alias("asset_uri"),
            F.explode(F.col("columns")).alias("c"),
        )
        .select(
            "asset_uri",
            F.element_at(F.split(F.col("c")["name"], ":"), -1).alias("column"),
            F.explode(
                F.filter(F.col("c")["tags"], lambda t: _tag_matches(t, template_id, project_id))
            ).alias("tag"),
        )
        .select("asset_uri", "column", F.explode(F.col("tag")["fields"]).alias("f"))
    )

    type_map = F.create_map(*[F.lit(x) for kv in _TYPE_MAP.items() for x in kv])
    out = table_tags.unionByName(col_tags).select(
        "asset_uri",
        "column",
        F.lit(template_id).alias("template_id"),
        F.col("f")["name"].alias("field_id"),
        type_map[F.upper(F.col("f")["type"])].alias("field_type"),
        F.col("f")["value"].alias("raw_value"),
    )
    return out
