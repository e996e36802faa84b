"""Export/report (S9-S12) and job-rollup (A10/A11) tests."""

import datetime

from datacatalog_tag_engine_spark.model.schemas import TAGS_SCHEMA
from datacatalog_tag_engine_spark.operators import export as X
from datacatalog_tag_engine_spark.store.jobs import rollup_tasks

TAGS = [
    ("p/datasets/d/tables/t1", None, "gov", "domain", "string", "LOGISTICS", None, None, None, None, None),
    ("p/datasets/d/tables/t1", None, "gov", "days", "double", None, 30.0, None, None, None, None),
    ("p/datasets/d/tables/t1", "c1", "gov", "domain", "string", "KEYS", None, None, None, None, None),
    ("p/datasets/d", None, "gov", "domain", "string", "DS-LEVEL", None, None, None, None, None),
    ("p/datasets/d/tables/t1", None, "gov", "rich", "richtext", "a<br>b", None, None, None, None, None),
    ("p/datasets/d/tables/t1", None, "gov", "when", "datetime", None, None, None, datetime.datetime(2023, 1, 2, 3, 4, 5), None, None),
]


def _tags(spark):
    return spark.createDataFrame(TAGS, TAGS_SCHEMA)


def test_table_grain(spark):
    got = {r["tag_field"]: r["tag_value"] for r in X.export_table_tags(_tags(spark)).collect()}
    assert got == {
        "domain": "LOGISTICS",
        "days": "30.0",
        "rich": "a, b",
        "when": "2023-01-02T03:04:05Z",
    }


def test_column_grain(spark):
    rows = X.export_column_tags(_tags(spark)).collect()
    assert len(rows) == 1
    assert (rows[0]["column"], rows[0]["tag_value"]) == ("c1", "KEYS")


def test_dataset_grain(spark):
    rows = X.export_dataset_tags(_tags(spark)).collect()
    assert len(rows) == 1
    assert rows[0]["tag_value"] == "DS-LEVEL"
    assert "table" not in rows[0].asDict()


def test_report_write_roundtrip(spark, tmp_path):
    path = str(tmp_path / "report")
    X.write_report(X.export_table_tags(_tags(spark)), path)
    X.write_report(X.export_table_tags(_tags(spark)), path)  # append
    assert spark.read.parquet(path).count() == 8
    X.write_report(X.export_table_tags(_tags(spark)), path, truncate=True)
    assert spark.read.parquet(path).count() == 4


def test_job_rollup(spark):
    tasks = spark.createDataFrame(
        [
            ("j1", "c1", "T", "SUCCESS"),
            ("j1", "c1", "T", "ERROR"),
            ("j2", "c2", "T", "SUCCESS"),
            ("j2", "c2", "T", "PENDING"),
        ],
        "job_uuid string, config_uuid string, config_type string, status string",
    )
    got = {r["job_uuid"]: r for r in rollup_tasks(tasks).collect()}
    assert got["j1"]["job_status"] == "ERROR"
    assert got["j1"]["pct_complete"] == 100.0
    assert got["j2"]["job_status"] == "RUNNING"
    assert got["j2"]["pct_complete"] == 50.0
