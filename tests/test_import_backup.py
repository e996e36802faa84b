"""CSV import (S5/J5/P8) and JSONL backup (S6/P7) operator tests."""

import pytest

from datacatalog_tag_engine_spark.model.schemas import TEMPLATES_SCHEMA
from datacatalog_tag_engine_spark.operators import importer as IMP


def _template_fields(spark):
    rows = [
        ("t", "data_owner", None, "string", False, 0, None),
        ("t", "retention_days", None, "double", False, 1, None),
        ("t", "is_compliant", None, "bool", False, 2, None),
        ("t", "approved_by", None, "richtext", False, 3, None),
    ]
    return spark.createDataFrame(rows, TEMPLATES_SCHEMA)


def test_melt_table_level(spark):
    csv = spark.createDataFrame(
        [("p", "d", "tbl", "alice", "90", "TRUE")],
        "project string, dataset string, table string, data_owner string, retention_days string, is_compliant string",
    )
    rows = IMP.melt_to_tag_rows(csv, _template_fields(spark), "t").collect()
    got = {r["field_id"]: (r["field_type"], r["raw_value"]) for r in rows}
    assert got == {
        "data_owner": ("string", "alice"),
        "retention_days": ("double", "90"),
        "is_compliant": ("bool", "TRUE"),
    }
    assert all(r["asset_uri"] == "p/datasets/d/tables/tbl" for r in rows)
    assert all(r["column"] is None for r in rows)


def test_melt_column_level_and_empty_skip(spark):
    csv = spark.createDataFrame(
        [("p", "d", "tbl", "c1", "alice", "")],
        "project string, dataset string, table string, column string, data_owner string, retention_days string",
    )
    rows = IMP.melt_to_tag_rows(csv, _template_fields(spark), "t").collect()
    got = {r["field_id"]: r["raw_value"] for r in rows}
    assert got["data_owner"] == "alice"
    assert got["retention_days"] is None  # empty -> null (skip semantics)
    assert all(r["column"] == "c1" for r in rows)


def test_melt_richtext_comma_swap(spark):
    csv = spark.createDataFrame(
        [("p", "d", "tbl", "a@x.com, b@x.com")],
        "project string, dataset string, table string, approved_by string",
    )
    rows = IMP.melt_to_tag_rows(csv, _template_fields(spark), "t").collect()
    assert rows[0]["raw_value"] == "a@x.com<br>b@x.com"


def test_unknown_csv_column_fails_loudly(spark):
    csv = spark.createDataFrame(
        [("p", "d", "tbl", "x")],
        "project string, dataset string, table string, not_a_field string",
    )
    with pytest.raises(ValueError, match="not in template"):
        IMP.melt_to_tag_rows(csv, _template_fields(spark), "t")


def test_read_tag_csv_rtrims(spark, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("project,dataset,table,data_owner\np,d,tbl,alice  \n")
    df = IMP.read_tag_csv(spark, str(p))
    assert df.first()["data_owner"] == "alice"


def test_multi_file_csv_union(spark, tmp_path):
    """U3: a config with several CSVs concatenates their extracts
    (reference main.py:3433-3436), even when the files carry different
    field-column subsets."""
    a = tmp_path / "a.csv"
    a.write_text("project,dataset,table,data_owner\np,d,t1,alice\n")
    b = tmp_path / "b.csv"
    b.write_text("project,dataset,table,retention_days,is_compliant\np,d,t2,90,TRUE\n")
    df = IMP.read_tag_csv(spark, [str(a), str(b)])
    rows = IMP.melt_to_tag_rows(df, _template_fields(spark), "t").collect()
    got = {
        (r["asset_uri"], r["field_id"]): r["raw_value"]
        for r in rows
        if r["raw_value"] is not None
    }
    assert got == {
        ("p/datasets/d/tables/t1", "data_owner"): "alice",
        ("p/datasets/d/tables/t2", "retention_days"): "90",
        ("p/datasets/d/tables/t2", "is_compliant"): "TRUE",
    }
    # glob form: one multi-file scan with a shared header layout
    c = tmp_path / "glob" ; c.mkdir()
    (c / "x.csv").write_text("project,dataset,table,data_owner\np,d,t3,bob\n")
    (c / "y.csv").write_text("project,dataset,table,data_owner\np,d,t4,carol\n")
    df2 = IMP.read_tag_csv(spark, str(c / "*.csv"))
    owners = {r["table"]: r["data_owner"] for r in df2.collect()}
    assert owners == {"t3": "bob", "t4": "carol"}


def test_empty_csv_path_list_fails_loudly(spark):
    with pytest.raises(ValueError, match="no CSV paths"):
        IMP.read_tag_csv(spark, [])


def test_dataset_level_uri(spark):
    csv = spark.createDataFrame(
        [("p", "d", "alice")], "project string, dataset string, data_owner string"
    )
    rows = IMP.melt_to_tag_rows(csv, _template_fields(spark), "t").collect()
    assert rows[0]["asset_uri"] == "p/datasets/d"
