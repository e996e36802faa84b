"""URI algebra tests (SURVEY P1/P2/U1; reference Resources.py:149-269
wildcard semantics, FIXTURES.md section 10)."""

import pytest

from datacatalog_tag_engine_spark.model.schemas import ASSETS_SCHEMA
from datacatalog_tag_engine_spark.operators import uri as U


@pytest.fixture(scope="module")
def assets(spark):
    rows = []
    for project, dataset, table in [
        ("p", "d", "tbl_a"),
        ("p", "d", "tbl_b"),
        ("p", "d", "tbl_ab"),
        ("p", "d", "other"),
        ("p", "d2", "tbl_a"),
        ("p", "extra_d2", "zzz"),
        ("q", "d", "tbl_a"),
    ]:
        rows.append(
            {
                "asset_uri": f"{project}/datasets/{dataset}/tables/{table}",
                "asset_type": "bigquery",
                "project": project,
                "dataset": dataset,
                "table": table,
            }
        )
    return spark.createDataFrame(rows, ASSETS_SCHEMA)


def tables(df):
    return sorted(r["asset_uri"] for r in df.collect())


def test_star_matches_all_tables_in_dataset(assets):
    out = U.expand_uris(assets, "bigquery/project/p/dataset/d/*")
    assert tables(out) == [
        "p/datasets/d/tables/other",
        "p/datasets/d/tables/tbl_a",
        "p/datasets/d/tables/tbl_ab",
        "p/datasets/d/tables/tbl_b",
    ]


def test_substring_wildcard_matches_full_table_id(assets):
    # reference matches substrings against project:dataset.table
    out = U.expand_uris(assets, "bigquery/project/p/dataset/d/tbl_a*")
    assert tables(out) == ["p/datasets/d/tables/tbl_a", "p/datasets/d/tables/tbl_ab"]
    # substring can span the dataset.table boundary
    out2 = U.expand_uris(assets, "bigquery/project/p/dataset/d/*d.tbl_b*")
    assert tables(out2) == ["p/datasets/d/tables/tbl_b"]


def test_exact_table(assets):
    out = U.expand_uris(assets, "bigquery/project/p/dataset/d/tbl_a")
    assert tables(out) == ["p/datasets/d/tables/tbl_a"]


def test_dataset_wildcard_is_containment_not_prefix(assets):
    # reference: `dataset[:-1] in ds.dataset_id` — 'd2*' also matches 'extra_d2'
    out = U.expand_uris(assets, "bigquery/project/p/dataset/d2*/*")
    assert tables(out) == ["p/datasets/d2/tables/tbl_a", "p/datasets/extra_d2/tables/zzz"]


def test_project_level(assets):
    out = U.expand_uris(assets, "bigquery/project/q")
    assert tables(out) == ["q/datasets/d/tables/tbl_a"]


def test_comma_union(assets):
    out = U.expand_uris(
        assets, "bigquery/project/p/dataset/d/tbl_a, bigquery/project/q/dataset/d/*"
    )
    assert tables(out) == ["p/datasets/d/tables/tbl_a", "q/datasets/d/tables/tbl_a"]


def test_include_minus_exclude(assets):
    out = U.expand_included_excluded(
        assets,
        "bigquery/project/p/dataset/d/*",
        "bigquery/project/p/dataset/d/tbl_*",
    )
    assert tables(out) == ["p/datasets/d/tables/other"]


def test_dataset_level_uri(assets):
    p = U.parse_uri("bigquery/project/p/dataset/d")
    assert p["level"] == U.DATASET_TAG


def test_dataset_level_matches_dataset_asset_not_tables(spark, assets):
    # inventory with a dataset-grain row (table null) alongside tables
    ds_row = spark.createDataFrame(
        [{"asset_uri": "p/datasets/d", "asset_type": "bigquery",
          "project": "p", "dataset": "d", "table": None}],
        assets.schema,
    )
    inventory = assets.unionByName(ds_row)
    # dataset-level uri -> ONLY the dataset asset (reference tags the
    # dataset, not each table in it)
    got = tables(U.expand_uris(inventory, "bigquery/project/p/dataset/d"))
    assert got == ["p/datasets/d"]
    # table wildcard never matches the dataset-grain row
    got2 = tables(U.expand_uris(inventory, "bigquery/project/p/dataset/d/*"))
    assert "p/datasets/d" not in got2


def test_invalid_uri_raises():
    with pytest.raises(ValueError):
        U.parse_uri("spanner/thing")
    # regression: a uri ending AT the dataset keyword raised IndexError
    with pytest.raises(ValueError):
        U.parse_uri("bigquery/project/p/dataset")


def test_column_exists_nested(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (
                "a",
                [
                    {"name": "top", "type": "STRING", "mode": None, "subcolumns": None},
                    {
                        "name": "parent",
                        "type": "RECORD",
                        "mode": None,
                        "subcolumns": [{"name": "child", "type": "STRING"}],
                    },
                ],
            )
        ],
        "asset_uri string, schema array<struct<name:string,type:string,mode:string,subcolumns:array<struct<name:string,type:string>>>>",
    )
    got = df.select(
        U.column_exists_in_schema(F.col("schema"), "top").alias("a"),
        U.column_exists_in_schema(F.col("schema"), "parent.child").alias("b"),
        U.column_exists_in_schema(F.col("schema"), "parent.nope").alias("c"),
        U.column_exists_in_schema(F.col("schema"), "missing").alias("d"),
    ).first()
    assert (got["a"], got["b"], got["c"], got["d"]) == (True, True, False, False)
