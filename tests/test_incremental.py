"""Incremental refresh pruning and schema drift tests."""

import datetime

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.model.schemas import ASSETS_SCHEMA, TAGS_SCHEMA
from datacatalog_tag_engine_spark.operators.incremental import schema_diff, stale_assets


def ts(s):
    return datetime.datetime.fromisoformat(s)


def _assets(spark, rows):
    return spark.createDataFrame(
        [
            {"asset_uri": u, "asset_type": "bigquery", "project": "p", "dataset": "d",
             "table": u.rsplit("/", 1)[-1], "updated_ts": up,
             "schema": [{"name": c, "type": t, "mode": None, "subcolumns": None} for c, t in cols]}
            for u, up, cols in rows
        ],
        ASSETS_SCHEMA,
    )


def test_stale_assets_prunes_unchanged(spark):
    assets = _assets(spark, [
        ("p/datasets/d/tables/fresh", ts("2026-01-01 00:00:00"), [("a", "INT")]),
        ("p/datasets/d/tables/changed", ts("2026-01-03 00:00:00"), [("a", "INT")]),
        ("p/datasets/d/tables/untagged", ts("2026-01-01 00:00:00"), [("a", "INT")]),
    ])
    tags = spark.createDataFrame(
        [
            ("p/datasets/d/tables/fresh", None, "t", "f", "string", "v", None, None, None, None, ts("2026-01-02 00:00:00")),
            ("p/datasets/d/tables/changed", None, "t", "f", "string", "v", None, None, None, None, ts("2026-01-02 00:00:00")),
        ],
        TAGS_SCHEMA,
    )
    got = {r["asset_uri"].rsplit("/", 1)[-1] for r in stale_assets(assets, tags).collect()}
    assert got == {"changed", "untagged"}


def test_schema_diff(spark):
    old = _assets(spark, [
        ("p/datasets/d/tables/t1", None, [("keep", "INT"), ("drop_me", "INT"), ("retype", "INT")]),
        ("p/datasets/d/tables/gone", None, [("x", "INT")]),
    ])
    new = _assets(spark, [
        ("p/datasets/d/tables/t1", None, [("keep", "INT"), ("added", "STRING"), ("retype", "STRING")]),
        ("p/datasets/d/tables/brand_new", None, [("y", "INT")]),
    ])
    got = {(r["asset_uri"].rsplit("/", 1)[-1], r["column"], r["change"]) for r in schema_diff(old, new).collect()}
    assert got == {
        ("t1", "added", "ADDED"),
        ("t1", "drop_me", "REMOVED"),
        ("t1", "retype", "RETYPED"),
        ("gone", None, "ASSET_REMOVED"),
        ("brand_new", None, "ASSET_ADDED"),
    }


def test_schema_diff_no_drift(spark):
    a = _assets(spark, [("p/datasets/d/tables/t1", None, [("a", "INT")])])
    assert schema_diff(a, a).count() == 0


def test_engine_incremental_refresh_skips_fresh_assets(spark):
    from datacatalog_tag_engine_spark.engine import TagEngine

    eng = TagEngine(spark)
    eng.create_template("t", [{"field_id": "owner", "field_type": "string"}])
    assets = _assets(spark, [
        ("p/datasets/d/tables/a", ts("2026-01-01 00:00:00"), [("x", "INT")]),
        ("p/datasets/d/tables/b", ts("2026-01-01 00:00:00"), [("x", "INT")]),
    ])
    cfg = eng.create_config(
        "STATIC_TAG_ASSET", "t", included_uris="bigquery/project/p/dataset/d/*",
        fields=[{"field_id": "owner", "field_value": "v1"}],
    )
    j1 = eng.trigger_job(cfg, assets)
    # second run: nothing changed -> incremental refresh touches 0 assets
    cfg2 = eng.create_config(
        "STATIC_TAG_ASSET", "t", included_uris="bigquery/project/p/dataset/d/*",
        fields=[{"field_id": "owner", "field_value": "v2"}],
    )
    j2 = eng.trigger_job(cfg2, assets, incremental=True)
    jobs = {j["job_uuid"]: j for j in eng.jobs}
    assert jobs[j1]["tasks_success"] == 2
    assert jobs[j2]["tasks_success"] == 0
    vals = {r["field_value_string"] for r in eng.store.all().collect()}
    assert vals == {"v1"}


def test_incremental_delta_bloom_equals_exact(spark):
    from pyspark.sql import functions as F

    from datacatalog_tag_engine_spark.pipeline import dedup as DD

    docs = spark.table("documents")
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    prior = docs.filter(F.col("doc_id") % 3 != 0)
    exact = {(r["doc_id"], r["fingerprint"]) for r in DD.incremental_delta(batch, prior).collect()}
    bloom = {
        (r["doc_id"], r["fingerprint"])
        for r in DD.incremental_delta_bloom(batch, prior).collect()
    }
    assert bloom == exact
    # tiny bitmap: heavy false-positive pressure — membership must still
    # be exact because every maybe-dup goes through the exact verify
    stressed = {
        (r["doc_id"], r["fingerprint"])
        for r in DD.incremental_delta_bloom(batch, prior, num_bits=64, k=2).collect()
    }
    assert stressed == exact


def test_schema_diff_schemaless_assets_report_no_drift(spark):
    """Regression: assets with null schema arrays produced spurious
    ADDED+REMOVED rows (explode_outer NULL columns never join)."""
    from datacatalog_tag_engine_spark.operators.incremental import schema_diff

    snap = spark.createDataFrame(
        [("a1", None)],
        "asset_uri string, schema array<struct<name string, type string>>",
    )
    assert schema_diff(snap, snap).count() == 0
