"""One scheduled-pipeline tick through ALL NINE reference config types
(ConfigType.py:4-12) plus SHARD_EXPORT (this repo's training-data
extension) — the engine-side equivalent of the reference's
examples/unit_tests.sh loop as a single cron pass: every config is
AUTO-scheduled, one run_ready_configs() call dispatches all of them,
and the assertions check the ledger, the tag store, the history
stream, the report export, the entry inventory, and the training-shard
manifest together."""

import datetime
import json

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.engine import TagEngine
from datacatalog_tag_engine_spark.model.schemas import ASSETS_SCHEMA

UTC = datetime.timezone.utc


def _assets(spark):
    rows = [
        {
            "asset_uri": f"p/datasets/d/tables/{t}",
            "asset_type": "bigquery",
            "project": "p",
            "dataset": "d",
            "table": t,
            "schema": [
                {"name": c, "type": None, "mode": None, "subcolumns": None}
                for c in spark.table(t).columns
            ],
        }
        for t in ["lineitem", "orders"]
    ] + [
        {"asset_uri": f"p/datasets/d2/tables/{t}", "asset_type": "bigquery",
         "project": "p", "dataset": "d2", "table": t}
        for t in ["users", "public_stuff"]
    ]
    return spark.createDataFrame(rows, ASSETS_SCHEMA)


def test_cron_tick_runs_all_ten_config_types(spark, tmp_path):
    eng = TagEngine(spark)
    eng.create_template("data_governance", [
        {"field_id": "data_owner", "field_type": "string"},
        {"field_id": "is_compliant", "field_type": "bool"},
        {"field_id": "retention_days", "field_type": "double"},
        {"field_id": "row_count", "field_type": "double"},
        {"field_id": "distinct_values", "field_type": "double"},
        {"field_id": "sensitive_field", "field_type": "bool"},
        {"field_id": "sensitive_type", "field_type": "string"},
        {"field_id": "approved_by", "field_type": "richtext"},
    ])
    assets = _assets(spark)
    sched = dict(
        refresh_mode="AUTO",
        refresh_frequency=24,
        refresh_unit="hours",
        next_run=datetime.datetime(2026, 1, 1, tzinfo=UTC),
    )

    # -- the nine configs, one per reference type --------------------------
    eng.create_config(
        "DYNAMIC_TAG_TABLE", "data_governance",
        included_uris="bigquery/project/p/dataset/d/lineitem",
        fields=[{"field_id": "row_count", "query_expression": "select count(*) from $table"}],
        **sched,
    )
    eng.create_config(
        "DYNAMIC_TAG_COLUMN", "data_governance",
        included_uris="bigquery/project/p/dataset/d/lineitem",
        included_columns_query="select 'l_orderkey', 'l_partkey'",
        fields=[{"field_id": "distinct_values",
                 "query_expression": "select count(distinct $column) from $table"}],
        **sched,
    )
    eng.create_config(
        "STATIC_TAG_ASSET", "data_governance",
        included_uris="bigquery/project/p/dataset/d/orders",
        fields=[{"field_id": "data_owner", "field_value": "governance-team"},
                {"field_id": "retention_days", "field_value": 180}],
        **sched,
    )
    eng.create_config(
        "GLOSSARY_TAG_ASSET", "data_governance",
        included_uris="bigquery/project/p/dataset/d/*",
        **sched,
    )
    eng.create_config(
        "SENSITIVE_TAG_COLUMN", "data_governance",
        included_uris="bigquery/project/p/dataset/d2/*",
        **sched,
    )
    csv = tmp_path / "tags.csv"
    csv.write_text("project,dataset,table,data_owner\np,d,lineitem,bob\n")
    eng.create_config(
        "TAG_IMPORT", "data_governance", included_uris="n/a",
        csv_path=str(csv), **sched,
    )
    jl = tmp_path / "backup.jsonl"
    jl.write_text(json.dumps({
        "entryGroupId": "d", "id": "orders", "locationId": "us", "projectId": "p",
        "tags": [{"templateId": "data_governance", "projectId": "p",
                  "fields": [{"name": "approved_by", "type": "STRING", "value": "x@y.com"}]}],
        "columns": [], "createTime": "x", "updateTime": "y", "snapshotTime": "z",
    }))
    eng.create_config(
        "TAG_RESTORE", "data_governance", included_uris="n/a",
        backup_path=str(jl), project_id="p", **sched,
    )
    # side-effect types last so the export sees this tick's tags
    eng.create_config(
        "TAG_EXPORT", None, target_path=str(tmp_path / "reports"), **sched,
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    (tmp_path / "files").mkdir()
    pq.write_table(pa.table({"id": list(range(5))}),
                   str(tmp_path / "files" / "part_a.parquet"))
    eng.create_config("ENTRY_CREATE", None, directory=str(tmp_path / "files"), **sched)
    eng.create_config(
        "SHARD_EXPORT", None, source_table="documents",
        target_path=str(tmp_path / "shards"), num_shards=4, token_col="n_chars",
        **sched,
    )

    # -- shared per-tick inputs (each runner picks what it needs) ----------
    mapping = spark.createDataFrame(
        [("l_orderkey", "is_compliant"), ("o_custkey", "is_compliant")],
        "source_name string, canonical_name string",
    )
    findings = spark.createDataFrame(
        [("p/datasets/d2/tables/users", "email", "EMAIL_ADDRESS")],
        "asset_uri string, field string, infotype string",
    )
    selection = spark.createDataFrame(
        [(["EMAIL_ADDRESS"], "EMAIL")],
        "field_infotypes array<string>, notable_infotype string",
    )
    classification = spark.createDataFrame(
        [(["EMAIL"], "Sensitive_Personal_Identifiable_Information")],
        "notable_infotypes array<string>, classification_result string",
    )

    # -- ONE cron tick ------------------------------------------------------
    now = datetime.datetime(2026, 1, 1, 12, tzinfo=UTC)
    job_ids = eng.run_ready_configs(
        assets, now=now,
        mapping=mapping, findings=findings,
        selection=selection, classification=classification,
    )
    assert len(job_ids) == 10

    # ledger: one SUCCESS row per config type
    by_type = {j["config_type"]: j for j in eng.jobs}
    assert set(by_type) == {
        "DYNAMIC_TAG_TABLE", "DYNAMIC_TAG_COLUMN", "STATIC_TAG_ASSET",
        "GLOSSARY_TAG_ASSET", "SENSITIVE_TAG_COLUMN", "TAG_IMPORT",
        "TAG_RESTORE", "TAG_EXPORT", "ENTRY_CREATE", "SHARD_EXPORT",
    }
    assert all(j["job_status"] == "SUCCESS" for j in eng.jobs), eng.jobs
    assert all(j["job_uuid"] in job_ids for j in eng.jobs)

    # tags: one spot check per tagging type
    tags = {}
    for r in eng.store.all().collect():
        v = (r["field_value_double"] if r["field_type"] == "double"
             else r["field_value_bool"] if r["field_type"] == "bool"
             else r["field_value_string"])
        tags[(r["asset_uri"], r["column"], r["field_id"])] = v
    li_n = spark.table("lineitem").count()
    assert tags[("p/datasets/d/tables/lineitem", None, "row_count")] == float(li_n)
    assert tags[("p/datasets/d/tables/lineitem", "l_orderkey", "distinct_values")] > 0
    assert tags[("p/datasets/d/tables/orders", None, "data_owner")] == "governance-team"
    assert tags[("p/datasets/d/tables/orders", None, "retention_days")] == 180.0
    assert tags[("p/datasets/d/tables/lineitem", None, "is_compliant")] is True  # glossary
    assert tags[("p/datasets/d2/tables/users", "email", "sensitive_field")] is True
    assert tags[("p/datasets/d2/tables/users", "email", "sensitive_type")] == "EMAIL"
    assert tags[("p/datasets/d/tables/lineitem", None, "data_owner")] == "bob"  # import
    assert tags[("p/datasets/d/tables/orders", None, "approved_by")] == "x@y.com"  # restore

    # history: every mutation audited, stamped with its job
    hist = eng.history()
    assert hist.count() == len(tags)
    assert {r["action"] for r in hist.select("action").distinct().collect()} == {"CREATE"}

    # export: report tables written from this tick's tags
    table_report = spark.read.parquet(str(tmp_path / "reports" / "catalog_report_table_tags"))
    assert table_report.count() > 0
    col_report = spark.read.parquet(str(tmp_path / "reports" / "catalog_report_column_tags"))
    assert col_report.filter(F.col("column") == "email").count() > 0

    # entries: the parquet file landed in the engine inventory
    assert eng.assets.filter(F.col("asset_uri").contains("part_a")).count() == 1

    # shards: the training-data last mile ran with full accounting —
    # the manifest is the authoritative shard map (num_shards rows,
    # corpus fully accounted) and the ledger's task grain is the shard
    manifest = spark.read.parquet(str(tmp_path / "shards" / "_manifest"))
    n_docs = spark.table("documents").count()
    assert manifest.count() == 4
    agg = manifest.agg(F.sum("n_docs"), F.sum("n_tokens")).collect()[0]
    assert agg[0] == n_docs
    assert agg[1] == spark.table("documents").agg(F.sum("n_chars")).collect()[0][0]
    se = by_type["SHARD_EXPORT"]
    assert se["task_count"] == 4 and se["tasks_success"] == 4

    # scheduling: every config advanced one period and is READY again;
    # an immediate second tick at the same `now` has nothing to run
    for cfg in eng.configs.values():
        assert cfg["version"] == 2
        assert cfg["scheduling_status"] == "READY"
        assert cfg["next_run"] == datetime.datetime(2026, 1, 2, tzinfo=UTC)  # +24h, past `now`
    assert eng.run_ready_configs(assets, now=now, mapping=mapping) == []
