"""End-to-end walkthrough mirroring the reference's examples/unit_tests.sh:
create a template, one config of every type, trigger jobs, then inspect
tags / history / job ledger / coverage / report exports — all against
the driver's sf0.001 testdata.

Run: python examples/demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.engine import TagEngine
from datacatalog_tag_engine_spark.operators.coverage import coverage_report
from datacatalog_tag_engine_spark.operators.incremental import stale_assets
from datacatalog_tag_engine_spark.session import get_spark, register_testdata

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("demo")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF_DIR)

    eng = TagEngine(spark)

    # 1. template (the data_governance example: every field type)
    eng.create_template(
        "data_governance",
        [
            {"field_id": "data_domain", "field_type": "enum",
             "enum_values": ["LOGISTICS", "MARKETING", "OPERATIONS"]},
            {"field_id": "data_owner", "field_type": "string"},
            {"field_id": "is_compliant", "field_type": "bool"},
            {"field_id": "retention_days", "field_type": "double"},
            {"field_id": "approved_by", "field_type": "richtext"},
            {"field_id": "data_creation", "field_type": "datetime"},
            {"field_id": "row_count", "field_type": "double"},
            {"field_id": "unique_orders", "field_type": "double"},
        ],
    )

    # 2. asset inventory from file discovery (entry-create flow)
    assets = eng.create_entries(SF_DIR, project="demo", dataset="warehouse")
    print(f"discovered {assets.count()} assets")

    # 3. dynamic profiling config over a wildcard
    dyn = eng.create_config(
        "DYNAMIC_TAG_TABLE", "data_governance",
        included_uris="bigquery/project/demo/dataset/warehouse/lineitem, "
        "bigquery/project/demo/dataset/warehouse/orders",
        fields=[
            {"field_id": "row_count", "query_expression": "select count(*) from $table"},
            {"field_id": "data_domain", "query_expression": "select 'LOGISTICS'"},
        ],
    )
    job1 = eng.trigger_job(dyn, eng.assets)

    # 4. static + scheduled config
    static = eng.create_config(
        "STATIC_TAG_ASSET", "data_governance",
        included_uris="bigquery/project/demo/dataset/warehouse/documents",
        fields=[
            {"field_id": "data_owner", "field_value": "governance-team"},
            {"field_id": "retention_days", "field_value": "180"},
            {"field_id": "data_creation", "field_value": "2023-11-10"},
        ],
    )
    eng.trigger_job(static, eng.assets)

    # 5. glossary config
    mapping = spark.createDataFrame(
        [("l_orderkey", "is_compliant"), ("o_orderkey", "is_compliant")],
        "source_name string, canonical_name string",
    )
    glossary = eng.create_config(
        "GLOSSARY_TAG_ASSET", "data_governance",
        included_uris="bigquery/project/demo/dataset/warehouse/*",
    )
    eng.trigger_job(glossary, eng.assets, mapping=mapping)

    print("\ntags:")
    eng.store.all().select(
        "asset_uri", "field_id",
        F.coalesce(
            "field_value_string",
            F.col("field_value_double").cast("string"),
            F.col("field_value_bool").cast("string"),
            F.col("field_value_ts").cast("string"),
        ).alias("value"),
    ).orderBy("asset_uri", "field_id").show(30, truncate=False)

    print("job ledger:")
    eng.jobs_df().select("job_uuid", "config_type", "job_status", "tasks_success").show(truncate=False)

    print("coverage:")
    coverage_report(eng.assets, eng.store.all()).select(
        "project", "dataset", "table_count", "tagged_tables", "tag_count"
    ).show(truncate=False)

    # 6. incremental refresh finds nothing to do (nothing changed)
    n_stale = stale_assets(eng.assets, eng.store.all()).count()
    print(f"stale assets after refresh: {n_stale}")

    # 7. report export
    with tempfile.TemporaryDirectory() as td:
        counts = eng.export_reports(td)
        print("report rows:", counts)

    print(f"history events: {eng.history().count()}")


if __name__ == "__main__":
    main()
