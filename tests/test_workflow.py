"""Event-driven tag workflow tests (reference extensions/
product_registration_pipeline): a PENDING status tag triggers follow-on
tagging for the asset, then the status flips to REVIEW."""

import pytest
from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.engine import TagEngine
from datacatalog_tag_engine_spark.model.schemas import ASSETS_SCHEMA
from datacatalog_tag_engine_spark.streaming import workflow as W


@pytest.fixture()
def registration(spark):
    eng = TagEngine(spark)
    eng.create_template(
        "data_product",
        [
            {"field_id": "data_product_status", "field_type": "enum",
             "enum_values": ["PENDING", "REVIEW", "APPROVED"]},
        ],
    )
    eng.create_template("data_resource", [{"field_id": "data_owner", "field_type": "string"}])
    assets = spark.createDataFrame(
        [
            {"asset_uri": f"p/datasets/d/tables/{t}", "asset_type": "bigquery",
             "project": "p", "dataset": "d", "table": t}
            for t in ("lineitem", "orders", "customer")
        ],
        ASSETS_SCHEMA,
    )
    follow_on = eng.create_config(
        "STATIC_TAG_ASSET", "data_resource",
        included_uris="bigquery/project/p/dataset/d/*",
        fields=[{"field_id": "data_owner", "field_value": "steward"}],
    )
    return eng, assets, follow_on


def _register(eng, assets, table):
    cfg = eng.create_config(
        "STATIC_TAG_ASSET", "data_product",
        included_uris=f"bigquery/project/p/dataset/d/{table}",
        fields=[{"field_id": "data_product_status", "field_value": "PENDING"}],
    )
    eng.trigger_job(cfg, assets)


def test_batch_workflow_dispatch_and_status_flip(spark, registration):
    eng, assets, follow_on = registration
    _register(eng, assets, "lineitem")

    results = W.run_workflow_batch(
        eng, eng.history(), assets,
        trigger_field="data_product_status", trigger_value="PENDING",
        follow_on_configs=[follow_on],
        status_value="REVIEW", status_type="enum",
    )
    assert [r["asset_uri"] for r in results] == ["p/datasets/d/tables/lineitem"]
    tags = {(r["asset_uri"], r["field_id"]): r["field_value_string"]
            for r in eng.store.all().collect()}
    # follow-on tag landed on the registered asset ONLY
    assert tags[("p/datasets/d/tables/lineitem", "data_owner")] == "steward"
    assert ("p/datasets/d/tables/orders", "data_owner") not in tags
    # originating status flipped PENDING -> REVIEW
    assert tags[("p/datasets/d/tables/lineitem", "data_product_status")] == "REVIEW"
    # the flip event does not re-fire the workflow
    again = W.run_workflow_batch(
        eng, eng.history(), assets,
        trigger_field="data_product_status", trigger_value="PENDING",
        follow_on_configs=[follow_on],
        status_value="REVIEW", status_type="enum",
    )
    assert len(again) == 1  # the original PENDING event is still in history...
    with pytest.raises(ValueError, match="differ"):
        W.run_workflow_batch(
            eng, eng.history(), assets,
            trigger_field="data_product_status", trigger_value="PENDING",
            follow_on_configs=[], status_value="PENDING",
        )


def test_streaming_workflow_trigger(spark, registration, tmp_path):
    eng, assets, follow_on = registration
    _register(eng, assets, "orders")
    _register(eng, assets, "customer")
    hist_dir, ckpt = str(tmp_path / "hist"), str(tmp_path / "ckpt")
    eng.history().write.parquet(hist_dir)

    from datacatalog_tag_engine_spark.streaming.history import read_history_stream

    q = W.workflow_trigger_stream(
        eng, read_history_stream(spark, hist_dir), assets, ckpt,
        trigger_field="data_product_status", trigger_value="PENDING",
        follow_on_configs=[follow_on],
        status_value="REVIEW", status_type="enum",
    )
    q.awaitTermination()
    tags = {(r["asset_uri"], r["field_id"]): r["field_value_string"]
            for r in eng.store.all().collect()}
    for t in ("orders", "customer"):
        assert tags[(f"p/datasets/d/tables/{t}", "data_owner")] == "steward"
        assert tags[(f"p/datasets/d/tables/{t}", "data_product_status")] == "REVIEW"
    assert ("p/datasets/d/tables/lineitem", "data_owner") not in tags
    # checkpointed: restarting over the same source dispatches nothing new
    jobs_before = len(eng.jobs)
    q2 = W.workflow_trigger_stream(
        eng, read_history_stream(spark, hist_dir), assets, ckpt,
        trigger_field="data_product_status", trigger_value="PENDING",
        follow_on_configs=[follow_on],
        status_value="REVIEW", status_type="enum",
    )
    q2.awaitTermination()
    assert len(eng.jobs) == jobs_before


def test_retry_duplicate_events_dispatch_once(spark, registration):
    eng, assets, follow_on = registration
    _register(eng, assets, "lineitem")
    doubled = eng.history().unionByName(eng.history())  # at-least-once redelivery
    results = W.run_workflow_batch(
        eng, doubled, assets,
        trigger_field="data_product_status", trigger_value="PENDING",
        follow_on_configs=[follow_on],
    )
    assert len(results) == 1


def test_column_level_trigger_flips_the_column_tag(spark):
    """Regression: a trigger tag at COLUMN grain must flip on the same
    column, not spawn a stray asset-level status tag (which would leave
    the original trigger armed)."""
    eng = TagEngine(spark)
    eng.create_template(
        "data_product",
        [{"field_id": "data_product_status", "field_type": "enum",
          "enum_values": ["PENDING", "REVIEW"]}],
    )
    assets = spark.createDataFrame(
        [{"asset_uri": "p/datasets/d/tables/lineitem", "asset_type": "bigquery",
          "project": "p", "dataset": "d", "table": "lineitem"}],
        ASSETS_SCHEMA,
    )
    # column-grain PENDING tag via direct subset update
    eng.update_tag_subset(
        "data_product", "p/datasets/d/tables/lineitem", "l_comment",
        [{"field_id": "data_product_status", "field_type": "enum", "raw_value": "PENDING"}],
    )
    results = W.run_workflow_batch(
        eng, eng.history(), assets,
        trigger_field="data_product_status", trigger_value="PENDING",
        follow_on_configs=[], status_value="REVIEW", status_type="enum",
    )
    assert len(results) == 1
    tags = {(r["asset_uri"], r["column"]): r["field_value_string"]
            for r in eng.store.all().collect()}
    assert tags[("p/datasets/d/tables/lineitem", "l_comment")] == "REVIEW"
    # no stray asset-level tag appeared
    assert ("p/datasets/d/tables/lineitem", None) not in tags
