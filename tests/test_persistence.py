"""Engine state persistence round-trip."""

import datetime

from datacatalog_tag_engine_spark.engine import TagEngine
from datacatalog_tag_engine_spark.model.schemas import ASSETS_SCHEMA


def test_save_load_roundtrip(spark, tmp_path):
    eng = TagEngine(spark)
    eng.create_template("t", [{"field_id": "owner", "field_type": "string"}])
    assets = spark.createDataFrame(
        [{"asset_uri": "p/datasets/d/tables/lineitem", "asset_type": "bigquery",
          "project": "p", "dataset": "d", "table": "lineitem"}],
        ASSETS_SCHEMA,
    )
    cfg = eng.create_config(
        "STATIC_TAG_ASSET", "t",
        included_uris="bigquery/project/p/dataset/d/lineitem",
        fields=[{"field_id": "owner", "field_value": "alice"}],
        refresh_mode="AUTO", refresh_frequency=1, refresh_unit="hours",
        next_run=datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc),
    )
    eng.trigger_job(cfg, assets)
    eng.set_settings("coverage_report", included_projects=["p"])
    eng.save_state(str(tmp_path / "state"))

    loaded = TagEngine.load_state(spark, str(tmp_path / "state"))
    assert loaded.templates == eng.templates
    assert loaded.get_settings("coverage_report") == (True, {"included_projects": ["p"]})
    assert loaded.tag_history_enabled()
    assert loaded.configs[cfg]["next_run"] == eng.configs[cfg]["next_run"]
    assert loaded.store.all().count() == 1
    assert loaded.history().count() == 1
    assert loaded.jobs[0]["job_status"] == "SUCCESS"

    # the loaded engine keeps working: new config ids don't collide and
    # scheduling state carried over
    jobs = loaded.run_ready_configs(assets, now=datetime.datetime(2026, 1, 2, tzinfo=datetime.timezone.utc))
    assert len(jobs) == 1
    assert jobs[0] not in {j["job_uuid"] for j in eng.jobs}

    # regression: a merge after load_state must take the FULL merge path
    # (the store is non-empty even though no tags_path was set) — a
    # same-key re-run updates in place, never duplicates
    assert loaded.store.all().count() == 1
    rows = loaded.store.all().collect()
    assert len({(r["asset_uri"], r["column"], r["field_id"]) for r in rows}) == len(rows)
    hist_actions = [r["action"] for r in loaded.history().collect()]
    assert hist_actions.count("UPDATE") == 1  # re-run classified as UPDATE, not CREATE


def test_save_load_roundtrip_with_templateless_configs(spark, tmp_path):
    # TAG_EXPORT / ENTRY_CREATE configs carry no template; they must
    # survive the JSON persistence roundtrip and stay job-dispatchable
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from datacatalog_tag_engine_spark.engine import TagEngine

    (tmp_path / "files").mkdir()
    pq.write_table(pa.table({"id": [1, 2]}), str(tmp_path / "files" / "a.parquet"))

    eng = TagEngine(spark)
    export_cfg = eng.create_config(
        "TAG_EXPORT", None, target_path=str(tmp_path / "reports"),
        refresh_mode="AUTO", refresh_frequency=1, refresh_unit="hours",
        next_run=datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc),
    )
    entry_cfg = eng.create_config("ENTRY_CREATE", None, directory=str(tmp_path / "files"))

    base = str(tmp_path / "state")
    eng.save_state(base)
    restored = TagEngine.load_state(spark, base)
    assert restored.configs[export_cfg]["config_type"] == "TAG_EXPORT"
    assert restored.configs[export_cfg]["template_id"] is None
    job = restored.trigger_job(entry_cfg, None)
    assert next(j for j in restored.jobs if j["job_uuid"] == job)["job_status"] == "SUCCESS"
    assert restored.assets.count() == 1
