"""Session-factory invariants: the scale-critical configs stay set and
consistent with each other (these interact — the RDD default is pinned
SMALL for driver-local relations, so distributed paths must size from
the SQL configs instead)."""

from datacatalog_tag_engine_spark.session import local_df


def test_scale_critical_configs(spark):
    cpus = spark.sparkContext.master.split("[")[1].rstrip("]")
    n = 32 if cpus == "*" else int(cpus)
    # LIMIT probes run one cluster-sized wave, not the 1-then-4x ramp
    assert int(spark.conf.get("spark.sql.limit.initialNumPartitions")) == n
    # SQL-side leaves keep cluster width via the conf; PySpark's
    # range() bypasses it (fills numSlices from the RDD default), so
    # synthetic inventories pass an explicit width
    assert int(spark.conf.get("spark.sql.leafNodeDefaultParallelism")) == n
    assert spark.range(0, 10_000, 1, n).rdd.getNumPartitions() == n
    # the RDD default for driver-local data is pinned small
    assert spark.sparkContext.defaultParallelism == max(4, n // 4)
    # and AQE + UTC + Arrow stay on (oracle comparability + scale)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"


def test_local_df_slices_by_size(spark):
    from datacatalog_tag_engine_spark.model.schemas import TAGS_SCHEMA

    few = local_df(spark, [("a", None, "t", "f", "string", None, None, None, None, None, None)], TAGS_SCHEMA)
    assert few.rdd.getNumPartitions() == 1
    many = local_df(spark, [(i,) for i in range(9000)], "id long")
    assert many.rdd.getNumPartitions() == 3


def test_local_df_rejects_unknown_keys(spark):
    import pytest

    from datacatalog_tag_engine_spark.model.schemas import TAGS_SCHEMA

    with pytest.raises(ValueError, match="not in schema"):
        local_df(spark, [{"asset_urii": "typo"}], TAGS_SCHEMA)


def test_local_df_dict_rows_with_ddl_schema(spark):
    df = local_df(spark, [{"id": 7}, {"id": None}], "id long")
    assert [r["id"] for r in df.orderBy("id").collect()] == [None, 7]
    import pytest

    with pytest.raises(ValueError, match="not in schema"):
        local_df(spark, [{"idd": 1}], "id long")
