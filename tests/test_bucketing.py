"""Bucketed co-located join (SCALE.md): writing fact tables bucketed on
the join key lets repeated joins run with NO shuffle of either side —
the plan evidence a 100 TB deployment depends on."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # spark.sql.warehouse.dir is static; bucketed tables land in the
    # session's default warehouse and are dropped afterwards
    li = spark.table("lineitem").limit(2000)
    od = spark.table("orders").limit(500)
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .saveAsTable("li_bucketed"))
    (od.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .saveAsTable("od_bucketed"))
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS od_bucketed")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    # disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_bucketed").join(
            spark.table("od_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined.groupBy("o_orderstatus").count())
        # the join itself must not exchange either bucketed side:
        # the only Exchange allowed is the post-join aggregation's
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_join_does_shuffle(spark, warehouse):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("lineitem")
        od = spark.table("orders")
        plan = _plan(li.join(od, F.col("l_orderkey") == F.col("o_orderkey")))
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_results_correct(spark, warehouse):
    a = (
        spark.table("li_bucketed")
        .join(spark.table("od_bucketed"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    b = (
        spark.table("lineitem").limit(2000)
        .join(spark.table("orders").limit(500), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert a == b
