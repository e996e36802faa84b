"""UDF registry (X1-X3) and URI format conversion (F2) tests."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.functions.udf_registry import (
    llm_summarize_udf,
    register_batch_udf,
    summarize_users,
)
from datacatalog_tag_engine_spark.operators import uri as U


def test_register_batch_udf_usable_in_sql(spark):
    register_batch_udf(spark, "shout", lambda s: s.str.upper(), "string")
    got = spark.sql("select shout('hello') as v").first()["v"]
    assert got == "HELLO"


def test_summarize_users_topk_with_exclusions(spark):
    events = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (2,), (3,), (99,), (99,), (99,), (99,)],
        "user_id long",
    )
    got = [r["user_id"] for r in summarize_users(events, k=2, excluded=[99]).collect()]
    assert got == [1, 2]


def test_llm_summarize_fake_is_deterministic(spark):
    llm_summarize_udf(spark, fake=True, max_words=3)
    got = spark.sql("select llm_summarize('one two three four five') as s").first()["s"]
    assert got == "one two three"


def test_llm_summarize_real_path_raises(spark):
    udf = llm_summarize_udf(spark, fake=False)
    df = spark.createDataFrame([("text",)], "t string").select(udf(F.col("t")).alias("s"))
    with pytest.raises(Exception):
        df.collect()


def test_uri_format_conversions():
    assert U.table_resource_to_uri("proj:ds.tbl") == "proj/datasets/ds/tables/tbl"
    assert U.dataset_resource_to_uri("proj.ds") == "proj/datasets/ds"
    assert U.uri_to_dotted("proj/datasets/ds/tables/tbl").endswith("ds.tbl")
    assert (
        U.bigquery_uri_to_resource("bigquery/project/p/dataset/d/t")
        == "p/datasets/d/tables/t"
    )
    assert U.bigquery_uri_to_resource("bigquery/project/p/dataset/d") == "p/datasets/d"
