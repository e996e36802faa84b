"""Type-coercion matrix tests (SURVEY 1.2; reference
DataCatalogController.py:1505-1569, :1857-1943)."""

import datetime

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.model import coercion as C


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_bool_from_string(spark):
    df = spark.createDataFrame(
        [("TRUE",), ("true",), (" True ",), ("FALSE",), ("yes",), (None,)], "v string"
    )
    got = [r["b"] for r in df.select(C.coerce_bool_from_string(F.col("v")).alias("b")).collect()]
    assert got == [True, True, True, False, False, None]


def test_bool_truthy(spark):
    df = spark.createDataFrame(
        [("1",), ("0",), ("0.0",), ("",), ("false",), ("anything",), (None,)], "v string"
    )
    got = [r["b"] for r in df.select(C.coerce_bool_truthy(F.col("v")).alias("b")).collect()]
    assert got == [True, False, False, False, False, True, None]


def test_double(spark):
    assert one(spark, C.coerce_double(F.lit(" 42.5 "))) == 42.5
    assert one(spark, C.coerce_double(F.lit("abc"))) is None


def test_timestamp_date_only_midnight_utc(spark):
    got = one(spark, C.coerce_timestamp(F.lit("2023-11-10")))
    assert got == datetime.datetime(2023, 11, 10, 0, 0, 0)


def test_timestamp_19_char(spark):
    got = one(spark, C.coerce_timestamp(F.lit("2022-05-11 21:18:20")))
    assert got == datetime.datetime(2022, 5, 11, 21, 18, 20)


def test_timestamp_iso_fallback(spark):
    got = one(spark, C.coerce_timestamp(F.lit("2022-09-14T18:24:31.615000+00:00")))
    assert got == datetime.datetime(2022, 9, 14, 18, 24, 31, 615000)


def test_timestamp_leading_space(spark):
    # FIXTURES.md: "' 2023-11-10'" leading space + date-only
    got = one(spark, C.coerce_timestamp(F.lit(" 2023-11-10")))
    assert got == datetime.datetime(2023, 11, 10, 0, 0, 0)


def test_enum_membership(spark):
    ev = F.array(F.lit("LOGISTICS"), F.lit("MARKETING"))
    assert one(spark, C.coerce_enum(F.lit("LOGISTICS"), ev)) == "LOGISTICS"
    assert one(spark, C.coerce_enum(F.lit("NOPE"), ev)) is None


def test_richtext_swaps(spark):
    assert one(spark, C.richtext_import_swap(F.lit("a, b,c"))) == "a<br>b<br>c"
    assert one(spark, C.richtext_export_swap(F.lit("a<br>b"))) == "a, b"


def test_render_tag_value(spark):
    df = spark.createDataFrame(
        [
            ("string", "hello", None, None, None),
            ("double", None, 1.5, None, None),
            ("bool", None, None, True, None),
            ("datetime", None, None, None, datetime.datetime(2023, 1, 2, 3, 4, 5)),
        ],
        "field_type string, s string, d double, b boolean, t timestamp",
    )
    got = [
        r["v"]
        for r in df.select(
            C.render_tag_value(F.col("field_type"), F.col("s"), F.col("d"), F.col("b"), F.col("t")).alias("v")
        ).collect()
    ]
    assert got == ["hello", "1.5", "TRUE", "2023-01-02T03:04:05Z"]
