"""KMV sketch tests: accuracy, exact-below-k, and the distributed
merge property."""

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline import sketches as K


def test_exact_when_fewer_than_k(spark):
    df = spark.createDataFrame([(i % 17,) for i in range(1000)], "v long")
    sk = K.kmv_sketch(df, "v", k=256)
    assert K.kmv_estimate(sk, k=256) == 17.0


def test_estimate_accuracy(spark):
    df = spark.table("lineitem")
    true = df.select(F.countDistinct("l_orderkey")).first()[0]
    est = K.kmv_estimate(K.kmv_sketch(df, "l_orderkey", k=256), k=256)
    assert abs(est - true) / true < 0.15  # ~1/sqrt(254) ≈ 6% expected


def test_merge_equals_global(spark):
    df = spark.table("lineitem")
    # per-"partition" sketches (split by parity) merge to the global one
    a = K.kmv_sketch(df.filter(F.col("l_orderkey") % 2 == 0), "l_orderkey", k=64)
    b = K.kmv_sketch(df.filter(F.col("l_orderkey") % 2 == 1), "l_orderkey", k=64)
    merged = K.kmv_merge([a, b], k=64)
    direct = K.kmv_sketch(df, "l_orderkey", k=64)
    assert merged == direct
    assert K.kmv_estimate(merged, k=64) == K.kmv_estimate(direct, k=64)


def test_declarative_form_matches_driver_side(spark):
    df = spark.table("lineitem")
    row = K.kmv_distinct_df(df, "l_orderkey", k=64).first()
    est = K.kmv_estimate(K.kmv_sketch(df, "l_orderkey", k=64), k=64)
    assert row["k_used"] == 64
    assert abs(row["estimate"] - est) < 0.01
