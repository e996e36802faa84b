"""Skew levers: salted two-stage aggregation and salted joins produce
the same results as their unsalted forms."""

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.operators.skew import salted_agg, salted_broadcast_join


def test_salted_agg_matches_plain(spark):
    # one hot key (90% of rows) + a long tail
    rows = [("hot", float(i % 7)) for i in range(900)] + [
        (f"k{i}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r["k"]: (r["n"], r["total"])
        for r in salted_agg(
            df, ["k"],
            partials=[(F.count("*"), "c"), (F.sum("v"), "s")],
            finals=[("sum(c)", "n"), ("sum(s)", "total")],
            salts=8, salt_source="v",
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["total"])
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("total")).collect()
    }
    assert got == want


def test_salted_agg_row_salt(spark):
    df = spark.createDataFrame([("a", i) for i in range(50)], "k string, v long")
    out = salted_agg(
        df, ["k"],
        partials=[(F.count("*"), "c")],
        finals=[("sum(c)", "n")],
        salts=4,
    ).collect()
    assert out[0]["n"] == 50


def test_salted_broadcast_join_matches_plain(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(5)],
        "k string, v long",
    )
    small = spark.createDataFrame([("hot", "H"), ("cold", "C")], "k string, label string")
    got = salted_broadcast_join(big, small, "k", salts=4).orderBy("k", "v").collect()
    want = big.join(small, "k").orderBy("k", "v").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_salted_broadcast_join_default_salt_spreads_hot_key(spark):
    """Regression: the old default salted by the join key itself, so the
    hot key landed in ONE salt value — a no-op. The whole-row default
    must fan a hot key across several salts, and salting by the key is
    rejected."""
    import pytest

    from pyspark.sql import functions as F

    big = spark.createDataFrame([("hot", i) for i in range(200)], "k string, v long")
    salt = F.crc32(F.to_json(F.struct(*big.columns))) % 4
    n_salts = big.withColumn("_s", salt).select("_s").distinct().count()
    assert n_salts > 1
    with pytest.raises(ValueError, match="vary within"):
        salted_broadcast_join(big, big.limit(1), "k", salt_source="k")
