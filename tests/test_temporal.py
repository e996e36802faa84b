"""As-of and range join edge cases (operators/temporal)."""

import datetime

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.operators.temporal import asof_join, range_join


def ts(s):
    return datetime.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, ts("2026-01-01 10:00:00")),  # after first right
            (2, 10, ts("2026-01-01 10:05:00")),  # equal ts with right -> tie
            (3, 10, ts("2026-01-01 09:00:00")),  # before any right -> null
            (4, 20, ts("2026-01-01 12:00:00")),  # key with no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, ts("2026-01-01 09:30:00"), 100.0),
            (10, ts("2026-01-01 10:05:00"), 200.0),
        ],
        "user_id long, ts timestamp, price double",
    )
    return left, right


def test_asof_basic_tie_and_miss(spark):
    left, right = _frames(spark)
    out = {r["event_id"]: (r["price_asof"], r["ts_asof"]) for r in asof_join(left, right, on="user_id").collect()}
    assert out[1] == (100.0, ts("2026-01-01 09:30:00"))
    # equal timestamps: the right row is visible (ASOF >= semantics)
    assert out[2] == (200.0, ts("2026-01-01 10:05:00"))
    assert out[3] == (None, None)
    assert out[4] == (None, None)
    assert len(out) == 4  # every left row survives exactly once


def test_asof_matches_duckdb_native(spark):
    import duckdb

    left, right = _frames(spark)
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    expected = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            "SELECT l.event_id, r.price, r.ts FROM l ASOF LEFT JOIN r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts"
        ).fetchall()
    }
    got = {r["event_id"]: (r["price_asof"], r["ts_asof"]) for r in asof_join(left, right, on="user_id").collect()}
    assert got == expected


def test_range_join_bucket_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 10, ts("2026-01-01 10:00:00"))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, ts("2026-01-01 10:00:00"), 7),   # at lower bound (inclusive)
            (10, ts("2026-01-01 10:01:00"), 8),   # inside
            (10, ts("2026-01-01 10:01:01"), 9),   # past upper bound (60s)
            (10, ts("2026-01-01 09:59:59"), 6),   # before window
            (20, ts("2026-01-01 10:00:30"), 5),   # other key
        ],
        "user_id long, ts timestamp, tag int",
    )
    out = sorted(
        r["tag_m"] for r in range_join(left, right, on="user_id", lower_sec=0, upper_sec=60).collect()
    )
    assert out == [7, 8]


def test_range_join_spanning_buckets(spark):
    # upper window larger than bucket width: probes multiple buckets
    left = spark.createDataFrame(
        [(1, 10, ts("2026-01-01 10:00:00"))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, ts("2026-01-01 10:04:00"), 1), (10, ts("2026-01-01 10:06:00"), 2)],
        "user_id long, ts timestamp, tag int",
    )
    out = sorted(
        r["tag_m"]
        for r in range_join(left, right, on="user_id", lower_sec=0, upper_sec=300, bucket_sec=60).collect()
    )
    assert out == [1]


def test_asof_join_row_atomic_with_null_fields(spark):
    """Regression: per-column carries stitched fields from DIFFERENT
    right rows when right value columns contain nulls; the attached row
    must be the single most recent right row, nulls and all."""
    import datetime

    def t(s):
        return datetime.datetime(2023, 1, 1, 0, 0, s)

    left = spark.createDataFrame([(1, t(30), 99)], "user_id long, ts timestamp, event_id long")
    right = spark.createDataFrame(
        [(1, t(10), 5.0, None), (1, t(20), None, 7.0)],
        "user_id long, ts timestamp, bid double, ask double",
    )
    row = asof_join(left, right, on="user_id").first()
    # the t=20 row is the most recent: bid must be NULL (not 5.0 from t=10)
    assert row["bid_asof"] is None and row["ask_asof"] == 7.0
    assert row["ts_asof"] == t(20)
