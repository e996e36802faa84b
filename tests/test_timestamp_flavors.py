"""Temporal operators must tolerate both timestamp flavors the driver's
parquet has shipped: TIMESTAMP(NANOS) (round-1 data — Spark reads it as
raw longs via the legacy conf) and TIMESTAMP(MICROS) without timezone
(round-2+ data — Spark reads TIMESTAMP_NTZ natively). Round 2 broke
range_join/sessionize/usage-streaming when the flavor flipped; these
tests pin every temporal operator against BOTH flavors so a future flip
is caught locally instead of by the driver."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datacatalog_tag_engine_spark.operators.temporal import asof_join, range_join
from datacatalog_tag_engine_spark.pipeline.profiling import sessionize
from datacatalog_tag_engine_spark.session import load_parquet
from datacatalog_tag_engine_spark.streaming import usage as U

BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros


def _write_events(tmpdir: str, flavor: str) -> str:
    """Write a small events.parquet with ts in the requested flavor.

    Identical micro-precision instants in both flavors, so operator
    output must be identical across them."""
    offs = [0, 30, 60, 2000, 2030, 7300, 90000, 90030]  # seconds
    ts_us = [BASE_US + o * 1_000_000 + 778_549 for o in offs]
    n = len(ts_us)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us"))
            if flavor == "us"
            else pa.array([t * 1000 for t in ts_us], pa.timestamp("ns")),
            "user_id": pa.array([1, 1, 1, 1, 1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(["view", "error", "view", "error", "view", "view", "error", "view"]),
            "value": pa.array([float(i) for i in range(n)], pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    d = os.path.join(tmpdir, flavor)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "events.parquet")
    pq.write_table(table, path)
    return d


@pytest.fixture(scope="module")
def flavor_dirs(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("ts_flavors"))
    return {f: _write_events(tmp, f) for f in ("us", "ns")}


def _events(spark, d):
    return load_parquet(spark, os.path.join(d, "events.parquet"))


def _rows(df, order_cols):
    return [tuple(str(v) for v in r) for r in df.orderBy(*order_cols).collect()]


def test_range_join_both_flavors(spark, flavor_dirs):
    outs = {}
    for flavor, d in flavor_dirs.items():
        ev = _events(spark, d)
        left = ev.filter("event_type = 'error'").select("event_id", "user_id", "ts")
        right = ev.filter("event_type = 'view'").select("user_id", "ts", "value")
        out = range_join(left, right, on="user_id", lower_sec=0, upper_sec=60)
        outs[flavor] = _rows(out.select("event_id", "user_id", "value_m"), ["event_id", "value_m"])
    assert outs["us"] == outs["ns"]
    assert len(outs["us"]) > 0


def test_asof_join_both_flavors(spark, flavor_dirs):
    outs = {}
    for flavor, d in flavor_dirs.items():
        ev = _events(spark, d)
        left = ev.filter("event_type = 'error'").select("event_id", "user_id", "ts")
        right = ev.filter("event_type = 'view'").select("user_id", "ts", "value")
        out = asof_join(left, right, on="user_id")
        outs[flavor] = _rows(out.select("event_id", "value_asof"), ["event_id"])
    assert outs["us"] == outs["ns"]
    assert len(outs["us"]) > 0


def test_sessionize_both_flavors(spark, flavor_dirs):
    outs = {}
    for flavor, d in flavor_dirs.items():
        out = sessionize(_events(spark, d), gap_minutes=30)
        outs[flavor] = _rows(
            out.select("user_id", "session_index", "n_events", "duration_sec"),
            ["user_id", "session_index"],
        )
    assert outs["us"] == outs["ns"]
    assert len(outs["us"]) >= 3  # the 90000s offsets force >1 session per user


def test_usage_stream_matches_batch_both_flavors(spark, flavor_dirs):
    for flavor, d in flavor_dirs.items():
        stream = U.read_events_stream(spark, d)
        sink = f"flavor_usage_{flavor}"
        U.run_available_now(U.daily_usage(stream), sink)
        got = {
            (str(r.event_date), r.event_type): (r.n, r.approx_users)
            for r in spark.table(sink).collect()
        }
        want = {
            (str(r.event_date), r.event_type): (r.n, r.approx_users)
            for r in U.daily_usage(_events(spark, d)).collect()
        }
        assert got == want, flavor
        assert len(want) > 0
