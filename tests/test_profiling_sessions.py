"""Numeric profiling, corpus stats, and sessionization (batch + the
applyInPandasWithState streaming form)."""

import datetime

import pytest
from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline import profiling as P


def test_profile_numeric_columns(spark):
    df = spark.table("lineitem")
    prof = {r["column"]: r for r in P.profile_numeric_columns(df, ["l_quantity", "l_discount"]).collect()}
    assert prof["l_quantity"]["n"] == 6000.0
    assert prof["l_quantity"]["n_null"] == 0.0
    assert prof["l_quantity"]["min_value"] >= 1.0
    assert prof["l_quantity"]["max_value"] <= 50.0
    assert 0 < prof["l_discount"]["mean_value"] < 1


def test_profile_defaults_to_numeric_schema(spark):
    prof = P.profile_numeric_columns(spark.table("orders"))
    cols = {r["column"] for r in prof.collect()}
    assert cols == {"o_orderkey", "o_custkey", "o_totalprice"}


def test_corpus_stats(spark):
    stats = P.corpus_stats(spark.table("documents"))
    rows = stats.collect()
    assert sum(r["n_docs"] for r in rows) == spark.table("documents").count()
    assert all(r["min_chars"] <= r["max_chars"] for r in rows)


SESS_EVENTS = [
    # user 1: two sessions (gap > 30 min between 10:20 and 11:30)
    (1, "2026-01-01 10:00:00"), (1, "2026-01-01 10:10:00"), (1, "2026-01-01 10:20:00"),
    (1, "2026-01-01 11:30:00"), (1, "2026-01-01 11:40:00"),
    # user 2: one session
    (2, "2026-01-01 09:00:00"), (2, "2026-01-01 09:29:00"),
]


def _events_df(spark):
    return spark.createDataFrame(SESS_EVENTS, "user_id long, ts_s string").select(
        "user_id", F.to_timestamp("ts_s").alias("ts")
    )


def test_batch_sessionize(spark):
    out = {
        (r["user_id"], r["session_index"]): (r["n_events"], r["duration_sec"])
        for r in P.sessionize(_events_df(spark), gap_minutes=30).collect()
    }
    assert out == {
        (1, 1): (3, 1200),
        (1, 2): (2, 600),
        (2, 1): (2, 1740),
    }


def test_streaming_sessionize_closed_sessions_match_batch(spark, tmp_path):
    from datacatalog_tag_engine_spark.streaming.sessions import sessionize_stream

    src = str(tmp_path / "events")
    _events_df(spark).write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sessions_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["n_events"], r["duration_sec"])
        for r in spark.table("sessions_sink").collect()
    }
    # within one batch, user 1's first session closes (a later event
    # arrived past the gap); each user's final session stays open in
    # state awaiting the event-time timeout
    assert (1, 3, 1200) in got
    assert (1, 2, 600) not in got
    batch = {
        (r["user_id"], r["n_events"], r["duration_sec"])
        for r in P.sessionize(_events_df(spark), gap_minutes=30).collect()
    }
    assert got <= batch


def test_profile_includes_decimal_and_handles_no_numeric(spark):
    # decimal measures (the warehouse money type) profile like doubles;
    # a frame with nothing numeric returns an EMPTY profile, not a crash
    from decimal import Decimal

    df = spark.createDataFrame(
        [(Decimal("1.50"), "a"), (Decimal("2.50"), "b")], "price decimal(10,2), name string"
    )
    prof = {r["column"]: r for r in P.profile_numeric_columns(df).collect()}
    assert set(prof) == {"price"}
    assert prof["price"]["mean_value"] == 2.0
    empty = P.profile_numeric_columns(df.select("name"))
    assert empty.count() == 0
    assert empty.columns[0] == "column"


def test_session_fn_late_events_never_move_backwards():
    """Regression: a within-watermark late event in a later micro-batch
    used to drag the open session's end backwards (negative duration,
    early timeout). Drives the state function directly with a stub."""
    import pandas as pd

    from datacatalog_tag_engine_spark.streaming.sessions import make_session_fn

    class StubState:
        def __init__(self):
            self._v, self.hasTimedOut, self.timeout = None, False, None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v = None

        def setTimeoutTimestamp(self, ms):
            self.timeout = ms

    fn = make_session_fn(gap_minutes=30)
    state = StubState()

    def batch(*secs):
        return list(fn((1,), iter([pd.DataFrame({"ts": [pd.Timestamp(s, unit="s") for s in secs]})]), state))

    base = 1_700_000_000
    assert batch(base + 600) == []           # open session at +600
    out = batch(base + 0)                    # late but within gap: merges
    assert out == []
    start, end, n = state.get
    assert (start, end, n) == (base, base + 600, 2)  # extent grew both ways
    assert state.timeout == (base + 600 + 1800) * 1000  # timeout unchanged by late event
    # an ancient event (older than start - gap) emits as its own session
    out = batch(base - 10_000)
    assert len(out) == 1 and out[0]["duration_sec"][0] == 0
    assert state.get == (base, base + 600, 2)  # open session untouched


def test_percentile_tolerance_names_use_full_precision(spark):
    """r10 ADVICE fix: int(p*100) folded 0.999 onto 0.99 (duplicate
    p99_exact columns). Names now come from the full decimal digits;
    genuinely colliding probs raise instead of emitting an ambiguous
    schema."""
    docs = spark.table("documents")
    out = P.percentile_tolerance_profile(docs, probs=(0.5, 0.99, 0.999))
    assert [c for c in out.columns if c.endswith("_exact")] == [
        "p50_exact",
        "p99_exact",
        "p999_exact",
    ]
    with pytest.raises(ValueError, match="duplicate"):
        P.percentile_tolerance_profile(docs, probs=(0.99, 0.990))


def test_session_funnel_struct_key_keeps_odd_user_ids_distinct(spark):
    """r10 ADVICE fix: the session key is the (user, session_index)
    struct, not a separator-joined string — users whose ids embed the
    old '#' separator stay distinct sessions."""
    t = datetime.datetime(2026, 1, 1)
    rows = [
        (1, t, "a#1", "view"),
        (2, t + datetime.timedelta(minutes=1), "a#1", "click"),
        (3, t, "a", "view"),
        (4, t + datetime.timedelta(minutes=2), "a", "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, event_type string"
    )
    out = {r["step"]: r["n_sessions"] for r in P.session_funnel(df, ["view", "click"]).collect()}
    assert out == {"view": 2, "click": 2}
