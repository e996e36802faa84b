"""Usage-event streaming aggregation (SURVEY.md T3; reference:
extensions/usage_tracking/README.md:1-11).

The reference derives entry_clicks / tag_creates / tag_updates /
tag_deletes summary rows from audit-log events on a daily schedule.
Structured Streaming expresses the same thing incrementally: readStream
over the event source -> watermark for late data -> tumbling daily
window counts -> append sink. The identical transformation runs in
batch mode (the functions take either a static or streaming DataFrame —
Spark's unified API), which is how the correctness oracle checks it.

Scale: the aggregation state is bounded by (window x event_type x
action) cardinality; the watermark expires state after `late` so a
100 TB/day stream holds only ~2 days of tiny counter state per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(
    spark: SparkSession,
    directory: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming source over the driver's events parquet. Streaming file
    sources take a directory; ``glob`` narrows it to the events file(s).

    Streaming sources need an explicit schema, so we sniff the parquet
    footer of one matching file (driver-side, no data read — same
    pattern as the batch loader ``session.load_parquet``) to decide the
    ``ts`` flavor: TIMESTAMP(NANOS) files are read as raw longs via the
    legacy conf and truncated to micros; micro-precision files are read
    natively (no tz -> TIMESTAMP_NTZ), byte-identical to the batch path
    so stream output == batch output."""
    import glob as globmod
    import os

    import pyarrow.parquet as pq

    ts_str = ""
    matches = globmod.glob(os.path.join(directory, glob)) + globmod.glob(
        os.path.join(directory, "**", glob), recursive=True
    )
    errors: list[str] = []
    for path in matches:
        try:
            ts_str = str(pq.read_schema(path).field("ts").type)
            break
        except Exception as ex:
            errors.append(f"{path}: {type(ex).__name__}: {ex}")
    if not ts_str:
        # a silent fallback would mis-schema the stream (NTZ vs nanos is
        # a 1000x timestamp skew) — fail clearly instead
        raise FileNotFoundError(
            f"cannot sniff a parquet footer for {glob!r} under {directory!r}: "
            + (f"all {len(matches)} candidate(s) unreadable: {errors}" if matches else "no file matches")
        )

    # any nanos precision takes the raw-long path regardless of tz —
    # reading timestamp[ns, tz=...] through the native reader without
    # the legacy conf would mis-scale values
    if ts_str.startswith("timestamp[ns"):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        reader = spark.readStream.schema(_events_schema(T.LongType())).option(
            "pathGlobFilter", glob
        )
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        raw = reader.parquet(directory)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

    ts_type: T.DataType = (
        T.TimestampType() if ts_str.startswith("timestamp[") and "tz=" in ts_str else T.TimestampNTZType()
    )
    reader = spark.readStream.schema(_events_schema(ts_type)).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(directory)
    # Watermarks require TIMESTAMP (not NTZ); with the session pinned to
    # UTC the cast is an identity reinterpretation, and the usage aggs
    # emit only dates, so stream output still equals the NTZ batch path.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def daily_usage(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Tumbling daily window counts per event_type — works on both
    streaming (with watermark-bounded state) and static frames."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.approx_count_distinct("user_id").alias("approx_users"))
        .select(
            F.col("w.start").cast("date").alias("event_date"),
            "event_type",
            "n",
            "approx_users",
        )
    )


def user_activity(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Per-user daily activity rollup (the usage-tracking per-principal
    summary shape)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(F.count("*").alias("events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").cast("date").alias("event_date"), "user_id", "events", "total_value")
    )


def cohort_user_days(events: DataFrame, id_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Per-user activity summary — the streaming-maintainable state
    behind the cohort-retention matrix (q70): one row per user holding
    the first-activity day and the distinct set of active days. ONE
    aggregation, so it runs as a complete-mode streaming query or a
    batch job unchanged (Spark's unified API); chaining the finishing
    aggregation onto the stream would need a second stateful operator,
    so that half stays a batch query over this (tiny, user-grain)
    table — the same split a production dashboard uses.

    State: one row per user; the day set is bounded by the tracking
    horizon (days, not events — a user active 1M times in a day costs
    one element). At 100 TB/day the state table is |users| rows."""
    day = F.to_date(F.col(ts_col))
    return events.groupBy(F.col(id_col).alias(id_col)).agg(
        F.min(day).alias("cohort_day"),
        F.collect_set(day).alias("active_days"),
    )


def cohort_retention_finish(user_days: DataFrame, id_col: str = "user_id") -> DataFrame:
    """Finish the retention matrix from ``cohort_user_days`` output:
    explode the per-user day sets into (cohort_day, day_offset) cells.
    Batch-side (the input is user-grain, tiny); composed with the
    streaming form it produces EXACTLY ``profiling.cohort_retention``'s
    output — the parity test asserts it."""
    return (
        user_days.select(
            "cohort_day",
            F.explode("active_days").alias("_d"),
            F.col(id_col),
        )
        .select(
            "cohort_day",
            F.datediff(F.col("_d"), F.col("cohort_day")).cast("int").alias("day_offset"),
            F.col(id_col),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def funnel_state_stream(
    events: DataFrame,
    steps: list[str],
    watermark: str = "1 day",
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming form of the ordered conversion funnel (q67): per-user
    step-completion times maintained as bounded state with
    ``applyInPandasWithState``.

    The funnel's sequential rule (step i counts only strictly AFTER the
    user's step i-1 time) is order-sensitive, so out-of-order delivery
    cannot be folded immediately: a late-arriving early 'view' can
    retroactively unlock an already-seen 'click'. The stream therefore
    BUFFERS each user's events until the event-time watermark passes
    them, then folds the released events in timestamp order — in-order
    folding makes the greedy rule exact: the first step-0 event sets
    f0, and a step-i event sets fi when f(i-1) is set, t > f(i-1), and
    fi is unset. Events beyond the watermark at arrival are handled by
    Spark's watermark semantics upstream (same contract as
    gate_metrics).

    State per user: len(steps) timestamps + the pending buffer, which
    the watermark bounds to the user's events inside the late-data
    horizon — at 100 TB/day that is (per-user event rate x watermark),
    not history. Events arriving ALREADY beyond the watermark are
    dropped and counted (``n_late_dropped`` in every emission) — the
    same contract the certified gate_metrics stream applies: folding
    them anyway would violate the in-order guarantee the correctness
    argument rests on, silently. Each invocation emits the user's
    current step times (append mode) with a monotone ``emit_seq``;
    downstream takes the max-seq row per user
    (``funnel_counts_finish``). Users holding pending events register
    an event-time timeout at their earliest pending timestamp, so a
    user with no further traffic still gets a fold-and-emit pass once
    the watermark clears their buffer — without it, quiet users' last
    events would sit unreleased forever (and the availableNow test
    form would never see their final state).

    State LIFETIME, deliberately different from the session funnel's:
    one row per user for as long as the stream runs. The lifetime
    funnel's answer can change with ANY future event (a user may
    convert years later), so no state row is ever final — removal
    would silently restart returning users' funnels and re-race
    ``emit_seq`` against their earlier emissions. Contrast
    ``session_funnel_stream``, where a closed session is immutable and
    idle state is therefore REMOVED (the r11 churn fix): there the
    store tracks active users; here it tracks |users| rows of
    (len(steps) longs + the watermark-bounded buffer) — the same
    envelope as ``cohort_user_days``, and the r9 state rung measured
    the buffer half.

    Reference analog: the usage-tracking extension's daily event
    rollups (extensions/usage_tracking/README.md:1-11) — this is the
    sequential-conversion counterpart."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    step_idx = {s: i for i, s in enumerate(steps)}
    n = len(steps)

    # the id field's type follows the input (string user ids are common
    # in event data; hardcoding long would corrupt at the Arrow
    # boundary)
    id_type = events.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("emit_seq", T.LongType()),
            T.StructField("step_ts_micro", T.ArrayType(T.LongType())),
            T.StructField("n_pending", T.IntegerType()),
            T.StructField("n_late_dropped", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("emit_seq", T.LongType()),
            T.StructField("steps_micro", T.ArrayType(T.LongType())),
            T.StructField("pend_ts", T.ArrayType(T.LongType())),
            T.StructField("pend_step", T.ArrayType(T.IntegerType())),
            T.StructField("n_late_dropped", T.LongType()),
        ]
    )

    def fold(key, pdfs, state):
        if state.exists:
            emit_seq, steps_micro, pend_ts, pend_step, n_late = state.get
            steps_micro = list(steps_micro)
            pend = list(zip(pend_ts, pend_step))
        else:
            emit_seq, steps_micro, pend, n_late = 0, [-1] * n, [], 0
        wm_ms = state.getCurrentWatermarkMs()
        wm = wm_ms * 1000  # micros
        for pdf in pdfs:
            for ts, et in zip(pdf[ts_col], pdf[type_col]):
                j = step_idx.get(et)
                if j is not None and ts is not None and not pd.isna(ts):
                    t = int(pd.Timestamp(ts).value) // 1000
                    if t <= wm:
                        # beyond-watermark arrival: the in-order fold
                        # already passed this point — drop and count
                        # (the gate_metrics late-data contract)
                        n_late += 1
                    else:
                        pend.append((t, j))
        release = sorted(e for e in pend if e[0] <= wm)
        pend = [e for e in pend if e[0] > wm]
        for t, j in release:
            if j == 0:
                if steps_micro[0] < 0:
                    steps_micro[0] = t
            elif steps_micro[j - 1] >= 0 and t > steps_micro[j - 1] and steps_micro[j] < 0:
                steps_micro[j] = t
        emit_seq += 1
        state.update(
            (
                emit_seq,
                steps_micro,
                [t for t, _ in pend],
                [j for _, j in pend],
                n_late,
            )
        )
        if pend:
            # wake this user when the watermark clears the earliest
            # buffered event (must be strictly beyond the current wm)
            state.setTimeoutTimestamp(
                max(wm_ms + 1, min(t for t, _ in pend) // 1000 + 1)
            )
        yield pd.DataFrame(
            [
                {
                    id_col: key[0],
                    "emit_seq": emit_seq,
                    "step_ts_micro": steps_micro,
                    "n_pending": len(pend),
                    "n_late_dropped": n_late,
                }
            ]
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(id_col)
        .applyInPandasWithState(
            fold, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def funnel_counts_finish(state_rows: DataFrame, steps: list[str], id_col: str = "user_id") -> DataFrame:
    """Finish funnel counts from ``funnel_state_stream`` emissions:
    latest emission per user -> per-step completion counts ->
    ``profiling.event_funnel``'s exact output shape (step_index, step,
    n_users, conversion). User-grain input, one tiny aggregation."""
    from pyspark.sql.window import Window

    latest = (
        state_rows.groupBy(id_col)
        .agg(F.max_by("step_ts_micro", "emit_seq").alias("st"))
    )
    spark = state_rows.sparkSession
    axis = spark.createDataFrame(
        [(i, s) for i, s in enumerate(steps)], "step_index int, step string"
    )
    counts = latest.select(
        F.posexplode("st").alias("step_index", "t")
    ).groupBy("step_index").agg(
        F.sum((F.col("t") >= 0).cast("long")).alias("n_users")
    )
    base = F.max(F.when(F.col("step_index") == 0, F.col("n_users"))).over(
        Window.partitionBy()
    )
    return (
        axis.join(counts, "step_index", "left")
        .withColumn("n_users", F.coalesce(F.col("n_users"), F.lit(0)).cast("long"))
        .select(
            "step_index",
            "step",
            "n_users",
            F.round(
                F.when(base > 0, F.col("n_users") / base).otherwise(F.lit(0.0)), 4
            ).alias("conversion"),
        )
    )


def run_available_now(stream_df: DataFrame, sink_name: str):
    """Drain everything currently available into an in-memory sink
    (complete mode) and return the finished query — the test/CI shape of
    a production ``writeStream.trigger(processingTime=...)`` job."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def session_funnel_stream(
    events: DataFrame,
    steps: list[str],
    gap_minutes: int = 30,
    watermark: str = "1 day",
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming form of the session-scoped conversion funnel (q75):
    per-user state holds ONE open session's step-completion times plus
    the watermark buffer; a closed session is emitted as one row.

    Combines the two existing stateful disciplines: sessionization's
    close-on-gap/close-on-timeout rule (streaming/sessions.py) with
    funnel_state_stream's watermark-ordered folding — the within-
    session step rule (step i counts only strictly after the session's
    own step i-1 time) is order-sensitive, so events fold only once
    the watermark passes them, in timestamp order. Session boundaries
    use the batch rule verbatim: floor-epoch-second gap strictly
    greater than gap_minutes*60 (profiling.sessionize / q75); step
    ordering compares full microsecond timestamps, also the batch
    rule. An open session closes when a released event lands past the
    gap OR when the watermark itself passes last_ts + gap — any future
    event must then open a new session, so the close commutes with
    every possible future.

    State per user: len(steps) timestamps + one session anchor + the
    late-horizon buffer (same bound as funnel_state_stream). Events
    already beyond the watermark at arrival are dropped and counted on
    every emission (the gate_metrics contract). Emitted rows are
    session-grain (append mode): (id, session_start_micro,
    step_ts_micro, n_late_dropped); ``session_funnel_finish`` turns
    them into q75's exact output shape."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    step_idx = {s: i for i, s in enumerate(steps)}
    n = len(steps)
    gap_sec = gap_minutes * 60
    id_type = events.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("session_start_micro", T.LongType()),
            T.StructField("step_ts_micro", T.ArrayType(T.LongType())),
            T.StructField("n_late_dropped", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("sess_start", T.LongType()),   # micros, -1 = none
            T.StructField("sess_last", T.LongType()),    # floor-epoch SECONDS
            T.StructField("steps_micro", T.ArrayType(T.LongType())),
            T.StructField("pend_ts", T.ArrayType(T.LongType())),
            T.StructField("pend_step", T.ArrayType(T.IntegerType())),
            T.StructField("n_late_dropped", T.LongType()),
        ]
    )

    def fold(key, pdfs, state):
        if state.exists:
            sess_start, sess_last, steps_micro, pend_ts, pend_step, n_late = state.get
            steps_micro = list(steps_micro)
            pend = list(zip(pend_ts, pend_step))
        else:
            sess_start, sess_last, steps_micro, pend, n_late = -1, -1, [-1] * n, [], 0
        wm_ms = state.getCurrentWatermarkMs()
        wm = wm_ms * 1000  # micros
        for pdf in pdfs:
            for ts, et in zip(pdf[ts_col], pdf[type_col]):
                if ts is None or pd.isna(ts):
                    continue
                t = int(pd.Timestamp(ts).value) // 1000
                if t <= wm:
                    n_late += 1
                else:
                    pend.append((t, step_idx.get(et, -1)))
        release = sorted(e for e in pend if e[0] <= wm)
        pend = [e for e in pend if e[0] > wm]
        closed: list[tuple[int, list[int]]] = []
        for t, j in release:
            t_sec = t // 1_000_000
            if sess_start < 0:
                sess_start, sess_last, steps_micro = t, t_sec, [-1] * n
            elif t_sec - sess_last > gap_sec:
                closed.append((sess_start, steps_micro))
                sess_start, sess_last, steps_micro = t, t_sec, [-1] * n
            else:
                sess_last = t_sec
            if j == 0:
                if steps_micro[0] < 0:
                    steps_micro[0] = t
            elif j > 0 and steps_micro[j - 1] >= 0 and t > steps_micro[j - 1] and steps_micro[j] < 0:
                steps_micro[j] = t
        # the watermark itself can close the open session: any future
        # event has t > wm, so t_sec - sess_last > gap is already
        # certain — the close commutes with every possible future
        if not pend and sess_start >= 0 and (wm // 1_000_000) - sess_last > gap_sec:
            closed.append((sess_start, steps_micro))
            sess_start, sess_last, steps_micro = -1, -1, [-1] * n
        if not pend and sess_start < 0:
            # nothing buffered and no open session: DROP the state row.
            # Under EventTimeTimeout an entry with no timeout registered
            # never expires, so persisting an empty entry here would
            # grow the state store forever with user churn (the same
            # rule sessions.py applies). Cost: the cumulative
            # n_late_dropped counter resets if the user returns — the
            # session rows already emitted carry its value.
            if state.exists:
                state.remove()
        else:
            state.update(
                (
                    sess_start,
                    sess_last,
                    steps_micro,
                    [t for t, _ in pend],
                    [j for _, j in pend],
                    n_late,
                )
            )
            if pend:
                state.setTimeoutTimestamp(max(wm_ms + 1, min(t for t, _ in pend) // 1000 + 1))
            else:
                state.setTimeoutTimestamp(max(wm_ms + 1, (sess_last + gap_sec) * 1000 + 1000))
        if closed:
            yield pd.DataFrame(
                [
                    {
                        id_col: key[0],
                        "session_start_micro": st,
                        "step_ts_micro": sm,
                        "n_late_dropped": n_late,
                    }
                    for st, sm in closed
                ]
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(id_col)
        .applyInPandasWithState(
            fold, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def session_step_times(
    events: DataFrame,
    steps: list[str],
    gap_minutes: int = 30,
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """BATCH twin of ``session_funnel_stream``'s emission grain — the
    q78/cohort_user_days pattern: the deterministic per-key state the
    stream maintains, computed as a batch job over the same events, so
    the streaming decomposition gets a driver-checkable row. One row
    per (user, session): the session's start micros, the per-step
    completion micros under the stream's exact within-session rule
    (step i counts only strictly after the session's own step i-1
    time; -1 = never reached), and n_late_dropped = 0 (a batch replay
    has no late data). ``session_funnel_finish`` over this table
    reproduces ``profiling.session_funnel`` (q75) exactly — the parity
    test asserts it, and the stream==batch test ties the stream's own
    emissions to the same finish.

    Session labels use the certified q32 gap rule verbatim
    (floor-epoch-second gap strictly greater than gap_minutes*60).
    Plan shape: one user-grain sort window for labels, then len(steps)
    session-grain min-aggregates chained by (strictly-after) joins —
    nothing event-grain survives the first funnel stage."""
    from pyspark.sql import Window

    from ..model.timeutil import ts_epoch_long

    w = Window.partitionBy(id_col).orderBy(ts_col)
    sec = ts_epoch_long(F.col(ts_col))
    gap = sec - F.lag(sec).over(w)
    labeled = events.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    ).withColumn("_sess", F.sum("_new_session").over(w))
    sess = labeled.select(
        F.struct(F.col(id_col), F.col("_sess")).alias("_sid"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_t"),
        F.col(type_col).alias("_et"),
    )
    base = sess.groupBy("_sid").agg(F.min("_t").alias("session_start_micro"))
    cur = None
    step_cols = []
    for i, step in enumerate(steps):
        stage = sess.filter(F.col("_et") == step)
        if cur is not None:
            stage = stage.join(
                cur.select("_sid", F.col(f"_t{i-1}").alias("_pt")), "_sid"
            ).filter(F.col("_t") > F.col("_pt"))
        cur = stage.groupBy("_sid").agg(F.min("_t").alias(f"_t{i}"))
        step_cols.append(f"_t{i}")
        base = base.join(cur, "_sid", "left")
    return base.select(
        F.col(f"_sid.{id_col}").alias(id_col),
        "session_start_micro",
        F.array(*[F.coalesce(F.col(c), F.lit(-1)) for c in step_cols]).alias(
            "step_ts_micro"
        ),
        F.lit(0).cast("long").alias("n_late_dropped"),
    )


def session_funnel_finish(
    session_rows: DataFrame, steps: list[str]
) -> DataFrame:
    """Finish q75's exact output shape from ``session_funnel_stream``
    emissions: each row is one closed session; a session counts for
    step i when its step-i time is set. Session-grain input, one tiny
    aggregation."""
    from pyspark.sql.window import Window

    spark = session_rows.sparkSession
    axis = spark.createDataFrame(
        [(i, s) for i, s in enumerate(steps)], "step_index int, step string"
    )
    counts = (
        session_rows.select(F.posexplode("step_ts_micro").alias("step_index", "t"))
        .groupBy("step_index")
        .agg(F.sum((F.col("t") >= 0).cast("long")).alias("n_sessions"))
    )
    base = F.max(F.when(F.col("step_index") == 0, F.col("n_sessions"))).over(
        Window.partitionBy()
    )
    return (
        axis.join(counts, "step_index", "left")
        .withColumn("n_sessions", F.coalesce(F.col("n_sessions"), F.lit(0)))
        .withColumn(
            "conversion",
            F.when(base > 0, F.round(F.col("n_sessions") / base, 4)).otherwise(
                F.lit(0.0)
            ),
        )
        .select("step_index", "step", "n_sessions", "conversion")
    )
