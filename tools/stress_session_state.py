"""Session-funnel state-CHURN rung: does the state store actually
shrink when users go silent? The r11 review fix makes
session_funnel_stream call state.remove() once a user has no open
session and nothing buffered — under EventTimeTimeout an entry with
no registered timeout never expires, so before the fix every user who
EVER appeared held a state row forever (unbounded growth under user
churn, the one failure mode the per-user-bound argument didn't cover).

Synthetic churn corpus: W waves x U users, every user active for one
3-event burst then silent forever; waves 2 h apart (gap 30 min ->
each burst is one session), watermark 10 min. Fed time-ordered as one
file per wave + a far-future flush. After each micro-batch the state
operator's numRowsTotal is read from the query progress — with the
fix it stays ~U (only the most recent wave's sessions are still
open/timing out); without it it climbs ~linearly to W x U.

Usage: python tools/stress_session_state.py [n_waves] [users_per_wave]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from datacatalog_tag_engine_spark.session import get_spark
from datacatalog_tag_engine_spark.streaming import usage as U


def main() -> None:
    n_waves = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    users = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark("session-state-stress")
    spark.sparkContext.setLogLevel("ERROR")
    src = tempfile.mkdtemp(prefix="session_churn_")
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    eid = 0
    try:
        for w in range(n_waves):
            rows = []
            for u in range(users):
                uid = w * users + u
                base = t0 + pd.Timedelta(hours=2 * w, seconds=u)
                for j, et in enumerate(["view", "click", "purchase"]):
                    rows.append(
                        {
                            "event_id": eid,
                            "ts": base + pd.Timedelta(minutes=2 * j),
                            "user_id": uid,
                            "event_type": et,
                            "value": 1.0,
                            "props": "",
                        }
                    )
                    eid += 1
            pdf = pd.DataFrame(rows).sort_values("ts")
            path = os.path.join(src, f"w{w:03d}.parquet")
            pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
            os.utime(path, (1_700_000_000 + w * 60,) * 2)
        # flush file: one far-future event advances the watermark past
        # every session's gap so the last wave also closes
        flush = pd.DataFrame(
            [
                {
                    "event_id": eid,
                    "ts": t0 + pd.Timedelta(days=30),
                    "user_id": 10**9,
                    "event_type": "flush",
                    "value": 0.0,
                    "props": "",
                }
            ]
        )
        fp = os.path.join(src, "zz_flush.parquet")
        pq.write_table(pa.Table.from_pandas(flush, preserve_index=False), fp)
        os.utime(fp, (1_700_000_000 + n_waves * 60,) * 2)

        stream = U.read_events_stream(
            spark, src, glob="*.parquet", max_files_per_trigger=1
        )
        q = (
            U.session_funnel_stream(
                stream, ["view", "click", "purchase"], watermark="10 minutes"
            )
            .writeStream.format("memory")
            .queryName("churn_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        per_batch = [
            (p["batchId"], p["stateOperators"][0]["numRowsTotal"])
            for p in q.recentProgress
            if p.get("stateOperators")
        ]
        emitted = spark.table("churn_sink").count()
        total_users = n_waves * users
        peak = max(n for _, n in per_batch)
        final = per_batch[-1][1]
        print(f"waves={n_waves} users/wave={users} total_users={total_users}")
        print("state rows per batch:", per_batch)
        print(
            f"peak state rows: {peak}  final: {final}  "
            f"emitted sessions: {emitted} (expect {total_users})"
        )
        print(
            "VERDICT:",
            "BOUNDED (state ~ one wave, churned users removed)"
            if peak <= 2 * users + 1
            else "UNBOUNDED (state grows with total users — the pre-fix behavior)",
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        for _ in range(3):
            time.sleep(0.1)


if __name__ == "__main__":
    main()
