"""Streaming-funnel state boundedness rung: feed the events corpus to
funnel_state_stream as N time-ordered micro-batches and measure the
per-user pending-buffer sizes the watermark actually admits — the
number that decides whether the design's "state = per-user rate x
watermark horizon, not history" claim holds.

Every fold emission carries (emit_seq, n_pending), so the memory sink
IS the instrument: max/mean pending across all emissions, final state
rows, and the finished funnel parity against the batch operator.

Usage: python tools/stress_funnel_state.py [sf_dir] [n_batches] [watermark]
(defaults: /root/testdata/sf0.001, 5 batches, '30 minutes')
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

import __spark_entry__ as E
from datacatalog_tag_engine_spark.pipeline.profiling import event_funnel
from datacatalog_tag_engine_spark.session import get_spark, load_parquet
from datacatalog_tag_engine_spark.streaming import usage as U


def run(sf_dir: str, n_batches: int, watermark: str, order: str) -> dict:
    spark = get_spark("funnel-stress")
    spark.sparkContext.setLogLevel("ERROR")
    events = load_parquet(spark, os.path.join(sf_dir, "events.parquet"))
    import hashlib

    pdf = events.toPandas()
    if order == "time":
        pdf = pdf.sort_values("ts").reset_index(drop=True)
    elif order == "jitter":
        # bounded disorder: each event's arrival position displaced by
        # a deterministic +-10 min — INSIDE the 30-min watermark, so
        # the pending buffer must absorb it all with zero drops
        jit = pdf["event_id"].map(
            lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) % 1200 - 600
        )
        pdf = (
            pdf.assign(_k=pdf["ts"] + pd.to_timedelta(jit, unit="s"))
            .sort_values("_k")
            .drop(columns="_k")
            .reset_index(drop=True)
        )
    else:
        # full deterministic shuffle: arrival order decorrelated from
        # event time entirely — most data arrives beyond the watermark,
        # the drop-and-count contract engages, and parity is expected
        # to break (the documented trade, same as gate_metrics)
        pdf = (
            pdf.assign(
                _h=pdf["event_id"].map(
                    lambda i: hashlib.md5(str(i).encode()).hexdigest()
                )
            )
            .sort_values("_h")
            .drop(columns="_h")
            .reset_index(drop=True)
        )

    src = tempfile.mkdtemp(prefix="funnel_stress_")
    try:
        chunk = (len(pdf) + n_batches - 1) // n_batches
        sentinel = pdf.iloc[:1].copy()
        sentinel["event_id"] = 10**9
        sentinel["user_id"] = 10**9
        sentinel["event_type"] = "flush"
        sentinel["ts"] = pdf["ts"].max() + pd.Timedelta(days=30)
        parts = [pdf.iloc[i * chunk : (i + 1) * chunk] for i in range(n_batches)]
        parts.append(sentinel)
        for i, part in enumerate(parts):
            path = os.path.join(src, f"f{i}.parquet")
            pq.write_table(pa.Table.from_pandas(part, preserve_index=False), path)
            os.utime(path, (1_700_000_000 + i * 60,) * 2)

        stream = U.read_events_stream(
            spark, src, glob="*.parquet", max_files_per_trigger=1
        )
        sink = f"funnel_stress_{order}"
        q = (
            U.funnel_state_stream(stream, E.FUNNEL_STEPS, watermark=watermark)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        rows = spark.table(sink)
        emissions = rows.count()
        pend = rows.agg(
            F.max("n_pending").alias("mx"),
            F.round(F.avg("n_pending"), 2).alias("mean"),
        ).first()
        users = rows.select("user_id").distinct().count()
        dropped = (
            rows.groupBy("user_id")
            .agg(F.max("n_late_dropped").alias("d"))
            .agg(F.sum("d"))
            .first()[0]
        )
        per_user_events = (
            events.groupBy("user_id").count().agg(F.max("count")).first()[0]
        )
        finished = {
            (r["step_index"], r["step"]): (r["n_sessions"] if "n_sessions" in r else r["n_users"], r["conversion"])
            for r in U.funnel_counts_finish(rows, E.FUNNEL_STEPS).collect()
        }
        batch = {
            (r["step_index"], r["step"]): (r["n_users"], r["conversion"])
            for r in event_funnel(events, E.FUNNEL_STEPS).collect()
        }
        return {
            "order": order,
            "n_batches": n_batches,
            "watermark": watermark,
            "events": int(events.count()),
            "users_in_state": int(users),
            "emissions": int(emissions),
            "max_pending": int(pend["mx"]),
            "mean_pending": float(pend["mean"]),
            "max_events_per_user": int(per_user_events),
            "n_late_dropped": int(dropped),
            "stream_equals_batch": finished == batch,
        }
    finally:
        shutil.rmtree(src, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    watermark = sys.argv[3] if len(sys.argv) > 3 else "30 minutes"
    out = [run(sf_dir, n_batches, watermark, o) for o in ("time", "jitter", "shuffled")]
    for r in out:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
