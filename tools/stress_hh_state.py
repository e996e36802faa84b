"""Heavy-hitter-stream state rung: the monitor's whole point is that
its state does NOT grow with the stream, so measure exactly that. A
growing vocabulary is fed in waves (every wave brings a fresh
singleton tail plus the same 10 planted heavies); after each
micro-batch the state operator's numRowsTotal is read from the query
progress. Bounded-by-construction means state rows == n_buckets
(one MG summary per bucket, each capped at `budget` counters)
regardless of how many distinct tokens have streamed by — the
VERDICT line checks it, and that the planted heavies survive every
bucket's final summary.

Usage: python tools/stress_hh_state.py [n_waves] [tokens_per_wave]
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
from datacatalog_tag_engine_spark.streaming.quality import (
    heavy_hitter_candidates,
    heavy_hitter_stream,
)

N_BUCKETS = 16
BUDGET = 128


def main() -> None:
    n_waves = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    per_wave = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark("hh-state-stress")
    spark.sparkContext.setLogLevel("ERROR")
    src = tempfile.mkdtemp(prefix="hh_waves_")
    try:
        for w in range(n_waves):
            # 20% of the wave's mass on 10 recurring heavies, the rest
            # a NEVER-REPEATING singleton tail (vocabulary grows by
            # 0.8 * per_wave every wave)
            toks = []
            for i in range(per_wave):
                if i % 5 == 0:
                    toks.append(f"hh_{(i // 5) % 10}")
                else:
                    toks.append(f"w{w}_t{i}")
            pdf = pd.DataFrame({"doc_id": [w], "text": [" ".join(toks)]})
            path = os.path.join(src, f"w{w:03d}.parquet")
            pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
            os.utime(path, (1_700_000_000 + w * 60,) * 2)

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*.parquet"))
        )
        q = (
            heavy_hitter_stream(stream, budget=BUDGET, n_buckets=N_BUCKETS)
            .writeStream.format("memory")
            .queryName("hh_state_sink")
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
        cands = {r["token"] for r in heavy_hitter_candidates(spark.table("hh_state_sink")).collect()}
        vocab_seen = n_waves * (4 * per_wave // 5) + 10
        peak = max(n for _, n in per_batch)
        print(f"waves={n_waves} tokens/wave={per_wave} vocab_seen~{vocab_seen}")
        print("state rows per batch:", per_batch)
        heavies_found = sorted(t for t in cands if t.startswith("hh_"))
        print(f"peak state rows: {peak} (bound {N_BUCKETS}); candidates: {len(cands)} "
              f"(bound {N_BUCKETS * BUDGET}); heavies in candidates: {len(heavies_found)}/10")
        bounded = peak <= N_BUCKETS and len(cands) <= N_BUCKETS * BUDGET
        complete = len(heavies_found) == 10
        print(
            "VERDICT:",
            "BOUNDED+COMPLETE (state == bucket count, heavies all survive)"
            if bounded and complete
            else "FAILED (state grew with vocabulary or a heavy was lost)",
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        for _ in range(3):
            time.sleep(0.1)


if __name__ == "__main__":
    main()
