"""Probe (r14, guide §3.1): does allowing shuffled-hash joins help the
inverted-index / winnowing fan-out self-joins?

Two runtime-settable levers, measured on the heaviest pair-join queries
(d25, d29, q106) with min-of-3 noop-sink timings, same session:
  A) baseline (sort-merge, the session default)
  B) spark.sql.join.preferSortMergeJoin=false (planner picks SHJ when
     its size conditions hold)
  C) AQE rewrite: spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold
     = advisoryPartitionSizeInBytes (the documented safe gate: rewrite
     only when every post-shuffle partition fits the local map)

Usage: python tools/shj_probe.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from datacatalog_tag_engine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = sys.argv[1:] or ["d25_winnowing_overlap", "d29_incremental_winnowing", "q106_copy_audit_profile"]
MODES = [
    ("baseline", {}),
    ("preferSHJ", {"spark.sql.join.preferSortMergeJoin": "false"}),
    ("aqeSHJ", {"spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "67108864"}),
]


def main() -> None:
    spark = get_spark("shj-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    import gc

    defaults = {k: spark.conf.get(k, None) for _, conf in MODES for k in conf}
    for name in QUERIES:
        for mode, conf in MODES:
            for k, v in conf.items():
                spark.conf.set(k, v)
            runs = []
            for _ in range(3):
                t0 = time.time()
                df = qs[name](spark, SF_DIR)
                df.write.mode("overwrite").format("noop").save()
                runs.append(round(time.time() - t0, 2))
                df = None
                spark.catalog.clearCache()
                gc.collect()
            print(f"{name:36s} {mode:10s} min {min(runs):6.2f}  runs {runs}", flush=True)
            for k in conf:
                if defaults[k] is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, defaults[k])


if __name__ == "__main__":
    main()
