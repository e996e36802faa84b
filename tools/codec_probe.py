"""Probe (r14, guide §2.3): does spark.io.compression.codec=zstd help
the winnowing pair-incidence shuffles (the 457 MB thin-row stream that
is d25/d29's measured floor)?

The codec is a core SparkConf fixed at session creation, so unlike
tools/shj_probe.py this cannot toggle in-process: run the script once
per codec (two processes, back to back, quiet box) and compare.

Usage: SPARK_GRAFT_CODEC=zstd python tools/codec_probe.py [query ...]
       SPARK_GRAFT_CODEC=lz4  python tools/codec_probe.py [query ...]

The session replicates datacatalog_tag_engine_spark.session.get_spark's
settings (it cannot call it: getOrCreate would drop the codec conf on
reuse and core confs do not apply to an existing session) plus the
codec under test.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CODEC = os.environ.get("SPARK_GRAFT_CODEC", "lz4")
QUERIES = sys.argv[1:] or [
    "d25_winnowing_overlap",
    "d29_incremental_winnowing",
    "d28_winnowing_contamination",
    "q106_copy_audit_profile",
]


def _session() -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.appName(f"codec-probe-{CODEC}")
        .master(f"local[{cpus}]")
        .config("spark.io.compression.codec", CODEC)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.limit.initialNumPartitions", cpus)
        .config("spark.default.parallelism", str(max(4, int(cpus) // 4)))
        .config("spark.sql.leafNodeDefaultParallelism", cpus)
        .getOrCreate()
    )


def main() -> None:
    import __spark_entry__ as E

    qs = E.queries()
    # validate CLI names before paying SparkSession startup (r14 ADVICE):
    # a typo used to surface as a bare KeyError after ~10s of JVM spin-up
    unknown = [n for n in QUERIES if n not in qs]
    if unknown:
        sys.exit(
            f"unknown queries: {', '.join(unknown)}\n"
            f"available: {', '.join(sorted(qs))}"
        )

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.sparkContext.getConf().get("spark.io.compression.codec") == CODEC

    for name in QUERIES:
        runs = []
        for _ in range(3):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            runs.append(round(time.time() - t0, 2))
            df = None
            spark.catalog.clearCache()
            gc.collect()
        print(f"{name:36s} codec={CODEC:5s} min {min(runs):6.2f}  runs {runs}", flush=True)


if __name__ == "__main__":
    main()
