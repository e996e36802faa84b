"""Stage decomposition of d25_winnowing_overlap at sf0.1 (guide §1):
time each pipeline stage in isolation with the noop sink so the next
optimization targets the actually dominant stage, not a guess.

Usage: python tools/d25_decompose.py [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline.text import winnowing_fingerprints
from datacatalog_tag_engine_spark.session import get_spark, load_parquet

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(tag, fn):
    best = None
    for _ in range(PASSES):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{tag}: min {best:.2f}s over {PASSES}")
    return best


def main() -> None:
    spark = get_spark("d25_decompose")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_parquet(spark, os.path.join(SF_DIR, "documents.parquet"))
    sc = spark.sparkContext

    sc.setJobDescription("d25 stage: fingerprints raw")
    timed("1 fingerprints (raw scan)", lambda: noop(winnowing_fingerprints(docs)))

    sc.setJobDescription("d25 stage: fps distinct")
    timed(
        "2 fps distinct",
        lambda: noop(
            winnowing_fingerprints(docs).select("doc_id", "fp").distinct()
        ),
    )

    fps = (
        winnowing_fingerprints(docs)
        .select("doc_id", "fp")
        .distinct()
        .localCheckpoint(eager=True)
    )
    hot = (
        fps.groupBy("fp").agg(F.count("*").alias("df")).filter(F.col("df") > 1000).select("fp")
    )
    join_side = fps.join(F.broadcast(hot), "fp", "left_anti")
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    keyed = join_side.repartition(width, "fp")

    sc.setJobDescription("d25 stage: hot agg + anti")
    timed("3 hot agg + anti-join (from ckpt)", lambda: noop(join_side))

    a = keyed.select(F.col("doc_id").alias("doc_a"), "fp")
    b = keyed.select(F.col("doc_id").alias("doc_b"), "fp")
    raw_join = a.join(b, "fp").filter(F.col("doc_a") < F.col("doc_b"))

    sc.setJobDescription("d25 stage: pair join only")
    timed(
        "4 pair join (count only, no groupBy)",
        lambda: print("  raw pairs:", raw_join.count()),
    )

    shared = (
        raw_join.groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )
    sc.setJobDescription("d25 stage: pair join + groupBy")
    timed("5 pair join + pair groupBy", lambda: noop(shared))

    sizes = keyed.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("_na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("_nb"))
    out = (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(F.col("n_shared") / F.least("_na", "_nb"), 4).alias("overlap"),
        )
    )
    sc.setJobDescription("d25 stage: full tail")
    timed("6 full tail (join+groupBy+size joins)", lambda: noop(out))


if __name__ == "__main__":
    main()
