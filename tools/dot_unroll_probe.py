"""Microbench + exact-equality check: interpreted HOF dot/norm vs the
fixed-dim unrolled chain, on the s30-shaped cell pair surface at sf0.1.

The unrolled chain must be BIT-IDENTICAL to the fold (same left-to-right
accumulation order over the same doubles), so the round-4 cosine cannot
move. This script proves it on the real data before the swap lands in
similarity.py: it computes both cosines side by side on every candidate
pair and counts rows where the RAW doubles differ at all.

Usage: python tools/dot_unroll_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.session import get_spark, load_parquet

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def dot_fold(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_fold(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def dot_chain(a, b, dim):
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + F.try_element_at(a, F.lit(i)) * F.try_element_at(b, F.lit(i))
    return acc


def norm_chain(a, dim):
    acc = F.lit(0.0)
    for i in range(1, dim + 1):
        x = F.try_element_at(a, F.lit(i))
        acc = acc + x * x
    return acc


def main() -> None:
    spark = get_spark("dot_unroll_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_parquet(spark, os.path.join(SF_DIR, "embeddings.parquet"))
    dim = emb.select(F.size("embedding").alias("d")).first()["d"]
    print(f"dim={dim}")

    # s30-shaped pair surface: assign to 8 cells by vec_id bucket (the
    # real one uses nearest-centroid; bucket keeps the probe cheap and
    # the pair count comparable), join within cell
    v = emb.select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("cell", F.pmod(F.col("vec_id"), F.lit(8)))
    a = v.select(F.col("vec_id").alias("qa"), F.col("v").alias("qv"), "cell")
    b = v.select(F.col("vec_id").alias("nb"), F.col("v").alias("cv"), "cell")
    pairs = a.join(b, "cell").filter(F.col("qa") != F.col("nb"))

    def timed(tag, col):
        df = pairs.select(col.alias("x"))
        t0 = time.time()
        for _ in range(3):
            df.write.format("noop").mode("overwrite").save()
        print(f"{tag}: {(time.time() - t0) / 3:.2f}s/pass")

    n = pairs.count()
    print(f"pairs={n}")
    timed("fold cosine (staged norms)", dot_fold(F.col("qv"), F.col("cv")))
    timed("chain cosine (unrolled)", dot_chain(F.col("qv"), F.col("cv"), dim))
    timed("fold norm", norm_fold(F.col("qv")))
    timed("chain norm", norm_chain(F.col("qv"), dim))

    # exact raw-double equality on every pair
    diff = (
        pairs.select(
            dot_fold(F.col("qv"), F.col("cv")).alias("f"),
            dot_chain(F.col("qv"), F.col("cv"), dim).alias("c"),
            norm_fold(F.col("qv")).alias("nf"),
            norm_chain(F.col("qv"), dim).alias("nc"),
        )
        .filter((F.col("f") != F.col("c")) | (F.col("nf") != F.col("nc")))
        .count()
    )
    print(f"pairs with ANY raw-double difference: {diff}")
    assert diff == 0, "unrolled chain is not bit-identical to the fold"
    print("BIT-IDENTICAL: ok")


if __name__ == "__main__":
    main()
