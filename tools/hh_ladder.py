"""Heavy-hitters ladder: the t37 claim ("no vocabulary-grain
shuffle") measured. Synthetic token stream with a long singleton tail
— 10 planted heavy tokens carry ~20% of the mass, every other token
is unique, so the vocabulary grows linearly with the stream while the
true heavy-hitter set stays fixed. Exactly the shape where the
t05/t32 groupBy(token) pays a vocabulary-sized shuffle and the
Misra-Gries two-pass shuffles only a bounded candidate set.

Per rung: wall for (a) exact groupBy-all-then-filter and (b)
heavy_hitter_tokens' two-pass form, plus the vocabulary size vs the
MG candidate bound (partitions x budget). Outputs must be equal —
asserted, not assumed.

Usage: python tools/hh_ladder.py [rungs_millions ...]   (default 1 4 16)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline.text import heavy_hitter_tokens
from datacatalog_tag_engine_spark.session import get_spark

K = 100
BUDGET = 1024


def token_stream(spark, n_tokens: int, parts: int = 32):
    """One token per row: ids with id % 50 < 10 map to one of 10 heavy
    tokens (each ~2% of mass); the rest are md5-unique singletons."""
    return (
        spark.range(n_tokens, numPartitions=parts)
        .select(
            F.when(
                F.col("id") % 50 < 10, F.concat(F.lit("hh_"), (F.col("id") % 10))
            )
            .otherwise(F.concat(F.lit("t_"), F.md5(F.col("id").cast("string"))))
            .alias("token")
        )
    )


def main() -> None:
    rungs = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("hh-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for m in rungs:
        n = m * 1_000_000
        toks = token_stream(spark, n).localCheckpoint(eager=True)  # price the algos, not range()
        docs = toks.withColumnRenamed("token", "text")

        # closed-form truth for the planted stream: each of the 10 heavy
        # tokens owns one residue of id % 50, so its exact count is
        # ceil/floor-free n/50 whenever 50 | n; singletons never qualify
        assert n % 50 == 0
        expected = sorted((f"hh_{i}", n // 50) for i in range(10))

        t0 = time.time()
        try:
            exact = (
                toks.groupBy("token")
                .agg(F.count("*").alias("n_occurrences"))
                .filter(F.col("n_occurrences") * K > F.lit(n))
            )
            exact_rows = sorted((r.token, r.n_occurrences) for r in exact.collect())
            assert exact_rows == expected
            exact_s = round(time.time() - t0, 2)
        except Exception as e:  # the vocabulary-grain agg CAN die here — record it
            exact_s = f"FAILED ({type(e).__name__}: aggregation over the full vocabulary)"

        t0 = time.time()
        mg = heavy_hitter_tokens(docs, text_col="text", k=K, candidate_budget=BUDGET)
        mg_rows = sorted((r.token, r.n_occurrences) for r in mg.collect())
        mg_s = time.time() - t0

        assert mg_rows == expected, (mg_rows[:3], expected[:3])
        try:
            vocab = toks.select("token").distinct().count()
        except Exception:
            vocab = 40 * n // 50 + 10  # closed form: singleton tail + 10 heavies
        parts = toks.rdd.getNumPartitions()
        row = {
            "tokens_m": m,
            "vocab": vocab,
            "hh_found": len(mg_rows),
            "groupby_all_sec": exact_s,
            "mg_two_pass_sec": round(mg_s, 2),
            "candidate_bound": parts * BUDGET,
        }
        out.append(row)
        print(json.dumps(row), flush=True)
        # unpersist() is a CacheManager call and does NOT free
        # localCheckpoint blocks; drop the reference and let the
        # ContextCleaner reclaim them before the next rung so rungs
        # don't contaminate each other's heap (r11 self-review)
        del toks, docs
        import gc

        gc.collect()
        spark._jvm.System.gc()
    print(json.dumps({"rungs": out}))


if __name__ == "__main__":
    main()
