"""global_rank vs single-task-window ladder: the measurement behind
CURRICULUM_WINDOW_MAX. Synthetic (id, score) tables of growing size;
each rung times (a) row_number over a global window — the
Exchange SinglePartition plan — and (b) sampling.global_rank's
range-partition + offsets form, and asserts the two agree on a
sample. The window's cost is one task doing everything (memory AND
time); the range form pays two shuffles + two Arrow passes of fixed
overhead but scales with the cluster.

Usage: python tools/rank_ladder.py [rows ...]   (default: 5k 100k 2M 8M)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datacatalog_tag_engine_spark.pipeline.sampling import global_rank
from datacatalog_tag_engine_spark.session import get_spark


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [5_000, 100_000, 2_000_000, 8_000_000]
    spark = get_spark("rank-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    print("| rows | window sec | global_rank sec | agree |")
    print("|---|---|---|---|")
    for n in sizes:
        df = (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                (F.xxhash64(F.col("id").cast("string")) % 1000).alias("score"),
            )
            .localCheckpoint(eager=True)
        )
        order = [F.col("score").desc(), F.col("doc_id")]
        t0 = time.time()
        w = Window.orderBy(*order)
        df.select("doc_id", F.row_number().over(w).alias("r")).write.mode(
            "overwrite"
        ).format("noop").save()
        t_win = time.time() - t0
        t0 = time.time()
        ranked = global_rank(df, order, rank_col="r")
        ranked.write.mode("overwrite").format("noop").save()
        t_rank = time.time() - t0
        # spot agreement on the extremes (full compare is O(n) driver
        # memory; the equivalence test does it exhaustively at sf0.001)
        lo = ranked.filter(F.col("r") <= 3).orderBy("r").collect()
        wdf = df.select("doc_id", F.row_number().over(w).alias("r"))
        lo_w = wdf.filter(F.col("r") <= 3).orderBy("r").collect()
        agree = [(r["doc_id"], r["r"]) for r in lo] == [
            (r["doc_id"], r["r"]) for r in lo_w
        ]
        print(f"| {n} | {t_win:.2f} | {t_rank:.2f} | {agree} |")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
