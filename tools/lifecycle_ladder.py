"""Index-lifecycle cost ladder: the s22 design claim is that deletion
cost scales with the AFFECTED-CELL volume, not the corpus — only
partitions holding a doomed id are staged and swapped; every other
cell's files are never read or written. This tool measures it: one
10x-scaled sf0.1 embedding corpus, one persisted IVF index copied per
variant, doomed sets of (roughly) fixed size confined to 1 / 2 / 4 / 8
of the 8 cells, wall time + the byte volume of the cells actually
rewritten. Expected: wall and rewritten bytes grow ~linearly in the
affected-cell count at fixed doomed-set size; the untouched-cell byte
volume never moves.

Usage: python tools/lifecycle_ladder.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline import similarity as SIM
from datacatalog_tag_engine_spark.session import get_spark, load_parquet

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cell_bytes(path: str) -> dict[int, int]:
    out: dict[int, int] = {}
    for d in glob.glob(os.path.join(path, "cell=*")):
        c = int(d.split("=")[1])
        out[c] = sum(
            os.path.getsize(p) for p in glob.glob(os.path.join(d, "*.parquet"))
        )
    return out


def main() -> None:
    spark = get_spark("lifecycle-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_parquet(spark, os.path.join(SF_DIR, "embeddings.parquet"))
    n = emb.count()
    copies = spark.range(10).select(F.col("id").alias("_c"))
    big = emb.crossJoin(F.broadcast(copies)).select(
        (F.col("vec_id") + F.col("_c") * (10 ** len(str(n)))).alias("vec_id"),
        "embedding",
    )
    base = tempfile.mkdtemp(prefix="ladder_ivf_")
    SIM.build_ivf_index(big, base, num_cells=8)
    total = big.count()
    resident = spark.read.parquet(base).select("vec_id", "cell")
    # ~200 doomed ids per cell, so the doomed-set size grows with the
    # affected-cell count but per-cell rewrite work stays comparable
    per_cell = {
        c: [r["vec_id"] for r in resident.filter(F.col("cell") == c).limit(200).collect()]
        for c in range(8)
    }
    print(f"index: {total} vectors, 8 cells, {sum(cell_bytes(base).values())} bytes")
    print("| affected cells | doomed ids | delete sec | bytes rewritten | untouched bytes moved |")
    print("|---|---|---|---|---|")
    try:
        for k in (1, 2, 4, 8):
            work = tempfile.mkdtemp(prefix="ladder_work_")
            shutil.rmtree(work)
            shutil.copytree(base, work)
            doomed_ids = [i for c in range(k) for i in per_cell[c]]
            doomed = spark.createDataFrame([(i,) for i in doomed_ids], "vec_id long")
            before = cell_bytes(work)
            spark.catalog.refreshByPath(work)
            t0 = time.time()
            removed = SIM.remove_from_ivf_index(spark, work, doomed)
            sec = time.time() - t0
            after = cell_bytes(work)
            rewritten = sum(
                after.get(c, 0) for c in range(k)
            )
            untouched_moved = sum(
                1 for c in range(k, 8) if after.get(c) != before.get(c)
            )
            assert removed == len(doomed_ids)
            print(
                f"| {k} | {len(doomed_ids)} | {sec:.2f} | {rewritten} | {untouched_moved} |"
            )
            shutil.rmtree(work, ignore_errors=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
