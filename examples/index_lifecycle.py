"""Persisted ANN index lifecycle walkthrough: the operational loop a
vector-serving deployment runs over a continuously refreshed corpus,
against the driver's sf0.001 testdata. Both layouts are exercised —
raw-vector IVF (exact cosine inside probed cells) and IVF-PQ (4-byte
ADC codes) — through every lifecycle leg:

1. build          build_ivf_index / build_ivfpq_index (cell-partitioned
                  parquet, quantizers stored beside the data)
2. serve          ivf_topk_from_index / ivfpq_topk_from_index
                  (partition-pruned: a query reads nprobe/num_cells)
3. grow           append_to_ivf_index / append_to_ivfpq_index
                  (delta-only assignment under the FROZEN quantizers,
                  file-additive — concurrent serving safe)
4. shrink         remove_from_ivf_index / remove_from_ivfpq_index
                  (rewrite-affected-cells; untouched cells byte-equal)
5. compact        compact_ivf_index / compact_ivfpq_index
                  (append deltas pile small files; one file per cell)
6. health         cell_balance_from_index / cell_inertia /
                  pq_code_histogram — the numbers that say when to
                  stop maintaining and REBUILD with retrained
                  quantizers instead

Each mutation prints the serving answer for a fixed query set so the
invariants are visible: grow == what a fresh rebuild would serve,
shrink == rebuild over the survivors, compact changes nothing.

Run: python examples/index_lifecycle.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline import similarity as SIM
from datacatalog_tag_engine_spark.session import get_spark, register_testdata

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def answer(df):
    # raw IVF scores cosine; IVF-PQ scores adist_micro — compare on
    # whatever the layout serves
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def main() -> None:
    spark = get_spark("index-lifecycle", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF)
    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    root = tempfile.mkdtemp(prefix="lifecycle_")

    for kind, build, append, remove, compact, serve in (
        (
            "ivf",
            SIM.build_ivf_index,
            SIM.append_to_ivf_index,
            SIM.remove_from_ivf_index,
            SIM.compact_ivf_index,
            SIM.ivf_topk_from_index,
        ),
        (
            "ivfpq",
            SIM.build_ivfpq_index,
            SIM.append_to_ivfpq_index,
            SIM.remove_from_ivfpq_index,
            SIM.compact_ivfpq_index,
            SIM.ivfpq_topk_from_index,
        ),
    ):
        path = os.path.join(root, kind)
        print(f"\n=== {kind} ===")
        # 1. build on the first half (the quantizer seeds live there)
        build(emb.filter(F.col("vec_id") < 100), path, num_cells=8)
        base = answer(serve(spark, path, qs, k=3, nprobe=2))
        print(f"build(half): top-3 for 5 queries -> {len(base)} rows")
        # 3. grow with the second half, in two daily deltas
        for lo, hi in ((100, 300), (300, 10**12)):
            n = append(
                spark, path,
                emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            )
            print(f"append [{lo},{hi}): +{n} rows")
        grown = answer(serve(spark, path, qs, k=3, nprobe=2))
        full_path = os.path.join(root, f"{kind}_full")
        build(emb, full_path, num_cells=8)
        assert grown == answer(serve(spark, full_path, qs, k=3, nprobe=2))
        print("grow == fresh rebuild: OK")
        # 4. shrink: retract some vectors
        doomed = emb.filter(
            (F.col("vec_id") >= 100) & (F.col("vec_id") % 7 == 0)
        ).select("vec_id")
        n = remove(spark, path, doomed)
        print(f"delete: -{n} rows")
        surv_path = os.path.join(root, f"{kind}_surv")
        build(
            emb.filter(~((F.col("vec_id") >= 100) & (F.col("vec_id") % 7 == 0))),
            surv_path, num_cells=8,
        )
        shrunk = answer(serve(spark, path, qs, k=3, nprobe=2))
        assert shrunk == answer(serve(spark, surv_path, qs, k=3, nprobe=2))
        print("shrink == rebuild over survivors: OK")
        # 5. compact the append/delete debris
        stats = compact(spark, path, max_files_per_cell=1)
        assert shrunk == answer(serve(spark, path, qs, k=3, nprobe=2))
        print(f"compact: {stats} -> serving unchanged: OK")
        # 6. health numbers that gate the rebuild decision
        if kind == "ivf":
            bal = SIM.cell_balance_from_index(spark, path).collect()
            print(
                "cell balance (from the partition column alone): "
                + ", ".join(f"cell {r['cell']}: {r['n_vectors']}" for r in bal)
            )

    shutil.rmtree(root, ignore_errors=True)
    print("\nlifecycle complete: grow/shrink/compact all value-verified")


if __name__ == "__main__":
    main()
