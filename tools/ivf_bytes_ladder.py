"""Bytes-read ladder for the persisted IVF index.

The pruning claim is already plan-asserted (tests/test_plans.py: the
cell IN-list reaches the parquet source as a PartitionFilter); this
tool MEASURES it: build the index over a 10x-scaled sf0.1 embedding
corpus, search at nprobe in {1, 2, 4}, and read the executed plan's
scan metrics (filesSize / numPartitions — post-pruning selection, not
a directory listing) against the total index size and the in-memory
`ivf_topk` full-corpus scan. Expected: read fraction ~= nprobe /
num_cells, which at a billion-vector corpus is the difference between
touching 1/16th of 100 TB and all of it per query batch.

Usage: python tools/ivf_bytes_ladder.py [nprobe ...]
Prints one JSON line per rung; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline.similarity import (
    build_ivf_index,
    ivf_topk,
    ivf_topk_from_index,
)
from datacatalog_tag_engine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CELLS = 16
SCALE = 10


def parquet_scan_bytes(df, path_fragment: str) -> tuple[int, int]:
    """(filesSize, numPartitions) summed over the executed plan's
    parquet scan leaves whose node string mentions ``path_fragment`` —
    the post-pruning file selection Spark actually read, via the same
    SQLMetrics the UI shows. Call AFTER an action has run the plan."""
    plan = df._jdf.queryExecution().executedPlan()
    # AQE wraps the final plan; unwrap to the executed physical tree
    if "AdaptiveSparkPlan" in plan.nodeName():
        plan = plan.executedPlan()
    size = parts = 0
    leaves = plan.collectLeaves()
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        if "Scan parquet" not in leaf.nodeName() and "Scan parquet" not in str(
            leaf.getClass().getSimpleName()
        ):
            if "FileSourceScan" not in leaf.getClass().getSimpleName():
                continue
        if path_fragment not in leaf.toString():
            continue
        it = leaf.metrics().iterator()
        for k, v in _scala_items(it):
            if k == "filesSize":
                size += v
            elif k == "numPartitions":
                parts += v
    return size, parts


def _scala_items(it):
    while it.hasNext():
        kv = it.next()
        yield kv._1(), kv._2().value()


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    nprobes = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    spark = get_spark("ivf-bytes-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    # measurement harness only: AQE re-wraps executed stages as opaque
    # QueryStageExec leaves, hiding the scan metrics this tool reads;
    # partition pruning happens at scan planning and is AQE-independent
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    from datacatalog_tag_engine_spark.session import load_parquet

    base = load_parquet(spark, f"{SF_DIR}/embeddings.parquet")
    n_base = base.count()
    # 10x the corpus: copy 0 keeps the original ids, so the
    # deterministic first-NUM_CELLS-by-id centroids are NUM_CELLS
    # DISTINCT base vectors (salting ids the other way would make all
    # centroids near-copies of base vector 0 — degenerate cells);
    # each copy gets a unique tiny perturbation so vectors stay distinct
    corpus = (
        base.crossJoin(spark.range(SCALE).select(F.col("id").alias("_c")))
        .select(
            (F.col("_c") * n_base + F.col("vec_id")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: x + F.col("_c").cast("float") / F.lit(1000.0),
            ).alias("embedding"),
        )
        .repartition(32)
    )
    root = tempfile.mkdtemp(prefix="ivf_ladder_")
    idx = os.path.join(root, "ivf")
    corpus_path = os.path.join(root, "corpus")
    corpus.write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    print(
        json.dumps({"rung": "corpus", "rows": corpus.count(), "base_rows": n_base}),
        flush=True,
    )

    t0 = time.time()
    build_ivf_index(corpus, idx, num_cells=NUM_CELLS)
    build_s = round(time.time() - t0, 2)
    index_bytes = dir_bytes(idx) - dir_bytes(os.path.join(idx, "_centroids"))
    print(
        json.dumps(
            {"rung": "index_build", "sec": build_s, "index_bytes": index_bytes}
        ),
        flush=True,
    )
    # ONE query vector: the nprobe/num_cells fraction is a per-query
    # property — a batch spread across cells probes their union
    queries = spark.read.parquet(corpus_path).orderBy("vec_id").limit(1)
    nq = queries.count()

    # baseline: the in-memory IVF assigns + scans the WHOLE corpus
    t0 = time.time()
    mem = ivf_topk(corpus, queries, k=5, num_cells=NUM_CELLS, nprobe=1)
    mem.collect()  # execute THIS plan — metrics live on its queryExecution
    mem_s = round(time.time() - t0, 2)
    mem_bytes, _ = parquet_scan_bytes(mem, corpus_path)
    print(
        json.dumps(
            {
                "rung": "in_memory_ivf",
                "nprobe": 1,
                "bytes_read": mem_bytes,
                "corpus_bytes": dir_bytes(corpus_path),
                "sec": mem_s,
                "queries": nq,
            }
        ),
        flush=True,
    )

    for nprobe in nprobes:
        t0 = time.time()
        res = ivf_topk_from_index(spark, idx, queries, k=5, nprobe=nprobe)
        res.collect()  # execute THIS plan — metrics live on its queryExecution
        sec = round(time.time() - t0, 2)
        got, parts = parquet_scan_bytes(res, idx)
        print(
            json.dumps(
                {
                    "rung": "from_index",
                    "nprobe": nprobe,
                    "bytes_read": got,
                    "index_bytes": index_bytes,
                    "read_fraction": round(got / index_bytes, 4),
                    "expected_fraction": round(nprobe / NUM_CELLS, 4),
                    "cells_scanned": parts,
                    "sec": sec,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
