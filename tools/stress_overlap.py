"""Stress rung for the r9-queued overlap operators: containment_pairs
(d12) and cross_source_overlap (d13) at sf0.1's corpus and at 10
id-disjoint copysets (the r6/r8 stress-harness shape — maximally
duplicated, every doc in a 10-clone family, which is the HARD case
for containment: clone families multiply both the inverted-index
join fan-out (df^2 per shingle) and the number of true >=threshold
pairs).

Records wall time + shuffle bytes per variant, including containment
with and without the max_df stop-shingle lever — the docstring's
"set max_df on any real corpus" advice, measured.

Usage: python tools/stress_overlap.py [n_copies ...]   (default: 1 10)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

os.environ.setdefault("SPARK_GRAFT_UI", "true")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline import dedup as DD
from datacatalog_tag_engine_spark.session import get_spark, load_parquet

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def shuffle_write_bytes() -> int:
    try:
        app_id = _api("applications")[0]["id"]
        stages = _api(f"applications/{app_id}/stages?status=COMPLETE")
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def build_corpus(spark, n_copies: int):
    docs = load_parquet(spark, os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text", "source"
    )
    if n_copies == 1:
        return docs
    n = docs.count()
    copies = spark.range(n_copies).select(F.col("id").alias("_c"))
    return docs.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") + F.col("_c") * (10 ** len(str(n)))).alias("doc_id"),
        "text",
        "source",
    )


def run(spark, corpus) -> list[tuple[str, float, int, int]]:
    rows: list[tuple[str, float, int, int]] = []

    def measure(name: str, df):
        t0, b0 = time.time(), shuffle_write_bytes()
        n = df.count()
        rows.append((name, round(time.time() - t0, 2), shuffle_write_bytes() - b0, n))

    sh = DD.shingle_table(corpus).localCheckpoint(eager=True)
    measure("d12 containment (exact, max_df=None)", DD.containment_pairs(sh, threshold=0.8))
    measure("d12 containment (max_df=100)", DD.containment_pairs(sh, threshold=0.8, max_df=100))
    measure("d13 cross_source_overlap (shingle)", DD.cross_source_overlap(corpus))
    measure(
        "d13 cross_source_overlap (fingerprint)",
        DD.cross_source_overlap(corpus, unit="fingerprint"),
    )
    return rows


def main() -> None:
    copies = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark("stress-overlap")
    spark.sparkContext.setLogLevel("ERROR")
    result = {}
    for n in copies:
        corpus = build_corpus(spark, n).localCheckpoint(eager=True)
        n_docs = corpus.count()
        print(f"\n### overlap operators at {n_docs} docs ({n} copyset(s) of {SF_DIR})\n")
        print("| variant | sec | shuffle bytes | output rows |")
        print("|---|---|---|---|")
        rows = run(spark, corpus)
        for name, sec, sb, cnt in rows:
            print(f"| {name} | {sec} | {sb if sb >= 0 else 'n/a'} | {cnt} |")
        result[n_docs] = rows
        spark.catalog.clearCache()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
