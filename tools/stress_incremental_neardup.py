"""Incremental near-dup quadrant rung (d19): measure what the
delta-restricted bucket join actually saves over the full self-join
estimate when a small daily batch lands on a large resident corpus —
the d19 design claim is that the resident x resident quadrant (which
grows quadratically with resident size and was already adjudicated
when the resident corpus was deduped) is never generated.

Corpus: n_copies text-suffixed copysets of sf0.1's documents (the
clone-heavy stress shape); delta = one copyset (today's crawl),
resident = the rest. Variants:

- full:   minhash_estimate_pairs(resident + delta) — every pair,
          including resident-internal ones
- d19:    incremental_neardup_pairs(delta, resident) — delta-touching
          pairs only
- d19+sigs: same, resident signatures precomputed and materialized
          (the persisted-artifact serving path — daily cost excludes
          resident shingling)

Usage: python tools/stress_incremental_neardup.py [n_copies]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline import dedup as DD
from datacatalog_tag_engine_spark.session import get_spark, load_parquet

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("stress-inc-neardup")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_parquet(spark, os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    nb = base.count()
    copies = spark.range(n_copies).select(F.col("id").alias("_c"))
    docs = base.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") + F.col("_c") * (10 ** len(str(nb)))).alias("doc_id"),
        F.concat("text", F.lit(" copyset"), F.col("_c")).alias("text"),
    ).localCheckpoint(eager=True)
    delta = docs.filter(F.col("doc_id") < 10 ** len(str(nb)))  # copyset 0
    resident = docs.filter(F.col("doc_id") >= 10 ** len(str(nb)))
    print(
        f"resident={resident.count()} delta={delta.count()} "
        f"(copyset shape: every doc has {n_copies - 1} near-clones)"
    )

    t0 = time.time()
    n_full = DD.minhash_estimate_pairs(docs).count()
    t_full = time.time() - t0

    t0 = time.time()
    n_d19 = DD.incremental_neardup_pairs(delta, resident).count()
    t_d19 = time.time() - t0

    sigs_r = DD.minhash_signatures(DD.shingle_table(resident)).localCheckpoint(
        eager=True
    )
    t0 = time.time()
    n_sig = DD.incremental_neardup_pairs(delta, resident, resident_sigs=sigs_r).count()
    t_sig = time.time() - t0

    print("| variant | sec | pairs |")
    print("|---|---|---|")
    print(f"| full self-join estimate | {t_full:.2f} | {n_full} |")
    print(f"| d19 delta-restricted | {t_d19:.2f} | {n_d19} |")
    print(f"| d19 + persisted resident sigs | {t_sig:.2f} | {n_sig} |")
    assert n_sig == n_d19


if __name__ == "__main__":
    main()
