"""The COPY-AUDIT shape, end to end: the substring-grain pipeline a
corpus owner runs when whole-document near-dup (minhash/Jaccard) has
already converged and the remaining redundancy is CONTAINED copies —
paragraphs pasted into wrappers, boilerplate-wrapped mirrors, leaked
benchmark answers inside otherwise-novel pages. Minhash provably
misses these (global similarity stays low); winnowing's guarantee
(any shared run of w + k - 1 characters shares a fingerprint —
Schleimer et al., SIGMOD'03) makes exactly this class visible.

Stages (each prints its accounting):

1. parameter pricing   winnowing_parameter_table — the (k, w)
                       decision table: guarantee length vs selection
                       density, expected vs measured on THIS corpus
                       (t44; the d18 discipline)
2. fingerprinting      winnowing_fingerprints — shuffle-free scan
                       projection; output is the copy-detection join
                       surface (t43)
3. overlap pairs       winnowing_overlap_pairs — df-capped bucketed
                       pair join, containment-style overlap vs the
                       smaller doc's surviving fingerprints (d25)
4. contained-copy drop winnowing_dedup — smaller side of each
                       qualifying pair drops; maximal docs stay (d27)
5. holdout leak check  winnowing_contamination — train x test only
                       (the within-split quadrant never generated);
                       flags train docs sharing fingerprint runs with
                       the holdout (d28)

At 100 TB: stages 1-2 are pure scans; stages 3-5 are bounded by the
capped join (pairs <= fp_rows x max_df) — run them at audit cadence,
not per-ingest (the per-ingest path is the d19/d23 signature store).

Run: python examples/copy_audit.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline.dedup import (
    winnowing_contamination,
    winnowing_dedup,
    winnowing_overlap_pairs,
)
from datacatalog_tag_engine_spark.pipeline.sampling import hash_bucket
from datacatalog_tag_engine_spark.pipeline.text import (
    winnowing_fingerprints,
    winnowing_parameter_table,
)
from datacatalog_tag_engine_spark.session import get_spark, register_testdata

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("copy-audit")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF)
    docs = spark.table("documents")

    print("== 1. (k, w) pricing ==")
    for r in winnowing_parameter_table(docs).orderBy("k", "w").collect():
        print(
            f"  k={r['k']} w={r['w']}: guarantee {r['guarantee_len']} chars, "
            f"density {r['measured_density_micro'] / 1e6:.3f} "
            f"(expected {r['expected_density_micro'] / 1e6:.3f}), "
            f"{r['n_fingerprints']} fingerprints"
        )

    print("== 2. fingerprint surface ==")
    fps = winnowing_fingerprints(docs)
    print(f"  {fps.count()} selections over {docs.count()} docs")

    print("== 3. overlap pairs (df-capped bucket join) ==")
    pairs = winnowing_overlap_pairs(docs, min_overlap=0.5)
    strong = pairs.filter(F.col("overlap") >= 0.8)
    print(f"  {pairs.count()} pairs at overlap >= 0.5; {strong.count()} at >= 0.8")

    print("== 4. contained-copy dedup ==")
    verdicts = winnowing_dedup(docs, min_overlap=0.8)
    dropped = verdicts.filter(~F.col("keep"))
    print(f"  {dropped.count()} contained copies dropped of {verdicts.count()}")

    print("== 5. holdout leak check ==")
    test = docs.filter(hash_bucket(F.col("doc_id"), 10) == 0)
    train = docs.filter(hash_bucket(F.col("doc_id"), 10) != 0)
    leaks = winnowing_contamination(train, test)
    print(
        f"  {leaks.count()} train docs share fingerprint runs with the "
        f"{test.count()}-doc holdout"
    )
    leaks.orderBy(F.desc("n_shared_max")).show(5)


if __name__ == "__main__":
    main()
