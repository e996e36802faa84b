"""The corpus-QA sweep: the read-only diagnosis pass an operator runs
BEFORE trusting a corpus snapshot to the expensive pipelines — every
stage is dimension-grain output over scan-grain input, so the whole
sweep is safe to run nightly at 100 TB.

Stages (each prints its accounting):

1. snapshot diff      corpus_snapshot_diff — what changed vs
                      yesterday, per source; a source 90% removed is
                      an upstream incident, stop here (q97)
2. heavy hitters      heavy_hitter_tokens — boilerplate detector with
                      NO vocabulary-grain shuffle (two-pass
                      Misra-Gries); feeds stop-shingle / max_df
                      choices (t37)
3. gate overlap       gate_overlap_matrix — which Gopher gates
                      co-fire; a pair firing ~identically is a
                      redundant gate to drop or reorder
                      cheapest-first (q98)
4. encoding coverage  char_coverage — out-of-alphabet mass per
                      source, the pre-tokenizer check (t30)
5. semantic structure knn_graph — mutual-kNN edge stats per cell,
                      the SemDeDup precursor (s30)
6. score calibration  score_gate_calibration — does the cheap t02
                      score predict the expensive gate? (q100)
7. language mixing    line_language_profile — docs whose single
                      label is the wrong shape (t39)

Run: python examples/corpus_qa.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline.profiling import (
    corpus_snapshot_diff,
    score_gate_calibration,
)
from datacatalog_tag_engine_spark.pipeline.similarity import knn_graph
from datacatalog_tag_engine_spark.pipeline.text import (
    char_coverage,
    gate_overlap_matrix,
    heavy_hitter_tokens,
    line_language_profile,
)
from datacatalog_tag_engine_spark.session import get_spark, register_testdata

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("corpus-qa", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF)
    docs = spark.table("documents")
    emb = spark.table("embeddings")

    # 1. what changed since the last snapshot (simulated: yesterday is
    # today minus every 17th doc; today amends every 5th)
    old = docs.filter(F.col("doc_id") % 17 != 0)
    new = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [amended]"))
        ).otherwise(F.col("text")),
    )
    diff = corpus_snapshot_diff(old, new).orderBy("source")
    print("== 1. snapshot diff (per source)")
    diff.show(5, truncate=False)

    # 2. corpus-wide heavy hitters — the boilerplate list
    hh = heavy_hitter_tokens(docs, k=100).orderBy(F.desc("n_occurrences"))
    print("== 2. heavy hitters (count > n_tokens/100)")
    hh.show(10, truncate=False)

    # 3. gate co-fire matrix — which quality rules are redundant
    mat = gate_overlap_matrix(docs).orderBy(F.desc("n_docs"))
    print("== 3. Gopher gate co-fire matrix (diagonal = solo counts)")
    mat.show(10, truncate=False)

    # 4. out-of-alphabet mass per source
    cov = char_coverage(docs).orderBy("coverage")
    print("== 4. character coverage (lowest-coverage sources first)")
    cov.show(5, truncate=False)

    # 5. mutual-kNN density per graph — high mutual density in a cell
    # means a tight semantic clump (dedup candidate region)
    g = knn_graph(emb, k=5, num_cells=8)
    stats = g.agg(
        F.count("*").alias("edges"),
        F.sum(F.col("mutual").cast("int")).alias("mutual_edges"),
        F.round(F.avg("cosine"), 4).alias("avg_cosine"),
    )
    print("== 5. kNN-graph structure")
    stats.show(truncate=False)

    # 6. cheap-score vs expensive-gate calibration: monotone keep_rate
    # means the score can pre-filter; flat means it predicts nothing
    cal = score_gate_calibration(docs).orderBy("decile")
    print("== 6. quality-score decile vs Gopher keep rate")
    cal.show(10, truncate=False)

    # 7. within-doc language mixing: a mixed doc's single label is
    # the wrong shape — route to segmentation before tokenizer work
    mix = line_language_profile(docs)
    summary = mix.agg(
        F.count("*").alias("docs"),
        F.sum(F.col("is_mixed").cast("int")).alias("mixed_docs"),
        F.sum((F.col("n_langs") == 0).cast("int")).alias("unlabeled"),
    )
    print("== 7. language-mixing profile")
    summary.show(truncate=False)

    # 8. PII incidence per source: the governance number BEFORE any
    # scrub runs (same sequential semantics as redact_pii, so these
    # counts are exactly what the scrubber would remove)
    from datacatalog_tag_engine_spark.pipeline.text import pii_incidence

    print("== 8. PII incidence (per source x type)")
    pii_incidence(docs).orderBy("source", "pii_type").show(12, truncate=False)

    # 9. the dedup-threshold decision table: cumulative candidate-pair
    # mass at each estimate lattice edge — pick the threshold from
    # counted mass, not folklore
    from datacatalog_tag_engine_spark.pipeline.dedup import (
        candidate_threshold_sweep,
        cluster_purity,
        minhash_dedup,
        neardup_clusters,
    )

    print("== 9. dedup-threshold sweep (cum = pairs a threshold keeps)")
    candidate_threshold_sweep(docs).orderBy(F.desc("est_jaccard")).show(truncate=False)

    # 10. provenance purity of the near-dup clusters: mixed clusters
    # are cross-source mirrors (a canonical pick erases one source's
    # copy — enumerate them before committing the dedup)
    clusters = neardup_clusters(docs, minhash_dedup(docs))
    purity = cluster_purity(docs, clusters)
    print("== 10. cross-source mirror clusters (n_sources > 1, largest first)")
    purity.filter("n_sources > 1").orderBy(F.desc("n_docs")).show(10, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
