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
    measure(
        "d12 containment (exact, max_df=None)",
        DD.containment_pairs(sh, threshold=0.8, max_df=None),
    )
    measure("d12 containment (max_df=100)", DD.containment_pairs(sh, threshold=0.8, max_df=100))
    # the SHIPPED default (auto=1000): the r10 verdict's ask — the table
    # previously jumped None -> 100, leaving the default's pair loss on
    # this clone-heavy corpus unmeasured
    measure(
        "d12 containment (max_df=1000 = shipped auto)",
        DD.containment_pairs(sh, threshold=0.8, max_df=1000),
    )
    # ...and the production order (exact-dedup first, containment among
    # canonicals): the mitigation containment_dedup applies by default,
    # measured with and without the cap so the default's residual loss
    # AFTER the mitigation is a number, not a narrative
    canon = corpus.join(
        DD.exact_dedup(corpus).filter("is_canonical").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    shc = DD.shingle_table(canon).localCheckpoint(eager=True)
    measure(
        "d12 exact-first + containment (max_df=1000)",
        DD.containment_pairs(shc, threshold=0.8, max_df=1000),
    )
    measure(
        "d12 exact-first + containment (max_df=None)",
        DD.containment_pairs(shc, threshold=0.8, max_df=None),
    )
    measure("d13 cross_source_overlap (shingle)", DD.cross_source_overlap(corpus))
    measure(
        "d13 cross_source_overlap (fingerprint)",
        DD.cross_source_overlap(corpus, unit="fingerprint"),
    )
    return rows


BOILER = "apache license two"  # ONE hot 3-shingle


def run_boilerplate(spark) -> None:
    """r10 rung (the r9 verdict's design-weak flag): boilerplate shared
    across DISTINCT docs — the case exact-dedup-first cannot help. The
    corpus is 50k docs (10 text-suffixed copies of sf0.1's documents,
    so exact dedup collapses nothing); a 3-word header (exactly ONE
    shared 3-shingle) is prepended to a fraction p. That shingle has
    df = p*50k and alone contributes ~df^2/2 inverted-index join rows
    through a single join key — the hottest-key skew containment's
    docstring warns about. Measures containment_dedup capped (the new
    auto=1000 default, which the df exceeds at every p here) vs
    uncapped at p=0.1 (25M-row hot key, runnable), and prints the
    analytic fan-out at p=0.5 (625M rows on one key — not run)."""
    base = load_parquet(spark, os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    nb = base.count()
    copies = spark.range(10).select(F.col("id").alias("_c"))
    docs = base.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") + F.col("_c") * (10 ** len(str(nb)))).alias("doc_id"),
        F.concat("text", F.lit(" copyset"), F.col("_c")).alias("text"),
    )
    n = docs.count()
    print(f"\n### boilerplate rung: {n} docs, ONE shared hot 3-shingle\n")
    # warmup so JIT/codegen cost lands outside the measured variants
    DD.containment_dedup(docs.limit(500)).filter("keep").count()
    print("| p | variant | sec | shuffle bytes | kept | hot-shingle join rows |")
    print("|---|---|---|---|---|---|")
    for p in (0.1, 0.5):
        f = int(n * p)
        fanout = f * f // 2
        corpus = docs.select(
            "doc_id",
            F.when(F.col("doc_id") % int(1 / p) == 0, F.concat(F.lit(BOILER + " "), "text"))
            .otherwise(F.col("text"))
            .alias("text"),
        ).localCheckpoint(eager=True)
        variants = [("capped (default auto=1000)", "auto")]
        if p <= 0.1:
            variants.append(("uncapped (max_df=None)", None))
        for name, cap in variants:
            t0, b0 = time.time(), shuffle_write_bytes()
            kept = (
                DD.containment_dedup(corpus, max_df=cap)
                .filter("keep")
                .count()
            )
            sec = round(time.time() - t0, 2)
            sb = shuffle_write_bytes() - b0
            rows = fanout if cap is None else f"{fanout} (avoided)"
            print(f"| {p} | {name} | {sec} | {sb if sb >= 0 else 'n/a'} | {kept} | {rows} |")
        if p > 0.1:
            print(
                f"| {p} | uncapped (max_df=None) | not run | ~{fanout:.1e} join rows "
                f"through ONE key | — | {fanout} |"
            )
        spark.catalog.clearCache()


def main() -> None:
    if "--boilerplate" in sys.argv:
        spark = get_spark("stress-overlap")
        spark.sparkContext.setLogLevel("ERROR")
        run_boilerplate(spark)
        return
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
