"""q59v2 composed-pipeline stress rung (r8 ask #2): run the cleaning
pipeline stage by stage at 500 docs (sf0.1's corpus) and at 50k docs
(10 id-disjoint sf0.1 copysets — the r6 stress-harness shape), and
record per-stage wall time plus shuffle bytes written, so a 100 TB
estimate has a measured slope instead of a single composite number.

Stage boundaries are eager localCheckpoints — exactly the barriers the
certified query runs (at 100 TB they are the between-stage parquet
writes), so each stage's wall time is attributable. Shuffle bytes come
from the Spark REST API (set SPARK_GRAFT_UI=true; per-stage deltas of
completed-stage shuffleWriteBytes).

Note the copyset corpus is maximally duplicated (every doc has 10
exact copies), which is the HARD case for the dedup stages: paragraph
dedup and minhash see 10x candidate pressure; the pipeline must
collapse it, not choke on it.

Usage: SPARK_GRAFT_UI=true python tools/stress_pipeline.py [n_copies ...]
(default: 1 10)
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
from datacatalog_tag_engine_spark.pipeline import text as TXT
from datacatalog_tag_engine_spark.pipeline.export import shard_assignments
from datacatalog_tag_engine_spark.session import get_spark, load_parquet

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def shuffle_write_bytes() -> int:
    """Total shuffle write bytes across all completed stages so far."""
    try:
        app_id = _api("applications")[0]["id"]
        stages = _api(f"applications/{app_id}/stages?status=COMPLETE")
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def build_corpus(spark, n_copies: int):
    docs = load_parquet(spark, os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    if n_copies == 1:
        return docs
    n = docs.count()
    copies = spark.range(n_copies).select(F.col("id").alias("_c"))
    return docs.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") + F.col("_c") * (10 ** len(str(n)))).alias("doc_id"), "text"
    )


def run(spark, corpus) -> list[tuple[str, float, int]]:
    rows: list[tuple[str, float, int]] = []

    def stage(name: str, df):
        t0, b0 = time.time(), shuffle_write_bytes()
        out = df.localCheckpoint(eager=True)
        rows.append((name, round(time.time() - t0, 2), shuffle_write_bytes() - b0))
        return out

    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = stage(
        "0 normalize+collapse",
        TXT.collapse_repeated_lines(TXT.normalize_text(corpus, passthrough=True))
        .select("doc_id", "text")
        .repartition(shuffle_n),
    )
    g = TXT.gopher_filter(
        docs, min_words=20, min_stopword_hits=0,
        max_dup_word_frac=1.0, max_top_bigram_frac=1.0,
    )
    kept = stage(
        "1 gopher gate", docs.join(g.filter("keep").select("doc_id"), "doc_id", "left_semi")
    )
    para = stage("2 paragraph dedup", DD.paragraph_dedup(kept).select("doc_id", "text"))
    spans = DD.remove_repeated_spans(para, n=8, min_docs=2).select("doc_id", "text")
    clean = stage(
        "3 span removal + drop", spans.filter(F.length(F.trim(F.col("text"))) > 0)
    )
    pairs = stage("4 minhash pairs", DD.minhash_dedup(clean))
    t0, b0 = time.time(), shuffle_write_bytes()
    clusters = DD.neardup_clusters(clean, pairs)
    canon = DD.apply_neardup_dedup(clean, clusters)
    nw = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda w: F.length(w) > 0))
    out = shard_assignments(canon.select("doc_id", nw.alias("n_words")), 4).select(
        "doc_id", "shard", "n_words"
    )
    n_out = out.count()
    rows.append(("5 clusters+apply+shards", round(time.time() - t0, 2), shuffle_write_bytes() - b0))
    rows.append(("OUTPUT ROWS", n_out, 0))
    return rows


def main() -> None:
    copies = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark("stress-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    result = {}
    for n in copies:
        corpus = build_corpus(spark, n).localCheckpoint(eager=True)
        n_docs = corpus.count()
        print(f"\n### q59v2 per-stage at {n_docs} docs ({n} copyset(s) of {SF_DIR})\n")
        print("| stage | sec | shuffle bytes written |")
        print("|---|---|---|")
        rows = run(spark, corpus)
        for name, sec, sb in rows:
            print(f"| {name} | {sec} | {sb if sb >= 0 else 'n/a'} |")
        result[n_docs] = [(n_, s, b) for n_, s, b in rows]
        spark.catalog.clearCache()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
