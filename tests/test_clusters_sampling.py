"""Near-dup clustering (connected components) and reproducible
sampling tests."""

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline import dedup as DD
from datacatalog_tag_engine_spark.pipeline import sampling as S


def test_clusters_transitive(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    # chain 0-1-2, pair 3-4, singleton 5
    pairs = spark.createDataFrame([(0, 1), (1, 2), (3, 4)], "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in DD.neardup_clusters(docs, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


def test_clusters_on_real_neardups(spark):
    docs = spark.table("documents")
    pairs = DD.minhash_dedup(docs, threshold=0.5)
    labels = DD.neardup_clusters(docs, pairs)
    n_pairs = pairs.count()
    merged = labels.filter(F.col("doc_id") != F.col("cluster_id")).count()
    assert labels.count() == docs.count()
    assert 0 < merged <= n_pairs
    # keeping only canonicals removes exactly the merged docs
    keep = labels.filter(F.col("doc_id") == F.col("cluster_id"))
    assert keep.count() == docs.count() - merged


def test_apply_neardup_dedup(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(6)], "doc_id long, source string"
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2), (3, 4)], "doc_a long, doc_b long")
    clusters = DD.neardup_clusters(docs, pairs)
    kept = DD.apply_neardup_dedup(docs, clusters)
    assert {r["doc_id"] for r in kept.collect()} == {0, 3, 5}
    assert kept.columns == docs.columns  # payload passes through


def test_deterministic_sample_reproducible(spark):
    docs = spark.table("documents")
    a = {r["doc_id"] for r in S.deterministic_sample(docs, "doc_id", 0.2).collect()}
    b = {r["doc_id"] for r in S.deterministic_sample(docs.repartition(3), "doc_id", 0.2).collect()}
    assert a == b  # partitioning-independent
    assert 0.1 < len(a) / docs.count() < 0.3
    # nested fractions: a 10% sample is a subset of the 20% sample
    c = {r["doc_id"] for r in S.deterministic_sample(docs, "doc_id", 0.1).collect()}
    assert c <= a


def test_stratified_sample(spark):
    docs = spark.table("documents")
    out = S.stratified_deterministic_sample(docs, "doc_id", "lang", {"en": 0.0})
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert "en" not in langs
    # unlisted strata keep everything
    others = docs.filter(F.col("lang") != "en").count()
    assert out.count() == others


def test_histogram_buckets(spark):
    df = spark.createDataFrame([(v,) for v in [1, 49, 50, 99, 100, 5000]], "v long")
    got = {r["bucket"]: (r["lo"], r["n"]) for r in S.histogram(df, F.col("v"), 50, max_buckets=3).collect()}
    assert got == {0: (0.0, 2), 1: (50.0, 2), 2: (100.0, 2)}  # 5000 clamps into last
