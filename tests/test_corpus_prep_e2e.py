"""End-to-end corpus preparation over the round-5 cleaning operators:
quality gate -> paragraph dedup -> span removal -> exact dedup ->
sharded export, with repartition-invariance checks for each new stage
(the pipeline must produce the identical corpus on any cluster
width)."""

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline import export as EX
from datacatalog_tag_engine_spark.pipeline.dedup import (
    exact_dedup,
    paragraph_dedup,
    remove_repeated_spans,
)
from datacatalog_tag_engine_spark.pipeline.text import gopher_filter


def _clean(docs):
    # thresholds tuned for the synthetic word-salad corpus (it has no
    # natural-language stopword density); the default Gopher rules are
    # exercised in test_text_pipeline
    g = gopher_filter(docs, min_words=10, min_stopword_hits=0, max_dup_word_frac=1.0, max_top_bigram_frac=1.0)
    kept = docs.join(g.filter("keep").select("doc_id"), "doc_id", "left_semi")
    para = paragraph_dedup(kept)
    spans = remove_repeated_spans(para, n=8, min_docs=3)
    fp = exact_dedup(spans)
    return spans.join(
        fp.filter("is_canonical").select("doc_id"), "doc_id", "left_semi"
    )


def test_corpus_prep_pipeline_accounting(spark, tmp_path):
    docs = spark.table("documents").select("doc_id", "text")
    n0 = docs.count()
    cleaned = _clean(docs)
    n1 = cleaned.count()
    assert 0 < n1 <= n0
    # every survivor still carries text and descends from an input doc
    assert cleaned.filter(F.col("text").isNull()).count() == 0
    assert (
        cleaned.join(docs.select("doc_id"), "doc_id", "left_anti").count() == 0
    )
    # export closes the pipeline: manifest accounts for every survivor
    manifest = EX.write_training_shards(
        cleaned.withColumn("n_tokens", F.size(F.split("text", r"\s+"))),
        str(tmp_path / "out"),
        num_shards=4,
        token_col="n_tokens",
    )
    assert manifest.agg(F.sum("n_docs")).first()[0] == n1


def test_corpus_prep_pipeline_deterministic(spark):
    docs = spark.table("documents").select("doc_id", "text")
    a = sorted(map(tuple, _clean(docs).collect()))
    b = sorted(map(tuple, _clean(docs.repartition(13)).collect()))
    assert a == b


def test_span_and_paragraph_ops_repartition_invariant(spark):
    docs = spark.table("documents").select("doc_id", "text")
    for op in (
        lambda d: remove_repeated_spans(d, n=8, min_docs=2),
        paragraph_dedup,
    ):
        a = sorted(map(tuple, op(docs).collect()))
        b = sorted(map(tuple, op(docs.repartition(7)).collect()))
        assert a == b


def test_cleaning_ops_idempotent(spark):
    """Fixed points: a second application of each cleaning operator
    removes nothing (paragraph dedup leaves corpus-unique paragraphs;
    span removal's survivors contain no cross-doc repeated gram)."""
    docs = spark.table("documents").select("doc_id", "text")
    once = paragraph_dedup(docs)
    twice = paragraph_dedup(once.select("doc_id", "text"))
    assert twice.agg(F.sum("n_removed")).first()[0] == 0

    cut = remove_repeated_spans(docs, n=8, min_docs=2)
    recut = remove_repeated_spans(cut.select("doc_id", "text"), n=8, min_docs=2)
    # survivors can still share SHORT whole-text shingles (docs reduced
    # below n words collapse to one shingle — by the detect-side
    # convention), so assert the long-output invariant: no full-length
    # gram repeats remain among pass-1 outputs still >= n words
    again = recut.join(
        cut.select(
            "doc_id", F.size(F.split("text", r"\s+")).alias("w1")
        ),
        "doc_id",
    ).filter(F.col("w1") >= 8)
    assert again.agg(F.coalesce(F.sum("n_removed"), F.lit(0))).first()[0] == 0
