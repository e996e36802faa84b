"""Dedup diagnostics (the xxhash64 join-key substitution guard)."""


def test_hash_collision_diagnostic_zero(spark):
    from datacatalog_tag_engine_spark.pipeline.dedup import hash_collision_count, shingle_table

    docs = spark.table("documents")
    assert hash_collision_count(shingle_table(docs)) == 0


# --- remove_repeated_spans (exact-substring dedup apply, arXiv:2107.06499)

from datacatalog_tag_engine_spark.pipeline import dedup

def test_remove_repeated_spans_cuts_boilerplate(spark):
    boiler = "subscribe to our newsletter for daily updates and offers"  # 9 words
    docs = spark.createDataFrame(
        [
            (1, f"Alpha beta gamma delta. {boiler} More unique prose here one"),
            (2, f"Totally different words entirely. {boiler} Closing remark text two"),
            (3, "No boilerplate at all in this particular document body three"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup.remove_repeated_spans(docs, n=8, min_docs=2).collect()
    }
    # the shared 9-word span yields two repeated 8-grams covering all 9
    # boilerplate words in both docs; unique words survive, case kept
    assert "subscribe" not in out[1]["text"].lower()
    assert "newsletter" not in out[2]["text"].lower()
    assert out[1]["text"].startswith("Alpha beta gamma delta.")
    assert out[1]["n_removed"] == 9 and out[2]["n_removed"] == 9
    # untouched doc comes back whole (whitespace-normalized), zero cut
    assert out[3]["n_removed"] == 0
    assert out[3]["text"].split() == docs.collect()[2]["text"].split()
    assert out[3]["n_words"] == 10


def test_remove_repeated_spans_short_doc_whole_shingle(spark):
    # docs shorter than n words use the whole-text shingle (the
    # repeated_spans convention): verbatim short repeats vanish
    docs = spark.createDataFrame(
        [(1, "click here"), (2, "click here"), (3, "keep me")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup.remove_repeated_spans(docs, n=8).collect()}
    assert out[1]["text"] == "" and out[1]["n_removed"] == 2
    assert out[2]["text"] == ""
    assert out[3]["text"] == "keep me" and out[3]["n_removed"] == 0


def test_remove_repeated_spans_agrees_with_detection(spark):
    # every doc repeated_spans flags must lose words; clean docs keep all
    texts = [
        (i, "common header line repeated across documents every single time "
            f"unique trailer {i} with more distinct words {i * 7}")
        for i in range(6)
    ] + [(99, "a wholly unrepeated document with its own vocabulary only")]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    flagged = {r["doc_id"] for r in dedup.repeated_spans(docs, n=8).collect()}
    out = {r["doc_id"]: r for r in dedup.remove_repeated_spans(docs, n=8).collect()}
    for d, r in out.items():
        assert (r["n_removed"] > 0) == (d in flagged), d
