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


# --- paragraph_dedup (CCNet paragraph-grain dedup, arXiv:1911.00359) --

def test_paragraph_dedup_keep_first(spark):
    nav = "Home | About | Contact"
    docs = spark.createDataFrame(
        [
            (1, f"{nav}\n\nFirst unique body paragraph."),
            (2, f"{nav}\n\nSecond, different body text.\n\n{nav}"),
            (3, "Entirely novel document with one paragraph."),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup.paragraph_dedup(docs).collect()}
    # doc 1 (lowest id, position 0) keeps the nav block; later copies cut
    assert out[1]["text"].startswith(nav) and out[1]["n_removed"] == 0
    assert out[2]["text"] == "Second, different body text."
    assert out[2]["n_paragraphs"] == 3 and out[2]["n_removed"] == 2
    assert out[3]["n_removed"] == 0
    assert out[3]["text"] == "Entirely novel document with one paragraph."


def test_paragraph_dedup_normalized_matching_and_min_len(spark):
    docs = spark.createDataFrame(
        [
            (1, "Shared   Paragraph Here\n\nYes."),
            (2, "shared paragraph  here\n\nYes."),
        ],
        "doc_id long, text string",
    )
    # case/whitespace variants are the same paragraph -> doc 2 loses it;
    # with min_len, the short "Yes." is exempt and kept everywhere
    out = {r["doc_id"]: r for r in dedup.paragraph_dedup(docs, min_len=10).collect()}
    assert out[1]["n_removed"] == 0
    assert out[2]["text"] == "Yes." and out[2]["n_removed"] == 1
    # without the exemption the second "Yes." is cut too
    out0 = {r["doc_id"]: r for r in dedup.paragraph_dedup(docs).collect()}
    assert out0[2]["text"] == "" and out0[2]["n_removed"] == 2


def test_paragraph_dedup_all_docs_survive(spark):
    docs = spark.createDataFrame(
        [(1, "same\n\nsame"), (2, "same")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dedup.paragraph_dedup(docs).collect()}
    # within-doc repeats dedup too (pos order); doc 2 fully emptied but
    # still present in the output
    assert out[1]["text"] == "same" and out[1]["n_removed"] == 1
    assert out[2]["text"] == "" and out[2]["n_removed"] == 1
