"""BPE tokenizer training (pipeline/bpe.py): exact parity with a
pure-Python reference implementation of arXiv:1508.07909, determinism
under repartitioning, and encode/train consistency."""

from collections import Counter

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline import bpe

END = bpe.END


def reference_bpe(texts, num_merges, min_pair_count=2):
    """Pure-Python BPE trainer — the paper's algorithm verbatim, used
    as the ground truth the distributed trainer must reproduce."""
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple([*w[:-1], w[-1] + END])] += 1
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        # max count, ties lexicographic — the distributed argmax rule
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _ = best
        merges.append((a, b))
        new_vocab = Counter()
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += cnt
        vocab = new_vocab
    return merges


TEXTS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest new new low",
]


def test_bpe_train_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges, vocab = bpe.bpe_train(docs, num_merges=10)
    assert merges == reference_bpe(TEXTS, 10)
    assert len(merges) == 10
    # the classic first merges on this corpus: frequent word-internal
    # pairs of 'newest'/'low' families
    v = {r["symbol"]: r["cnt"] for r in vocab.collect()}
    assert sum(v.values()) > 0
    # every learned merge's joined form exists as a vocab symbol or a
    # prefix of one (later merges may have absorbed it)
    for a, b in merges:
        j = a + b
        assert any(s == j or j in s for s in v), (a, b)


def test_bpe_train_deterministic_across_partitionings(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS * 4)], "doc_id long, text string"
    )
    m1, _ = bpe.bpe_train(docs, num_merges=6)
    m2, _ = bpe.bpe_train(docs.repartition(13), num_merges=6)
    assert m1 == m2


def test_bpe_train_early_stop_on_rare_pairs(spark):
    # every word unique: after the frequent pairs are exhausted the
    # best pair count drops below min_pair_count and training stops
    docs = spark.createDataFrame(
        [(0, "ab ab ab xy")], "doc_id long, text string"
    )
    merges, _ = bpe.bpe_train(docs, num_merges=50, min_pair_count=2)
    assert 0 < len(merges) < 50


def test_bpe_apply_roundtrip_consistency(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges, _ = bpe.bpe_train(docs, num_merges=8)
    enc = bpe.bpe_apply(docs, merges)
    rows = {r["doc_id"]: r for r in enc.collect()}
    assert set(rows) == {0, 1, 2}
    for r in rows.values():
        # concatenating tokens and stripping markers reconstructs the
        # original lowercased text exactly
        joined = "".join(r["tokens"]).replace(END, " ").strip()
        assert joined == " ".join(
            dict(enumerate(TEXTS))[r["doc_id"]].lower().split()
        )
        assert r["n_tokens"] == len(r["tokens"])
    # a fully-merged frequent word encodes to ONE token
    newest = [t for t in rows[1]["tokens"] if t == "newest" + END]
    assert newest or any("newest" in t for t in rows[1]["tokens"])


def test_pair_counts_are_corpus_weighted(spark):
    docs = spark.createDataFrame([(0, "aa aa aa")], "doc_id long, text string")
    syms = bpe._initial_symbols(bpe.word_counts(docs))
    pc = {(r["a"], r["b"]): r["n"] for r in bpe.pair_counts(syms).collect()}
    # one distinct word with count 3: the pair (a, a</w>) counts 3
    assert pc == {("a", "a" + END): 3}


def test_bpe_apply_matches_training_tokenization(spark):
    """Encode-side tokenization mirrors training exactly (code-review
    r5): a NULL text encodes to zero tokens (training's F.split drops
    nulls — str(None) must not mint a phantom 'none' word), and
    unicode whitespace does NOT split (training's Java-regex \\s+ is
    ASCII-only, so 'foo\\u00a0bar' is ONE word on both sides)."""
    merges = [("l", "o"), ("lo", "w</w>")]
    docs = spark.createDataFrame(
        [(1, None), (2, "foo\u00a0bar"), (3, "low")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in bpe.bpe_apply(docs, merges).collect()
    }
    assert got[1] == ([], 0)
    assert got[3] == (["low</w>"], 1)
    # exactly one word: a single end-of-word marker in the whole doc
    assert sum(t.endswith(END) for t in got[2][0]) == 1


def test_bpe_train_local_and_distributed_identical(spark):
    """The driver-memory merge loop (the default regime) and the
    distributed-rounds fallback (driver_vocab_limit=0) must produce the
    IDENTICAL merge list and final vocab — the regime choice is a
    placement decision, never a semantics one."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    m_local, v_local = bpe.bpe_train(docs, num_merges=10)
    m_dist, v_dist = bpe.bpe_train(docs, num_merges=10, driver_vocab_limit=0)
    assert m_local == m_dist
    assert sorted(map(tuple, v_local.collect())) == sorted(map(tuple, v_dist.collect()))
    # and both match the pure-Python paper reference
    assert m_local == reference_bpe(TEXTS, 10)


def test_bpe_train_local_early_stop_and_ties(spark):
    """Early stop (min_pair_count) and lexicographic tie-breaks behave
    identically in both regimes on a tie-heavy corpus."""
    texts = ["ab ab cd cd", "ef ef gh gh"]  # all pairs tie at 2
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    m_local, _ = bpe.bpe_train(docs, num_merges=50, min_pair_count=2)
    m_dist, _ = bpe.bpe_train(docs, num_merges=50, min_pair_count=2, driver_vocab_limit=0)
    assert m_local == m_dist == reference_bpe(texts, 50)


def test_bpe_sentinel_char_is_a_word_boundary_cross_engine(spark):
    """U+001F (the SQL replay's symbol separator) inside a document must
    not corrupt the oracle's separator framing: both engines now split
    words on [\\s\\x1f]+, so the sentinel can never appear inside a word.
    Proven the hard way — a corpus where \\x1f glues words together,
    tokenized by the Spark encoder AND the DuckDB merge replay, must
    agree exactly (before the r8 fix the SQL side silently dropped the
    \\x1f-joined token)."""
    import duckdb

    import __spark_entry__ as E

    texts = [
        "low\x1flow lower",            # sentinel joining two words
        "\x1fnewest newest\x1f",        # leading / trailing sentinel
        "wid\x1f\x1fest low",           # run of sentinels mid-"word"
        "plain text no sentinel",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, _ = bpe.bpe_train(docs, num_merges=8)
    got = sorted(
        (r["doc_id"], r["tokens"], r["n_tokens"])
        for r in bpe.bpe_apply(docs, merges)
        .select("doc_id", F.concat_ws("|", "tokens").alias("tokens"), "n_tokens")
        .collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", [(i, t) for i, t in enumerate(texts)]
    )
    want = sorted(
        (r[0], r[1], r[2])
        for r in con.execute(E.bpe_apply_sql(merges)).fetchall()
    )
    con.close()
    assert got == want
    # and the sentinel really was exercised: the glued words tokenized
    # as separate words, not one "low\x1flow" token stream
    by_id = dict((d, t) for d, t, _ in got)
    assert by_id[0].count("|") >= 2
