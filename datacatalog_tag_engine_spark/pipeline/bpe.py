"""Distributed BPE tokenizer training (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units",
arXiv:1508.07909 — the public byte-pair-encoding algorithm used by
GPT-2/RoBERTa-style tokenizers).

Scale shape — the part that matters at 100 TB: classic BPE never needs
the corpus during training, only the WORD FREQUENCY table. The corpus
pays exactly ONE explode+aggregate pass into (word, count); the merge
loop then runs over that vocabulary-grain table — IN DRIVER MEMORY
when it fits a configurable budget (the common case, and how
SentencePiece/HF tokenizer trainers work: a 32k-merge vocabulary
trains in seconds with incremental pair-count maintenance, instead of
two Spark jobs per merge), falling back to distributed rounds
(pair-count aggregate + argmax + symbol rewrite) only when the
vocabulary itself outgrows the driver. A 100 TB corpus with a 50M-word
vocabulary still pays corpus cost once; the regime choice only moves
WHERE the vocabulary-sized loop runs.

Determinism: the argmax pair breaks ties lexicographically, the merge
rewrite is the standard greedy left-to-right scan, and word counts are
exact longs — the learned merge list replays identically on any
partitioning or cluster width (pytest proves equality with a pure-
Python reference implementation and across repartitionings). Training
is inherently iterative (each merge depends on the last), so this
family is rows-only territory for the correctness driver, like the
k-means quantizer (s06).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# marks the end of a word so merges cannot cross word boundaries and
# word-final subwords stay distinct from word-internal ones ("er</w>"
# vs "er") — the arXiv:1508.07909 convention
END = "</w>"


def word_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt): the one corpus-sized pass of BPE training.

    Lowercased whitespace words — the same normalization as the other
    text operators, plus U+001F (unit separator) as an extra word
    boundary: \\x1f is NOT matched by ASCII \\s, but it is the symbol
    separator the SQL-side merge replay frames its symbol strings with
    (``__spark_entry__.bpe_apply_sql``), so a word containing it would
    corrupt that framing. Treating it as whitespace in BOTH engines
    keeps every word sentinel-free by construction. The pre-explode
    repartition spreads the tokenize
    across the cluster (single-file corpora otherwise run it on one
    core); keyless round-robin because the downstream groupBy is on
    word, not doc (see _repartition_round_robin)."""
    from .dedup import _repartition_round_robin

    return (
        _repartition_round_robin(docs.select(text_col))
        .select(F.explode(F.split(F.lower(F.col(text_col)), r"[\s\x1f]+")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(symbols array<string>, cnt): each word split into characters
    with the end-of-word marker appended to the LAST character."""
    w = F.col("word")
    chars = F.transform(
        F.sequence(F.lit(1), F.length(w)),
        lambda i: F.when(i == F.length(w), F.concat(F.substring(w, i, 1), F.lit(END))).otherwise(
            F.substring(w, i, 1)
        ),
    )
    return words.select(chars.alias("symbols"), "cnt")


def pair_counts(syms: DataFrame) -> DataFrame:
    """(a, b, n): corpus-weighted counts of adjacent symbol pairs —
    one explode+aggregate over the vocabulary-sized symbol table."""
    s = F.col("symbols")
    pairs = F.zip_with(
        F.slice(s, 1, F.greatest(F.size(s) - 1, F.lit(0))),
        F.slice(s, 2, F.greatest(F.size(s) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        syms.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("n"))
    )


def _merge_round(syms: DataFrame, a: str, b: str) -> DataFrame:
    """Apply one merge (a, b) -> a+b to every symbol array: the
    standard greedy left-to-right scan (overlapping occurrences merge
    leftmost-first, so 'x x x' under merge (x, x) becomes ['xx', 'x']).
    Adjacent-pair rewriting is inherently sequential within a word —
    the one place Python is unavoidable — so it runs as an
    Arrow-batched pandas iterator over the vocabulary-sized table,
    never the corpus."""
    out_schema = T.StructType(
        [
            T.StructField("symbols", T.ArrayType(T.StringType())),
            T.StructField("cnt", T.LongType()),
        ]
    )

    def apply(batches):
        merged = a + b
        for pdf in batches:
            rows = [
                (_greedy_merge(list(symbols), a, b, merged), cnt)
                for symbols, cnt in zip(pdf["symbols"], pdf["cnt"])
            ]
            yield pd.DataFrame(rows, columns=["symbols", "cnt"])

    return syms.mapInPandas(apply, out_schema)


def _greedy_merge(symbols: list, a: str, b: str, merged: str) -> list:
    """The one merge-rewrite rule, shared verbatim by both training
    regimes and ``_merge_round``'s distributed form: greedy
    left-to-right, overlapping occurrences merge leftmost-first."""
    out, i, n = [], 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _bpe_train_local(
    rows, num_merges: int, min_pair_count: int
) -> tuple[list[tuple[str, str]], list[tuple[str, int]]]:
    """The in-memory merge loop over a collected (word, cnt) table —
    how real tokenizer trainers (SentencePiece / HF tokenizers) work:
    the merge loop never needs the corpus, only the vocabulary.

    Exactly equivalent to the distributed rounds (pytest proves
    merge-list and vocab equality): the argmax uses the same
    (n desc, a asc, b asc) order, the rewrite is the same greedy scan,
    and pair counts update incrementally by subtract-old/add-new per
    rewritten word — arithmetically identical to a full recount. A
    pair -> word-index map bounds each round's work to the words that
    actually contain the best pair, so 30k+ merges cost seconds, not
    one Spark job each."""
    from collections import defaultdict

    words: list[list] = []  # [symbols, cnt]
    for r in rows:
        w, cnt = r["word"], r["cnt"]
        words.append([[*w[:-1], w[-1] + END] if w else [], cnt])

    pc: dict = defaultdict(int)  # (a, b) -> corpus-weighted count
    index: dict = defaultdict(set)  # (a, b) -> indices of words containing it
    for i, (syms, cnt) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pc[p] += cnt
            index[p].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best_pair, best_n = None, None
        for pair, n in pc.items():
            if n <= 0:
                continue
            if best_n is None or n > best_n or (n == best_n and pair < best_pair):
                best_pair, best_n = pair, n
        if best_pair is None or best_n < min_pair_count:
            break
        a, b = best_pair
        merges.append(best_pair)
        merged = a + b
        for i in list(index[best_pair]):
            syms, cnt = words[i]
            out = _greedy_merge(syms, a, b, merged)
            for p in zip(syms, syms[1:]):
                pc[p] -= cnt
            for p in zip(out, out[1:]):
                pc[p] += cnt
            old_pairs, new_pairs = set(zip(syms, syms[1:])), set(zip(out, out[1:]))
            for p in old_pairs - new_pairs:
                index[p].discard(i)
            for p in new_pairs - old_pairs:
                index[p].add(i)
            words[i][0] = out

    vocab: dict = defaultdict(int)
    for syms, cnt in words:
        for s in syms:
            vocab[s] += cnt
    return merges, sorted(vocab.items())


def bpe_train(
    docs: DataFrame,
    num_merges: int = 32,
    text_col: str = "text",
    min_pair_count: int = 2,
    driver_vocab_limit: int | None = 2_000_000,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``num_merges`` BPE merges from the corpus; returns
    ``(merges, vocab)`` where ``merges`` is the ordered merge list and
    ``vocab`` the final (symbol, cnt) subword table.

    Two regimes sharing one corpus pass (the word-count aggregate) and
    one rewrite rule, chosen by the DISTINCT-WORD count against
    ``driver_vocab_limit``:

    * **local** (the common case — this is how SentencePiece/HF train):
      the vocabulary-grain (word, cnt) table collects ONCE to the
      driver and the whole merge loop runs in local memory with
      incremental pair-count maintenance — a real 32k-merge vocabulary
      costs seconds instead of ~64k Spark jobs of scheduler overhead.
      2M distinct words is ~100 MB of driver heap; raise the limit on a
      big driver, or pass ``None``/0 to force the distributed rounds.
    * **distributed** (over-budget fallback): per merge, a pair-count
      aggregate over the symbol table, ONE driver-side argmax row, one
      mapInPandas rewrite, with an eager localCheckpoint per round to
      keep lineage flat (the neardup_clusters pattern) and the
      superseded generation freed immediately.

    Both regimes produce the identical merge list and vocab (pytest
    proves it): the argmax breaks ties on (a, b) lexicographically and
    the rewrite is the same greedy left-to-right scan. Training stops
    early when the best pair's count drops below ``min_pair_count``
    (merging singleton pairs memorizes the corpus)."""
    from ..session import free_local_checkpoint

    spark = docs.sparkSession
    wc = word_counts(docs, text_col)
    if driver_vocab_limit:
        # the regime probe (count) and the winning regime's read
        # (collect, or the symbol-init below) share one aggregation
        wc = wc.persist()
        if wc.count() <= driver_vocab_limit:
            rows = wc.collect()
            wc.unpersist()
            merges, vocab_rows = _bpe_train_local(rows, num_merges, min_pair_count)
            return merges, spark.createDataFrame(vocab_rows, "symbol string, cnt long")

    syms = _initial_symbols(wc).localCheckpoint(eager=True)
    if driver_vocab_limit:
        # the eager checkpoint just materialized the symbol table — the
        # word-count cache has no more readers
        wc.unpersist()
    merges = []
    for _ in range(num_merges):
        best = (
            pair_counts(syms)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        nxt = _merge_round(syms, a, b).localCheckpoint(eager=True)
        free_local_checkpoint(syms)
        syms = nxt
    vocab = (
        syms.select(F.explode("symbols").alias("symbol"), "cnt")
        .groupBy("symbol")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return merges, vocab


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with a learned merge list: (doc_id, tokens
    array<string>, n_tokens). The merge list broadcasts inside the
    Arrow-batched UDF closure (it is num_merges-sized); per-batch word
    memoization means each distinct word in a batch pays the merge scan
    once. Row-local — no shuffle; scales as one corpus pass."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = T.StructType(
        [
            T.StructField(id_col, docs.schema[id_col].dataType),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.IntegerType()),
        ]
    )

    def encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        symbols = [*word[:-1], word[-1] + END] if word else []
        # apply merges in learned order: repeatedly merge the
        # lowest-rank adjacent pair (the standard BPE encode loop)
        while len(symbols) > 1:
            best_rank, best_i = None, None
            for i in range(len(symbols) - 1):
                r = ranks.get((symbols[i], symbols[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
        cache[word] = symbols
        return symbols

    def apply(batches):
        cache: dict = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                # mirror training's tokenization EXACTLY: nulls drop out
                # (F.split(NULL) -> NULL, explode drops — str(None) would
                # mint a phantom 'none' token), the split is ASCII
                # \s+ (re.ASCII == Java regex \s), not Python's default
                # unicode-whitespace split — otherwise learned merges get
                # applied at word boundaries training never saw — and
                # \x1f joins the boundary class for the same reason as
                # word_counts (the SQL replay's symbol sentinel)
                if not isinstance(text, str):
                    toks.append([])
                    continue
                out: list[str] = []
                for w in re.split(r"[\s\x1f]+", text.lower(), flags=re.ASCII):
                    if w:
                        out.extend(encode_word(w, cache))
                toks.append(out)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "tokens": toks, "n_tokens": [len(t) for t in toks]}
            )

    from .dedup import _repartition_for_explode

    return _repartition_for_explode(docs.select(id_col, text_col), id_col).mapInPandas(
        apply, out_schema
    )


def tokenizer_fertility(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Tokenizer QA surface (r9 queue): per-``group_col`` fertility of
    a trained merge list — tokens/word and chars/token are THE numbers
    a tokenizer review reads (fertility >> 1.3 on a language means the
    vocabulary under-serves it; chars/token collapsing toward 1 means
    the merges memorized nothing). Sennrich et al. (arXiv:1508.07909)
    report exactly these ratios for BPE sizing.

    One encode pass (``bpe_apply``) joined back to row-local word/char
    counts under the SAME tokenization (word chars sum the split
    words, so whitespace/sentinels don't count), then a group_col-grain
    aggregate: integer sums are exact cross-engine, the two divisions
    round at 6 (the q30 pattern). Returns (group, n_docs, n_words,
    n_tokens, n_word_chars, tokens_per_word, chars_per_token)."""
    toks = bpe_apply(docs, merges, id_col=id_col, text_col=text_col).select(
        id_col, "n_tokens"
    )
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"[\s\x1f]+"), lambda w: F.length(w) > 0
    )
    stats = docs.select(
        id_col,
        F.col(group_col).alias("grp"),
        F.size(words).alias("_nw"),
        F.aggregate(
            words, F.lit(0), lambda acc, w: acc + F.length(w)
        ).alias("_nc"),
    )
    return (
        stats.join(toks, id_col)
        .groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_nw").cast("long").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("_nc").cast("long").alias("n_word_chars"),
        )
        .select(
            group_col,
            "n_docs",
            "n_words",
            "n_tokens",
            "n_word_chars",
            F.round(F.col("n_tokens") / F.col("n_words"), 6).alias("tokens_per_word"),
            F.round(F.col("n_word_chars") / F.col("n_tokens"), 6).alias(
                "chars_per_token"
            ),
        )
    )
