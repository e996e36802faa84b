"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, fingerprinting. All built-in-function
expressions (JVM-side, codegen) — no Python in the hot path — and
deterministic so a SQL oracle can replay them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish word/punct tokenizer: word runs, digit runs, or single
# non-space punctuation — a cheap proxy for subword token counts.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_words, n_tokens): whitespace word count plus
    regex token count."""
    t = F.col(text_col)
    return docs.select(
        id_col,
        F.length(t).alias("n_chars"),
        F.size(F.split(t, r"\s+")).alias("n_words"),
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0)).alias("n_tokens"),
    )


STOPWORDS = (
    "the a an and or of to in is are was were be been it this that with as for on at by".split()
)


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features per doc:

    mean_word_len, stopword_ratio (whitespace words that are stopwords),
    punct_ratio (punctuation chars / chars), alpha_ratio, plus a
    composite quality_score in [0,1]: high stopword presence and
    moderate word length up, punctuation noise down. All ratios rounded
    to 4 for cross-engine comparability.
    """
    t = F.col(text_col)
    words = F.split(t, r"\s+")
    n_words = F.size(words)
    n_chars = F.length(t)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]"), 0))
    n_alpha = F.size(F.regexp_extract_all(t, F.lit(r"[A-Za-z]"), 0))

    # guard the zero denominators: an EMPTY string has n_chars 0 (and
    # ANSI mode turns x/0 into a job-killing error, not a NaN) — empty
    # texts never occur in a raw corpus but DO reach this operator
    # composed after surgery stages (span removal can empty a doc).
    # Values are untouched for every non-empty text; an empty text
    # scores all-zero ratios. n_words needs no guard: split('') is
    # [''], size 1.
    safe_chars = F.greatest(n_chars, F.lit(1))
    mean_word_len = (n_chars - (n_words - 1)) / n_words
    stopword_ratio = n_stop / n_words
    punct_ratio = n_punct / safe_chars
    alpha_ratio = n_alpha / safe_chars
    # composite built from the UNROUNDED ratios: integer-ratio operands
    # almost never land on exact round-half boundaries, keeping the
    # rounded result identical across engines with different half-rules
    quality = F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(0.0),
            F.lit(0.5) * alpha_ratio + F.lit(0.5) * F.least(F.lit(1.0), stopword_ratio * 5)
            - punct_ratio,
        ),
    )
    return docs.select(
        id_col,
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(stopword_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(quality, 4).alias("quality_score"),
    )


# marker words per language for the n-gram/stopword language-ID
# heuristic; deterministic argmax with fixed language order tiebreak.
LANG_MARKERS = {
    "en": "the and is of to in that it with for".split(),
    "de": "der die das und ist nicht mit ein eine zu".split(),
    "fr": "le la les et est dans pour que une des".split(),
    "es": "el la los y es en que de una por".split(),
}


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred): CJK chars -> 'zh'; otherwise the language
    with the most marker-word hits ('und' when zero hits everywhere).
    Ties break in fixed en>de>fr>es order."""
    t = F.col(text_col)
    words = F.split(F.lower(t), r"\s+")
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores[lang] = F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
    has_cjk = F.size(F.regexp_extract_all(t, F.lit(r"[一-鿿]"), 0)) > 0

    best = F.lit("und")
    best_score = F.lit(0)
    # reversed fixed order so that earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        cond = scores[lang] >= best_score
        # strictly-greater for later langs handled by reversed order +
        # >= for earlier: en checked last with >= wins equal scores
        best = F.when(scores[lang] >= best_score, F.lit(lang)).otherwise(best)
        best_score = F.greatest(best_score, scores[lang])
    pred = F.when(has_cjk, F.lit("zh")).otherwise(
        F.when(best_score > 0, best).otherwise(F.lit("und"))
    )
    return docs.select(id_col, pred.alias("lang_pred"))


# PII scrub patterns, applied in fixed order; kept RE2/Java-regex
# compatible (no \b, no lookaround) so a SQL engine replays them exactly.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"(\d{1,3}\.){3}\d{1,3}", "<IP>"),
    (r"\d{3}-\d{3}-\d{4}", "<PHONE>"),
)


def redact_pii(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Training-data PII scrub: emails, IPv4s, phone-shaped numbers
    replaced by typed placeholders, counted per doc. Pure regexp
    expressions (JVM codegen, no Python); patterns apply in declaration
    order, each counting against the previous stage's output, so the
    semantics are a deterministic pipeline any regex engine can replay.
    """
    t = F.col(text_col)
    n_red = F.lit(0)
    for pat, repl in PII_PATTERNS:
        n_red = n_red + F.size(F.regexp_extract_all(t, F.lit(pat), 0))
        t = F.regexp_replace(t, pat, repl)
    return docs.select(id_col, t.alias("redacted"), n_red.alias("n_redactions"))


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group top-k terms by tf-idf (tf = term count in the group,
    idf = ln(n_groups / groups_containing_term), natural log, rounded to
    4; ties break on term asc).

    Scale shape: the expensive explode scans the corpus ONCE into one
    (group, term) aggregation; document frequency is then a count
    window over the aggregated term table ((group, term) rows are
    unique, so count-per-term == distinct groups containing the term) —
    a join back to a second aggregation of the same corpus would scan
    and explode it twice (measured: Spark does not reuse the exchange).
    n_groups is a driver-side scalar from a column-pruned mini-scan.
    The final top-k is a per-group window with WindowGroupLimit pushdown
    over the small term table, never the corpus.
    """
    n_groups = docs.select(group_col).distinct().count()
    words = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
    ).filter(F.length("term") > 0)
    tf = words.groupBy("grp", "term").agg(F.count("*").alias("tf"))
    from pyspark.sql import Window

    wt = Window.partitionBy("term")
    scored = tf.withColumn("df", F.count("*").over(wt)).select(
        F.col("grp").alias(group_col),
        "term",
        F.round(F.col("tf") * F.log(F.lit(n_groups) / F.col("df")), 4).alias("tfidf"),
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def length_percentiles(
    docs: DataFrame, group_col: str = "source", value_col: str = "n_chars"
) -> DataFrame:
    """Exact p50/p90/p99 of a numeric column per group
    (linear-interpolation percentiles — the PERCENTILE_CONT definition
    both Spark's ``percentile`` and DuckDB's ``quantile_cont`` use).
    One hash aggregation; for 100 TB switch to approx_percentile with a
    documented error bound — the exact form here doubles as its oracle.
    """
    v = F.col(value_col)
    return docs.groupBy(group_col).agg(
        F.round(F.percentile(v, F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile(v, F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile(v, F.lit(0.99)), 4).alias("p99"),
        F.count("*").alias("n"),
    )


def training_shuffle(
    docs: DataFrame,
    n_shards: int = 8,
    seed: str = "s42",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-order shuffle: md5(seed||id) assigns a
    pseudo-random sort key, documents shard by the key's top 32 bits and
    order within their shard by (key, id).

    This is the distributed form of "shuffle the corpus once per epoch":
    no global single-partition window — the row_number partitions by
    shard, so each shard orders independently (one shuffle on shard).
    Reshuffling = changing the seed. Returns (id, shard, position).
    """
    key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    shard = (F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards).cast("int")
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("sort_key", id_col)
    return (
        docs.select(id_col, key.alias("sort_key"), shard.alias("shard"))
        .withColumn("position", F.row_number().over(w))
        .select(id_col, "shard", "position")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size context chunking: each document splits into
    ceil(n_tokens / chunk_tokens) chunks; the last chunk carries the
    remainder. Returns (id, chunk_id, n_tokens) — the packing manifest a
    sequence-training pipeline materializes before tokenization. Pure
    sequence+explode (no Python, no shuffle: chunking is row-local)."""
    n_tokens = F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), 0))
    n_chunks = F.ceil(n_tokens / F.lit(chunk_tokens)).cast("int")
    return (
        docs.select(id_col, n_tokens.alias("_nt"), n_chunks.alias("_nc"))
        .filter(F.col("_nc") > 0)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id"),
            F.col("_nt"),
        )
        .select(
            id_col,
            "chunk_id",
            F.least(
                F.lit(chunk_tokens), F.col("_nt") - F.col("chunk_id") * chunk_tokens
            ).alias("n_tokens"),
        )
    )


def ngram_array(words: Column, n: int) -> Column:
    """Positionally-aligned n-gram array with partial tails: element i
    is the space-join of words[i..i+n-1] (shorter at the tail). Callers
    slice off the tail.

    Construction is zip_with DOUBLING: a 2k-gram is a k-gram zipped
    with itself shifted by k, so the expression tree is O(log n) levels
    deep. The naive n-1-step chain duplicates the whole subtree at each
    level — 2^(n-1) copies of the split — and Catalyst's analysis walks
    it as a tree: at n=8 a single projection took MINUTES to plan.
    (And transform(sequence, i -> slice(words, i, n)) executes
    O(words^2) array copies — measured 10x slower at n<=5.) zip_with
    pads the shorter (shifted) side with nulls and concat_ws skips
    nulls, so partial tail grams assemble harmlessly."""
    pows = {1: words}
    p = 1
    while p * 2 <= n:
        g = pows[p]
        shifted = F.slice(g, p + 1, F.greatest(F.size(g) - p, F.lit(0)))
        pows[p * 2] = F.zip_with(g, shifted, lambda a, b: F.concat_ws(" ", a, b))
        p *= 2
    grams = None
    offset = 0
    for p in sorted(pows, reverse=True):
        if offset + p <= n:
            comp = pows[p]
            if grams is None:
                grams = comp
            else:
                shifted = F.slice(comp, offset + 1, F.greatest(F.size(comp) - offset, F.lit(0)))
                grams = F.zip_with(grams, shifted, lambda a, b: F.concat_ws(" ", a, b))
            offset += p
    return grams


def word_ngrams(words: Column, n: int) -> Column:
    """Array of space-joined word n-grams; empty array when the doc has
    fewer than ``n`` words."""
    size = F.size(words)
    full = F.slice(ngram_array(words, n), 1, F.greatest(size - F.lit(n - 1), F.lit(0)))
    return F.when(size >= n, full).otherwise(F.array().cast("array<string>"))


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination detection: for each training document,
    the fraction of its distinct word ``n``-grams that also appear in
    the benchmark corpus. Training runs drop (or flag) docs whose
    ``contamination`` exceeds a threshold before the data ships.

    Returns (doc_id, n_shingles, n_matched, contamination) for docs
    with at least one shingle (shorter docs have nothing to test).

    Scale shape: the benchmark side (an eval suite) is tiny relative to
    a 100 TB corpus — its distinct shingle set broadcasts, so the
    corpus explodes ONCE and never shuffles before the per-doc
    aggregation (keyed on doc_id, uniform). If the benchmark set ever
    outgrows broadcast range, drop the hint and the same plan runs as a
    shuffle join on the shingle key.
    """
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    bench_sh = (
        benchmark.select(F.explode(word_ngrams(words, n)).alias("shingle"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # per-document dedup INSIDE the row (array_distinct) — equivalent
    # to a global distinct on (id, shingle) but saves that entire
    # corpus-sized shuffle, the same plan choice as shingle_table —
    # including its pre-explode repartition (r14): the n-gram build is
    # the CPU-heavy row-local pass, and keying the spread on the id
    # feeds the per-doc groupBy below with no second shuffle.
    from .dedup import _repartition_for_explode

    doc_sh = _repartition_for_explode(docs.select(id_col, text_col), id_col).select(
        id_col, F.explode(F.array_distinct(word_ngrams(words, n))).alias("shingle")
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_matched"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_matched",
            F.round(F.col("n_matched") / F.col("n_shingles"), 4).alias("contamination"),
        )
    )


def _max_run_expr(arr: Column) -> Column:
    """Longest run of equal consecutive elements, computed row-locally
    with an F.aggregate fold (struct state: prev, run, best) — no
    explode, no shuffle."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(arr, init, step, lambda acc: acc["best"])


def repetition_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    * ``dup_word_frac`` — 1 - distinct words / words (bulk repetition)
    * ``top_bigram_frac`` — occurrences of the most frequent word
      bigram / total bigrams (looping text)
    * ``max_word_run`` — longest run of the SAME word consecutively
      (stutter / generation loops)

    Docs with fewer than two words are excluded (no bigram to measure).
    Everything is row-local array math — ``array_distinct`` for the word
    ratio, an ``aggregate`` fold over the SORTED bigram array for the
    modal count (a sorted array's longest equal-run IS the mode count),
    and the same fold over the unsorted words for runs. Zero shuffles,
    zero Python: at 100 TB this is a pure scan projection.
    """
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    n_words = F.size(words)
    bigrams = word_ngrams(words, 2)
    n_bigrams = F.size(bigrams)
    dup_word_frac = F.lit(1.0) - F.size(F.array_distinct(words)) / n_words
    top_bigram = _max_run_expr(F.array_sort(bigrams))
    return (
        docs.select(
            id_col,
            n_words.alias("n_words"),
            F.round(dup_word_frac, 4).alias("dup_word_frac"),
            F.round(top_bigram / n_bigrams, 4).alias("top_bigram_frac"),
            _max_run_expr(words).alias("max_word_run"),
        )
        .filter(F.col("n_words") >= 2)
    )


PACK_SCHEMA = (
    "shard int, bin_id int, doc_id long, chunk_id int, n_tokens int, bin_offset int"
)

# target chunks per packing shard: bounds each applyInPandas Arrow batch
# (~tens of MB at typical manifest row width) independent of corpus size
CHUNKS_PER_SHARD = 65_536


def pack_chunks(
    chunks: DataFrame,
    capacity: int = 64,
    n_shards: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy sequence packing: assign fixed-size training chunks to
    context-window bins of ``capacity`` tokens, first-fit in
    deterministic (doc_id, chunk_id) order within a shard. This is the
    step that turns a chunk manifest (``chunk_documents``) into the
    packed batches a trainer consumes — bins never exceed capacity and
    every chunk lands in exactly one bin.

    Sequential packing is inherently stateful (a bin boundary depends
    on every prior chunk), so this is the honest `applyInPandas` case:
    chunks group by a deterministic shard key (``doc_id % n_shards``,
    keeping a doc's chunks together), each shard packs independently in
    one Arrow batch, and bin ids are shard-local. One shuffle on the
    shard key; shards scale out with the corpus. Output:
    (shard, bin_id, doc_id, chunk_id, n_tokens, bin_offset).

    ``n_shards=None`` (default) derives the shard count purely from the
    chunk count (~CHUNKS_PER_SHARD chunks each, floor 8) so the
    per-shard Arrow batch stays bounded as the corpus grows — a fixed
    shard count means batches that grow linearly with input and
    eventually don't fit an executor. The derivation deliberately does
    NOT consult cluster parallelism: shard assignment (doc_id %
    n_shards) decides bin membership, so the same manifest must pack
    identically on an 8-core laptop and a 1000-executor cluster for the
    output to be replayable. The count pass runs on an eagerly
    checkpointed manifest, which the packing stage then reuses — the
    upstream chunking pipeline executes once, not twice, at the cost of
    materializing the (narrow: ids + token count) manifest in the block
    manager; its blocks are freed by the ContextCleaner once the caller
    drops the result. Pass an explicit n_shards to skip both the count
    and the checkpoint.
    """
    import math

    import pandas as pd

    if n_shards is None:
        chunks = chunks.localCheckpoint(eager=True)
        n_chunks = chunks.count()
        n_shards = max(8, math.ceil(n_chunks / CHUNKS_PER_SHARD))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([id_col, "chunk_id"]).reset_index(drop=True)
        bin_ids, offsets = [], []
        cur_bin, cur_fill = 0, 0
        for t in pdf["n_tokens"]:
            t = int(t)
            if cur_fill + t > capacity and cur_fill > 0:
                cur_bin += 1
                cur_fill = 0
            bin_ids.append(cur_bin)
            offsets.append(cur_fill)
            cur_fill += t
        pdf["bin_id"] = pd.Series(bin_ids, dtype="int32")
        pdf["bin_offset"] = pd.Series(offsets, dtype="int32")
        return pdf[["shard", "bin_id", id_col, "chunk_id", "n_tokens", "bin_offset"]]

    with_shard = chunks.withColumn(
        "shard", (F.col(id_col) % n_shards).cast("int")
    ).select("shard", id_col, F.col("chunk_id").cast("int"), F.col("n_tokens").cast("int"))
    return with_shard.groupBy("shard").applyInPandas(pack, PACK_SCHEMA)


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    plus a 64-bit numeric form (first 15 hex chars) for cheap joins."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    fp = F.md5(norm)
    return docs.select(
        id_col,
        fp.alias("fingerprint"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("long").alias("fingerprint64"),
    )


def unigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-trained unigram language-model score per document — the
    perplexity-style quality filter (low average log-prob = unusual
    vocabulary = often junk). Two passes by nature: train (word counts
    over the corpus) and score (join words to the model, average).

    Cross-engine determinism: per-word log-probs round to 6 decimals
    and sum as exact integers (micro-log-probs), so the aggregation is
    associative — no float-summation-order drift between engines or
    partitionings. Scale shape: the vocabulary is tiny next to the
    corpus, so the scoring join broadcasts the model; the corpus
    explodes once per pass and aggregates on doc_id.

    Returns (doc_id, n_words, avg_logprob). Docs with zero non-empty
    tokens produce no row (exactly like ``hashed_linear_score``).
    """
    # one module-wide tokenization rule: empty split tokens are NOT
    # words (the t14/gopher_filter rule) — ragged whitespace must not
    # inflate n_words or put '' in the vocabulary model
    words = docs.select(
        id_col,
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda w: F.length(w) > 0,
            )
        ).alias("word"),
    )
    # the vocabulary aggregation feeds THREE consumers — the total
    # action below, the broadcast model, and (via words) the scoring
    # join — across two separate actions, which exchange reuse cannot
    # span. persist(), not an eager localCheckpoint: the returned plan
    # references this node, so a checkpoint could never be freed and
    # would pin non-evictable storage per call for the session's
    # lifetime; persisted blocks are LRU-evictable and recomputable
    # (the same rationale as semantic_dedup's cell assignment).
    vocab = words.groupBy("word").agg(F.count("*").alias("c")).persist()
    total = vocab.agg(F.sum("c")).first()[0]
    lp_micro = F.round(F.log(F.col("c") / F.lit(float(total))) * 1_000_000).cast("long")
    model = vocab.select("word", lp_micro.alias("lp6"))
    return (
        words.join(F.broadcast(model), "word")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_words"), F.sum("lp6").alias("_s"))
        .select(
            id_col,
            "n_words",
            F.round(F.col("_s") / F.col("n_words") / 1e6, 4).alias("avg_logprob"),
        )
    )


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int = 5000,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-source token-budget sampling: walk each source's documents in
    deterministic pseudo-random order (md5 of the id) and keep documents
    until the source's token budget is spent — the "take N tokens per
    source" step that builds a fixed-size training mix from an unbounded
    corpus. A document is kept when it STARTS inside the budget, so
    every source overshoots by at most one document and sources cannot
    starve. Exact integer cumulative sum over a per-source window (one
    shuffle); membership depends only on ids and budgets, never on
    layout. Returns (doc_id, source, n_tokens, cum_tokens).
    """
    from pyspark.sql import Window

    n_tokens = F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), 0))
    base = docs.select(
        id_col,
        group_col,
        n_tokens.alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("_ord"),
    )
    w = Window.partitionBy(group_col).orderBy("_ord", id_col)
    return (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") - F.col("n_tokens") < budget_tokens)
        .select(id_col, group_col, "n_tokens", "cum_tokens")
    )


def hashed_linear_score(
    docs: DataFrame,
    weights: DataFrame | None = None,
    num_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """fastText-style linear quality classifier over the hashing trick:
    each lowercase word hashes into one of ``num_buckets`` feature
    buckets; a document's score is sigmoid(mean bucket weight). This is
    the standard cheap quality-classifier shape (e.g. a
    wiki-vs-crawl linear model) used to score 100 TB corpora.

    ``weights`` is a (bucket INT, w DOUBLE) table from offline training.
    When None, deterministic placeholder weights derive from
    md5('w:'||bucket) mapped into [-1, 1) — honestly a stand-in for a
    trained model (this container trains nothing), but exercising the
    real plumbing: hashing trick, per-token bucket lookup, broadcast
    weight table, mean-pool, sigmoid.

    Plan: the weight table is ``num_buckets`` rows — broadcast; the
    corpus explodes once to (doc, bucket), joins the broadcast table,
    and aggregates back on doc_id. One corpus-sized shuffle (the doc_id
    rollup), no Python anywhere. Weights quantize to integer
    micro-units before summing (the t13 trick): the per-doc mean is an
    exact integer sum, associative under any partitioning or engine.
    Returns (doc_id, n_words, score) with score rounded to 4.
    """
    spark = docs.sparkSession
    if weights is None:
        # md5-derived placeholder in [-1, 1): first 8 hex chars / 2^32
        frac = F.conv(
            F.substring(F.md5(F.concat(F.lit("w:"), F.col("bucket").cast("string"))), 1, 8),
            16,
            10,
        ).cast("double") / F.lit(float(2**32))
        weights = spark.range(num_buckets).select(
            F.col("id").cast("int").alias("bucket"), (frac * 2 - 1).alias("w")
        )
    w6 = weights.select(
        "bucket", F.round(F.col("w") * 1_000_000).cast("long").alias("w6")
    )
    # empty split tokens are NOT features: they would add md5('')
    # bucket contributions for every run of ragged whitespace, and the
    # trainer (train_quality_classifier) must see the IDENTICAL feature
    # map — train and serve share this tokenization by contract
    toks = docs.select(
        id_col,
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda w: F.length(w) > 0,
            )
        ).alias("word"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("word")), 1, 8), 16, 10).cast("long")
        % num_buckets
    ).cast("int")
    scored = (
        toks.select(id_col, bucket.alias("bucket"))
        .join(F.broadcast(w6), "bucket")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_words"), F.sum("w6").alias("_s6"))
    )
    mean = F.col("_s6") / F.col("n_words") / F.lit(1e6)
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-mean))
    return scored.select(id_col, "n_words", F.round(sig, 4).alias("score"))


def perplexity_buckets(
    docs: DataFrame,
    boundaries: tuple[float, float] = (1 / 3, 2 / 3),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al., arXiv:1911.00359,
    public): score every document with the corpus-trained unigram LM
    (``unigram_logprob``) and split the corpus into head/middle/tail at
    the given cumulative-fraction boundaries of the score distribution
    — the standard "keep head+middle, drop tail" pre-training filter.

    The cutoffs are exact percentiles of the per-document average
    log-prob (two scalar driver values — at 100 TB swap in
    approx_percentile with this exact form as its oracle, the same
    ladder as length_percentiles). Returns (doc_id, n_words,
    avg_logprob, bucket) with bucket in {'head','middle','tail'};
    higher avg_logprob = more LM-typical = head.
    """
    lo, hi = (float(b) for b in boundaries)
    if not 0 < lo < hi < 1:
        raise ValueError(f"boundaries must satisfy 0 < lo < hi < 1, got {boundaries}")
    # persist(): the percentile action below AND the returned plan both
    # read the doc-grain score table — without this every consumer pays
    # the corpus explode + scoring join twice (the dsir_logratio /
    # incremental_delta_bloom dual-consumer pattern)
    scored = unigram_logprob(docs, id_col, text_col).persist()
    # exact distribution cutoffs; percentile_cont over ONE aggregated
    # pass of the (already doc-grain) score table
    cuts = scored.agg(
        F.expr(f"percentile(avg_logprob, {1 - lo})").alias("head_min"),
        F.expr(f"percentile(avg_logprob, {1 - hi})").alias("mid_min"),
    ).first()
    bucket = (
        F.when(F.col("avg_logprob") >= cuts["head_min"], "head")
        .when(F.col("avg_logprob") >= cuts["mid_min"], "middle")
        .otherwise("tail")
    )
    return scored.withColumn("bucket", bucket)


# the Gopher rules' required stopword set (Rae et al., arXiv:2112.11446
# Table A1: "contains at least 2 of ..."), distinct from the general
# STOPWORDS list above
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# gopher_filter's output feature columns — ONE definition drives both
# the passthrough clash check and the output-shape assertion, so adding
# a feature cannot silently bypass the guard
GOPHER_FEATURE_COLUMNS = (
    "n_words", "mean_word_len", "symbol_word_ratio", "bullet_line_frac",
    "ellipsis_line_frac", "alpha_word_frac", "stopword_hits",
    "dup_word_frac", "top_bigram_frac", "fail_reasons", "keep",
)

# intermediate staging columns (dropped before return) — passthrough
# inputs must not collide with these either
_GOPHER_STAGE_COLUMNS = (
    "_g_words", "_g_wlc", "_g_lines", "_g_bigrams", "_g_nsym",
    "_f_n_words", "_f_mean_word_len", "_f_symbol_word_ratio",
    "_f_bullet_line_frac", "_f_ellipsis_line_frac", "_f_alpha_word_frac",
    "_f_stop_hits", "_f_dup_word_frac", "_f_top_bigram_frac", "_f_fail",
)


def gopher_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    max_dup_word_frac: float = 0.3,
    max_top_bigram_frac: float = 0.18,
    passthrough: bool = False,
) -> DataFrame:
    """The Gopher quality-filter rule set (Rae et al., "Scaling
    Language Models: ... Gopher", arXiv:2112.11446 Table A1) as one
    scan projection: per document, every rule's feature, the sorted
    list of failed rule names, and ``keep``. With ``passthrough`` the
    input columns ride along ahead of the features (the composition
    form: ``gopher_filter(docs, passthrough=True).filter("keep")``
    keeps working on the full rows — streaming-safe, still stateless).

    Defaults are the paper's published thresholds. Rules:

    * ``word_count``      — ``min_words <= n_words <= max_words``
    * ``mean_word_len``   — mean word length in [min, max]
    * ``symbol_ratio``    — (# of '#' + '...' + '…') / words <= max
    * ``bullet_lines``    — fraction of lines starting with a bullet
    * ``ellipsis_lines``  — fraction of lines ending with an ellipsis
    * ``alpha_words``     — fraction of words containing a letter
    * ``stopword_hits``   — distinct GOPHER_STOPWORDS present >= min
    * ``dup_words``       — 1 - distinct/total words <= max (proxy for
      the paper's duplicate line/paragraph fractions at word grain)
    * ``top_bigram``      — modal bigram frequency <= max

    The two repetition rules need >= 2 words to be measurable; on
    shorter docs they pass vacuously (word_count already fails them).
    Features are rounded to 4 for cross-engine comparability; rule
    PREDICATES compare the unrounded values. Everything is row-local
    JVM array/regexp math — zero shuffles, zero Python, a pure scan
    projection at 100 TB.
    """
    # NULL text behaves as empty text: upstream cleaners
    # (remove_repeated_spans, paragraph_dedup) emit '' for fully-removed
    # docs and the filter must classify both identically (keep=false via
    # word_count), never crash
    t = F.coalesce(F.col(text_col), F.lit(""))
    if passthrough:
        clash = (set(docs.columns) - {id_col}) & set(GOPHER_FEATURE_COLUMNS)
        if clash:
            # a duplicate name would make every later by-name reference
            # AMBIGUOUS_REFERENCE — fail loudly at plan time instead
            raise ValueError(
                f"passthrough input columns collide with gopher feature "
                f"names: {sorted(clash)} — rename or drop them first"
            )
        stage_clash = set(docs.columns) & set(_GOPHER_STAGE_COLUMNS)
        if stage_clash:
            raise ValueError(
                f"passthrough input columns collide with gopher staging "
                f"names: {sorted(stage_clash)} — rename or drop them first"
            )
    lead = [F.col("*")] if passthrough else [F.col(id_col)]
    # STAGE the derived arrays, then the raw scalar features, as bound
    # columns (the multi-consumer-HOF rule, tools/hof_lint.py): the
    # nine rules + the rounded output consume every feature at least
    # twice, and each feature re-derives its source array on the
    # no-CSE interpreted HOF path — unstaged, the words split alone
    # re-ran ~20x per doc across the feature/rule/output consumers.
    # empty tokens (leading/trailing whitespace artifacts of split) are
    # NOT words — counting them inflates n_words and deflates every
    # per-word fraction against the paper's thresholds.
    # blank lines are layout, not content — they must not dilute the
    # bullet/ellipsis fractions
    staged = docs.select(
        *lead,
        F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0).alias("_g_words"),
        F.filter(F.split(F.lower(t), r"\s+"), lambda w: F.length(w) > 0).alias(
            "_g_wlc"
        ),
        F.filter(F.split(t, r"\n"), lambda l: F.length(F.trim(l)) > 0).alias(
            "_g_lines"
        ),
        # the symbol count is the one feature input that needs the RAW
        # text (not an array) — counted here because the staging select
        # is the last projection that still sees the text column
        # ('…' IS an ellipsis here exactly as in the ellipsis_lines rule)
        F.size(F.regexp_extract_all(t, F.lit(r"#|\.\.\.|…"), 0)).alias("_g_nsym"),
    )
    staged = staged.withColumn("_g_bigrams", word_ngrams(F.col("_g_wlc"), 2))
    words = F.col("_g_words")
    words_lc = F.col("_g_wlc")
    n_words = F.size(words)
    # every per-word / per-line fraction NULL-guards its denominator:
    # ANSI mode (the session default) aborts the whole job on x/0, and
    # empty or whitespace-only docs genuinely occur after span removal —
    # a NULL feature reads as "not measurable" and fails no rule (the
    # word_count rule already rejects these docs)
    # TRUE mean word length (sum of word lengths / words) — the
    # char-count shortcut (n_chars - separators)/n charges indentation
    # and blank lines to the words and misclassifies formatted text
    mean_word_len = F.when(
        n_words > 0, F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)) / n_words
    )
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_word_frac = F.when(n_words > 0, n_alpha_words / n_words)
    symbol_word_ratio = F.when(n_words > 0, F.col("_g_nsym") / n_words)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(words_lc, s),
        )
    )
    lines = F.col("_g_lines")
    n_lines = F.size(lines)
    bullet_line_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*(\*|-|•)\s"))) / n_lines,
    )
    ellipsis_line_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))) / n_lines,
    )
    dup_word_frac = F.when(
        n_words > 0, F.lit(1.0) - F.size(F.array_distinct(words_lc)) / n_words
    )
    bigrams = F.col("_g_bigrams")
    top_bigram_frac = F.when(
        n_words >= 2, _max_run_expr(F.array_sort(bigrams)) / F.size(bigrams)
    )  # else NULL: not measurable

    # second staging level: each RAW (unrounded) feature is computed
    # exactly once; the rule predicates and the rounded output both
    # read the bound scalar
    feat = staged.select(
        F.col("*"),
        n_words.alias("_f_n_words"),
        mean_word_len.alias("_f_mean_word_len"),
        symbol_word_ratio.alias("_f_symbol_word_ratio"),
        bullet_line_frac.alias("_f_bullet_line_frac"),
        ellipsis_line_frac.alias("_f_ellipsis_line_frac"),
        alpha_word_frac.alias("_f_alpha_word_frac"),
        stop_hits.alias("_f_stop_hits"),
        dup_word_frac.alias("_f_dup_word_frac"),
        top_bigram_frac.alias("_f_top_bigram_frac"),
    )
    fn_words = F.col("_f_n_words")
    fmean = F.col("_f_mean_word_len")
    fsym = F.col("_f_symbol_word_ratio")
    fbul = F.col("_f_bullet_line_frac")
    fell = F.col("_f_ellipsis_line_frac")
    falpha = F.col("_f_alpha_word_frac")
    fstop = F.col("_f_stop_hits")
    fdup = F.col("_f_dup_word_frac")
    fbig = F.col("_f_top_bigram_frac")

    rules = [
        ("word_count", (fn_words < min_words) | (fn_words > max_words)),
        ("mean_word_len",
         (fmean < min_mean_word_len) | (fmean > max_mean_word_len)),
        ("symbol_ratio", fsym > max_symbol_word_ratio),
        ("bullet_lines", fbul > max_bullet_line_frac),
        ("ellipsis_lines", fell > max_ellipsis_line_frac),
        ("alpha_words", falpha < min_alpha_word_frac),
        ("stopword_hits", fstop < min_stopword_hits),
        ("dup_words", (fn_words >= 2) & (fdup > max_dup_word_frac)),
        ("top_bigram", (fn_words >= 2) & (fbig > max_top_bigram_frac)),
    ]
    # fail_reasons feeds two outputs (the list and keep) — staged too
    feat = feat.select(
        F.col("*"),
        F.array_sort(
            F.filter(
                F.array(*[F.when(cond, F.lit(name)) for name, cond in rules]),
                lambda x: x.isNotNull(),
            )
        ).alias("_f_fail"),
    )
    fail_reasons = F.col("_f_fail")
    orig = docs.columns if passthrough else [id_col]
    out = feat.select(
        *orig,
        fn_words.alias("n_words"),
        F.round(fmean, 4).alias("mean_word_len"),
        F.round(fsym, 4).alias("symbol_word_ratio"),
        F.round(fbul, 4).alias("bullet_line_frac"),
        F.round(fell, 4).alias("ellipsis_line_frac"),
        F.round(falpha, 4).alias("alpha_word_frac"),
        fstop.alias("stopword_hits"),
        F.round(fdup, 4).alias("dup_word_frac"),
        F.round(fbig, 4).alias("top_bigram_frac"),
        fail_reasons.alias("fail_reasons"),
        (F.size(fail_reasons) == 0).alias("keep"),
    )
    # keep the guard's name list and the actual output in lockstep
    missing = set(GOPHER_FEATURE_COLUMNS) - set(out.columns)
    assert not missing, f"GOPHER_FEATURE_COLUMNS out of sync: {missing}"
    return out


def bigram_logprob(
    docs: DataFrame,
    train: DataFrame | None = None,
    lam: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Interpolated bigram language-model score per document — the
    stronger form of ``unigram_logprob``'s perplexity-style quality
    signal (a real LM filter in the CCNet mold, arXiv:1911.00359,
    built from corpus statistics instead of an external model):

        P(w2 | w1) = lam * c(w1 w2)/c(w1)  +  (1-lam) * (c(w2)+1)/(N+V)

    averaged over every transition (docs need >= 2 words; shorter docs
    score 0.0 with n_transitions 0 — kept, like unigram's empty case).
    ``train`` defaults to ``docs`` (self-scoring); pass a reference
    corpus to measure cross-corpus typicality — unseen bigrams then
    back off to the smoothed unigram term alone.

    Determinism: per-transition log-probs quantize to micro-units
    (round(lp*1e6) as long) BEFORE the per-document sum — associative,
    exact on any engine or partitioning (the unigram_logprob / DSIR
    convention). The interpolation itself is a fixed row-local double
    expression, identical everywhere.

    Scale shape (the part that differs from unigram): the BIGRAM model
    is corpus-vocabulary-squared-ish — NOT broadcastable — so both the
    model build and the scoring join key on the 8-byte xxhash64 of the
    bigram; the transition table persists and feeds both (one gram
    pass). The unigram model stays broadcast. One doc-keyed aggregate
    at the end.

    Returns (doc_id, n_transitions, avg_logprob).
    """
    if not 0 <= lam < 1:
        # lam = 1 drops the smoothing floor: an unseen bigram (always
        # possible with an external train corpus) gives p = 0 and a
        # NULL log that would silently vanish from the average
        raise ValueError(f"lam must be in [0, 1), got {lam}")
    # NULL text == empty text (the remove_repeated_spans convention):
    # split(NULL) is NULL, which would drop the doc from BOTH the
    # transition rows and the size()-based < 2-words fallback — the
    # docstring contract is "shorter docs score 0.0, kept"
    self_scoring = train is None or train is docs
    docs = docs.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    train = docs if self_scoring else train.withColumn(
        text_col, F.coalesce(F.col(text_col), F.lit(""))
    )

    def _pairs(df):
        words = F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: F.length(w) > 0
        )
        n = F.size(words)
        pair = F.zip_with(
            F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
        from .dedup import _repartition_for_explode

        return (
            _repartition_for_explode(df.select(id_col, text_col), id_col)
            .select(id_col, F.explode(pair).alias("p"))
            .select(
                id_col,
                F.col("p.w1").alias("w1"),
                F.col("p.w2").alias("w2"),
                F.xxhash64(F.concat_ws(" ", "p.w1", "p.w2")).alias("bh"),
            )
        )

    def _words(df):
        return df.select(
            id_col,
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda w: F.length(w) > 0,
                )
            ).alias("word"),
        )

    # model: unigram counts (broadcastable) + hashed bigram counts
    uni = _words(train).groupBy("word").agg(F.count("*").alias("c1")).persist()
    row = uni.agg(F.sum("c1"), F.count("*")).first()
    total, vsize = (row[0] or 0), row[1]
    train_pairs = _pairs(train)
    if train is docs:
        # self-scoring: ONE persisted transition table feeds both the
        # model aggregate and the scoring join (the dsir_logratio
        # shared-subtree pattern)
        train_pairs = train_pairs.persist()
        scored = train_pairs
    else:
        scored = _pairs(docs)
    bi = train_pairs.groupBy("bh").agg(F.count("*").alias("c2"))
    p_bi = F.coalesce(F.col("c2"), F.lit(0)) / F.col("c1_prev")
    p_uni = (F.coalesce(F.col("c1_cur"), F.lit(0)) + 1) / F.lit(float(total + vsize))
    # a w1 unseen in train has no c1_prev: the bigram term is undefined
    # there, so the smoothed unigram term carries the whole estimate
    p = F.when(
        F.col("c1_prev").isNotNull(), F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni
    ).otherwise(p_uni)
    lp6 = F.round(F.log(p) * 1_000_000).cast("long")
    prev_m = F.broadcast(uni.select(F.col("word").alias("w1"), F.col("c1").alias("c1_prev")))
    cur_m = F.broadcast(uni.select(F.col("word").alias("w2"), F.col("c1").alias("c1_cur")))
    return (
        scored.join(bi, "bh", "left")
        .join(prev_m, "w1", "left")
        .join(cur_m, "w2", "left")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_transitions"), F.sum(lp6).alias("_s"))
        .select(
            id_col,
            "n_transitions",
            F.round(F.col("_s") / F.col("n_transitions") / 1e6, 4).alias("avg_logprob"),
        )
        .unionByName(
            # docs with < 2 words have no transition rows at all — a
            # row-local word count finds them without a third gram pass
            docs.select(
                id_col,
                F.size(
                    F.filter(
                        F.split(F.lower(F.col(text_col)), r"\s+"),
                        lambda w: F.length(w) > 0,
                    )
                ).alias("_nw"),
            )
            .filter(F.col("_nw") < 2)
            .select(
                F.col(id_col),
                F.lit(0).alias("n_transitions"),
                F.lit(0.0).alias("avg_logprob"),
            )
        )
    )


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    num_buckets: int = 1024,
    iterations: int = 20,
    lr: float = 2.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train the fastText-style linear quality classifier that
    ``hashed_linear_score`` serves: logistic regression on mean-pooled
    hashing-trick features, positive = curated/in-domain exemplars
    (wiki/books), negative = random crawl — the CCNet / GPT-3 quality
    filter recipe (arXiv:1911.00359 §4.3). Returns the (bucket, w)
    weight table, feed it straight to ``hashed_linear_score`` (the
    feature map here is EXACTLY the scorer's: same md5 bucket, same
    mean pooling, so train and serve cannot drift).

    Training is full-batch gradient descent with every cross-partition
    sum quantized to integer micro-units first (margins AND gradients)
    — long sums are associative, so the learned weights are
    bit-identical on any partitioning, engine, or cluster width: the
    trained MODEL replays exactly, unlike seeded MLlib fits (s06).

    Scale shape: the labeled set (thousands to millions of docs — a
    SAMPLE, never the corpus) pays one tokenize+hash pass into a
    persisted (doc, bucket, x) feature table partitioned by doc; each
    iteration is one margin aggregate on that partitioning (no
    re-shuffle), one co-partitioned residual join, and one
    ``num_buckets``-row gradient aggregate collected to the driver —
    gradient state is MODEL-sized, the corpus never moves again.
    """
    from pyspark.sql import Window

    from .dedup import _repartition_for_explode

    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    labeled = positive.select(
        F.concat(F.lit("p:"), F.col(id_col).cast("string")).alias("_k"),
        F.lit(1.0).alias("_y"),
        F.col(text_col),
    ).unionByName(
        negative.select(
            F.concat(F.lit("n:"), F.col(id_col).cast("string")).alias("_k"),
            F.lit(0.0).alias("_y"),
            F.col(text_col),
        )
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("word")), 1, 8), 16, 10).cast("long")
        % num_buckets
    ).cast("int")
    toks = (
        _repartition_for_explode(labeled, "_k")
        .select(
            "_k",
            "_y",
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda w: F.length(w) > 0,
                )
            ).alias("word"),
        )
        .select("_k", "_y", bucket.alias("bucket"))
    )
    # mean pooling: x = cnt/n_words per (doc, bucket); persisted — the
    # only corpus-sized table, partitioned by _k for every later join
    nw = Window.partitionBy("_k")
    feats = (
        toks.groupBy("_k", "_y", "bucket")
        .agg(F.count("*").alias("_c"))
        .withColumn("_x", F.col("_c") / F.sum("_c").over(nw))
        .drop("_c")
        .persist()
    )
    n_docs = feats.select("_k").distinct().count()
    spark = positive.sparkSession
    w = [0.0] * num_buckets
    for _ in range(iterations):
        wdf = spark.createDataFrame(
            [(b, wb) for b, wb in enumerate(w)], "bucket int, w double"
        )
        # margin6 = sum of micro-unit contributions — exact long sum
        margins = (
            feats.join(F.broadcast(wdf), "bucket")
            .withColumn("_c6", F.round(F.col("_x") * F.col("w") * 1e6).cast("long"))
            .groupBy("_k", "_y")
            .agg(F.sum("_c6").alias("_m6"))
            .select(
                "_k",
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_m6") / F.lit(1e6)))
                    - F.col("_y")
                ).alias("_r"),
            )
        )
        grad_rows = (
            feats.join(margins, "_k")  # co-partitioned on _k
            .withColumn("_g6", F.round(F.col("_r") * F.col("_x") * 1e6).cast("long"))
            .groupBy("bucket")
            .agg(F.sum("_g6").alias("_s6"))
            .collect()
        )
        for r in grad_rows:
            w[r["bucket"]] -= lr * (r["_s6"] / 1e6) / n_docs
    feats.unpersist()
    return spark.createDataFrame(
        [(b, wb) for b, wb in enumerate(w)], "bucket int, w double"
    )


def normalize_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: bool = False,
) -> DataFrame:
    """Unicode/whitespace normalization — the stage every web-corpus
    pipeline runs FIRST (CCNet arXiv:1911.00359 normalizes before
    paragraph hashing; the Gopher thresholds assume normalized text):
    line endings unified, control characters stripped, typographic
    punctuation folded to ASCII, exotic spaces folded to plain spaces,
    whitespace runs collapsed. Raw crawl text that differs only in
    curly quotes or NBSP runs hashes apart in every dedup operator —
    normalizing here is what makes the downstream exact/paragraph/span
    dedup keys mean "same text".

    Returns (id_col, text_col, n_chars_raw, n_chars, changed) for every
    input row: ``text_col`` is the normalized text (NULL treated as
    empty, like the rest of the cleaning family), ``changed`` whether
    normalization altered the raw text (NULL counts as changed when it
    becomes ''). With ``passthrough=True`` it instead returns ALL input
    columns with ``text_col`` replaced in place and no stat columns —
    the pipeline-composition form (stream gates, q59-style chains)
    where the surrounding columns must ride through untouched.

    The whole operator is one chain of built-in string expressions —
    a pure scan projection (zero shuffles, zero Python, whole-stage
    codegen), and every step replays exactly in ANSI SQL (the DuckDB
    oracle chains the same translate/replace/regexp_replace calls).
    """
    raw = F.coalesce(F.col(text_col), F.lit(""))
    # CRLF / lone CR -> LF first, so CR never hits the control strip
    t = F.regexp_replace(raw, "\r\n?", "\n")
    # C0 controls except \t \n, plus DEL — gone
    t = F.regexp_replace(t, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    # typographic punctuation -> ASCII; exotic spaces -> space;
    # zero-width space deleted (translate drops unpaired from-chars —
    # same semantics in Spark and DuckDB/Postgres)
    t = F.translate(
        t,
        "\u2018\u2019\u201a\u201c\u201d\u201e\u2013\u2014\u2212"  # quotes, dashes
        "\u00a0\u2007\u2009\u200a\u202f\u200b",  # exotic spaces + ZWSP
        "'''\"\"\"---     ",
    )
    t = F.replace(t, F.lit("…"), F.lit("..."))
    # collapse space/tab runs; strip spaces hugging a newline; cap
    # blank-line runs at one blank line; trim the ends
    t = F.regexp_replace(t, "[ \t]+", " ")
    t = F.regexp_replace(t, " ?\n ?", "\n")
    t = F.regexp_replace(t, "\n{3,}", "\n\n")
    t = F.regexp_replace(t, "^[\n ]+|[\n ]+$", "")
    # temp name first: aliasing the rebuilt text straight to text_col
    # would let lateral-alias resolution capture later references (the
    # module-wide rule from remove_repeated_spans)
    if passthrough:
        if "_norm" in docs.columns:
            raise ValueError(
                "input already has a '_norm' column — rename it before "
                "normalize_text(passthrough=True)"
            )
        # text_col keeps its ORIGINAL position: a consumer doing
        # positional writes (insertInto, union-by-position) must see the
        # same schema order with normalization on or off
        first = [F.col(c) if c != text_col else t.alias("_norm") for c in docs.columns]
        second = [
            F.col(c) if c != text_col else F.col("_norm").alias(text_col)
            for c in docs.columns
        ]
        return docs.select(*first).select(*second)
    return (
        docs.select(
            id_col,
            F.col(text_col).alias("_raw"),
            t.alias("_norm"),
        )
        .select(
            id_col,
            F.col("_norm").alias(text_col),
            F.coalesce(F.length("_raw"), F.lit(0)).alias("n_chars_raw"),
            F.length("_norm").alias("n_chars"),
            (~F.col("_norm").eqNullSafe(F.col("_raw"))).alias("changed"),
        )
    )


def vocab_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 100,
    rank_buckets: int = 1024,
) -> DataFrame:
    """Corpus vocabulary profile in ONE row — the QA surface a corpus
    build reads before training a tokenizer or setting filter
    thresholds: token/type counts, hapax fraction (crawl noise shows
    up as a hapax explosion), head coverage (what fraction of all
    tokens the top_k types account for — the broadcast-model and
    stop-shingle levers depend on this), and the Zipf slope (natural
    language sits near -1; templated/machine text drifts far off it —
    Piantadosi, "Zipf's word frequency law in natural language",
    Psychon Bull Rev 2014).

    The slope is the OLS fit of log(count) on log(rank) over the full
    vocabulary. Cross-engine determinism: each per-type term (the logs
    and their product) quantizes to integer micro-units BEFORE the
    cross-partition sums (the t13 trick), so the regression inputs are
    exact longs and the only float math is the final closed-form
    division.

    Scale shape: one corpus explode + word aggregation (the shuffle
    carries map-side-combined (word, count) partials); everything after
    is vocabulary-grain. Ranking is DISTRIBUTED: no output depends on
    WHICH type inside a count-tie group gets which rank — the ln/ln²
    sums depend only on the group's rank RANGE {r0+1..r0+m}, and the
    top-k cutoff only on how many of those ranks are <= k — so ranks
    are assigned per (count, hash-bucket) sub-group with analytic
    offsets instead of one global row_number over the full vocabulary
    (a raw-crawl whitespace vocabulary runs to billions of types; one
    task sorting it would BE the job):

        rank = r0(c) + off(c, bucket) + row_number within (c, bucket)

    r0 comes from the count-of-counts histogram (<= ~sqrt(2N) rows for
    N tokens since distinct count values sum to <= N — a one-task
    cumulative walk over at most millions of tiny (c, m) rows, not
    billions of types); off from the (c, bucket) histogram windowed
    PER COUNT VALUE (partitions of <= rank_buckets rows); the only
    per-type window is partitioned by (c, bucket), so the largest tie
    group (hapaxes) splits across rank_buckets tasks. The rank SET per
    group — hence every emitted value — is bit-identical to the global
    window form (pytest-proven on tie-heavy corpora incl. a top_k that
    splits a tie group). Returns (n_tokens, n_types, hapax_frac,
    top{k}_coverage, zipf_slope)."""
    words = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda w: F.length(w) > 0,
            )
        ).alias("word")
    )
    from pyspark.sql import Window

    vocab = words.groupBy("word").agg(F.count("*").alias("c"))
    vb = vocab.select(
        "word", "c", F.pmod(F.xxhash64("word"), F.lit(rank_buckets)).alias("bucket")
    )
    gb = vb.groupBy("c", "bucket").agg(F.count("*").alias("m_cb"))
    # r0(c): types with a strictly higher count (histogram-grain walk)
    hc = gb.groupBy("c").agg(F.sum("m_cb").alias("m_c"))
    w_hist = Window.orderBy(F.desc("c")).rowsBetween(Window.unboundedPreceding, -1)
    r0 = hc.select("c", F.coalesce(F.sum("m_c").over(w_hist), F.lit(0)).alias("r0"))
    # off(c, bucket): types of the same count in lower buckets
    w_off = (
        Window.partitionBy("c")
        .orderBy(F.asc("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = gb.select(
        "c", "bucket", F.coalesce(F.sum("m_cb").over(w_off), F.lit(0)).alias("off")
    )
    w_rn = Window.partitionBy("c", "bucket").orderBy(F.asc("word"))
    ranked = (
        vb.join(off, ["c", "bucket"])
        .join(r0, "c")
        .select(
            "c",
            (F.col("r0") + F.col("off") + F.row_number().over(w_rn)).alias("rank"),
        )
    )
    lx = F.round(F.log(F.col("rank")) * 1_000_000).cast("long")
    ly = F.round(F.log(F.col("c")) * 1_000_000).cast("long")
    lxy = F.round(F.log(F.col("rank")) * F.log(F.col("c")) * 1_000_000).cast("long")
    lxx = F.round(F.log(F.col("rank")) * F.log(F.col("rank")) * 1_000_000).cast("long")
    agg = ranked.agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("_hapax"),
        F.sum(F.when(F.col("rank") <= top_k, F.col("c")).otherwise(0)).alias("_top"),
        F.sum(lx).alias("_sx"),
        F.sum(ly).alias("_sy"),
        F.sum(lxy).alias("_sxy"),
        F.sum(lxx).alias("_sxx"),
    )
    n = F.col("n_types").cast("double")
    sx = F.col("_sx") / 1e6
    sy = F.col("_sy") / 1e6
    sxy = F.col("_sxy") / 1e6
    sxx = F.col("_sxx") / 1e6
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return agg.select(
        "n_tokens",
        "n_types",
        F.round(F.col("_hapax") / F.col("n_types"), 4).alias("hapax_frac"),
        F.round(F.col("_top") / F.col("n_tokens"), 4).alias(f"top{top_k}_coverage"),
        # a single-type corpus has no regression (denominator 0):
        # NULL, not a crash, under ANSI
        F.round(
            F.when(F.col("n_types") > 1, slope), 4
        ).alias("zipf_slope"),
    )


def collapse_repeated_lines(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """WITHIN-document cleanup: collapse runs of consecutively repeated
    lines to their first occurrence (scraped pages duplicate nav items,
    prompts, and progress lines back-to-back; the Gopher dup_line
    fraction FLAGS these — this is the repair). Matching is on the
    trimmed lowercase form; blank lines never match each other (a
    paragraph break is structure, not repetition). Complements the
    cross-document ``dedup.line_dedup``: that one needs a corpus-wide
    shuffle, this one is pure row-local array math — zero shuffles,
    zero Python, so it composes into any scan for free.

    Returns (id_col, text_col, n_lines, n_removed) for every input
    document; NULL text behaves as empty."""
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    norm = lambda x: F.lower(F.trim(x))  # noqa: E731 — shared by both lambdas
    kept = F.filter(
        lines,
        lambda x, i: (i == 0)
        | (F.length(F.trim(x)) == 0)
        | (norm(x) != norm(F.element_at(lines, i))),  # element_at is 1-based: i = previous
    )
    return (
        docs.select(
            id_col,
            F.size(lines).alias("n_lines"),
            (F.size(lines) - F.size(kept)).alias("n_removed"),
            F.concat_ws("\n", kept).alias("_clean_text"),
        )
        .select(id_col, F.col("_clean_text").alias(text_col), "n_lines", "n_removed")
    )


def apply_decontamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    max_contamination: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The APPLY step for benchmark decontamination: drop every
    training document whose benchmark n-gram overlap exceeds
    ``max_contamination`` (default 0.0 — ANY overlapping n-gram
    disqualifies, the GPT-3 appendix-C rule of removing documents with
    eval-set collisions). The detect side is ``contamination_check``;
    this shares its derivation, so detect and apply can never disagree
    on what counts as an overlap.

    Returns the surviving documents with ALL input columns untouched —
    documents too short to produce an n-gram have nothing to test and
    are KEPT (they cannot leak an n-gram they don't contain).

    Scale shape: inherits ``contamination_check``'s plan — the
    benchmark's distinct shingles broadcast, the corpus explodes once,
    and the final keep is a broadcast-able left-anti join of the
    doc-grain flagged set against the corpus (flagged ids <= docs that
    overlap an eval suite — small by construction)."""
    # the drop predicate uses the UNROUNDED ratio (n_matched vs
    # threshold * n_shingles): contamination_check's 4-decimal display
    # rounding would let a >20k-shingle doc with one genuine eval
    # collision round to 0.0000 and ship the leak (the rounded-feature
    # vs unrounded-predicate rule gopher_filter documents)
    flagged = (
        contamination_check(docs, benchmark, n=n, id_col=id_col, text_col=text_col)
        .filter(F.col("n_matched") > F.lit(max_contamination) * F.col("n_shingles"))
        .select(id_col)
    )
    return docs.join(flagged, id_col, "left_anti")


def chunk_text(
    docs: DataFrame,
    chunk_words: int = 200,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking WITH the text: each document yields
    word-grain windows of ``chunk_words`` every ``stride`` words
    (default = ``chunk_words``, i.e. disjoint; a smaller stride
    overlaps adjacent chunks — the retrieval/context-training shape
    where a fact straddling a boundary must appear whole in SOME
    chunk). NOT interchangeable with ``chunk_documents``: that one
    manifests counts at TOKEN_REGEX-token grain (punctuation splits),
    this one slices at whitespace-WORD grain so the emitted text
    rejoins exactly — plan capacity from the same grain you
    materialize with.

    Chunk count is ``1 + ceil((n_words - chunk_words) / stride)`` when
    the doc overflows one window, else one chunk — so the final window
    may be short but every word is covered and no empty trailing
    window is emitted. Docs with no words (empty/NULL text) yield no
    rows. Returns (id_col, chunk_id, text_col, n_words, start_word).

    Pure row-local array math (split once, slice per window) — no
    shuffle, no Python; the explode is bounded by n_words/stride."""
    if chunk_words < 1:
        raise ValueError(f"chunk_words must be >= 1, got {chunk_words}")
    stride = chunk_words if stride is None else stride
    if not 1 <= stride <= chunk_words:
        raise ValueError(
            f"stride must be in [1, chunk_words], got {stride} vs {chunk_words}"
        )
    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda w: F.length(w) > 0,
    )
    n = F.size(words)
    n_chunks = F.when(
        n <= chunk_words, F.lit(1)
    ).otherwise(F.lit(1) + F.ceil((n - F.lit(chunk_words)) / F.lit(stride)).cast("int"))
    return (
        docs.select(id_col, words.alias("_w"), n.alias("_n"), n_chunks.alias("_nc"))
        .filter(F.col("_n") > 0)
        .select(
            id_col,
            "_w",
            "_n",
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            F.concat_ws(
                " ",
                F.slice(F.col("_w"), F.col("chunk_id") * stride + 1, chunk_words),
            ).alias(text_col),
            F.least(
                F.lit(chunk_words), F.col("_n") - F.col("chunk_id") * F.lit(stride)
            ).alias("n_words"),
            (F.col("chunk_id") * stride).alias("start_word"),
        )
    )


# fixed-order HTML strip rules; RE2/Java-compatible (no lookarounds,
# no backreferences; \z not $ — Java's $ also matches before a final
# newline, RE2's does not) so a SQL engine replays them exactly.
_HTML_STRIP_RULES = (
    # script/style/noscript blocks go WITH their contents; the \z
    # alternate bounds an UNCLOSED block (truncated crawl doc) so raw
    # JS/CSS never leaks into the cleaned text
    (r"(?i)<script[\s\S]*?(</script\s*>|\z)", " "),
    (r"(?i)<style[\s\S]*?(</style\s*>|\z)", " "),
    (r"(?i)<noscript[\s\S]*?(</noscript\s*>|\z)", " "),
    (r"<!--[\s\S]*?(-->|\z)", " "),
    # block-level closers become line breaks so structure survives as
    # newlines (paragraph/line dedup downstream depends on it)
    (r"(?i)</(p|div|li|h[1-6]|tr|table|ul|ol|blockquote|section|article)\s*>", "\n"),
    (r"(?i)<br\b[^>]*>", "\n"),  # \b + attr tail: <br>, <br/>, <br class=x>
    # every remaining TAG drops — the name-start class keeps a stray
    # '<' in prose/code ('if x < 10 and y > 3') from swallowing text
    (r"</?[A-Za-z!][^>]*>", " "),
)

# fixed entity table, decoded in declaration order. &amp; is
# deliberately LAST: decoding it first would turn a double-escaped
# sample ('&amp;lt;div&amp;gt;') into live '<div>' AFTER tag stripping
# already ran. Only these literals decode (named + the common numeric
# forms) — there is no generic &#NNNN; pass.
_HTML_ENTITIES = (
    ("&nbsp;", " "), ("&#160;", " "),
    ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#34;", '"'),
    ("&#39;", "'"), ("&#x27;", "'"), ("&apos;", "'"),
    ("&amp;", "&"),
)


def strip_html(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """HTML -> text, the stage BEFORE normalization in a web pipeline:
    script/style/noscript/comment blocks drop with their contents,
    block-element closers and <br> become newlines (so paragraph/line
    structure survives for the dedup operators), remaining tags drop,
    and the common named entities decode. This is the regexp-chain
    form of boilerplate-free extraction — deterministic and
    SQL-replayable, not a DOM parser; malformed markup degrades to
    extra whitespace, never to an error. Compose as
    strip_html -> normalize_text -> (gate, dedup, ...): the
    normalization pass collapses the whitespace this stage leaves.

    Returns (id_col, text_col, had_markup); NULL text behaves as
    empty. Pure scan projection: a chain of regexp_replace/replace
    expressions — zero shuffles, zero Python."""
    raw = F.coalesce(F.col(text_col), F.lit(""))
    t = raw
    for pat, repl in _HTML_STRIP_RULES:
        t = F.regexp_replace(t, pat, repl)
    for ent, ch in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return (
        docs.select(
            id_col,
            raw.alias("_raw"),
            t.alias("_stripped"),
        )
        .select(
            id_col,
            F.col("_stripped").alias(text_col),
            (~F.col("_stripped").eqNullSafe(F.col("_raw"))).alias("had_markup"),
        )
    )


def corpus_divergence(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str = "source",
) -> DataFrame:
    """Jensen-Shannon divergence of each source's unigram distribution
    from the whole-corpus distribution — the mixture-QA number a corpus
    build reads before setting per-source sampling weights (a source
    whose JSD spikes between snapshots changed character; a near-zero
    JSD source adds little diversity). Extends the reference's
    per-asset profile-expression pattern (DataCatalogController.py
    dynamic tag expressions) to distribution-level corpus QA.

    JSD(P_s || P_corpus) = sum_w [p ln(2p/(p+q)) + q ln(2q/(p+q))]/2
    over the union vocabulary. Words absent from the source contribute
    q*ln(2)/2 each, so the absent-word mass folds into the closed form
    ln(2)/2 * (1 - C_s/N) where C_s is the corpus count-mass of the
    words PRESENT in the source — only present (source, word) pairs are
    ever materialized (vocabulary-grain, never |sources| x |vocab|).

    Cross-engine determinism: each present-pair term quantizes to
    integer nano-units before the cross-partition sum (the t13/t22
    trick); the absent-mass correction is computed from exact integer
    counts with an explicit double literal for ln(2), so no libm or
    summation-order drift can split engines.

    Scale shape: one corpus explode into a map-side-combined
    (source, word) count shuffle; the global word counts derive from
    those partials (word-grain aggregation, no second corpus pass); the
    scoring join is vocabulary-grain. Returns (source, n_tokens,
    n_types, js_divergence), js rounded to 6.
    """
    _LN2 = 0.6931471805599453
    words = docs.select(
        F.col(by).alias(by),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda w: F.length(w) > 0,
            )
        ).alias("word"),
    )
    # consumed by the global-count derivation AND the scoring join —
    # persist (LRU-evictable), same rationale as unigram_logprob's vocab
    sc = words.groupBy(by, "word").agg(F.count("*").alias("c_s")).persist()
    gc = sc.groupBy("word").agg(F.sum("c_s").alias("c_g"))
    totals = sc.groupBy(by).agg(F.sum("c_s").alias("n_s"))
    n_total = int(sc.agg(F.sum("c_s")).first()[0])
    p = F.col("c_s") / F.col("n_s")
    q = F.col("c_g") / F.lit(float(n_total))
    term = (
        p * F.log(F.lit(2.0) * p / (p + q)) + q * F.log(F.lit(2.0) * q / (p + q))
    ) / F.lit(2.0)
    pairs = (
        sc.join(gc, "word")
        .join(F.broadcast(totals), by)
        .select(
            by,
            F.round(term * 1e9).cast("long").alias("t9"),
            F.col("c_g").alias("c_g"),
            F.col("c_s").alias("c_s"),
        )
    )
    return (
        pairs.groupBy(by)
        .agg(
            F.sum("c_s").alias("n_tokens"),
            F.count("*").alias("n_types"),
            F.sum("t9").alias("_s9"),
            F.sum("c_g").alias("_cmass"),
        )
        .select(
            by,
            "n_tokens",
            "n_types",
            F.round(
                F.col("_s9") / 1e9
                + F.lit(_LN2 / 2.0) * (F.lit(n_total) - F.col("_cmass")) / F.lit(float(n_total)),
                6,
            ).alias("js_divergence"),
        )
    )


def vocab_growth(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10,
) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative distinct types vs
    cumulative tokens over the corpus in id order, at n_buckets
    checkpoints (Heaps, "Information Retrieval: Computational and
    Theoretical Aspects", 1978 — V ~ K*N^beta; a growth curve that
    bends away from the power law flags templated or exhausted data).

    Buckets are id-RANGE slices (bucket = floor(id * n/(max_id+1))), a
    pure projection — NOT a global ntile, which would sort the corpus
    through one task (the t22 lesson). A type's first bucket is
    min(bucket) over its occurrences, correct because the bucket map is
    monotone in id. The only windows run over n_buckets rows.

    Returns (bucket, n_docs, n_tokens, new_types, cum_tokens,
    cum_types) with one row per NON-EMPTY bucket."""
    from pyspark.sql import Window

    max_id = docs.agg(F.max(id_col)).first()[0]
    span = int(max_id) + 1
    bucket = F.least(
        (F.col(id_col) * n_buckets / F.lit(span)).cast("long"),
        F.lit(n_buckets - 1),
    )
    base = docs.select(F.col(id_col), bucket.alias("bucket"), F.col(text_col))
    words = base.select(
        "bucket",
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda w: F.length(w) > 0,
            )
        ).alias("word"),
    )
    tok = words.groupBy("bucket").agg(F.count("*").alias("n_tokens"))
    first_seen = (
        words.groupBy("word")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("new_types"))
    )
    ndocs = base.groupBy("bucket").agg(F.count("*").alias("n_docs"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ndocs.join(tok, "bucket", "left")
        .join(first_seen, "bucket", "left")
        .select(
            "bucket",
            "n_docs",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("new_types", F.lit(0)).alias("new_types"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn("cum_types", F.sum("new_types").over(w))
    )


def char_coverage(
    docs: DataFrame,
    by: str = "source",
    text_col: str = "text",
    alphabet: str = r"[a-z0-9\s.,;:!?'\"()\-]",
) -> DataFrame:
    """Per-group character-coverage profile: how much of each source's
    text falls outside a declared working alphabet — the pre-tokenizer
    QA number (a source full of out-of-alphabet bytes either needs a
    bigger alphabet, transliteration, or exclusion BEFORE the merge
    list is trained on it; BPE fallback on unseen bytes silently
    inflates fertility instead of failing).

    Counted by deletion: strip every in-alphabet character from the
    lowercased text and measure what remains — one regexp_replace per
    row, a pure projection (no shuffle before the group-grain
    aggregate), and the same character-class semantics in Spark (Java
    regex) and DuckDB (RE2) for this ASCII class. Returns (by,
    n_chars, n_outside, coverage) with coverage rounded to 6."""
    total = F.length(F.coalesce(F.col(text_col), F.lit("")))
    outside = F.length(
        F.regexp_replace(F.lower(F.coalesce(F.col(text_col), F.lit(""))), alphabet, "")
    )
    return docs.groupBy(by).agg(
        F.sum(total).cast("long").alias("n_chars"),
        F.sum(outside).cast("long").alias("n_outside"),
        F.round(
            F.lit(1.0) - F.sum(outside) / F.greatest(F.sum(total), F.lit(1)), 6
        ).alias("coverage"),
    )


def gate_mixture_drift(
    docs: DataFrame,
    by: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    **gate_kwargs,
) -> DataFrame:
    """What the quality gate does to the corpus MIXTURE: per-source
    document share before vs after ``gopher_filter``, and the drift.
    A gate that is globally reasonable can still silently halve one
    source's share — exactly the number a mixture-weighted training
    run (q54/q63) needs to see before trusting its pre-gate weights.

    One gate pass (the certified t16 rules) + two group-grain
    aggregates joined on the group key; the window for shares runs
    over |sources| rows. Returns (by, n_before, n_after,
    share_before, share_after, share_drift), shares rounded to 6,
    drift = share_after - share_before rounded to 6. Sources the gate
    empties keep their row (n_after = 0)."""
    from pyspark.sql import Window

    # Materialize the thin (id, keep) stream BEFORE filtering on it:
    # `filter("keep").select(id)` lets CollapseProject + pushdown inline
    # the staged gate features ~30x into one scan-level Filter predicate
    # (FilterExec gets no subexpression elimination; ProjectExec does),
    # so every doc paid split(text) dozens of times — the q98
    # gate_overlap barrier discipline. At 100 TB this boundary is the
    # gate table itself (its own artifact).
    flags = (
        gopher_filter(docs, id_col=id_col, text_col=text_col, **gate_kwargs)
        .select(id_col, "keep")
        .localCheckpoint(eager=True)
    )
    kept = flags.filter("keep")
    before = docs.groupBy(by).agg(F.count("*").alias("n_before"))
    after = (
        docs.join(kept.select(id_col), id_col, "left_semi")
        .groupBy(by)
        .agg(F.count("*").alias("n_after"))
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    joined = before.join(after, by, "left").withColumn(
        "n_after", F.coalesce(F.col("n_after"), F.lit(0))
    )
    sb = F.col("n_before") / F.sum("n_before").over(w)
    sa = F.col("n_after") / F.greatest(F.sum("n_after").over(w), F.lit(1))
    return joined.select(
        by,
        F.col("n_before").cast("long").alias("n_before"),
        F.col("n_after").cast("long").alias("n_after"),
        F.round(sb, 6).alias("share_before"),
        F.round(sa, 6).alias("share_after"),
        F.round(sa - sb, 6).alias("share_drift"),
    )


def top_ngrams_per_group(
    docs: DataFrame,
    by: str = "source",
    text_col: str = "text",
    n: int = 2,
    k: int = 3,
) -> DataFrame:
    """Top-k most frequent word n-grams per group — the corpus
    inspection surface behind every "what is this source actually
    full of" question, and the boilerplate detector that feeds
    max_df/stop-shingle choices in the dedup family (an n-gram
    dominating a source's top list IS its candidate stop-shingle).

    Deterministic ranking: count desc, then the n-gram ascending —
    both engines agree on ties. One (group, ngram)-grain map-side-
    combined count, then a per-group top-k window over the counted
    rows (never the raw tokens). Returns (by, ngram, n_occurrences,
    rank)."""
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda w: F.length(w) > 0,
    )
    # slice off ngram_array's partial tails (docs with < n words
    # contribute nothing — no whole-text fallback here, unlike
    # word_shingles: a 1-word "bigram" is not an n-gram count)
    full = F.slice(
        ngram_array(toks, n), 1, F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    )
    grams = docs.select(
        F.col(by).alias("_g"),
        F.explode(full).alias("_ng"),
    )
    counts = grams.groupBy("_g", "_ng").agg(F.count("*").alias("n_occurrences"))
    w = Window.partitionBy("_g").orderBy(F.desc("n_occurrences"), F.asc("_ng"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_g").alias(by),
            F.col("_ng").alias("ngram"),
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def token_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str = "source",
) -> DataFrame:
    """Per-source unigram Shannon entropy in bits/token — the
    diversity-QA companion to ``corpus_divergence``: a source whose
    entropy collapses between snapshots went templated/boilerplate
    (few types dominate); entropy near log2(n_types) means a flat,
    diverse distribution. Read together with ``vocab_growth`` before
    setting mixture weights.

    H_s = -sum_w p ln(p) / ln(2), p = c_sw / n_s. Cross-engine
    determinism: each present-word term quantizes to integer
    nano-units before the cross-partition sum (the t13/t28 trick), so
    no libm or summation-order drift can split engines.

    Scale shape: one corpus explode into a map-side-combined
    (source, word) count shuffle, then a source-grain rollup —
    vocabulary-grain intermediates, dimension-grain output. Returns
    (source, n_tokens, n_types, entropy_bits) with entropy rounded
    to 6."""
    _LN2 = 0.6931471805599453
    words = docs.select(
        F.col(by).alias(by),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda w: F.length(w) > 0,
            )
        ).alias("word"),
    )
    sc = words.groupBy(by, "word").agg(F.count("*").alias("c_s"))
    totals = sc.groupBy(by).agg(
        F.sum("c_s").alias("n_s"), F.count("*").alias("n_types")
    )
    p = F.col("c_s") / F.col("n_s")
    term = -p * F.log(p) / F.lit(_LN2)
    return (
        sc.join(F.broadcast(totals), by)
        .select(
            by,
            F.col("n_s"),
            F.col("n_types"),
            F.round(term * 1e9).cast("long").alias("t9"),
        )
        .groupBy(by)
        .agg(
            F.first("n_s").cast("long").alias("n_tokens"),
            F.first("n_types").cast("long").alias("n_types"),
            F.round(F.sum("t9") / 1e9, 6).alias("entropy_bits"),
        )
    )


def mixture_rebalance(drift: DataFrame, cap: float = 10.0) -> DataFrame:
    """Corrective post-gate sampling weights from
    ``gate_mixture_drift``'s output: a quality gate never filters
    sources evenly, so the surviving corpus's mixture drifts from the
    one the data recipe chose — weight = share_before / share_after
    restores it at sampling time (capped: a source the gate nearly
    annihilated should be re-sourced, not upsampled 1000x from its
    survivors; a fully annihilated source gets weight 0, there is
    nothing to sample). Feed the weights to the q54/q55 mixture
    sampler.

    Input is the dimension-grain drift table (|sources| rows), so this
    is scale-free — the corpus-sized work already happened inside
    gate_mixture_drift. Returns (source, n_after, share_before,
    share_after, weight), weight rounded to 4."""
    w = F.when(
        F.col("share_after") > 0,
        F.least(F.col("share_before") / F.col("share_after"), F.lit(cap)),
    ).otherwise(F.lit(0.0))
    return drift.select(
        "source",
        "n_after",
        "share_before",
        "share_after",
        F.round(w, 4).alias("weight"),
    )


def code_prose_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source code-vs-prose routing profile — the pre-mixture
    classifier an LLM-data pipeline runs before deciding tokenizer,
    quality gates, and sampling weights (code wants different ones
    than prose; Gopher-style gates like t16 actively DELETE good code
    by punishing symbols and short lines). Three per-doc signals, all
    decided by EXACT INTEGER comparisons so both engines agree
    bit-for-bit with no float thresholds:

    - symbol density: chars in []{}();=<># over total chars,
      code-like when > 2% (count * 50 > chars);
    - indented-line fraction: nonempty lines opening with a tab or
      4+ spaces, code-like when > 15% (count * 20 > 3 * lines);
    - statement-line fraction: nonempty lines closing with ; { or },
      code-like when > 20% (count * 5 > lines).

    is_code = symbol density AND (indentation OR statement lines) —
    symbols alone misfire on math-heavy prose, structure alone on
    poetry, so the conjunction is the rule. The per-doc symbol ratio
    is quantized to the micro lattice BEFORE the per-source sum (the
    t13/t33 determinism trick).

    One corpus pass, dimension-grain output. Returns (source, n_docs,
    n_code, code_frac, mean_symbol_frac)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    chars = F.length(t)
    sym = chars - F.length(F.regexp_replace(t, r"[\[\]{}();=<>#]", ""))
    lines = F.filter(
        F.split(t, "\n"), lambda l: F.length(F.trim(l)) > 0
    )
    n_lines = F.size(lines)
    indented = F.size(F.filter(lines, lambda l: l.rlike(r"^(\t|    )")))
    stmt = F.size(F.filter(lines, lambda l: l.rlike(r"[;{}]\s*$")))
    per_doc = docs.select(
        F.col(source_col),
        (
            (sym * 50 > chars)
            & ((indented * 20 > 3 * n_lines) | (stmt * 5 > n_lines))
        ).alias("_is_code"),
        F.round(sym / F.greatest(chars, F.lit(1)) * 1e6, 0)
        .cast("long")
        .alias("_sym_micro"),
    )
    return per_doc.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("_is_code").cast("long")).cast("long").alias("n_code"),
        F.round(F.sum(F.col("_is_code").cast("long")) / F.count("*"), 4).alias(
            "code_frac"
        ),
        F.round(F.sum("_sym_micro") / F.count("*") / F.lit(1e6), 6).alias(
            "mean_symbol_frac"
        ),
    )


def contamination_profile(
    contamination: DataFrame,
    bucket_pct: int = 10,
) -> DataFrame:
    """Decision table over ``contamination_check`` output: how many
    training docs fall in each contamination band, and what cumulative
    fraction of the corpus a drop-threshold at each band boundary
    would remove — the table an operator reads BEFORE picking the
    decontamination threshold (drop-at-0.8 vs drop-at-0.2 can differ
    by percent of the corpus; this makes the trade a number).

    Bucketing stays on exact integers: bucket = floor(n_matched *
    (100 / bucket_pct) / n_shingles) clamps full containment into the
    last band; the division is of exact ints, so both engines land the
    identical double and the identical floor. cum_frac_at_or_above is
    the fraction a threshold at the band's LOWER edge would drop
    (window over the band-grain rollup, ~10 rows).

    Returns (bucket, lo_pct, n_docs, frac_docs, cum_frac_at_or_above).
    """
    from pyspark.sql.window import Window

    bands = 100 // bucket_pct
    bucket = F.least(
        F.floor(F.col("n_matched") * bands / F.col("n_shingles")),
        F.lit(bands - 1),
    ).cast("int")
    per = contamination.groupBy(bucket.alias("bucket")).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    total = F.sum("n_docs").over(Window.partitionBy())
    cum = F.sum("n_docs").over(
        Window.orderBy(F.col("bucket").desc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    return per.select(
        "bucket",
        (F.col("bucket") * bucket_pct).cast("int").alias("lo_pct"),
        "n_docs",
        F.round(F.col("n_docs") / total, 6).alias("frac_docs"),
        F.round(cum / total, 6).alias("cum_frac_at_or_above"),
    )


def language_id_margin(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Confidence surface for ``language_id``'s marker heuristic — the
    routing table for a two-tier language pipeline: a doc whose top two
    marker scores are close (or zero) got its label from a tie-break,
    not evidence, and should route to the expensive classifier; a doc
    with a wide margin is safe to label cheaply. The same
    estimate-cheaply / verify-the-uncertain shape as d15/d16.

    All scores are integer marker-hit counts (replayable in any
    engine); best/second come from sorting the 4-score array, so the
    margin is exact. ``lang_pred`` repeats t03's rule verbatim
    (CJK -> zh, zero hits -> und, fixed tie order). Returns (doc_id,
    lang_pred, best_hits, second_hits, margin) — doc-grain, one scan,
    no shuffle (pure projection)."""
    t = F.col(text_col)
    words = F.split(F.lower(t), r"\s+")
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores[lang] = F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
    has_cjk = F.size(F.regexp_extract_all(t, F.lit(r"[一-鿿]"), 0)) > 0
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(list(LANG_MARKERS)):
        best = F.when(scores[lang] >= best_score, F.lit(lang)).otherwise(best)
        best_score = F.greatest(best_score, scores[lang])
    pred = F.when(has_cjk, F.lit("zh")).otherwise(
        F.when(best_score > 0, best).otherwise(F.lit("und"))
    )
    ordered = F.reverse(F.array_sort(F.array(*scores.values())))
    return docs.select(
        id_col,
        pred.alias("lang_pred"),
        ordered[0].cast("int").alias("best_hits"),
        ordered[1].cast("int").alias("second_hits"),
        (ordered[0] - ordered[1]).cast("int").alias("margin"),
    )


def _mg_reduce(counters, budget: int):
    """THE mergeable-summaries Misra-Gries reduction (Agarwal et al.,
    PODS'12), shared by the batch pass (heavy_hitter_tokens) and the
    streaming monitor (streaming.quality.heavy_hitter_stream) so the
    certified stream==batch equivalence rests on ONE definition: fold
    exact batch counts in, then shrink back to <= budget keys by
    subtracting the (budget+1)-th largest count from every key and
    dropping the non-positive — error bound <= n/(budget+1), identical
    to the per-token decrement loop but vectorizable. May legitimately
    return an EMPTY summary (an all-equal over-budget Counter cancels
    itself out); callers must not treat emptiness as "no input"."""
    import collections

    if len(counters) <= budget:
        return counters
    sub = sorted(counters.values(), reverse=True)[budget]
    return collections.Counter({t: c - sub for t, c in counters.items() if c > sub})


def heavy_hitter_tokens(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 100,
    candidate_budget: int = 1024,
    broadcast_max: int = 1_000_000,
) -> DataFrame:
    """EXACT heavy hitters without a vocabulary-grain shuffle: every
    lowercased whitespace token whose corpus count strictly exceeds
    ``n_tokens / k``, with its exact count. The scale form of the
    t05/t32 family — their ``groupBy(token)`` shuffles the ENTIRE
    vocabulary (at 100 TB that is the dominant shuffle of the job);
    this two-pass shape shuffles only a bounded candidate set.

    Pass 1 — Misra–Gries per partition (``mapInPandas``, one dict of
    at most ``candidate_budget`` counters per partition, Arrow
    batches): the classic guarantee composes across partitions — a
    token dropped everywhere has per-partition count <= n_i/budget, so
    its global count is <= N/budget; any token with count > N/budget
    survives in at least one partition's summary. With budget >= k the
    candidate union therefore contains EVERY true heavy hitter; it is
    bounded by partitions x budget rows regardless of vocabulary size.
    The same pass emits per-partition token totals (one row each), so
    N needs no extra scan.

    Pass 2 — exact counts of candidates only: the token stream is
    semi-joined to the BROADCAST candidate set and counted; map-side
    combine makes the shuffle candidate-grain. "Bounded by
    construction" (partitions x budget) is NOT "small" at every scale
    — tens of thousands of input partitions x 1024 is tens of millions
    of candidate rows, past any sane broadcast/driver budget — so the
    distinct candidate set is counted first (one cheap scan of the
    checkpointed pass-1 summary) and above ``broadcast_max`` rows the
    pass falls back to a map-side-combined vocabulary aggregate
    semi-joined to the candidates through an ordinary shuffle join:
    slower (the t05 shuffle shape) but never driver-fatal, and
    value-identical. The final filter is pure integer arithmetic
    (``count * k > N`` — no division, no float threshold), so both
    engines agree exactly and the output is independent of
    partitioning (asserted in tests).

    Two corpus scans instead of one vocabulary shuffle is the right
    trade at scale: scans parallelize linearly and push the projection
    to the parquet reader; the vocabulary shuffle materializes every
    distinct token. Returns (token, n_occurrences), deterministic.

    Reference analog: the tag-count rollups the reference renders on
    its report pages (BigQueryController's aggregate views) — here as
    a bounded-memory streaming-sketch pass + exact verification, the
    d15/d16 estimate-then-verify shape applied to frequency."""
    import pandas as pd

    budget = max(candidate_budget, k)
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
                lambda w: F.length(w) > 0,
            )
        ).alias("token")
    )

    def mg(batches):
        import collections

        counters: collections.Counter = collections.Counter()
        total = 0
        for pdf in batches:
            total += len(pdf)
            counters.update(pdf["token"].value_counts().to_dict())
            counters = _mg_reduce(counters, budget)
        out = pd.DataFrame(
            {
                "token": list(counters.keys()) + [""],
                "n": list(counters.values()) + [total],
                "kind": ["cand"] * len(counters) + ["total"],
            }
        )
        yield out

    summary = toks.mapInPandas(mg, schema="token string, n long, kind string")
    # tiny by construction: <= partitions x budget candidate rows +
    # one total row per partition — safe to checkpoint eagerly so the
    # two downstream uses (total agg + broadcast join) scan it once
    summary = summary.localCheckpoint(eager=True)
    n_total = summary.filter(F.col("kind") == "total").agg(F.sum("n")).collect()[0][0] or 0
    cands = summary.filter(F.col("kind") == "cand").select("token").distinct()
    if cands.count() <= broadcast_max:
        counted = (
            toks.join(F.broadcast(cands), "token")
            .groupBy("token")
            .agg(F.count("*").alias("n_occurrences"))
        )
    else:
        # candidate set outgrew the broadcast guard: aggregate first
        # (partial map-side combine keeps the shuffle at
        # distinct-tokens-per-partition grain, never occurrence grain)
        # and semi-join the candidates with a shuffle join
        counted = (
            toks.groupBy("token")
            .agg(F.count("*").alias("n_occurrences"))
            .join(cands, "token", "left_semi")
        )
    return counted.filter(F.col("n_occurrences") * k > F.lit(int(n_total))).select(
        "token", F.col("n_occurrences").cast("long").alias("n_occurrences")
    )


def gate_overlap_matrix(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **gopher_kwargs,
) -> DataFrame:
    """Pairwise co-fire counts of the Gopher gate rules — the gate
    DIAGNOSIS surface: q72 says which sources a gate decimates; this
    says which gates are REDUNDANT (pair count ~= both solo counts —
    one of them can be dropped or reordered cheapest-first) and which
    are independent signals. The diagonal is each gate's solo firing
    count, so the matrix carries the full marginal too.

    One gopher_filter scan (pure projection, t16's certified rule
    math), explode the per-doc failed-rule list twice with ``a <= b``
    (upper triangle), then a dimension-grain groupBy — at most
    9 x 10 / 2 = 45 output rows regardless of corpus size; the shuffle
    carries (gate, gate) pairs, never documents. Returns
    (gate_a, gate_b, n_docs)."""
    # BARRIER before the explode (r14, plan-audited): explode over a
    # bound array column makes InferFiltersFromGenerate add
    # `size(fail_reasons) > 0`, and predicate pushdown then substitutes
    # the alias straight through the staged projections — the ENTIRE
    # nine-rule gate expression lands a second time in a scan-level
    # Filter, so every document paid the gate math twice. The gate
    # stream is thin here (id + <= 9 rule names); materialize it once,
    # the winnowing_contamination barrier discipline. At 100 TB this
    # boundary is the gate table itself (its own artifact).
    failed = (
        gopher_filter(docs, id_col, text_col, **gopher_kwargs)
        .select(id_col, "fail_reasons")
        .localCheckpoint(eager=True)
    )
    pairs = failed.select(
        F.explode("fail_reasons").alias("gate_a"), F.col("fail_reasons")
    ).select("gate_a", F.explode("fail_reasons").alias("gate_b"))
    return (
        pairs.filter(F.col("gate_a") <= F.col("gate_b"))
        .groupBy("gate_a", "gate_b")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def line_language_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document language segmentation at LINE grain — the op
    that catches what a doc-level label (t03) structurally cannot: a
    document that is half English boilerplate and half German body
    gets one t03 label, trains the wrong tokenizer branch, and poisons
    per-language mixtures. Each non-blank line is classified with
    t03's exact rule (CJK -> zh; else most marker hits, en>de>fr>es
    tie order, zero hits -> und); the doc-level profile says how mixed
    the doc actually is. The routing companion to t36's margin: t03
    labels, t36 says how confidently, this says whether ONE label is
    even the right shape.

    Entirely row-local higher-order-function math — transform over the
    line array, aggregate counts per label in the same projection —
    so it is a pure scan at 100 TB: no explode, no shuffle, nothing
    leaves the row. Deterministic dominant rule: most lines, ties in
    the fixed en>de>fr>es>zh>und order. Returns (doc_id, n_lines,
    dominant_lang, n_dominant_lines, n_langs, is_mixed) where n_langs
    counts distinct NON-und line labels and is_mixed = (n_langs >= 2)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines_e = F.filter(F.split(t, r"\n"), lambda l: F.length(F.trim(l)) > 0)

    def classify(line: Column) -> Column:
        words = F.filter(
            F.split(F.lower(line), r"\s+"), lambda w: F.length(w) > 0
        )
        scores = {}
        for lang, markers in LANG_MARKERS.items():
            arr = F.array(*[F.lit(m) for m in markers])
            scores[lang] = F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
        has_cjk = F.size(F.regexp_extract_all(line, F.lit(r"[一-鿿]"), 0)) > 0
        best = F.lit("und")
        best_score = F.lit(0)
        for lang in reversed(list(LANG_MARKERS)):
            best = F.when(scores[lang] >= best_score, F.lit(lang)).otherwise(best)
            best_score = F.greatest(best_score, scores[lang])
        return F.when(has_cjk, F.lit("zh")).otherwise(
            F.when(best_score > 0, best).otherwise(F.lit("und"))
        )

    # STAGE _lines and _langs as bound columns: the six label counts
    # plus the dominant walk each consume the classified array, and the
    # interpreted HOF path does no CSE — unstaged, every consumer
    # re-ran the full per-line classification (measured 6x: 7s -> 1s
    # at sf0.1, the thrice-learned multi-consumer-HOF rule).
    base = docs.select(id_col, lines_e.alias("_lines"))
    base = base.select(
        id_col, "_lines", F.transform(F.col("_lines"), classify).alias("_langs")
    )
    lines = F.col("_lines")
    langs = F.col("_langs")
    labels = ["en", "de", "fr", "es", "zh", "und"]

    # closure factory, NOT a default-arg lambda: F.filter reads a
    # two-parameter lambda as (element, index) and would bind the
    # label slot to the index column
    def _eq(lab: str):
        return lambda x: x == F.lit(lab)

    counts = {lab: F.size(F.filter(langs, _eq(lab))) for lab in labels}
    # dominant = most lines, fixed-order tiebreak: walk the order
    # reversed with >= so earlier labels win equal counts (the t03
    # tie discipline applied to line counts)
    dom = F.lit("und")
    dom_n = F.lit(-1)
    for lab in reversed(labels):
        dom = F.when(counts[lab] >= dom_n, F.lit(lab)).otherwise(dom)
        dom_n = F.greatest(dom_n, counts[lab])
    n_langs = sum(
        (counts[lab] > 0).cast("int") for lab in labels if lab != "und"
    )
    # zero lines means zero evidence: the tie walk would hand the
    # all-zero case to 'en' (last >= wins) — route it to 'und' like
    # t03's zero-hits rule
    dom = F.when(F.size(lines) == 0, F.lit("und")).otherwise(dom)
    return base.select(
        id_col,
        F.size(lines).cast("int").alias("n_lines"),
        dom.alias("dominant_lang"),
        dom_n.cast("int").alias("n_dominant_lines"),
        n_langs.cast("int").alias("n_langs"),
        (n_langs >= 2).alias("is_mixed"),
    )


def line_repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The LINE/PARAGRAPH half of Gopher's repetition block (Rae et
    al., arXiv:2112.11446 Table A1: duplicate line fraction, duplicate
    paragraph fraction, and their character-fraction forms) — t11
    covers the word/n-gram half; gopher_filter proxies this half at
    word grain (its documented ``dup_words`` shortcut). A doc whose
    lines repeat is boilerplate/scaffolding even when its word mix
    looks organic.

    Definitions (the paper's): an occurrence is a DUPLICATE if an
    identical line (paragraph) appeared EARLIER in the document;
    dup_*_frac = duplicate occurrences / total, dup_*_char_frac =
    characters of duplicate occurrences / characters of all. Blank
    lines and paragraphs are not occurrences. Docs with zero lines
    (paragraphs) get NULL fractions — "not measurable", the
    gopher_filter NULL-feature convention.

    Everything is row-local: the earlier-equal mask is a transform
    with index + exists over the prefix slice (O(L^2) per doc in the
    row, zero shuffles — a pure scan projection at 100 TB). Returns
    (doc_id, n_lines, dup_line_frac, dup_line_char_frac, n_paras,
    dup_para_frac, dup_para_char_frac), fractions rounded to 4."""
    t = F.coalesce(F.col(text_col), F.lit(""))

    def signals(units: Column, prefix: str) -> list[Column]:
        n = F.size(units)
        # mask[j] = an identical unit exists at an earlier index
        mask = F.transform(
            units,
            lambda x, i: F.exists(F.slice(units, F.lit(1), i), lambda y: y == x),
        )
        pairs = F.arrays_zip(units.alias("u"), mask.alias("d"))
        n_dup = F.size(F.filter(pairs, lambda p: p["d"]))
        chars_all = F.aggregate(units, F.lit(0), lambda a, u: a + F.length(u))
        chars_dup = F.aggregate(
            pairs, F.lit(0), lambda a, p: a + F.when(p["d"], F.length(p["u"])).otherwise(F.lit(0))
        )
        frac = F.when(n > 0, F.round(n_dup / n, 4))
        cfrac = F.when(chars_all > 0, F.round(chars_dup / chars_all, 4))
        return [
            n.cast("int").alias(f"n_{prefix}s"),
            frac.alias(f"dup_{prefix}_frac"),
            cfrac.alias(f"dup_{prefix}_char_frac"),
        ]

    lines = F.filter(F.split(t, r"\n"), lambda l: F.length(F.trim(l)) > 0)
    paras = F.filter(
        F.transform(F.split(t, r"\n\n+"), lambda p: F.trim(p)),
        lambda p: F.length(p) > 0,
    )
    return docs.select(
        id_col, *signals(lines, "line"), *signals(paras, "para")
    )


def ngram_coverage_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """The n-gram half of Gopher's repetition block at CHARACTER grain
    (Rae et al., arXiv:2112.11446 Table A1) — completes the family:
    t11 word-grain, t40 line/paragraph-grain, this the
    fraction-of-characters forms the paper actually thresholds:

    * ``top_{n}_gram_char_frac`` (n in top_ns) — characters COVERED by
      occurrences of the most frequent word n-gram / all word
      characters (thresholds 0.20/0.18/0.16 at n=2/3/4). Ties break
      to the lexicographically smallest gram — deterministic in any
      engine. Positional coverage, so overlapping occurrences of a
      self-repeating gram count each word once and the fraction stays
      <= 1 (the count x length shortcut overshoots exactly there).
    * ``dup_{n}_gram_char_frac`` (n in dup_ns) — characters COVERED by
      any occurrence of any n-gram appearing >= 2 times / all word
      characters (thresholds 0.15..0.10 at n=5..10).

    A feature is NULL when the doc has fewer than n words (not
    measurable — the t40/gopher_filter convention).

    Implementation note — this is a DELIBERATE Arrow/pandas path, not
    an expression: the coverage mask is inherently positional, and
    nesting it in higher-order functions re-evaluates every referenced
    sub-expression per element (Spark's interpreted HOF path has no
    common-subexpression elimination), which measured out at
    effectively O(W^3) per document. The per-doc Python is LINEAR
    (dict counts + one sliding window per n), Arrow-batched, and the
    operator stays a pure scan projection at 100 TB — embarrassingly
    parallel, no shuffle, no state. The DuckDB oracle replays the same
    definitions relationally (set-based coverage join)."""
    import re

    import pandas as pd

    from decimal import ROUND_HALF_UP, Decimal

    ws = re.compile(r"\s+", re.ASCII)  # Java/RE2 \s is ASCII-only

    feat_names = [f"top_{n}_gram_char_frac" for n in top_ns] + [
        f"dup_{n}_gram_char_frac" for n in dup_ns
    ]
    id_type = docs.schema[id_col].dataType.simpleString()
    schema = ", ".join([f"{id_col} {id_type}"] + [f"{f} double" for f in feat_names])

    def rnd(x: float) -> float:
        # HALF_UP on the shortest decimal repr — BigDecimal.valueOf
        # semantics, what F.round and DuckDB round() do on doubles
        return float(Decimal(repr(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))

    def doc_features(text) -> list:
        words = [w for w in ws.split((text or "").lower()) if w]
        n_words = len(words)
        wlens = [len(w) for w in words]
        char_total = sum(wlens)
        out = []

        def coverage(starts: list, n: int) -> float:
            covered = 0
            nxt = 0  # first uncovered word index
            for i in starts:  # starts ascending
                lo = max(i, nxt)
                hi = i + n  # exclusive
                if hi > lo:
                    covered += sum(wlens[lo:hi])
                    nxt = hi
            return rnd(covered / char_total)

        for n in top_ns:
            if n_words < n or char_total == 0:
                out.append(None)
                continue
            grams = [" ".join(words[i : i + n]) for i in range(n_words - n + 1)]
            counts: dict = {}
            for g in grams:
                counts[g] = counts.get(g, 0) + 1
            # modal gram; ties -> the lexicographically smallest
            best_count = max(counts.values())
            best_gram = min(g for g, c in counts.items() if c == best_count)
            starts = [i for i, g in enumerate(grams) if g == best_gram]
            out.append(coverage(starts, n))
        for n in dup_ns:
            if n_words < n or char_total == 0:
                out.append(None)
                continue
            grams = [" ".join(words[i : i + n]) for i in range(n_words - n + 1)]
            counts = {}
            for g in grams:
                counts[g] = counts.get(g, 0) + 1
            starts = [i for i, g in enumerate(grams) if counts[g] >= 2]
            out.append(coverage(starts, n))
        return out

    def compute(batches):
        for pdf in batches:
            feats = [doc_features(t) for t in pdf[text_col]]
            data = {id_col: pdf[id_col].values}
            for col_idx, name in enumerate(feat_names):
                data[name] = [f[col_idx] for f in feats]
            yield pd.DataFrame(data)

    return docs.select(id_col, text_col).mapInPandas(compute, schema=schema)


def pii_incidence(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-(group, pii_type) incidence of the ``PII_PATTERNS`` surface
    — the corpus-level companion of ``redact_pii`` (t06 scrubs; this
    says WHERE the PII mass lives, the number a data-governance review
    asks for before any scrub runs). Counting uses the same
    sequential-pipeline semantics as the scrub (each pattern counts
    against the previous pattern's redacted text), so incidence here
    equals redactions there by construction.

    One corpus scan: every pattern's per-doc count is a column of the
    SAME projection (JVM regexp codegen, no Python), exploded to
    (group, pii_type) grain and rolled up — the shuffle carries
    groups x patterns rows, never documents. Returns (``group_col``,
    pii_type, n_docs, n_hits) with n_docs = docs containing >= 1 hit
    of that type and n_hits the total occurrence count.

    Reference analog: the DLP inspection rollups the reference tags
    assets with (infotype aggregation, sensitive.py J2) — here at
    corpus grain over raw text rather than per-column findings."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    structs = []
    for pat, repl in PII_PATTERNS:
        name = repl.strip("<>").lower()
        structs.append(
            F.struct(
                F.lit(name).alias("pii_type"),
                F.size(F.regexp_extract_all(t, F.lit(pat), 0)).alias("n"),
            )
        )
        t = F.regexp_replace(t, pat, repl)
    hits = docs.select(
        group_col, F.explode(F.array(*structs)).alias("h")
    ).select(group_col, F.col("h.pii_type").alias("pii_type"), F.col("h.n").alias("n"))
    return hits.groupBy(group_col, "pii_type").agg(
        F.sum((F.col("n") > 0).cast("int")).cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("n_hits"),
    )


# winnowing parameters: k-character grams, window of w gram hashes.
# Guarantee (Schleimer et al., SIGMOD'03): any substring match of
# length >= w + k - 1 shares at least one selected fingerprint.
WINNOW_K = 8
WINNOW_W = 4


def winnowing_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-character gram of
    the lowercased text, slide a window of ``w`` hashes, select each
    window's minimum (RIGHTMOST occurrence on ties), de-duplicate
    selections. The selected set is ~2/(w+1) of the gram count yet
    GUARANTEES that any two documents sharing a substring of length
    >= w + k - 1 share at least one fingerprint — the detection
    contract n-gram Jaccard (similarity-grain) and minhash
    (whole-document-grain) do not give for contained copies of
    bounded length.

    Entirely row-local higher-order functions over one scan — no
    explode before the per-doc selection, no shuffle at all; at 100 TB
    this is a pure scan projection whose output (doc_id, pos, fp) is
    the JOIN SURFACE for copy detection (bucket join on fp, df-capped
    like the shingle path). The gram hash is the first 8 hex digits of
    md5 as an integer — the engine-portable hash used across the
    oracle surface (q58's bucket rule), so DuckDB replays it exactly.
    A document shorter than k characters has no grams and emits no
    rows; one with fewer than ``w`` gram hashes emits the single
    minimum of what exists (the paper's short-document degenerate
    case). Returns (``id_col``, pos, fp) where pos is the 1-based gram
    start position."""
    if k < 1 or w < 1:
        raise ValueError("winnowing needs k >= 1 and w >= 1")
    # STAGED columns, not one nested expression: Spark's interpreted
    # higher-order-function path does no common-subexpression reuse, so
    # a gram/hash array nested inside the per-window lambda would be
    # re-derived for EVERY window — O(n^2) per document, an effective
    # hang at corpus scale (the t41 lesson). Materializing each
    # intermediate as a real column makes the outer lambda read a bound
    # row value and the whole op stays O(n * w). The gram hash is FUSED
    # into one transform straight off the bound ``_t`` column — each
    # element is consumed exactly once, so the no-CSE rule is satisfied
    # without materializing the gram-string array, whose per-window
    # string churn was the winnowing family's measured ~2x variance
    # source (6.4s stable vs 10.3-21.3s volatile at sf0.1).
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    staged = docs.select(id_col, t.alias("_t"), F.length(t).alias("_n"))
    staged = staged.select(
        id_col,
        F.when(
            F.col("_n") >= k,
            F.transform(
                F.sequence(F.lit(1), F.col("_n") - k + 1),
                lambda i: F.conv(
                    F.substring(F.md5(F.substring(F.col("_t"), i, k)), 1, 8), 16, 10
                ).cast("long"),
            ),
        )
        .otherwise(F.array().cast("array<long>"))
        .alias("_hs"),
    ).select(id_col, "_hs", F.size("_hs").alias("_m"))

    st = staged.select(
        id_col, _winnow_picks_expr(F.col("_hs"), F.col("_m"), w).alias("_picks")
    )
    kept = _winnow_consec_dedup_expr("_picks")
    return st.select(id_col, F.explode(kept).alias("p")).select(
        id_col, F.col("p.pos").alias("pos"), F.col("p.fp").alias("fp")
    )


def _winnow_picks_expr(hs: Column, m: Column, w: int) -> Column:
    """The winnowing window-pick scan as ONE expression over a BOUND
    gram-hash array column ``hs`` (with ``m`` = size(hs) also bound —
    the no-CSE staging rule): one struct per window, (rightmost-argmin
    position, min hash), pre-dedup. Shared by winnowing_fingerprints
    and the fused winnowing_parameter_table so the two can never
    drift on the pick rule.

    ``w`` is a plain Python int, so the window scan UNROLLS to
    element_at reads + one least() + a rightmost-first when-chain —
    the slice/reverse/array_position form allocated ~4 array copies
    PER WINDOW (~14.5M windows at sf0.1 => ~60M short-lived arrays,
    GC-bound; measured r14: t43 6.7 -> 3.6s). least() over longs is
    exactly array_min(slice), and checking the RIGHTMOST element
    first reproduces the reversed-array_position tiebreak, so the
    pick is value-identical."""

    def window_pick(i):
        elems = [F.element_at(hs, i + F.lit(j)) for j in range(w)]
        mn = F.least(*elems) if w > 1 else elems[0]
        if w > 1:
            pos = F.when(elems[w - 1] == mn, i + F.lit(w - 1))
            for j in range(w - 2, 0, -1):
                pos = pos.when(elems[j] == mn, i + F.lit(j))
            pos = pos.otherwise(i)
        else:
            pos = i
        return F.struct(pos.cast("int").alias("pos"), mn.alias("fp"))

    return (
        F.when(m >= w, F.transform(F.sequence(F.lit(1), m - w + 1), window_pick))
        .when(
            m > 0,
            F.array(
                F.struct(
                    (m + 1 - F.array_position(F.reverse(hs), F.array_min(hs)))
                    .cast("int")
                    .alias("pos"),
                    F.array_min(hs).alias("fp"),
                )
            ),
        )
        .otherwise(F.array().cast("array<struct<pos:int,fp:long>>"))
    )


def _winnow_consec_dedup_expr(picks_col: str) -> Column:
    """Pick dedup via an O(n) consecutive-run filter over the BOUND
    picks column named ``picks_col``, NOT array_distinct: a position
    can only be picked by the consecutive windows that contain it (an
    intermediate window picking elsewhere implies a smaller hash that
    would also beat it in the later window), so duplicate picks always
    form consecutive runs — keep a pick iff it differs from its
    predecessor. array_distinct on an array of structs is an O(n^2)
    interpreted comparison per doc (measured 10-14s vs 6.7-7.0s at
    sf0.1), and a post-explode .distinct() would add the family's only
    shuffle; the picks column must be staged (bound) first — the
    filter lambda reads it twice (the no-CSE rule).

    element_at is 1-based and the filter index 0-based, so
    element_at(picks, i) IS the predecessor for i >= 1; the
    greatest(i, 1) clamp keeps the index valid at i == 0 (where the
    self-compare is false and the i == 0 arm keeps the pick) without
    betting on boolean short-circuit order — element_at(_, 0) throws."""
    return F.filter(
        F.col(picks_col),
        lambda p, i: (i == F.lit(0))
        | (
            p["pos"]
            != F.element_at(F.col(picks_col), F.greatest(i, F.lit(1)))["pos"]
        ),
    )


def winnowing_parameter_table(
    docs: DataFrame,
    params: tuple = ((8, 4), (8, 8), (12, 4), (12, 8)),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The winnowing (k, w) DECISION TABLE — the d18 discipline applied
    to t43's two knobs: per candidate parameter pair, the GUARANTEE
    (any shared substring of >= w + k - 1 chars shares a fingerprint
    — what the sketch promises) against the COST (selection density:
    expected ~2/(w+1) of the gram count, plus the measured density on
    THIS corpus, which also prices the d25/d27 join surface since
    fingerprint rows are its input). Raising w trades detection
    granularity for a sparser join; raising k shrinks incidental
    8-char-gram collisions (the r13 d25 rung's synthetic-corpus
    hotspot) at the cost of missing shorter copies. Run this before
    pinning parameters on a new corpus, exactly like d18 prices
    (bands, rows) and d20 prices max_df.

    ONE corpus scan for the whole table (r14 optimization; was one
    winnowing scan + one gram-count scan PER pair — 8 full passes for
    the default grid): the gram-hash array is computed once per
    DISTINCT k as a bound column (the md5 hashing is the family's
    dominant per-row cost and is identical across w values), every
    (k, w) pair's window-pick/consec-dedup count reads its k's bound
    array (the staged no-CSE discipline — multi-referenced non-cheap
    aliases are exempt from CollapseProject, so each array
    materializes once per row), and a single aggregate sums all
    per-pair fingerprint counts and per-k gram counts in one pass.
    The pick logic is ``_winnow_picks_expr``/``_winnow_consec_dedup_expr``
    — the SAME definitions winnowing_fingerprints explodes, so count
    identity holds by construction (n_fingerprints = sum of kept-array
    sizes = count of exploded rows). Still row-local and shuffle-free;
    |params| rows out via one explode of the aggregated row. Expected
    density and measured density ride the 1e6 micro lattice
    (exact-integer division, engine-identical). Returns (k, w,
    guarantee_len, n_grams, n_fingerprints, expected_density_micro,
    measured_density_micro)."""
    for k, w in params:
        if k < 1 or w < 1:
            raise ValueError("winnowing needs k >= 1 and w >= 1")
    pairs = list(dict.fromkeys(params))  # unique (k, w), first-seen order
    ks = list(dict.fromkeys(k for k, _ in pairs))
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    stage0 = docs.select(t.alias("_t"), F.length(t).alias("_n"))
    # one bound hash array + gram count per distinct k (the fused
    # transform from winnowing_fingerprints, verbatim); the lambda is
    # built by a factory — a kk=k default arg would change the lambda's
    # ARITY and make F.transform pass the element index as kk
    def _gram_hash(kk):
        return lambda i: F.conv(
            F.substring(F.md5(F.substring(F.col("_t"), i, kk)), 1, 8), 16, 10
        ).cast("long")

    stage1 = stage0.select(
        *[
            F.when(
                F.col("_n") >= k,
                F.transform(
                    F.sequence(F.lit(1), F.col("_n") - k + 1), _gram_hash(k)
                ),
            )
            .otherwise(F.array().cast("array<long>"))
            .alias(f"_hs{k}")
            for k in ks
        ],
        *[
            F.when(F.col("_n") >= k, F.col("_n") - k + 1)
            .otherwise(F.lit(0))
            .cast("long")
            .alias(f"_g{k}")
            for k in ks
        ],
    )
    gcols = [f"_g{k}" for k in ks]
    stage2 = stage1.select(
        *gcols,
        *[F.col(f"_hs{k}") for k in ks],
        *[F.size(f"_hs{k}").alias(f"_m{k}") for k in ks],
    )
    stage3 = stage2.select(
        *gcols,
        *[
            _winnow_picks_expr(F.col(f"_hs{k}"), F.col(f"_m{k}"), w).alias(
                f"_p_{k}_{w}"
            )
            for k, w in pairs
        ],
    )
    stage4 = stage3.select(
        *gcols,
        *[
            F.size(_winnow_consec_dedup_expr(f"_p_{k}_{w}"))
            .cast("long")
            .alias(f"_f_{k}_{w}")
            for k, w in pairs
        ],
    )
    # empty corpus: sum() is NULL — n_fingerprints coalesces to 0 (the
    # explode-count form's value) while n_grams stays NULL (the sum
    # form's value), matching the per-pair implementation exactly
    agged = stage4.agg(
        *[F.sum(f"_g{k}").alias(f"_ng{k}") for k in ks],
        *[
            F.coalesce(F.sum(f"_f_{k}_{w}"), F.lit(0))
            .cast("long")
            .alias(f"_nf_{k}_{w}")
            for k, w in pairs
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(k).cast("int").alias("k"),
                F.lit(w).cast("int").alias("w"),
                F.lit(w + k - 1).cast("int").alias("guarantee_len"),
                F.col(f"_ng{k}").alias("n_grams"),
                F.col(f"_nf_{k}_{w}").alias("n_fingerprints"),
                F.lit(round(2 / (w + 1) * 1e6)).cast("long").alias(
                    "expected_density_micro"
                ),
                # NULL density when the corpus has zero grams (every
                # doc shorter than k) — ANSI mode makes an unguarded
                # /0 a hard error, the t02 lesson
                F.when(
                    F.col(f"_ng{k}") > 0,
                    F.round(F.col(f"_nf_{k}_{w}") * 1e6 / F.col(f"_ng{k}")),
                )
                .cast("long")
                .alias("measured_density_micro"),
            )
            for k, w in params
        ]
    )
    return agged.select(F.explode(rows).alias("r")).select("r.*")


# rule name -> the feature column its predicate reads (t16's rules;
# one map drives t45's unpivot so a rule cannot silently lose its
# feature pairing)
GOPHER_RULE_FEATURES = {
    "word_count": "n_words",
    "mean_word_len": "mean_word_len",
    "symbol_ratio": "symbol_word_ratio",
    "bullet_lines": "bullet_line_frac",
    "ellipsis_lines": "ellipsis_line_frac",
    "alpha_words": "alpha_word_frac",
    "stopword_hits": "stopword_hits",
    "dup_words": "dup_word_frac",
    "top_bigram": "top_bigram_frac",
}


def gopher_rule_quantiles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    probs: tuple = (0.05, 0.25, 0.5, 0.75, 0.95),
    **gopher_kwargs,
) -> DataFrame:
    """The Gopher gate's THRESHOLD-TUNING table — the d18/t44 decision
    -table discipline applied to t16's nine knobs: per rule, the exact
    interpolated quantiles of its feature ON THIS CORPUS next to the
    fraction the current threshold rejects. Rae et al. published
    thresholds tuned for their crawl mix; on a different corpus the
    same thresholds can silently reject half a source (or nothing),
    and the keep-rate alone cannot say which rule did it or where the
    knee sits. Read this before re-pinning any gate parameter, exactly
    like d18 prices (bands, rows) and t44 prices (k, w).

    One gate scan (the staged t16 projection), one row-local unpivot
    to (rule, value, failed) — NINE rows per doc, no join — and one
    rule-grain aggregate; 9 rows out. NULL features ("not measurable":
    empty docs, <2-word repetition rules) are excluded by the
    percentile but counted in n_docs - n_measurable. Returns (rule,
    n_docs, n_measurable, n_failed, fail_frac, p05..p95 rounded 4)."""
    g = gopher_filter(docs, id_col, text_col, **gopher_kwargs)
    entries = [
        F.struct(
            F.lit(rule).alias("rule"),
            F.col(feat).cast("double").alias("value"),
            F.array_contains(F.col("fail_reasons"), rule).alias("failed"),
        )
        for rule, feat in GOPHER_RULE_FEATURES.items()
    ]
    long = g.select(F.explode(F.array(*entries)).alias("e")).select(
        "e.rule", "e.value", "e.failed"
    )
    aggs = [
        F.count("*").cast("long").alias("n_docs"),
        F.count("value").cast("long").alias("n_measurable"),
        F.sum(F.col("failed").cast("int")).cast("long").alias("n_failed"),
        F.round(F.sum(F.col("failed").cast("int")) / F.count("*"), 4).alias(
            "fail_frac"
        ),
    ]
    for p in probs:
        aggs.append(
            F.round(F.expr(f"percentile(value, {p})"), 4).alias(
                f"p{int(round(p * 100)):02d}"
            )
        )
    return long.groupBy("rule").agg(*aggs)


def unicode_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Encoding-corruption signals at document grain — the cleaning
    gate the Gopher rules structurally miss: mojibake (a cascade of
    U+FFFD replacement characters from a bad charset guess), binary
    junk decoded as text (C0 control characters), and
    unexpectedly-non-ASCII content in a source declared ASCII all
    pass word-grain quality rules while poisoning the tokenizer.
    CCNet-style pipelines run exactly this class of check before
    language ID (a corrupted doc language-IDs as noise).

    Pure row-local regexp counting over one scan — zero shuffles,
    zero Python, the t02 shape. Newline/tab/CR are formatting, NOT
    control junk here. ``suspect`` pins the conservative rule: any
    replacement char, any control char, or a majority-non-ASCII doc.
    Returns (doc_id, n_chars, n_nonascii, nonascii_frac, n_control,
    n_replacement, suspect)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    staged = docs.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        F.size(F.regexp_extract_all(t, F.lit(r"[^\x00-\x7F]"), 0))
        .cast("long")
        .alias("n_nonascii"),
        F.size(
            F.regexp_extract_all(
                t, F.lit(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"), 0
            )
        )
        .cast("long")
        .alias("n_control"),
        F.size(F.regexp_extract_all(t, F.lit("�"), 0))
        .cast("long")
        .alias("n_replacement"),
    )
    frac = F.when(
        F.col("n_chars") > 0, F.round(F.col("n_nonascii") / F.col("n_chars"), 4)
    )
    return staged.select(
        id_col,
        "n_chars",
        "n_nonascii",
        frac.alias("nonascii_frac"),
        "n_control",
        "n_replacement",
        (
            (F.col("n_replacement") > 0)
            | (F.col("n_control") > 0)
            | F.coalesce(frac > 0.5, F.lit(False))
        ).alias("suspect"),
    )
