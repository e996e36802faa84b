"""Windowed ingest-quality metrics for continuous corpus pipelines.

A production crawl ingest needs a MONITORING surface beside the data
path: when a source starts shipping junk (a parser regression, a new
spam campaign), the gate's per-window fail-reason mix is the first
signal — long before corpus-level stats move. This stream derives it
from the same ``gopher_filter`` the data path runs, so the monitor can
never disagree with the gate about why a document dropped.

Scale: state is bounded by (window x source x reason) cardinality and
the watermark expires it; the corpus-sized input passes through one
stateless projection + explode before the windowed count, exactly like
the usage stream (SURVEY.md T3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gate_metrics(
    docs: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    **gopher_kwargs,
) -> DataFrame:
    """Per (window, source, outcome) document counts, where ``outcome``
    is ``kept`` or one Gopher fail reason — a document failing N rules
    counts once under EACH (the mix is a diagnosis surface, so partial
    attributions would hide co-occurring regressions); ``kept`` rows
    count once. Works on static frames (no window/watermark columns
    required beyond ``ts_col``; the batch form is the oracle replay) and
    on streams (append mode after the watermark closes a window).

    Returns (window_start, window_end, source, outcome, n_docs).
    ``gopher_kwargs`` pass through to the gate so the monitor scores
    with the SAME thresholds as the data path."""
    from ..pipeline.text import gopher_filter

    gated = gopher_filter(
        docs, id_col=id_col, text_col=text_col, passthrough=True, **gopher_kwargs
    )
    outcome = F.explode(
        F.when(F.col("keep"), F.array(F.lit("kept"))).otherwise(
            F.col("fail_reasons")
        )
    ).alias("outcome")
    rows = gated.select(F.col(ts_col), F.col(source_col), outcome)
    if docs.isStreaming:
        rows = rows.withWatermark(ts_col, watermark)
    return (
        rows.groupBy(F.window(ts_col, window), source_col, "outcome")
        .agg(F.count("*").alias("n_docs"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            source_col,
            "outcome",
            "n_docs",
        )
    )


def heavy_hitter_stream(
    docs: DataFrame,
    budget: int = 1024,
    n_buckets: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """Streaming Misra-Gries heavy-hitter monitor — the t37 candidate
    pass as a continuously-maintained stream state: per token-hash
    bucket, a bounded MG summary folds each micro-batch's token counts
    in, and every invocation emits the bucket's current survivors.
    The boilerplate/spam-campaign detector that runs BESIDE the ingest
    path: a token surging into a bucket's survivor set mid-stream is
    the first signal of a template flood, hours before corpus-level
    stats move.

    Two properties make this the rare stateful stream with NO ordering
    machinery: counting is COMMUTATIVE (late or re-ordered deliveries
    just add — no watermark buffering, no in-order release, contrast
    funnel_state_stream's pending buffer), and the mergeable-MG
    reduction gives the same completeness guarantee as the batch form
    — a token whose stream-to-date count exceeds N_bucket/budget is in
    its bucket's summary, so with budget >= k every k-heavy-hitter of
    the stream so far survives. Sharding state by ``xxhash64(token) %
    n_buckets`` bounds each state row at ``budget`` counters AND
    spreads the fold across the cluster (a single global MG would
    serialize on one task); a token lives wholly in one bucket, so
    per-bucket counts ARE global counts.

    Emissions (append mode): (bucket, emit_seq, token, mg_count,
    bucket_total) — one row per surviving token per fold, bounded by
    budget x buckets per micro-batch. ``heavy_hitter_candidates``
    reduces a run's emissions to the final candidate set + stream
    total; exact counts come from the t37 pass-2 recount over the
    archived corpus (candidates are a guaranteed superset of the true
    heavy set — asserted against heavy_hitter_tokens in tests).
    ``mg_count`` is the summary's UNDERCOUNT (never above truth) — a
    display hint, not the answer."""
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
                lambda w: F.length(w) > 0,
            )
        ).alias("token")
    ).withColumn("bucket", F.pmod(F.xxhash64("token"), F.lit(n_buckets)).cast("int"))

    out_schema = T.StructType(
        [
            T.StructField("bucket", T.IntegerType()),
            T.StructField("emit_seq", T.LongType()),
            T.StructField("token", T.StringType()),
            T.StructField("mg_count", T.LongType()),
            T.StructField("bucket_total", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("emit_seq", T.LongType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("counts", T.ArrayType(T.LongType())),
            T.StructField("total", T.LongType()),
        ]
    )

    def fold(key, pdfs, state):
        import collections

        from datacatalog_tag_engine_spark.pipeline.text import _mg_reduce

        if state.exists:
            emit_seq, tokens, counts, total = state.get
            counters = collections.Counter(dict(zip(tokens, counts)))
        else:
            emit_seq, counters, total = 0, collections.Counter(), 0
        for pdf in pdfs:
            total += len(pdf)
            counters.update(pdf["token"].value_counts().to_dict())
            counters = _mg_reduce(counters, budget)
        emit_seq += 1
        state.update(
            (emit_seq, list(counters.keys()), [int(c) for c in counters.values()], total)
        )
        # a NULL-token marker row rides every fold: the summary can
        # legitimately reduce to EMPTY (a pure singleton tail cancels
        # itself out), and without the marker that fold would emit
        # nothing — heavy_hitter_candidates would then sum a STALE
        # bucket_total (undercounting N, letting sub-threshold tokens
        # pass the exact recount) and report the previous fold's
        # survivors as current
        yield pd.DataFrame(
            {
                "bucket": key[0],
                "emit_seq": emit_seq,
                "token": list(counters.keys()) + [None],
                "mg_count": [int(c) for c in counters.values()] + [None],
                "bucket_total": total,
            }
        )

    return toks.groupBy("bucket").applyInPandasWithState(
        fold, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def heavy_hitter_candidates(emissions: DataFrame) -> DataFrame:
    """Reduce a heavy_hitter_stream run's emissions to the CURRENT
    candidate set: each bucket's latest fold wins (max emit_seq — the
    funnel_counts_finish discipline), candidates are its surviving
    tokens, and ``n_total`` (the same on every output row) is the
    stream-to-date token count summed across buckets' latest totals.
    Feed the candidates to the t37 pass-2 recount for exact counts."""
    from pyspark.sql import Window

    # window-max instead of a self-join: emissions is typically a
    # memory-sink view, and joining a frame to its own aggregate trips
    # Spark's conflicting-reference resolution; the window is
    # bucket-grain anyway (emissions are candidate-bounded)
    w = Window.partitionBy("bucket")
    rows = emissions.withColumn("_mx", F.max("emit_seq").over(w)).filter(
        F.col("emit_seq") == F.col("_mx")
    )
    totals = (
        rows.groupBy("bucket")
        .agg(F.first("bucket_total").alias("bt"))
        .agg(F.sum("bt").alias("n_total"))
    )
    # drop the per-fold marker rows (token NULL) — they exist so an
    # EMPTY summary still registers its fold and bucket_total above
    return (
        rows.filter(F.col("token").isNotNull())
        .select("token", "mg_count")
        .crossJoin(F.broadcast(totals))
    )


def heavy_hitter_replay(
    docs: DataFrame,
    k: int = 100,
    budget: int = 1024,
    n_buckets: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """Batch replay of the monitor loop — the q78/q85 discipline
    applied to the heavy-hitter stream: the stream's STATE GRAIN
    (per-token-hash-bucket Misra-Gries summaries, the exact rows
    ``heavy_hitter_stream`` holds in ``applyInPandasWithState``)
    computed in batch with the SAME ``_mg_reduce`` fold and the same
    emission schema (marker row included), reduced by
    ``heavy_hitter_candidates``, then recounted exactly against the
    corpus — the full monitor loop the stream runs continuously,
    replayed end to end in one batch job.

    Counting is commutative and the MG guarantee is order-free AND
    merge-closed (Agarwal et al., PODS'12: merging per-shard MG
    summaries by summing counters and re-reducing keeps the error
    bound, so every token with count > N_bucket/budget survives), so
    the replay's candidate set is — like the stream's — a guaranteed
    superset of the true heavy set, and the exact recount makes the
    final answer identical to ``heavy_hitter_tokens(docs, k)``. That
    identity is the driver oracle (the t37 SQL verbatim); the
    multi-micro-batch fold parity is pinned separately in the
    stream==batch pytest.

    Memory shape (review finding, fixed): the per-bucket fold is TWO
    bounded passes, never a whole-bucket materialization — pass A is a
    ``mapInPandas`` partition scan holding n_buckets x budget counters
    (Arrow batches stream through; nothing group-sized is collected),
    pass B merges each bucket's per-partition SUMMARIES (partitions x
    (budget + 1) rows per bucket — candidate-grain) with the same
    ``_mg_reduce``. A single ``applyInPandas`` over the raw token
    stream would load ~1/n_buckets of ALL corpus token occurrences
    into one pandas frame, exactly the unbounded state the MG summary
    exists to avoid.

    Returns (token, n_occurrences), deterministic."""
    import pandas as pd

    from ..pipeline.text import _mg_reduce

    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
                lambda w: F.length(w) > 0,
            )
        ).alias("token")
    ).withColumn("bucket", F.pmod(F.xxhash64("token"), F.lit(n_buckets)).cast("int"))

    def part_fold(batches):
        # pass A: one bounded MG summary per (partition, bucket);
        # marker row (token NULL) carries the partition-bucket total
        import collections

        counters: dict = collections.defaultdict(collections.Counter)
        totals: collections.Counter = collections.Counter()
        for pdf in batches:
            for b, sub in pdf.groupby("bucket"):
                totals[int(b)] += len(sub)
                counters[int(b)].update(sub["token"].value_counts().to_dict())
                counters[int(b)] = _mg_reduce(counters[int(b)], budget)
        out = {"bucket": [], "token": [], "n": [], "total": []}
        for b, tot in totals.items():
            for t, c in counters[b].items():
                out["bucket"].append(b)
                out["token"].append(t)
                out["n"].append(int(c))
                out["total"].append(0)
            out["bucket"].append(b)
            out["token"].append(None)
            out["n"].append(0)
            out["total"].append(int(tot))
        yield pd.DataFrame(out)

    partials = toks.mapInPandas(
        part_fold, schema="bucket int, token string, n long, total long"
    )

    def bucket_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        # pass B: candidate-grain input (partitions x (budget+1) rows),
        # mergeable-summaries reduction + the stream emission schema
        import collections

        cand = pdf[pdf["token"].notna()]
        counters = collections.Counter()
        for t, c in zip(cand["token"], cand["n"]):
            counters[t] += int(c)
        counters = _mg_reduce(counters, budget)
        total = int(pdf["total"].sum())
        return pd.DataFrame(
            {
                "bucket": pdf["bucket"].iloc[0],
                "emit_seq": 1,
                "token": list(counters.keys()) + [None],
                "mg_count": [int(c) for c in counters.values()] + [None],
                "bucket_total": total,
            }
        )

    emissions = partials.groupBy("bucket").applyInPandas(
        bucket_merge,
        schema="bucket int, emit_seq long, token string, mg_count long, bucket_total long",
    )
    cands = heavy_hitter_candidates(emissions).localCheckpoint(eager=True)
    n_total = int(cands.agg(F.max("n_total")).collect()[0][0] or 0)
    counted = (
        toks.join(F.broadcast(cands.select("token").distinct()), "token")
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
    )
    return counted.filter(F.col("n_occurrences") * k > F.lit(n_total)).select(
        "token", F.col("n_occurrences").cast("long").alias("n_occurrences")
    )
