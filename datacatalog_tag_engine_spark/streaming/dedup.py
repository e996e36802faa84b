"""Streaming ingest dedup for training-data pipelines.

A continuous crawl delivers documents at-least-once (retries,
re-fetches, mirrored sources). This operator drops re-deliveries and
near-identical re-crawls inside a watermark horizon using
``dropDuplicatesWithinWatermark`` on the content fingerprint — Spark
keeps one state row per fingerprint and expires it when the watermark
passes, so state size tracks the horizon's ingest volume, never the
corpus (the batch-side exact form over full history is
pipeline.dedup.incremental_delta's anti-join).

Same at-least-once-to-effectively-once pattern as the tag-history
stream (SURVEY T4): idempotency comes from a deterministic key, not
from the delivery layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline.dedup import bow_fingerprint


def dedup_stream(
    docs: DataFrame,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Append-mode stream of first-seen documents: later deliveries with
    the same bag-of-words fingerprint inside the watermark horizon drop.
    Works on static frames too, where "first-seen" is DETERMINISTIC:
    the earliest ``ts_col`` row per fingerprint wins, ties (and rows
    with a NULL or absent timestamp) break on the full row's total
    order — a min_by aggregate; plain dropDuplicates keeps whichever
    row a task sees first, which varies with partitioning and would
    make the batch replay of a stream flaky."""
    with_fp = docs.withColumn("fingerprint", bow_fingerprint(F.col(text_col)))
    if not docs.isStreaming:
        # the ordering key is a STRUCT so min_by never sees a bare NULL
        # (it skips null ordering values — a group of all-NULL-ts rows
        # would otherwise collapse to a null row): known timestamps
        # sort before unknown, then ts, then the whole row as tiebreak.
        # Static frames without a ts column order purely by row.
        parts = []
        if ts_col in with_fp.columns:
            parts = [F.col(ts_col).isNull(), F.col(ts_col)]
        order = F.struct(*parts, F.struct(*with_fp.columns))
        return (
            with_fp.groupBy("fingerprint")
            .agg(F.min_by(F.struct(*with_fp.columns), order).alias("_r"))
            .select("_r.*")
        )
    return with_fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )


def clean_ingest_stream(
    docs: DataFrame,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = False,
    **gopher_kwargs,
) -> DataFrame:
    """Continuous corpus ingest = quality gate -> dedup, as one stream:
    documents failing the Gopher rules drop immediately (stateless scan
    projection — no state, no watermark interaction), then surviving
    re-deliveries/re-crawls dedup within the watermark horizon
    (``dedup_stream``'s one-state-row-per-fingerprint).

    The gate runs FIRST deliberately: junk documents never enter the
    dedup state store, so state size tracks the CLEAN ingest volume.
    Works on static frames too (the batch oracle replays it: same
    filter, then ``dedup_stream``'s deterministic earliest-``ts_col``
    keep-first).

    ``normalize=True`` prepends ``pipeline.text.normalize_text`` (also
    a stateless projection) so the gate's thresholds and the dedup
    fingerprint both see normalized text — two re-crawls differing only
    in curly quotes or NBSP runs dedup to one state row instead of two.

    ``gopher_kwargs`` pass through to ``pipeline.text.gopher_filter``
    (thresholds). Output = the surviving documents' original columns
    (``text_col`` normalized when requested) plus the content
    fingerprint.
    """
    from ..pipeline.text import gopher_filter, normalize_text

    if normalize:
        docs = normalize_text(docs, id_col=id_col, text_col=text_col, passthrough=True)
    if docs.isStreaming:
        # streaming plans cannot localCheckpoint; micro-batches are
        # small enough that the collapsed gate filter is acceptable
        gated = (
            gopher_filter(docs, id_col=id_col, text_col=text_col, passthrough=True, **gopher_kwargs)
            .filter("keep")
            .select(*docs.columns)
        )
    else:
        # batch replay: materialize the thin (id, keep) stream before
        # filtering on it — `filter("keep")` would inline the staged
        # gate features ~30x into one pushed-down Filter predicate
        # (FilterExec gets no subexpression elimination; ProjectExec
        # does). Semi-join the survivors back. q98/gate_mixture_drift
        # barrier discipline.
        flags = (
            gopher_filter(docs, id_col=id_col, text_col=text_col, **gopher_kwargs)
            .select(id_col, "keep")
            .localCheckpoint(eager=True)
        )
        gated = docs.join(
            flags.filter("keep").select(id_col), id_col, "left_semi"
        ).select(*docs.columns)
    return dedup_stream(gated, watermark=watermark, ts_col=ts_col, text_col=text_col)


def sigstore_ingest_stream(
    stream_docs: DataFrame,
    store_path: str,
    accepted_sink: str,
    checkpoint: str,
    text_col: str = "text",
    bands: int = 4,
    threshold: float = 0.5,
    metrics_sink: str | None = None,
):
    """The daily dedup loop as a CONTINUOUS micro-batch pipeline — the
    streaming form of the d23 signature-store serving path: each
    micro-batch of crawled documents is near-dup-checked against the
    persisted signature store at SIGNATURE grain (resident text never
    re-read), survivors are appended to ``accepted_sink`` (parquet)
    AND their signatures appended to the store, so the NEXT
    micro-batch dedups against everything accepted so far. Run it on
    a file-source stream over crawl drops and the archive maintains
    itself.

    ``foreachBatch`` rather than a stateful operator, deliberately:
    the dedup state here IS the persisted store (unbounded corpus
    lifetime — the wrong shape for watermark-expiring stream state;
    contrast ``dedup_stream``, whose horizon is minutes), and
    foreachBatch gives exactly-once-per-batch semantics against it:
    Spark retries a failed batch with the same batch_id, the corpus
    sink write is batch_id-KEYED (``batch=<id>`` subdirectory,
    overwrite mode — a retry after a partial success replaces its own
    output instead of appending a duplicate copy; review finding), and
    ``append_to_signature_store``'s resident anti-join makes the store
    half of the retry idempotent (the torn-append recovery contract,
    pytest-certified) — at-least-once delivery, effectively-once
    corpus AND store growth. Within a batch, earlier-id wins among
    near-dup pairs (the canonical lowest-id rule applied batch-locally
    via the pair list's doc_b side).

    Returns the StreamingQuery; stream==batch parity (the final store
    and accepted set equal the sequential batch replay over the same
    micro-batches, ``sigstore_ingest_replay``) is pinned in tests."""

    def process(batch: DataFrame, batch_id: int) -> None:
        _sigstore_ingest_batch(
            batch.sparkSession,
            batch,
            batch_id,
            store_path,
            accepted_sink,
            text_col=text_col,
            bands=bands,
            threshold=threshold,
            metrics_sink=metrics_sink,
        )

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _sigstore_ingest_batch(
    spark,
    batch: DataFrame,
    batch_id: int,
    store_path: str,
    accepted_sink: str,
    text_col: str = "text",
    bands: int = 4,
    threshold: float = 0.5,
    metrics_sink: str | None = None,
) -> None:
    """One micro-batch of the signature-store ingest loop — the single
    copy both the stream (``foreachBatch``) and the batch replay
    (``sigstore_ingest_replay``, the driver-certified form) run.

    Retry safety is the subtle part (review finding): a batch that
    crashed AFTER ``append_to_signature_store`` but BEFORE the stream
    checkpoint commit is re-delivered by Spark with the same batch_id,
    and by then the store already holds the batch's own survivors'
    signatures — re-adjudicating the whole batch would violate
    ``incremental_neardup_pairs``' unique-id contract (a survivor's
    signatures appear delta-side AND resident-side, it pairs with its
    batch-mates as is_cross, lands in losers, and the batch-keyed sink
    overwrite permanently drops an already-accepted document while its
    signatures stay resident). So the batch is split against the
    store's RESIDENT id set first: ids already in the store were
    accepted by the crashed attempt and re-emit as survivors without
    re-adjudication; only genuinely new ids are paired (against a
    store that now includes the earlier survivors — a prior loser
    still loses, now as a cross pair). On a clean first run the split
    is a no-op (the q51 delta contract: batch ids are new). The
    resident-id scan is column-pruned to the id and is the same scan
    ``append_to_signature_store``'s idempotence already pays.

    The id column comes from the store's ``_sigstore_meta`` (never a
    hardcoded name), so a store built with a different ``id_col``
    adjudicates and joins on its own id semantics (review finding).

    ``metrics_sink`` (optional) writes one acceptance-accounting row
    per batch to ``{metrics_sink}/batch=<id>`` (overwrite — retry-
    idempotent like the corpus sink): (n_in, n_accepted,
    n_cross_losers, n_within_losers). Loser counts are evidence
    counts, not a partition: a doc near-dup of both the archive and a
    batch-mate appears in both. On a RETRY the loser counts reflect
    the retry's (smaller) re-adjudication while n_in/n_accepted stay
    whole-batch — documented, since only clean runs feed the batch
    replay's oracle."""
    from ..pipeline.dedup import (
        _sigstore_meta,
        append_to_signature_store,
        incremental_neardup_from_store,
    )
    from ..session import free_local_checkpoint

    id_col = _sigstore_meta(spark, store_path)["id_col"]
    batch = batch.localCheckpoint(eager=True)
    resident_ids = spark.read.parquet(store_path).select(id_col)
    already = batch.join(resident_ids, id_col, "left_semi")
    fresh = batch.join(resident_ids, id_col, "left_anti")
    pairs = incremental_neardup_from_store(
        spark, store_path, fresh, text_col, bands, threshold
    )
    if metrics_sink is not None:
        # the metrics counts below would each replay the candidate
        # join's full lineage; one eager materialization of the
        # pair-grain (tiny) result serves the loser join AND both
        # counts, freed before return
        pairs = pairs.localCheckpoint(eager=True)
    # drop fresh docs near-dup of the resident corpus OR of an
    # earlier-id batch-mate (doc_b is always the larger id within
    # cross=False pairs; cross pairs carry the batch doc on either
    # side, so take both roles' batch members)
    losers = (
        pairs.select(F.col("doc_b").alias(id_col))
        .union(pairs.filter("is_cross").select(F.col("doc_a").alias(id_col)))
        .distinct()
        .join(fresh.select(id_col), id_col, "left_semi")
    )
    survivors = (
        fresh.join(losers, id_col, "left_anti")
        .unionByName(already)
        .localCheckpoint(eager=True)
    )
    survivors.write.mode("overwrite").parquet(f"{accepted_sink}/batch={batch_id}")
    append_to_signature_store(spark, store_path, survivors, text_col)
    if metrics_sink is not None:
        # pair-grain accounting only — the corpus is never re-scanned;
        # loser counts restrict to fresh ids (the pair list can carry
        # resident ids on either side of a cross pair). These counts
        # run AFTER the store append, but that cannot skew them: every
        # doc they count is a LOSER, and losers are never appended (a
        # re-listed store would only remove this batch's survivors
        # from `fresh`, which no loser count reads).
        fresh_ids = fresh.select(id_col)
        n_cross = (
            pairs.filter("is_cross")
            .select(F.col("doc_a").alias(id_col))
            .unionAll(pairs.filter("is_cross").select(F.col("doc_b").alias(id_col)))
            .join(fresh_ids, id_col, "left_semi")
            .distinct()
            .count()
        )
        n_within = (
            pairs.filter(~F.col("is_cross"))
            .select(F.col("doc_b").alias(id_col))
            .join(fresh_ids, id_col, "left_semi")
            .distinct()
            .count()
        )
        spark.createDataFrame(
            [(batch.count(), survivors.count(), n_cross, n_within)],
            "n_in long, n_accepted long, n_cross_losers long, n_within_losers long",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{metrics_sink}/batch={batch_id}"
        )
        free_local_checkpoint(pairs)
    free_local_checkpoint(batch)
    free_local_checkpoint(survivors)


def sigstore_ingest_replay(
    spark,
    store_path: str,
    batches: list[DataFrame],
    accepted_sink: str,
    text_col: str = "text",
    bands: int = 4,
    threshold: float = 0.5,
    metrics_sink: str | None = None,
) -> DataFrame:
    """Sequential batch replay of the continuous ingest loop — the
    q78/q85/q99 pattern that gives the stream its driver-certifiable
    batch form: each crawl drop runs the SAME ``_sigstore_ingest_batch``
    the ``foreachBatch`` stream runs, in drop order, against the same
    persisted store. Returns the accepted corpus read back from the
    batch-keyed sink: (batch, id..., original columns) — one row per
    accepted document, ``batch`` recording which drop admitted it.
    stream==replay equality over identical drops is pinned in tests;
    the replay's relational oracle (the unrolled per-stage d19
    derivation) certifies both."""
    for i, b in enumerate(batches):
        _sigstore_ingest_batch(
            spark,
            b,
            i,
            store_path,
            accepted_sink,
            text_col=text_col,
            bands=bands,
            threshold=threshold,
            metrics_sink=metrics_sink,
        )
    return spark.read.parquet(accepted_sink)


def ingest_rate_trend(metrics: DataFrame) -> DataFrame:
    """Acceptance-rate TREND over the sigstore ingest loop's metrics
    table (q103's output, one row per batch): per-batch acceptance on
    the 1e4 micro lattice plus the running accepted total — the two
    lines an ops dashboard actually plots over a crawl's drops. A
    falling accept rate is the loop working (the store saturating on a
    repetitive crawl) or the crawler looping (re-fetching yesterday);
    the cumulative line says which, because saturation flattens it
    while re-fetching flattens it AND n_in stays constant.

    The global window is ordered by batch over a metrics table whose
    row count IS the batch count (bounded by the loop's cadence, never
    by corpus size) — one partition of a dimension-sized frame, the
    q67 funnel-window shape. Returns (batch, n_in, n_accepted,
    accept_rate_micro, cum_accepted, cum_in)."""
    from pyspark.sql import Window

    w = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, 0)
    return metrics.select(
        F.col("batch").cast("int").alias("batch"),
        F.col("n_in").cast("long").alias("n_in"),
        F.col("n_accepted").cast("long").alias("n_accepted"),
        F.when(
            F.col("n_in") > 0,
            F.round(F.col("n_accepted") * 10000 / F.col("n_in")),
        )
        .cast("long")
        .alias("accept_rate_micro"),
        F.sum("n_accepted").over(w).cast("long").alias("cum_accepted"),
        F.sum("n_in").over(w).cast("long").alias("cum_in"),
    )
