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
