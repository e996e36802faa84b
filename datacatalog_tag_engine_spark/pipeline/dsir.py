"""DSIR-style importance resampling for training-data selection.

Implements the hashed n-gram importance-weight scheme of Xie et al.,
"Data Selection for Language Models via Importance Resampling"
(arXiv:2302.03169, public): the raw and target corpora are summarized
as bag-of-hashed-ngram (unigram + bigram) bucket distributions; every
raw document is scored by its log-likelihood ratio under the target vs
raw bucket models; selection draws a Gumbel-top-k sample, equivalent to
sampling-without-replacement proportional to softmax(score/temperature).

Everything is engine-portable and deterministic, matching the repo's
exact-replay conventions (unigram_logprob's lp6 micro-log-probs, PQ's
micro-unit distances): bucketing uses the md5 bucket from
``pipeline.sampling.hash_bucket`` (no JVM-specific hash), per-bucket
log-ratios quantize to integer micro-units (round(lr * 1e6) as long)
BEFORE the per-document sum — long addition is associative and exact,
so the sum is identical under any partitioning or engine, unlike a
float sum of rounded doubles — and the Gumbel noise derives from an
md5 uniform. The selected set replays exactly anywhere.

Scale shape (100 TB): the bucket table is ``buckets`` rows regardless
of corpus size — it broadcasts. The raw corpus explodes once into
(doc, bucket) pairs and aggregates on the uniform doc_id key (one
shuffle). The target corpus (a quality exemplar set — orders of
magnitude smaller) costs one extra pass. No driver-side collects.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _repartition_for_explode
from .sampling import hash_bucket
from .text import word_ngrams

BUCKETS = 10_000


def _gram_buckets(text_col: Column, buckets: int) -> Column:
    """Array of hashed-ngram bucket ids (with multiplicity) for one
    document: lowercase whitespace words, unigrams + bigrams — the
    multiplicity IS the bag-of-ngrams likelihood's term count."""
    words = F.filter(
        F.split(F.lower(text_col), r"\s+"), lambda w: F.length(w) > 0
    )
    grams = F.concat(words, word_ngrams(words, 2))
    return F.transform(grams, lambda g: hash_bucket(g, buckets))


def _bucket_counts(
    docs: DataFrame, text_col: str, buckets: int
) -> DataFrame:
    """(bucket, cnt): corpus-wide hashed-ngram occurrence counts. The
    pre-explode repartition spreads the CPU-heavy gram hashing across
    the cluster — corpora often arrive as few large files, and without
    it the explode runs on as many cores as input splits; keyless
    round-robin because the downstream groupBy is on bucket, not doc
    (see dedup._repartition_round_robin)."""
    from .dedup import _repartition_round_robin

    return (
        _repartition_round_robin(docs.select(text_col))
        .select(F.explode(_gram_buckets(F.col(text_col), buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_logratio(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    buckets: int = BUCKETS,
) -> tuple[DataFrame, int]:
    """Per-bucket importance log-ratio table in integer micro-units.

    Returns ``(table, default)`` where ``table`` is (bucket, lr6) for
    every bucket observed in either corpus and ``default`` is the value
    for never-observed buckets — both with add-one smoothing over the
    ``buckets``-sized vocabulary:

        lr6(b) = round((ln((c_t(b)+1)/(N_t+B)) - ln((c_r(b)+1)/(N_r+B))) * 1e6)

    as a long. Quantizing BEFORE the per-document sum makes the sum an
    exact integer — associative, so it replays identically on any
    engine or partitioning (a float sum of rounded doubles is
    order-dependent). The two corpus totals are the only driver-side
    values (two scalar aggregates)."""
    # persist() the bucket-grain count tables (<= ``buckets`` rows each,
    # LRU-evictable): the totals action below and the returned table
    # plan both read them, so each corpus pays ONE explode+aggregate for
    # the model — not one per consumer action
    raw_c = _bucket_counts(raw, text_col, buckets).persist()
    tgt_c = _bucket_counts(target, text_col, buckets).persist()
    # two scalar totals — dimension-sized driver reads, not collects
    n_raw = raw_c.agg(F.sum("cnt")).first()[0] or 0
    n_tgt = tgt_c.agg(F.sum("cnt")).first()[0] or 0
    denom_t = float(n_tgt + buckets)
    denom_r = float(n_raw + buckets)
    table = (
        raw_c.withColumnRenamed("cnt", "cnt_raw")
        .join(tgt_c.withColumnRenamed("cnt", "cnt_tgt"), "bucket", "full_outer")
        .select(
            "bucket",
            F.round(
                (
                    F.log((F.coalesce(F.col("cnt_tgt"), F.lit(0)) + 1) / F.lit(denom_t))
                    - F.log((F.coalesce(F.col("cnt_raw"), F.lit(0)) + 1) / F.lit(denom_r))
                )
                * 1_000_000
            )
            .cast("long")
            .alias("lr6"),
        )
    )
    default = int(round((math.log(1.0 / denom_t) - math.log(1.0 / denom_r)) * 1_000_000))
    return table, default


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = BUCKETS,
) -> DataFrame:
    """(doc_id, n_grams, dsir_score) for every raw document: the
    bag-of-hashed-ngrams log-likelihood ratio of target vs raw, the
    DSIR importance weight in log space. Documents with no grams score
    0.0 (empty product — kept, so downstream selection sees the whole
    corpus). The score is an exact integer micro-unit sum divided by
    1e6 at the output grain — one IEEE division of the same integer,
    bit-identical on every engine (no float-order drift, no rounding
    boundary to disagree on).

    Plan: bucket table broadcasts (``buckets`` rows), corpus explodes
    once, one shuffle on the uniform doc_id key."""
    table, default = dsir_logratio(raw, target, text_col, buckets)
    feats = _repartition_for_explode(raw.select(id_col, text_col), id_col).select(
        F.col(id_col),
        F.explode_outer(_gram_buckets(F.col(text_col), buckets)).alias("bucket"),
    )
    # the explode_outer NULL-bucket row (a doc with no grams at all)
    # must contribute 0, not the unseen-bucket default — only real
    # grams whose bucket missed the table take the smoothed default
    term = F.when(F.col("bucket").isNull(), F.lit(0).cast("long")).otherwise(
        F.coalesce(F.col("lr6"), F.lit(default).cast("long"))
    )
    return (
        feats.join(F.broadcast(table), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_grams"),
            (F.coalesce(F.sum(term), F.lit(0).cast("long")) / F.lit(1e6)).alias(
                "dsir_score"
            ),
        )
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    temperature: float | None = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = BUCKETS,
) -> DataFrame:
    """Select ``k`` raw documents by DSIR importance: Gumbel-top-k over
    ``dsir_score / temperature``, which samples without replacement
    with probability proportional to softmax of the tempered scores —
    the paper's resampling step. ``temperature=None`` (or 0) disables
    the noise: pure deterministic top-k by score.

    The Gumbel noise is hash-derived (md5 uniform, same construction as
    ``pipeline.sampling``), so the selected set is deterministic and
    engine-replayable; ties break on doc_id. Returns (doc_id, n_grams,
    dsir_score, selection_key) sorted by selection_key descending —
    a distributed top-k (TakeOrdered), never a full sort at the sink."""
    if temperature is not None and temperature < 0:
        raise ValueError(f"temperature must be >= 0, got {temperature}")
    w = dsir_weights(raw, target, id_col, text_col, buckets)
    if temperature:
        # u in (0,1): (md5_32(id)+0.5)/2^32 — never exactly 0 or 1, so
        # -ln(-ln(u)) is always finite
        u = (
            F.conv(F.substring(F.md5(F.concat(F.lit("dsir:"), F.col(id_col).cast("string"))), 1, 8), 16, 10)
            .cast("long")
            .cast("double")
            + 0.5
        ) / F.lit(4294967296.0)
        key = F.col("dsir_score") / F.lit(float(temperature)) - F.log(-F.log(u))
    else:
        key = F.col("dsir_score").cast("double")
    return (
        w.withColumn("selection_key", F.round(key, 6))
        .orderBy(F.desc("selection_key"), F.asc(id_col))
        .limit(k)
    )
