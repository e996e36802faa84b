"""Column and corpus profiling operators.

The tag engine's core purpose is computing profile metrics per asset
(the dynamic-tag expression corpus). These operators generalize that to
whole-schema numeric profiling and corpus-level document statistics —
the summaries a training-data pipeline publishes per snapshot.

All metrics are single-pass aggregations (one shuffle of partial
aggregates regardless of row count); inexact-sum metrics (mean/stddev)
are rounded to 2 decimals for cross-engine comparability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def profile_numeric_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column numeric profile: (column, n, n_null, n_distinct,
    min_value, max_value, mean_value, stddev_value) — one aggregation
    pass for ALL columns (the per-column metrics are parallel aggregate
    expressions, not per-column jobs), then unpivoted to long rows."""
    if columns is None:
        # every numeric family, including DecimalType — the common
        # warehouse type for money/quantity measures (a decimal column
        # silently skipped would profile as absent, not as an error)
        columns = [
            f.name
            for f in df.schema.fields
            if isinstance(
                f.dataType,
                (T.IntegerType, T.LongType, T.FloatType, T.DoubleType,
                 T.ShortType, T.ByteType, T.DecimalType),
            )
        ]
    if not columns:
        # nothing numeric: an empty profile, not an empty-agg crash
        return df.sparkSession.createDataFrame(
            [],
            "column string, n double, n_null double, n_distinct double, "
            "min_value double, max_value double, mean_value double, stddev_value double",
        )
    aggs = []
    for c in columns:
        col = F.col(c).cast("double")
        aggs.extend(
            [
                F.count(col).alias(f"{c}__n"),
                F.count(F.when(col.isNull(), 1)).alias(f"{c}__n_null"),
                F.countDistinct(col).alias(f"{c}__n_distinct"),
                F.min(col).alias(f"{c}__min"),
                F.max(col).alias(f"{c}__max"),
                F.round(F.avg(col), 2).alias(f"{c}__mean"),
                F.round(F.stddev_samp(col), 2).alias(f"{c}__stddev"),
            ]
        )
    wide = df.agg(*aggs)
    stack_args = []
    for c in columns:
        stack_args.append(F.lit(c))
        for metric in ["n", "n_null", "n_distinct", "min", "max", "mean", "stddev"]:
            stack_args.append(F.col(f"{c}__{metric}").cast("double"))
    return wide.select(
        F.stack(F.lit(len(columns)), *stack_args).alias(
            "column", "n", "n_null", "n_distinct", "min_value", "max_value", "mean_value", "stddev_value"
        )
    )


def corpus_stats(docs: DataFrame, group_col: str = "source", text_col: str = "text") -> DataFrame:
    """Per-group corpus summary: documents, total/mean token counts and
    char counts — the per-snapshot stats a data pipeline publishes."""
    words = F.size(F.split(F.col(text_col), r"\s+"))
    chars = F.length(F.col(text_col))
    # Output types pinned to bigint/double: DuckDB's sum(INTEGER) yields
    # HUGEINT (float64 in pandas) and min/max(length) yield BIGINT, so
    # every integer metric is cast to long on BOTH engines for the
    # driver's dtype-sensitive value hasher.
    return docs.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(words).cast("long").alias("total_words"),
        F.round(F.avg(words), 2).alias("mean_words"),
        F.sum(chars).cast("long").alias("total_chars"),
        F.min(chars).cast("long").alias("min_chars"),
        F.max(chars).cast("long").alias("max_chars"),
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    user's previous event exceeds ``gap_minutes``. Classic
    lag -> boundary-flag -> running-sum window pattern; session_id is
    (user, session_index). Returns per-session rollups.

    The streaming form of the same semantics is
    streaming.sessions.sessionize_stream (applyInPandasWithState).
    """
    from pyspark.sql import Window

    from ..model.timeutil import ts_epoch_long

    w = Window.partitionBy(user_col).orderBy(ts_col)
    sec = ts_epoch_long(F.col(ts_col))
    gap = sec - F.lag(sec).over(w)
    flagged = events.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    flagged = flagged.withColumn("session_index", F.sum("_new_session").over(w))
    return (
        flagged.groupBy(user_col, "session_index")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .withColumn(
            "duration_sec",
            ts_epoch_long(F.col("session_end")) - ts_epoch_long(F.col("session_start")),
        )
    )


def length_outliers(
    docs: DataFrame,
    by: str = "source",
    value_col: str = "n_chars",
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier profile over a length-ish measure:
    exact median and MAD (median absolute deviation), plus how many
    rows sit more than k MADs from the median — the length-anomaly
    gate a corpus build runs per source (mean/stddev profiles are
    themselves dragged by the outliers they should flag; the median/
    MAD pair is breakdown-resistant — Leys et al., "Detecting
    outliers: do not use standard deviation around the mean", JESP
    2013).

    Two corpus passes by nature (the MAD needs the median first); both
    are group-grain exact percentiles. At 100 TB swap the exact
    percentile for percentile_approx and document the epsilon — the
    structure is unchanged. Exact interpolated medians here so the
    DuckDB oracle (median()) matches bit-for-bit.

    Returns (by, n_docs, median_val, mad_val, n_outliers,
    outlier_frac)."""
    med = docs.groupBy(by).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    dev = docs.join(F.broadcast(med), by).withColumn(
        "_adev", F.abs(F.col(value_col) - F.col("_med"))
    )
    mad = dev.groupBy(by).agg(F.expr("percentile(_adev, 0.5)").alias("_mad"))
    flagged = dev.join(F.broadcast(mad), by)
    return (
        flagged.groupBy(by)
        .agg(
            F.count("*").alias("n_docs"),
            F.first("_med").alias("_m"),
            F.first("_mad").alias("_d"),
            F.count_if(F.col("_adev") > F.lit(k) * F.col("_mad")).alias("n_outliers"),
        )
        .select(
            by,
            "n_docs",
            F.round("_m", 2).alias("median_val"),
            F.round("_d", 2).alias("mad_val"),
            "n_outliers",
            F.round(F.col("n_outliers") / F.col("n_docs"), 4).alias("outlier_frac"),
        )
    )


def event_funnel(
    events: DataFrame,
    steps: list[str],
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: for each step i, the users who
    performed step i strictly AFTER their earliest qualifying
    occurrence of step i-1 (min-timestamp chaining — the standard
    funnel semantics: a user converts once, re-orderings don't count).
    Generalizes the engine's sessionize/usage rollups (streaming/
    usage.py) to multi-step behavioral analytics.

    Each stage is a user-grain aggregate joined to the previous
    stage's (user, ts) frame — co-partitioned on the user key, so the
    chain costs len(steps) user-grain shuffles and nothing
    corpus-grain is ever re-scanned more than once per step. The
    final conversion window runs over len(steps) rows.

    Returns (step_index, step, n_users, conversion) where conversion
    is n_users / step-0 users rounded to 4."""
    from pyspark.sql import Window

    frames = []
    prev = None
    for i, s in enumerate(steps):
        e = events.filter(F.col(type_col) == s)
        if prev is None:
            cur = e.groupBy(id_col).agg(F.min(ts_col).alias("_t"))
        else:
            cur = (
                e.join(prev.select(id_col, F.col("_t").alias("_pt")), id_col)
                .filter(F.col(ts_col) > F.col("_pt"))
                .groupBy(id_col)
                .agg(F.min(ts_col).alias("_t"))
            )
        frames.append(
            cur.agg(F.count("*").alias("n_users")).select(
                F.lit(i).alias("step_index"), F.lit(s).alias("step"), "n_users"
            )
        )
        prev = cur
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    w = Window.orderBy("step_index").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    first_n = F.max(F.when(F.col("step_index") == 0, F.col("n_users"))).over(w)
    return out.withColumn(
        "conversion",
        F.when(first_n > 0, F.round(F.col("n_users") / first_n, 4)).otherwise(F.lit(0.0)),
    )


def cohort_retention(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    day, counted on each later day they return — (cohort_day,
    day_offset, n_users), offset 0 being the cohort's own size. The
    companion view to ``event_funnel`` (which orders steps within a
    journey; this orders RETURN behavior across days) and to the
    streaming usage rollups (streaming/usage.py) a usage-stats
    consumer reads alongside.

    Plan shape: one user-grain aggregate for the cohort day, rejoined
    on the user key (co-partitioned with the aggregate's output; AQE
    broadcasts when the user dimension is small), then a distinct at
    (cohort, offset, user) grain — each user counts once per active
    day — and a cohort-grain count. Nothing event-grain survives past
    the distinct, so the result is bounded by users x active-days no
    matter the event volume."""
    d = events.select(id_col, F.to_date(ts_col).alias("_d"))
    cohorts = d.groupBy(id_col).agg(F.min("_d").alias("cohort_day"))
    return (
        d.join(cohorts, id_col)
        .select(
            "cohort_day",
            F.datediff(F.col("_d"), F.col("cohort_day")).alias("day_offset"),
            id_col,
        )
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_users"))
    )


def percentile_tolerance_profile(
    docs: DataFrame,
    by: str = "source",
    value_col: str = "n_chars",
    probs: tuple = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
    rel_tol: float = 0.05,
) -> DataFrame:
    """Sketched percentiles certified the q60-HLL way: the
    hash-checked output carries the EXACT interpolated per-group
    percentiles (what both engines can agree on — DuckDB
    quantile_cont) plus a within-tolerance flag for Spark's bounded
    ``percentile_approx`` sketch against the exact DISCRETE quantile
    (its own estimator class; see the inline comment) — the sketch
    binary itself (Greenwald-Khanna) is not SQL-replayable, the claim
    "the sketch is within rel_tol of exact at this accuracy" is.

    This is the 100 TB shape for every length/percentile profile in
    the module: exact ``percentile`` holds all values per group;
    percentile_approx streams a bounded GK sketch (state ~ accuracy,
    mergeable map-side). The tolerance flag is the evidence the swap
    is safe at the declared accuracy. Returns (by, p50_exact,
    p90_exact, p99_exact, sketch_within_tol)."""
    exact = [F.expr(f"percentile({value_col}, {p})").alias(f"_e{i}") for i, p in enumerate(probs)]
    approx = [
        F.expr(f"percentile_approx({value_col}, {p}, {accuracy})").alias(f"_a{i}")
        for i, p in enumerate(probs)
    ]
    # the tolerance compares the sketch against the exact DISCRETE
    # quantile (percentile_approx at max accuracy — an actual order
    # statistic), not the interpolated exact: percentile_approx never
    # interpolates, so on a small group the gap between adjacent order
    # statistics would fail any value tolerance through no fault of
    # the sketch (seen at sf0.01: a 25-row group's interpolated p90 =
    # 451.6 vs the order statistic 484). The interpolated exact stays
    # in the OUTPUT columns (what DuckDB's quantile_cont replays).
    disc = [
        F.expr(f"percentile_approx({value_col}, {p}, 2147483647)").alias(f"_d{i}")
        for i, p in enumerate(probs)
    ]
    agg = docs.groupBy(by).agg(*exact, *approx, *disc)
    within = F.lit(True)
    for i in range(len(probs)):
        d, a = F.col(f"_d{i}"), F.col(f"_a{i}")
        within = within & (F.abs(a - d) <= rel_tol * F.greatest(F.abs(d), F.lit(1.0)))
    # output names from the FULL decimal precision: int(p*100) folded
    # 0.999 onto 0.99 (two p99_exact columns -> ambiguous-column
    # failures downstream); the canonical probs keep their familiar
    # names, everything else takes its decimal digits verbatim
    canonical = {0.5: "p50", 0.9: "p90", 0.99: "p99"}
    names = [
        canonical.get(p, "p" + str(p).split(".")[1]) for p in probs
    ]
    if len(set(names)) != len(names):
        raise ValueError(f"probs {probs} produce duplicate column names {names}")
    return agg.select(
        by,
        *[
            F.round(F.col(f"_e{i}"), 2).alias(f"{names[i]}_exact")
            for i in range(len(probs))
        ],
        within.alias("sketch_within_tol"),
    )


def session_funnel(
    events: DataFrame,
    steps: list[str],
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """The conversion funnel scoped WITHIN sessions: a session
    converts step i only if it contains a step-i event strictly after
    its own step-(i-1) time — ``event_funnel``'s ordered-min-ts rule
    applied per (user, session) instead of per user. The difference
    is the product question: "do users EVER come back and buy"
    (event_funnel) vs "does a single visit carry through checkout"
    (this).

    Sessions come from the same gap rule ``sessionize`` certifies
    (q32): a new session opens when the gap to the user's previous
    event exceeds ``gap_minutes`` (the label derivation is repeated
    here verbatim rather than refactored out of sessionize — the q32
    path stays byte-untouched; the q32/this pair of driver rows pins
    both). One user-grain sort window for labels, then len(steps)
    session-grain min aggregates — nothing event-grain survives the
    first funnel stage. Returns (step_index, step, n_sessions,
    conversion) — event_funnel's shape at session grain."""
    from pyspark.sql import Window

    from ..model.timeutil import ts_epoch_long

    w = Window.partitionBy(user_col).orderBy(ts_col)
    sec = ts_epoch_long(F.col(ts_col))
    gap = sec - F.lag(sec).over(w)
    labeled = events.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    ).withColumn("session_index", F.sum("_new_session").over(w))
    # the session key is the (user, session_index) PAIR, not a string
    # concat: a separator-joined key is injective here only by the
    # accident of the int tail, silently stops being so under refactor
    # (e.g. a string sub-session label), and materializes a string per
    # event for no gain — the struct shuffles as raw fields
    sess = labeled.select(
        F.struct(F.col(user_col), F.col("session_index")).alias("_sid"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_et"),
    )
    # the event_funnel stage chain, keyed by session id instead of
    # user id — fully lazy (a union of 1-row aggregates, no driver
    # loop over counts)
    frames = []
    prev = None
    for i, step in enumerate(steps):
        stage = sess.filter(F.col("_et") == step)
        if prev is not None:
            stage = stage.join(
                prev.select("_sid", F.col("_t").alias("_pt")), "_sid"
            ).filter(F.col("_ts") > F.col("_pt"))
        cur = stage.groupBy("_sid").agg(F.min("_ts").alias("_t"))
        frames.append(
            cur.agg(F.count("*").alias("n_sessions")).select(
                F.lit(i).alias("step_index"), F.lit(step).alias("step"), "n_sessions"
            )
        )
        prev = cur
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    ww = Window.orderBy("step_index").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    first_n = F.max(F.when(F.col("step_index") == 0, F.col("n_sessions"))).over(ww)
    return out.withColumn(
        "conversion",
        F.when(first_n > 0, F.round(F.col("n_sessions") / first_n, 4)).otherwise(
            F.lit(0.0)
        ),
    )


def event_rate_anomaly(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    k: float = 3.0,
) -> DataFrame:
    """Per-type event-rate anomaly profile: hourly tumbling counts,
    then the median/MAD robust-outlier rule (``length_outliers``' own
    arithmetic) over each type's hourly series — the monitoring
    number that catches a broken producer (rate cliff) or a replayed
    backlog (rate spike) without being dragged by the anomaly itself
    the way mean/stddev is.

    Two shuffles by nature: (type, hour)-grain counts, then two
    type-grain exact medians (at 100 TB swap for percentile_approx —
    q74 certifies the tolerance). Only hours WITH events count — a
    silent gap is a rate-0 hour and needs the event-time axis of the
    streaming monitor (gate_metrics), not a batch profile. Returns
    (event_type, n_hours, median_rate, mad_rate, n_anomalous,
    max_rate)."""
    hourly = events.groupBy(
        F.col(type_col).alias("_t"), F.date_trunc("hour", F.col(ts_col)).alias("_h")
    ).agg(F.count("*").alias("_n"))
    med = hourly.groupBy("_t").agg(F.expr("percentile(_n, 0.5)").alias("_med"))
    dev = hourly.join(F.broadcast(med), "_t").withColumn(
        "_adev", F.abs(F.col("_n") - F.col("_med"))
    )
    mad = dev.groupBy("_t").agg(F.expr("percentile(_adev, 0.5)").alias("_mad"))
    return (
        dev.join(F.broadcast(mad), "_t")
        .groupBy(F.col("_t").alias(type_col))
        .agg(
            F.count("*").cast("long").alias("n_hours"),
            F.round(F.first("_med"), 2).alias("median_rate"),
            F.round(F.first("_mad"), 2).alias("mad_rate"),
            F.sum(
                (F.col("_adev") > k * F.greatest(F.col("_mad"), F.lit(1.0))).cast("long")
            ).cast("long").alias("n_anomalous"),
            F.max("_n").cast("long").alias("max_rate"),
        )
    )


def lang_source_profile(
    docs: DataFrame,
    lang_col: str = "lang",
    source_col: str = "source",
) -> DataFrame:
    """Language x source contingency profile with independence ratios:
    observed cell counts against the expected-under-independence count
    (row_total x col_total / grand_total) — the mixture-QA view that
    shows WHERE languages concentrate (ratio >> 1: a source is the de
    facto home of a language; ratio << 1 with big marginals: a gap the
    sampling weights should know about).

    One (lang, source)-grain aggregate plus two broadcast marginal
    joins; output is observed cells only (|langs| x |sources| upper
    bound). Returns (lang, source, n_docs, expected, ratio), expected
    rounded 2, ratio rounded 4."""
    cells = docs.groupBy(
        F.col(lang_col).alias("lang"), F.col(source_col).alias("source")
    ).agg(F.count("*").alias("n_docs"))
    lt = cells.groupBy("lang").agg(F.sum("n_docs").alias("_lt"))
    st = cells.groupBy("source").agg(F.sum("n_docs").alias("_st"))
    from pyspark.sql import Window

    grand = F.sum("n_docs").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    joined = cells.join(F.broadcast(lt), "lang").join(F.broadcast(st), "source")
    exp = F.col("_lt") * F.col("_st") / grand
    return joined.select(
        "lang",
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(exp, 2).alias("expected"),
        F.round(F.col("n_docs") / exp, 4).alias("ratio"),
    )


def corpus_snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str = "source",
) -> DataFrame:
    """Per-source diff of two corpus snapshots — the daily-pipeline QA
    rollup that answers "what actually changed between yesterday's
    corpus and today's" BEFORE the expensive re-clean/re-shard
    machinery runs: q79/q84 plan which shards to rewrite; this says
    whether the delta's shape is sane (a source suddenly 90% removed
    is an upstream incident, not a refresh).

    Each side reduces to (id, group, md5(text) fingerprint, token
    count) — a pure scan projection; the diff is ONE full-outer join
    on the id followed by a dimension-grain rollup. At 100 TB both
    sides partition by the id hash and the join co-locates; nothing
    document-sized survives past the projection. Rows classify as
    added (old side null), removed (new side null), changed
    (fingerprints differ), else unchanged; ``token_delta`` is the
    net whitespace-token change including added/removed mass. Returns
    (by, n_added, n_removed, n_changed, n_unchanged, token_delta).

    Reference analog: tag-history diffing — the reference writes a
    full history row per tag change and reports change counts per
    asset (main.py's history views); here the same change-accounting
    at corpus grain."""
    def side(df: DataFrame, tag: str) -> DataFrame:
        toks = F.filter(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
            lambda w: F.length(w) > 0,
        )
        return df.select(
            F.col(id_col).alias("_id"),
            F.col(by).alias(f"_g_{tag}"),
            F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias(f"_fp_{tag}"),
            F.size(toks).cast("long").alias(f"_nt_{tag}"),
        )

    joined = side(old, "old").join(side(new, "new"), "_id", "full_outer")
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(
            F.coalesce(F.col("_g_new"), F.col("_g_old")).alias(by),
            status.alias("_st"),
            (F.coalesce(F.col("_nt_new"), F.lit(0)) - F.coalesce(F.col("_nt_old"), F.lit(0))).alias("_td"),
        )
        .groupBy(by)
        .agg(
            F.sum(F.when(F.col("_st") == "added", 1).otherwise(0)).cast("long").alias("n_added"),
            F.sum(F.when(F.col("_st") == "removed", 1).otherwise(0)).cast("long").alias("n_removed"),
            F.sum(F.when(F.col("_st") == "changed", 1).otherwise(0)).cast("long").alias("n_changed"),
            F.sum(F.when(F.col("_st") == "unchanged", 1).otherwise(0)).cast("long").alias("n_unchanged"),
            F.sum("_td").cast("long").alias("token_delta"),
        )
    )


def score_gate_calibration(
    docs: DataFrame,
    n_deciles: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    **gopher_kwargs,
) -> DataFrame:
    """Calibration table between the CHEAP quality score (t02's
    quality_scores — one scan projection) and the EXPENSIVE rule gate
    (t16's gopher_filter): per score decile, how many docs the gate
    actually keeps. The estimate-cheaply/verify-the-uncertain family's
    QA closer (d15/d16, t36): if keep_rate is monotone in the decile,
    the cheap score is a usable pre-filter (route only the uncertain
    middle deciles through the full gate); if it's flat, the score
    predicts nothing and a score-ordered curriculum (q90) is ordering
    on noise.

    Deciles come from ``curriculum_order`` — the certified staging
    (SQL-standard NTILE over (score desc, id), window form under the
    2M gate, global_rank above), so the calibration buckets are
    byte-identical to the buckets training would actually use. One
    doc-grain join, dimension-grain output (n_deciles rows). Returns
    (decile, n_docs, n_kept, keep_rate) with keep_rate rounded to 4."""
    from .sampling import curriculum_order
    from .text import gopher_filter, quality_scores

    scored = quality_scores(docs, id_col, text_col).select(id_col, "quality_score")
    staged = curriculum_order(scored, n_stages=n_deciles, id_col=id_col).select(
        id_col, F.col("stage").alias("decile")
    )
    keep = gopher_filter(docs, id_col, text_col, **gopher_kwargs).select(
        id_col, "keep"
    )
    return (
        staged.join(keep, id_col)
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("keep").cast("int")).cast("long").alias("n_kept"),
            F.round(F.sum(F.col("keep").cast("int")) / F.count("*"), 4).alias(
                "keep_rate"
            ),
        )
    )


def corpus_health_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    **gopher_kwargs,
) -> DataFrame:
    """The per-source corpus DASHBOARD — the one table an operator
    reads before touching mixture weights: for every source, volume,
    Gopher-gate survival, quality-score mass, PII exposure, and token
    mass, each column a certified operator's own formula (t16's gate,
    t02's score, t06's sequential redaction count, t01's token count)
    joined at doc grain and rolled up once. The reference answers
    these per-column via DLP/BQ tag rollups (`report_settings` /
    coverage reports); this is the corpus-grain form a training
    pipeline wants.

    Every input is a row-local scan projection over the SAME table;
    the composition pays doc-grain joins (id, metric) and one
    dimension-grain shuffle — no corpus re-scan is possible for a
    consumer that reads four certified surfaces. Returns (source,
    n_docs, keep_rate, mean_quality_micro, pii_doc_frac,
    pii_hits_per_doc, mean_tokens): ratios of exact integers rounded 4
    (identical doubles in any engine), and the quality mean on the
    1e4 micro lattice (per-doc scores are round-4, so micro units are
    exact integers and the mean is a rounded exact-integer division —
    the s28 drift_micro discipline)."""
    from .text import gopher_filter, quality_scores, redact_pii, token_counts

    base = docs.select(id_col, group_col)
    g = gopher_filter(docs, id_col=id_col, text_col=text_col, **gopher_kwargs).select(
        id_col, "keep"
    )
    q = quality_scores(docs, id_col, text_col).select(id_col, "quality_score")
    p = redact_pii(docs, id_col, text_col).select(id_col, "n_redactions")
    t = token_counts(docs, id_col, text_col).select(id_col, "n_tokens")
    j = base.join(g, id_col).join(q, id_col).join(p, id_col).join(t, id_col)
    return (
        j.groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.round(F.avg(F.col("keep").cast("int")), 4).alias("keep_rate"),
            F.round(
                F.sum(F.round(F.col("quality_score") * 10000).cast("long"))
                / F.count("*")
            )
            .cast("long")
            .alias("mean_quality_micro"),
            F.round(F.avg((F.col("n_redactions") > 0).cast("int")), 4).alias(
                "pii_doc_frac"
            ),
            F.round(F.avg("n_redactions"), 4).alias("pii_hits_per_doc"),
            F.round(F.avg("n_tokens"), 4).alias("mean_tokens"),
        )
    )


def source_quality_quantiles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str = "source",
    probs: tuple = (0.05, 0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Per-source quality-score DISTRIBUTION — the shape q104's mean
    cannot show: two sources with equal mean quality where one is
    uniform and the other bimodal (half boilerplate, half prose) need
    opposite curation, and only the quantile spread tells them apart.
    The q90/q105 curriculum staging also reads this: a stage boundary
    at a global quantile lands differently per source, and this table
    is where that skew is visible before the mixture is pinned.

    One t02 scan joined to the source column at doc grain, one
    source-grain aggregate with exact interpolated percentiles
    (|sources| groups — exact is fine at any corpus size; the q74
    tolerance pattern applies if a single source's row count ever
    dominates). Returns (source, n_docs, p05..p95 rounded 4)."""
    from .text import quality_scores

    q = quality_scores(docs, id_col, text_col).select(id_col, "quality_score")
    j = docs.select(id_col, by).join(q, id_col)
    aggs = [F.count("*").cast("long").alias("n_docs")]
    for p in probs:
        aggs.append(
            F.round(F.expr(f"percentile(quality_score, {p})"), 4).alias(
                f"p{int(round(p * 100)):02d}"
            )
        )
    return j.groupBy(by).agg(*aggs)


def dedup_funnel(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = 100,
    min_overlap: float = 0.8,
    **gopher_kwargs,
) -> DataFrame:
    """The curation FUNNEL: documents and tokens surviving each stage
    of the canonical cleaning sequence — gate, then exact dedup, then
    whole-document near-dup canonicals, then contained-copy removal —
    applied SEQUENTIALLY (each stage sees only the previous stage's
    survivors, exactly as a production run would compose them). The
    one-page accounting a corpus build publishes: "we started with X
    tokens and trained on Y" with the loss attributed per stage. Stage
    order is the cheap-to-expensive discipline: the gate prunes before
    any join, exact dedup prunes before the minhash shuffle, and the
    winnowing pair join runs last on the smallest corpus.

    Each stage's surviving-id set is materialized once (eager local
    checkpoint, id column only) so no stage's lineage re-executes its
    predecessors, and stage inputs re-read the raw corpus semi-joined
    to the surviving ids — at 100 TB that is one keep-set join per
    stage, never a recomputation chain. Token counts are computed ONCE
    on the input and joined per stage (t01's regex). Returns
    (stage_id, stage, n_docs, n_tokens, docs_frac, tokens_frac)
    with fractions of the INPUT, rounded 4."""
    from .dedup import exact_dedup, minhash_dedup, neardup_clusters, winnowing_dedup
    from .text import gopher_filter, token_counts
    from ..session import free_local_checkpoint

    toks = token_counts(docs, id_col, text_col).localCheckpoint(eager=True)
    src0 = docs.select(id_col, text_col)

    checkpoints = []

    def survivors(ids):
        cp = ids.localCheckpoint(eager=True)
        checkpoints.append(cp)
        return cp

    stages = [("input", src0.select(id_col))]
    cur = src0
    gate = survivors(
        gopher_filter(cur, id_col, text_col, **gopher_kwargs)
        .filter("keep")
        .select(id_col)
    )
    stages.append(("gopher_gate", gate))
    cur = src0.join(gate, id_col, "left_semi")
    exact = survivors(
        exact_dedup(cur, id_col, text_col).filter("is_canonical").select(id_col)
    )
    stages.append(("exact_dedup", exact))
    cur = src0.join(exact, id_col, "left_semi")
    labels = neardup_clusters(cur, minhash_dedup(cur, id_col, text_col), id_col=id_col)
    canon = survivors(
        labels.filter(F.col(id_col) == F.col("cluster_id")).select(id_col)
    )
    stages.append(("minhash_canonical", canon))
    cur = src0.join(canon, id_col, "left_semi")
    kept = survivors(
        winnowing_dedup(
            cur, id_col, text_col, max_df=max_df, min_overlap=min_overlap
        )
        .filter("keep")
        .select(id_col)
    )
    stages.append(("winnowing_contained", kept))

    per = None
    for i, (name, ids) in enumerate(stages):
        row = (
            ids.join(toks, id_col)
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("n_tokens").cast("long").alias("n_tokens"),
            )
            .select(
                F.lit(i).cast("int").alias("stage_id"),
                F.lit(name).alias("stage"),
                "n_docs",
                "n_tokens",
            )
        )
        per = row if per is None else per.unionByName(row)

    from pyspark.sql import Window

    # whole-frame window over |stages| rows — the input totals ride
    # along without a second pass
    w = Window.partitionBy()
    out = per.select(
        "stage_id",
        "stage",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_docs")
            / F.max(F.when(F.col("stage_id") == 0, F.col("n_docs"))).over(w),
            4,
        ).alias("docs_frac"),
        F.round(
            F.col("n_tokens")
            / F.max(F.when(F.col("stage_id") == 0, F.col("n_tokens"))).over(w),
            4,
        ).alias("tokens_frac"),
    ).localCheckpoint(eager=True)
    for cp in checkpoints:
        free_local_checkpoint(cp)
    free_local_checkpoint(toks)
    return out
