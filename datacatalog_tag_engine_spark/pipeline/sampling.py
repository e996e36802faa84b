"""Reproducible sampling and distribution summaries for training-data
pipelines.

``deterministic_sample`` is hash-bucket sampling: membership depends
only on the key (md5 bucket), never on partitioning, executor count, or
seed plumbing — re-running on any cluster, any engine, yields the SAME
sample. That property is what makes pipeline snapshots auditable
(Spark's ``sample()`` is seed+partition dependent and irreproducible
across layouts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(key: Column, buckets: int = BUCKETS) -> Column:
    """Engine-portable bucket in [0, buckets): first 8 md5 hex chars of
    the stringified key, mod buckets."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long") % buckets


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, buckets: int = BUCKETS
) -> DataFrame:
    """Keep rows whose key bucket falls below fraction*buckets. Same
    keys in -> same sample out, anywhere. The threshold rounds half-up
    (same rule as temperature_mixture_sample): int(f*b) truncation
    would drop a bucket whenever f*b lands just under an integer in
    binary float (0.57*10000 = 5699.999…), making the kept fraction
    disagree with any engine that computes the product exactly."""
    return df.filter(hash_bucket(F.col(key_col), buckets) < int(fraction * buckets + 0.5))


def stratified_deterministic_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float], buckets: int = BUCKETS
) -> DataFrame:
    """Per-stratum fractions (e.g. downsample 'en' to 10%, keep 'de'),
    same hash-bucket reproducibility and the same half-up threshold rule
    as deterministic_sample."""
    bucket = hash_bucket(F.col(key_col), buckets)
    thresh = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in (kv[0], int(kv[1] * buckets + 0.5))]
    )
    return df.filter(bucket < F.coalesce(thresh[F.col(strata_col)], F.lit(buckets)))


def train_val_test_split(
    df: DataFrame,
    key_col: str = "doc_id",
    strata_col: str = "source",
    train_bp: int = 8000,
    val_bp: int = 1000,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Deterministic train/val/test assignment: the key's md5 bucket
    decides the split (< train_bp -> train, next val_bp -> val, rest ->
    test). Membership depends only on the key, so the split is stable
    across reruns, engines, and cluster layouts — and documents can
    never leak between splits when the corpus is re-partitioned or
    appended to (new keys land in splits at the same ratios; existing
    keys never move). Returns (key, strata, split) — a codegen
    projection, no shuffle."""
    bucket = hash_bucket(F.col(key_col), buckets)
    split = (
        F.when(bucket < train_bp, F.lit("train"))
        .when(bucket < train_bp + val_bp, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.select(key_col, strata_col, split.alias("split"))


def mixture_weights(
    docs: DataFrame,
    alpha: float = 0.5,
    budget_tokens: int | None = None,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture weights per source (the multilingual /
    multi-source training-mix recipe: p_s ∝ n_s^alpha — alpha=1 is
    proportional to size, alpha->0 approaches uniform, flattening the
    head so low-resource sources aren't drowned).

    Returns (source, n_docs, n_tokens, weight, rate): ``weight`` is the
    normalized mixture probability (round 6); ``rate`` is the per-source
    document sampling fraction min(1, budget*weight/n_tokens) against a
    token budget (round 6; NULL when no budget given).

    Scale shape: one aggregation over the corpus to (source) grain —
    source cardinality is tiny by nature, so the normalization runs as a
    global window over a handful of rows; no corpus-sized shuffle beyond
    the partial-agg rollup.
    """
    from pyspark.sql import Window

    from .text import TOKEN_REGEX

    toks = F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), 0))
    per_src = docs.groupBy(strata_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(toks).cast("long").alias("n_tokens"),
    )
    w_all = Window.partitionBy()  # source grain: a handful of rows
    raw_w = F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    weight = raw_w / F.sum(raw_w).over(w_all)
    out = per_src.select(
        strata_col,
        "n_docs",
        "n_tokens",
        F.round(weight, 6).alias("weight"),
    )
    if budget_tokens is None:
        return out.withColumn("rate", F.lit(None).cast("double"))
    # guard the zero-token source explicitly: budget*weight/0 is NULL
    # and least() SKIPS nulls, so the unguarded form returns rate=1.0 —
    # keeping 100% of a weight-0 source, the opposite of the contract
    rate = F.when(
        F.col("n_tokens") > 0,
        F.least(F.lit(1.0), F.lit(float(budget_tokens)) * F.col("weight") / F.col("n_tokens")),
    ).otherwise(F.lit(0.0))
    return out.withColumn("rate", F.round(rate, 6))


def temperature_mixture_sample(
    docs: DataFrame,
    alpha: float = 0.5,
    budget_tokens: int = 10_000,
    key_col: str = "doc_id",
    strata_col: str = "source",
    text_col: str = "text",
    buckets: int = BUCKETS,
) -> DataFrame:
    """Materialize a temperature-mixed corpus: each source's documents
    are kept at the ``mixture_weights`` rate via the same hash-bucket
    rule as ``deterministic_sample`` — membership depends only on the
    key, so the mix is reproducible on any layout and any engine.

    The per-source rate table is tiny (source grain) and broadcasts;
    the corpus pays one scan + one broadcast-join filter (no shuffle of
    the corpus itself). Returns (doc_id, source, n_tokens).
    """
    from .text import TOKEN_REGEX

    rates = mixture_weights(docs, alpha, budget_tokens, strata_col, text_col).select(
        strata_col, "rate"
    )
    toks = F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), 0))
    keyed = docs.select(key_col, strata_col, toks.alias("n_tokens"))
    # floor(rate*buckets + 0.5): integer threshold, half-up — the same
    # arithmetic is replayable in the SQL oracle without float-compare
    # edge cases at bucket boundaries
    thresh = F.floor(F.col("rate") * buckets + F.lit(0.5))
    return (
        keyed.join(F.broadcast(rates), strata_col)
        .filter(hash_bucket(F.col(key_col), buckets) < thresh)
        .select(key_col, strata_col, "n_tokens")
    )


def histogram(
    df: DataFrame, value: Column, bucket_width: float, max_buckets: int = 100
) -> DataFrame:
    """Fixed-width histogram: (bucket, lo, n); values past the last
    bucket clamp into it. One aggregation pass."""
    b = F.least(F.floor(value / bucket_width), F.lit(max_buckets - 1)).cast("long")
    return (
        df.select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .select("bucket", (F.col("bucket") * F.lit(float(bucket_width))).alias("lo"), "n")
    )


def sample_k_per_group(
    df: DataFrame,
    k: int,
    key_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Exactly min(k, group size) rows per group, chosen by a
    deterministic pseudo-random order (md5 of the key — the same
    reproducibility contract as deterministic_sample: re-running on any
    engine, partitioning, or cluster width selects the SAME rows, which
    hash-threshold sampling cannot promise when you need an exact count
    per group).

    One shuffle on the group key; the per-group window is
    WindowGroupLimit-pruned (rank <= k cuts rows inside the window
    operator before any downstream work). The md5 order also makes the
    selection stable under corpus append: a new document displaces at
    most one prior selection per group, never reshuffles the set.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def epoch_plan(
    docs: DataFrame,
    budget_tokens: int,
    alpha: float = 0.5,
    max_epochs: float = 4.0,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """The data-constrained side of the mixing recipe: when a source's
    temperature-scaled target exceeds what it HAS, a real training mix
    repeats it — and repetition pays off only so far (Muennighoff et
    al., "Scaling Data-Constrained Language Models", arXiv:2305.16264:
    returns decay rapidly past ~4 epochs). ``mixture_weights`` caps
    rates at 1 (subsampling only); this planner reports the other
    regime explicitly instead of silently under-delivering the mix.

    Per source: ``target_tokens`` = round(weight x budget), ``epochs``
    = target/available (round 4), ``planned_tokens`` = min(target,
    available x max_epochs), ``shortfall_tokens`` = the target tokens
    that cannot be met within ``max_epochs`` repeats, and
    ``is_constrained`` when the cap binds. The plan is transparent —
    shortfall is REPORTED for the caller to re-weight, not silently
    redistributed, so the emitted mix always matches what the plan
    says. A zero-token source gets weight 0 (n^alpha = 0), hence target
    0 and epochs NULL — nothing to repeat, nothing owed.

    Scale shape: rides ``mixture_weights``'s single corpus aggregation;
    everything here is source-grain arithmetic (a handful of rows)."""
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be > 0, got {budget_tokens}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    base = mixture_weights(docs, alpha, None, strata_col, text_col)
    target = F.round(F.col("weight") * F.lit(float(budget_tokens))).cast("long")
    avail = F.col("n_tokens").cast("double")
    cap = F.round(avail * F.lit(float(max_epochs))).cast("long")
    planned = F.least(F.col("target_tokens"), cap)
    return (
        base.select(
            strata_col,
            "n_docs",
            "n_tokens",
            "weight",
            target.alias("target_tokens"),
        )
        .select(
            strata_col,
            "n_docs",
            "n_tokens",
            "weight",
            "target_tokens",
            F.when(
                F.col("n_tokens") > 0,
                F.round(F.col("target_tokens") / avail, 4),
            ).alias("epochs"),
            planned.alias("planned_tokens"),
            (F.col("target_tokens") - planned).alias("shortfall_tokens"),
            (F.col("target_tokens") > cap).alias("is_constrained"),
        )
    )


def materialize_mixture(
    docs: DataFrame,
    plan: DataFrame,
    key_col: str = "doc_id",
    strata_col: str = "source",
    buckets: int = BUCKETS,
) -> DataFrame:
    """Emit the corpus an ``epoch_plan`` describes: each source's
    documents appear ``floor(e)`` times plus a deterministic
    hash-selected fraction once more, where ``e`` = the plan's
    ``planned_tokens / n_tokens`` (the max_epochs-capped epochs —
    subsampling sources have e < 1 and emit a subset, repeated sources
    have e > 1 and emit full copies plus a remainder). This is the
    bridge from the PLAN to the corpus a shard export writes: without
    it, epochs > 1 silently degrades to 1 (a dedup-keyed downstream
    would also kill repeats — hence the explicit ``epoch`` column, part
    of the identity of every emitted row).

    Selection is document-grain (a doc is in or out of the remainder
    whole), so per-source token delivery approximates the plan within
    one document's tokens times the bucket resolution — exact token
    packing is ``token_budget_sample``'s job downstream.

    Determinism: copy j of a doc exists iff ``j < floor(e)`` or
    ``hash(key || ':' || floor(e))`` falls under the remainder rate —
    the same md5-bucket rule as ``deterministic_sample``, salted with
    the copy index so the remainder draw is independent of the base
    copies. Same corpus + plan -> same emitted multiset, any engine,
    any partitioning.

    Returns the input columns plus ``epoch`` (0-based copy index).
    A document whose source the plan does not cover (or covers with
    zero tokens) FAILS the job loudly (row-level ``raise_error`` — no
    validation pre-pass, no extra job): a plan computed on yesterday's
    snapshot silently dropping today's new source would ship an
    undercounted mix with nobody told.

    Scale shape: the plan is source-grain and broadcasts; the corpus
    pays one scan + an explode bounded by ceil(e) — no shuffle."""
    for reserved in ("epoch", "_n", "_full", "_rem"):
        if reserved in docs.columns:
            raise ValueError(
                f"input already has a {reserved!r} column — rename it "
                "before materialize_mixture"
            )
    e = F.col("planned_tokens") / F.col("n_tokens")
    rates = plan.filter(F.col("n_tokens") > 0).select(
        strata_col,
        F.floor(e).cast("int").alias("_full"),
        F.floor((e - F.floor(e)) * buckets + F.lit(0.5)).cast("long").alias("_rem"),
    )
    rem_key = F.concat(F.col(key_col).cast("string"), F.lit(":"), F.col("_full"))
    has_rem = hash_bucket(rem_key, buckets) < F.col("_rem")
    n_copies = F.when(
        F.col("_full").isNull(),
        F.raise_error(
            F.concat(
                F.lit("materialize_mixture: source not in plan (or zero tokens): "),
                F.col(strata_col),
            )
        ).cast("int"),
    ).otherwise(F.col("_full") + has_rem.cast("int"))
    return (
        docs.join(F.broadcast(rates), strata_col, "left")
        .withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .select(
            *docs.columns,
            F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("epoch"),
        )
    )


def holdout_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_bp: int = 1000,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Leakage-guarded eval holdout: the id's md5 bucket assigns
    eval membership (same engine-portable rule as
    train_val_test_split — stable under re-partitioning and corpus
    appends), and any TRAIN doc whose whitespace-normalized text
    fingerprint collides with an eval doc is quarantined instead of
    trained on — id-level splitting alone leaks every exact clone
    pair that straddles the boundary, which inflates eval scores by
    exactly the corpus dup rate (the decontamination argument of
    arXiv:2107.06499 applied to the pipeline's own split).

    One projection pass for the split + fingerprints, then one
    fingerprint-keyed left join of the train side against the
    distinct eval fingerprints (eval_bp/buckets of the corpus).
    Returns (doc_id, split) with split in
    {'eval', 'train', 'quarantined'}."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    tagged = docs.select(
        F.col(id_col),
        F.md5(norm).alias("_fp"),
        (hash_bucket(F.col(id_col), buckets) < eval_bp).alias("_is_eval"),
    )
    eval_fps = tagged.filter("_is_eval").select("_fp").distinct()
    leaked = F.col("_hit").isNotNull() & ~F.col("_is_eval")
    return (
        tagged.join(
            eval_fps.withColumn("_hit", F.lit(1)), "_fp", "left"
        )
        .select(
            id_col,
            F.when(F.col("_is_eval"), F.lit("eval"))
            .when(leaked, F.lit("quarantined"))
            .otherwise(F.lit("train"))
            .alias("split"),
        )
    )


def global_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "_rank",
) -> DataFrame:
    """Exact 1-based global rank under a STRICT total order (the
    caller's last order column must be unique) WITHOUT a single-task
    global window. ``row_number().over(Window.orderBy(...))`` plans an
    `Exchange SinglePartition` — every row through ONE task, the
    classic 100 TB killer hiding inside an innocent-looking window.
    This is the distributed form:

    1. ``repartitionByRange`` on the order keys — the range
       partitioner guarantees every row of partition i sorts before
       every row of partition i+1 — then sort within partitions and
       PIN the result with an eager localCheckpoint (range boundaries
       come from sampling; without the pin, the size job and the rank
       job could re-sample different boundaries and disagree).
    2. per-partition row counts: one job returning num_partitions
       driver rows -> cumulative offsets (dimension-grain state).
    3. one ``mapInPandas`` pass adding offset + within-partition
       position — Arrow-batched, order-preserving, no shuffle.

    The rank VALUES are deterministic regardless of where the sampled
    boundaries land (the total order is fixed by ``order_cols``);
    only the partition split varies. Cost: one range shuffle + two
    passes, vs the window's one shuffle into a single task — at any
    real scale the former wins by the width of the cluster. Caller
    drops/ignores ``rank_col`` collisions (asserted).

    Block-manager note: the returned DataFrame reads from the pinned
    eager checkpoint, which stays in the block manager until the
    DataFrame is garbage-collected — materialize promptly. The pinned
    checkpoint is exposed as ``._graft_checkpoint`` so a caller that
    CHAINS global_rank calls (curriculum_order) can free the earlier
    stage once a later eager stage has superseded it."""
    from pyspark import TaskContext
    from pyspark.sql import types as T

    assert rank_col not in df.columns
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .localCheckpoint(eager=True)
    )
    sizes = {
        r["_pid"]: r["n"]
        for r in ranged.select(F.spark_partition_id().alias("_pid"))
        .groupBy("_pid")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in range(max(sizes, default=-1) + 1):
        offsets[pid] = acc
        acc += sizes.get(pid, 0)
    b_offsets = spark.sparkContext.broadcast(offsets)
    schema = T.StructType(ranged.schema.fields + [T.StructField(rank_col, T.LongType())])

    def add_rank(batches):
        pid = TaskContext.get().partitionId()
        base = b_offsets.value.get(pid, 0)
        seen = 0
        for pdf in batches:
            out = pdf.copy()
            out[rank_col] = range(base + seen + 1, base + seen + len(pdf) + 1)
            seen += len(pdf)
            yield out

    out = ranged.mapInPandas(add_rank, schema=schema)
    out._graft_checkpoint = ranged
    return out


def _ntile_from_rank(rank, n_rows: int, n_stages: int):
    """SQL-standard NTILE derived from the global rank: the first
    (n_rows mod n_stages) stages get ceil(n_rows/n_stages) rows, the
    rest floor — bit-identical to every engine's ntile given the same
    total order. Pure column arithmetic (rank is 1-based)."""
    q, rem = n_rows // n_stages, n_rows % n_stages
    boundary = rem * (q + 1)
    big = F.floor((rank - 1) / F.lit(q + 1)) + 1
    small = F.lit(rem) + F.floor((rank - 1 - boundary) / F.lit(max(q, 1))) + 1
    return (
        F.when(F.lit(rem > 0) & (rank <= boundary), big).otherwise(small).cast("int")
    )


# below this row count curriculum_order uses the plain window form:
# a single-task window over a few million (id, score, rank) rows is
# cheaper than global_rank's two range shuffles + checkpoints + Arrow
# passes (measured at sf0.1: 1.0 s window vs 8.5 s scalable on 5k
# rows — pure fixed overhead). Above it, the window's
# Exchange SinglePartition becomes the bottleneck/OOM and the range
# form wins by the width of the cluster. The two produce IDENTICAL
# output (equivalence test), so this is a physical-plan switch only —
# the same kind of decision AQE makes, gated on a count the function
# already needs for the NTILE arithmetic.
CURRICULUM_WINDOW_MAX = 2_000_000


def curriculum_order(
    scores: DataFrame,
    n_stages: int = 10,
    id_col: str = "doc_id",
    score_col: str = "quality_score",
    window_max: int = CURRICULUM_WINDOW_MAX,
) -> DataFrame:
    """Deterministic quality-curriculum ordering: stage docs from
    highest to lowest quality in ``n_stages`` equal-size stages
    (SQL-standard NTILE distribution over (score desc, id) — larger
    stages first, identical in any engine given the total order), then
    shuffle WITHIN each stage by the engine's deterministic md5 order
    (the q35/q62 reproducibility rule) so a stage is not accidentally
    sorted by score — a data loader streaming curriculum_rank order
    gets clean-first training with honest within-stage mixing, and the
    same corpus + scores always yields the same byte order (training
    reproducibility — the property a random shuffle destroys).

    Scale: above ``window_max`` rows both total orders are computed
    with ``global_rank`` (range partition + offsets), NOT
    ``ntile()/row_number()`` window calls — those plan an
    `Exchange SinglePartition` that drags the whole doc-grain table
    through one task. The stage is derived from the rank by the exact
    NTILE formula (``_ntile_from_rank``), so the output is
    bit-identical to the window form (the equivalence test pins it)
    while every stage of the plan stays cluster-wide. At or below
    ``window_max`` the plain window form runs instead — identical
    values, far lower fixed cost (see CURRICULUM_WINDOW_MAX).

    Pairs with ``epoch_plan``/``materialize_mixture``: those decide
    HOW MUCH of each source to train on, this decides WHEN each doc is
    seen. Takes any (id, score) table — text.quality_scores, a
    classifier, a perplexity. Returns (doc_id, stage,
    curriculum_rank)."""
    n_rows = scores.count()
    if n_rows <= window_max:
        from pyspark.sql.window import Window

        stage_w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
        staged = scores.select(
            F.col(id_col), F.ntile(n_stages).over(stage_w).alias("stage")
        )
        rank_w = Window.orderBy(
            "stage", F.md5(F.col(id_col).cast("string")), F.col(id_col)
        )
        return staged.select(
            id_col,
            "stage",
            F.row_number().over(rank_w).cast("long").alias("curriculum_rank"),
        )
    from ..session import free_local_checkpoint

    by_quality = global_rank(
        scores.select(id_col, score_col),
        [F.col(score_col).desc(), F.col(id_col)],
        rank_col="_qrank",
    )
    staged = by_quality.select(
        id_col,
        _ntile_from_rank(F.col("_qrank"), n_rows, n_stages).alias("stage"),
    )
    ranked = global_rank(
        staged.withColumn("_md5", F.md5(F.col(id_col).cast("string"))),
        [F.col("stage"), F.col("_md5"), F.col(id_col)],
        rank_col="curriculum_rank",
    )
    # the second global_rank's EAGER internal checkpoint has fully
    # materialized by now, so the first stage's corpus-sized checkpoint
    # is superseded — free it instead of pinning two doc-grain copies
    # for the result's lifetime
    free_local_checkpoint(by_quality._graft_checkpoint)
    return ranked.select(id_col, "stage", F.col("curriculum_rank").cast("long"))


def stage_mixture(
    curriculum: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-(stage, source) composition of a ``curriculum_order`` plan —
    the QA check that a quality curriculum has not silently become a
    DOMAIN curriculum: quality scores correlate with source (q72
    measures how strongly), so the top stages can over-represent one
    source and the model trains on a domain-skewed prefix. This table
    says by how much; fix with per-source score normalization or
    ``mixture_weights`` if the skew is unacceptable.

    One doc-grain join + a (stages x sources)-grain rollup; the share
    window runs over the rolled-up dimension table. Returns (stage,
    source, n_docs, stage_share)."""
    from pyspark.sql.window import Window

    j = curriculum.select(id_col, "stage").join(
        docs.select(id_col, source_col), id_col
    )
    per = j.groupBy("stage", source_col).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    w = Window.partitionBy("stage")
    return per.select(
        "stage",
        F.col(source_col).alias("source"),
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias("stage_share"),
    )


def source_relative_scores(
    scored: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality_score",
    source_col: str = "source",
) -> DataFrame:
    """Re-express quality as each doc's WITHIN-SOURCE quantile:
    score' = (n_source - rank + 1) / n_source in (0, 1], rank = the
    doc's position under (score desc, id) inside its own source. This
    is the fix for the skew ``stage_mixture`` flags: raw scores
    correlate with source (a curated source out-scores a crawl
    wholesale), so a raw-score curriculum front-loads one domain;
    ranked against its own source, every source contributes its best
    docs to stage 1, its worst to the last stage, and each stage's
    mixture matches the corpus mixture up to per-stage integer
    rounding (the contract test pins it on a constructed skew).

    Both windows are PARTITIONED by source — cluster-wide, no
    single-task exchange at any size (the global ordering problem only
    reappears downstream in curriculum_order, which handles it).
    score' divides two exact ints, so any engine lands the identical
    double. Returns (id, quality_score) ready for curriculum_order."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(source_col).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    n = F.count("*").over(Window.partitionBy(source_col))
    rank = F.row_number().over(w)
    return scored.select(
        id_col,
        ((n - rank + 1) / n).alias(score_col),
    )


def curriculum_token_budget(
    docs: DataFrame,
    n_stages: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token mass per curriculum stage — the PLANNING table between
    q90's ordering and a training run's schedule: stage N's document
    and token counts plus the cumulative token mass through stage N
    (what "train the first 3 stages" actually costs) and each stage's
    share. Deciles carry equal DOC counts by construction (ntile), but
    token mass per stage is the number schedules are written against —
    high-quality deciles skew long or short depending on the corpus,
    and this is the table that says which.

    q90's certified staging (quality ntile) joined to t01's certified
    token count at doc grain, one dimension-grain rollup, a <=
    ``n_stages``-row window for the cumulative — nothing corpus-grain
    after the join. Returns (stage, n_docs, n_tokens, cum_tokens,
    token_frac rounded 6)."""
    from pyspark.sql import Window

    from .text import quality_scores, token_counts

    scores = quality_scores(docs, id_col, text_col).select(id_col, "quality_score")
    staged = curriculum_order(scores, n_stages=n_stages, id_col=id_col).select(
        id_col, "stage"
    )
    toks = token_counts(docs, id_col, text_col).select(id_col, "n_tokens")
    per = (
        staged.join(toks, id_col)
        .groupBy("stage")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )
    w_cum = (
        Window.partitionBy()
        .orderBy("stage")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    return per.select(
        "stage",
        "n_docs",
        "n_tokens",
        F.sum("n_tokens").over(w_cum).cast("long").alias("cum_tokens"),
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(w_all), 6).alias(
            "token_frac"
        ),
    )
