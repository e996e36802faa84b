"""Training-data export: deterministic sharded parquet with a manifest.

The last mile of a training-data pipeline: the cleaned/sampled corpus
leaves Spark as a fixed set of shards a training job can map to data-
loader workers. Shard assignment is the engine-portable md5 bucket
(``pipeline.sampling.hash_bucket``), NOT Spark's task partitioning —
the same corpus shards identically on any cluster width, engine, or
rerun, so resumable training sees a stable world.

Scale shape (100 TB): one shuffle — ``repartition(num_shards, shard)``
— then a partitioned write; rows are sorted by id within each task so
file contents are byte-deterministic. The manifest is a shard-grain
aggregate (num_shards rows) computed in the same pass's lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import hash_bucket

MANIFEST_DIR = "_manifest"


def shard_assignments(
    df: DataFrame, num_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """Input plus a ``shard`` column in [0, num_shards): the md5 hash
    bucket of the id — uniform, deterministic, engine-portable."""
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    return df.withColumn("shard", hash_bucket(F.col(id_col), num_shards).cast("int"))


def write_training_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    id_col: str = "doc_id",
    token_col: str | None = None,
    data_format: str = "parquet",
    compression: str | None = None,
) -> DataFrame:
    """Write ``df`` as ``path/shard=K/`` files, rows id-sorted within
    files, plus a manifest at ``path/_manifest`` with EXACTLY
    ``num_shards`` rows (shard, n_docs[, n_tokens]) — and return the
    manifest re-read from disk (so callers validate what was actually
    written, not the plan). A shard that received zero documents keeps
    its manifest row with n_docs 0; its data directory is absent, so
    data loaders must drive from the manifest, not a directory listing.

    ``token_col``, when given, is summed into the manifest's
    ``n_tokens`` so data-loader schedulers can weight shards.

    ``data_format``: ``parquet`` (default — columnar, footer-count
    manifest read-back) or ``json`` (JSON Lines, one doc per line —
    what most training data loaders stream; pair with
    ``compression='gzip'`` for the conventional ``.jsonl.gz`` shards).
    The manifest itself is always parquet — it is the machine-read
    shard map, not loader input. JSON Lines has no column types, so
    the manifest read-back re-reads with the writer's schema to count
    what actually landed.

    Parallelism: ``repartition(num_shards, "shard")`` puts each
    shard's rows in exactly ONE task (that is what yields one id-sorted
    file per shard — the manifest contract), so num_shards IS the
    write-stage parallelism cap. Sizing rule at scale: pick num_shards
    from the target shard SIZE (1-4 GB each is the data-loader sweet
    spot), which at 100 TB means tens of thousands of shards —
    naturally far above any executor-slot count, so the cap never
    binds in the regime this writer exists for. It binds only in the
    inverted misuse (a handful of giant shards over a big cluster);
    the fix there is more shards, not a salted writer that would break
    the one-file-per-shard contract.
    """
    if data_format not in ("parquet", "json"):
        raise ValueError(
            f"data_format must be 'parquet' or 'json', got {data_format!r}"
        )
    # a NULL id has no md5 bucket: its rows would land in the Hive
    # default partition, invisible to the shard map — reject up front
    # (limit(1) short-circuits; the scan is id-column-pruned)
    if df.filter(F.col(id_col).isNull()).limit(1).count() > 0:
        raise ValueError(f"{id_col} contains NULL — every row needs a shardable id")
    sharded = shard_assignments(df, num_shards, id_col)
    writer = (
        sharded.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.format(data_format).save(path)
    aggs = [F.count(id_col).alias("n_docs")]
    if token_col is not None:
        aggs.append(
            F.coalesce(F.sum(token_col), F.lit(0)).cast("long").alias("n_tokens")
        )
    spark = df.sparkSession
    # aggregate over what landed on disk — the write is the source of
    # truth; the read-back costs a footer-only count per shard (plus a
    # single-column scan when token_col is requested). The outer join
    # against range(num_shards) keeps EMPTY shards in the manifest: a
    # bucket that received no documents still belongs to the fixed
    # shard set (its directory is absent — the manifest, not a
    # directory listing, is the authoritative shard map).
    # explicit schema: an all-empty write leaves only _SUCCESS behind,
    # and a schema-less read of it cannot infer — the manifest must
    # still come out as num_shards zero rows
    written = spark.read.schema(sharded.schema).format(data_format).load(path)
    all_shards = spark.range(num_shards).select(F.col("id").cast("int").alias("shard"))
    (
        all_shards.join(written, "shard", "left")
        .groupBy("shard")
        .agg(*aggs)
        .write.mode("overwrite")
        .parquet(f"{path}/{MANIFEST_DIR}")
    )
    return spark.read.parquet(f"{path}/{MANIFEST_DIR}")


def shard_balance(
    df: DataFrame,
    num_shards: int,
    id_col: str = "doc_id",
    token_col: str | None = None,
) -> DataFrame:
    """Pre-write shard-balance profile: what the md5 bucket rule WILL
    do to this corpus, per shard — (shard, n_docs[, n_tokens],
    doc_skew), where doc_skew = n_docs * num_shards / total_docs
    (1.0 = perfectly even, rounded to 4). Empty shards keep their row
    (doc_skew 0.0). At 100 TB a skewed shard is a straggler data-loader
    worker for the WHOLE training run, so this is the go/no-go check
    before ``write_training_shards`` — md5 bucketing is uniform on the
    ids, but id-correlated filtering upstream (range splits, per-source
    sampling) can still tilt it.

    One map-side-combined groupBy on the shard key (num_shards result
    rows); the skew normalization is a window over those shard-grain
    rows, not a second corpus pass."""
    sharded = shard_assignments(df, num_shards, id_col)
    aggs = [F.count("*").alias("n_docs")]
    if token_col is not None:
        aggs.append(
            F.coalesce(F.sum(token_col), F.lit(0)).cast("long").alias("n_tokens")
        )
    spark = df.sparkSession
    all_shards = spark.range(num_shards).select(F.col("id").cast("int").alias("shard"))
    per = (
        all_shards.join(sharded.groupBy("shard").agg(*aggs), "shard", "left")
        .withColumn("n_docs", F.coalesce(F.col("n_docs"), F.lit(0)))
    )
    if token_col is not None:
        per = per.withColumn("n_tokens", F.coalesce(F.col("n_tokens"), F.lit(0)))
    from pyspark.sql.window import Window

    total = F.sum("n_docs").over(Window.partitionBy())
    cols = ["shard", "n_docs"] + (["n_tokens"] if token_col is not None else [])
    return per.select(
        *cols,
        F.round(F.col("n_docs") * num_shards / total, 4).alias("doc_skew"),
    )


def dirty_shards(
    old_docs: DataFrame,
    new_docs: DataFrame,
    num_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental-export planner: between two corpus versions, which
    training shards actually need rewriting. Because the md5 bucket
    rule is a pure function of the id, a doc's shard NEVER moves when
    other docs come and go (no resharding cascade — the property
    round-robin or size-balanced assignment lacks), so the delta
    between versions touches exactly the shards holding an added or
    removed id; everything else is byte-identical on disk (the writes
    are deterministic and id-sorted) and can be skipped.

    One full outer join on the id (both sides pre-bucketed — the
    shard is derived, not joined on), one shard-grain rollup, the
    generated shard axis keeping clean shards visible. At 100 TB with
    daily deltas this is the difference between rewriting the corpus
    and rewriting ~delta-sized dirty shards.

    Returns (shard, n_kept, n_added, n_removed, needs_rewrite) for
    every shard."""
    o = shard_assignments(old_docs.select(id_col), num_shards, id_col).select(
        id_col, "shard", F.lit(1).alias("_o")
    )
    n = shard_assignments(new_docs.select(id_col), num_shards, id_col).select(
        id_col, "shard", F.lit(1).alias("_n")
    )
    j = o.join(n, [id_col, "shard"], "full")
    per = j.groupBy("shard").agg(
        F.sum((F.col("_o").isNotNull() & F.col("_n").isNotNull()).cast("long"))
        .cast("long")
        .alias("n_kept"),
        F.sum(F.col("_o").isNull().cast("long")).cast("long").alias("n_added"),
        F.sum(F.col("_n").isNull().cast("long")).cast("long").alias("n_removed"),
    )
    spark = old_docs.sparkSession
    axis = spark.range(num_shards).select(F.col("id").cast("int").alias("shard"))
    out = axis.join(per, "shard", "left")
    return out.select(
        "shard",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("n_added"), F.lit(0)).cast("long").alias("n_added"),
        F.coalesce(F.col("n_removed"), F.lit(0)).cast("long").alias("n_removed"),
        (
            F.coalesce(F.col("n_added"), F.lit(0))
            + F.coalesce(F.col("n_removed"), F.lit(0))
            > 0
        ).alias("needs_rewrite"),
    )


def resharding_plan(
    manifest: DataFrame,
    target_docs_per_shard: int,
    shard_col: str = "shard",
    count_col: str = "n_docs",
) -> DataFrame:
    """Consolidation plan over a shard manifest: assign every old
    shard to a NEW shard id by contiguous repacking at
    ``target_docs_per_shard`` — new_shard = floor(docs_before / target)
    where docs_before is the running total of docs in shard-id order
    BEFORE this shard. Trickle appends under range sharding (q84) and
    retraction-heavy dirty-shard rewrites (q79) both leave a long tail
    of small shards; a data loader then pays per-shard open/seek
    overhead thousands of times for kilobytes each. Contiguous
    repacking merges neighbors only, so id-range locality survives and
    the moved set is exactly the small-shard tail.

    Shard-grain in and out (the manifest is the authoritative map —
    write_training_shards' contract): the plan says which old shards
    coalesce; executing it re-writes only old shards whose new id
    differs (``moved``). An over-target shard keeps a shard to itself
    (floor of its own start) and is flagged ``needs_split`` — splitting
    needs doc grain, i.e. a write_training_shards pass over just that
    shard's rows. One window over manifest-grain rows; nothing
    doc-grain anywhere.

    Returns (shard, n_docs, new_shard, moved, needs_split) for every
    manifest row."""
    from pyspark.sql.window import Window

    w = Window.orderBy(shard_col).rowsBetween(Window.unboundedPreceding, -1)
    before = F.coalesce(F.sum(count_col).over(w), F.lit(0))
    return manifest.select(
        F.col(shard_col).cast("int").alias("shard"),
        F.col(count_col).cast("long").alias("n_docs"),
        F.floor(before / target_docs_per_shard).cast("int").alias("new_shard"),
        (
            F.floor(before / target_docs_per_shard).cast("int")
            != F.col(shard_col).cast("int")
        ).alias("moved"),
        (F.col(count_col) > target_docs_per_shard).alias("needs_split"),
    )


def range_shard_assignments(
    docs: DataFrame,
    range_width: int,
    num_shards: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Locality sharding: shard = id // range_width (optionally capped
    into num_shards by modulo for a fixed shard budget). The md5 rule
    (``shard_assignments``) maximizes BALANCE but destroys export
    locality — the r10 incremental rung measured a 200-doc trickle add
    dirtying 62/64 hash shards, because uniform hashing sprays any
    delta everywhere. When ids are monotone in ingest order (crawl
    sequence numbers, snowflake ids), contiguous ranges put a daily
    append into the TAIL shards only: the dirty set is
    ceil(delta/range_width) shards regardless of corpus size. The
    trade is explicit: range shards skew when ingest is bursty
    (shard_balance says by how much); hash shards stay balanced but
    are all dirty on any append. Pick per table, diff either with
    ``dirty_shards_assigned``."""
    shard = (F.col(id_col) / range_width).cast("long")
    if num_shards is not None:
        shard = shard % num_shards
    return docs.select(id_col, shard.cast("int").alias("shard"))


def dirty_shards_assigned(
    old_assigned: DataFrame,
    new_assigned: DataFrame,
    id_col: str = "doc_id",
    shard_col: str = "shard",
) -> DataFrame:
    """``dirty_shards`` for EXPLICIT shard assignments: both versions
    carry their own (id, shard) mapping, so any assignment policy —
    md5, id ranges, dates, a size-balancing optimizer — plugs into the
    same incremental-export planning. A doc whose shard CHANGED
    between versions (resharding) is a removal from its old shard plus
    an addition to its new one, so resharding cost is visible in the
    plan instead of silently rewriting everything.

    Same shape as ``dirty_shards``: one full outer join on the id,
    shard-grain rollup, every observed shard kept visible. Returns
    (shard, n_kept, n_added, n_removed, needs_rewrite)."""
    o = old_assigned.select(id_col, F.col(shard_col).alias("_os"))
    n = new_assigned.select(id_col, F.col(shard_col).alias("_ns"))
    j = o.join(n, id_col, "full")
    kept = j.filter(F.col("_os") == F.col("_ns")).groupBy(
        F.col("_os").alias(shard_col)
    ).agg(F.count("*").cast("long").alias("n_kept"))
    added = j.filter(
        F.col("_os").isNull() | (F.col("_os") != F.col("_ns"))
    ).filter(F.col("_ns").isNotNull()).groupBy(
        F.col("_ns").alias(shard_col)
    ).agg(F.count("*").cast("long").alias("n_added"))
    removed = j.filter(
        F.col("_ns").isNull() | (F.col("_os") != F.col("_ns"))
    ).filter(F.col("_os").isNotNull()).groupBy(
        F.col("_os").alias(shard_col)
    ).agg(F.count("*").cast("long").alias("n_removed"))
    axis = (
        old_assigned.select(F.col(shard_col))
        .unionByName(new_assigned.select(F.col(shard_col)))
        .distinct()
    )
    out = axis.join(kept, shard_col, "left").join(added, shard_col, "left").join(
        removed, shard_col, "left"
    )
    return out.select(
        F.col(shard_col).cast("int").alias("shard"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("n_added", F.lit(0)).cast("long").alias("n_added"),
        F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        (
            F.coalesce("n_added", F.lit(0)) + F.coalesce("n_removed", F.lit(0)) > 0
        ).alias("needs_rewrite"),
    )


def verify_training_shards(
    spark,
    path: str,
    id_col: str = "doc_id",
    data_format: str = "parquet",
) -> DataFrame:
    """Integrity check of a ``write_training_shards`` directory against
    its own manifest — the read-side half of the export contract, run
    before a training job trusts the shards (and after any
    delete/compact/resharding maintenance): recount what is actually
    on disk per shard and compare with the manifest rows. A partial
    write, a manually deleted file, or a stray extra file shows up as
    a disk/manifest mismatch on exactly its shard. Reference analog:
    the job ledger's tasks_ran == task_count completion check
    (jobs.rollup_tasks) — an export that cannot be verified cannot be
    resumed either.

    The recount is footer-grain for parquet (row counts come from
    metadata, no data pages); the manifest side is num_shards rows.
    Empty shards verify too: the manifest row says 0 docs and the
    (absent) directory contributes 0. Returns (shard, manifest_docs,
    disk_docs, ok) for every manifest shard, ok = counts equal."""
    manifest = spark.read.parquet(f"{path}/{MANIFEST_DIR}").select(
        "shard", F.col("n_docs").alias("manifest_docs")
    )
    schema = None
    if data_format == "json":
        # JSON has no self-describing footer; recount with a minimal
        # projection schema (the id column + the partition column)
        schema = f"{id_col} long, shard int"
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    try:
        written = reader.format(data_format).load(path)
        disk = written.groupBy("shard").agg(
            F.count(id_col).cast("long").alias("disk_docs")
        )
    except Exception:
        # an all-empty export leaves only _SUCCESS + the manifest —
        # nothing to load; every shard's disk count is 0
        disk = spark.createDataFrame([], "shard int, disk_docs long")
    return (
        manifest.join(disk, "shard", "left")
        .select(
            "shard",
            F.col("manifest_docs").cast("long"),
            F.coalesce("disk_docs", F.lit(0)).cast("long").alias("disk_docs"),
            (F.col("manifest_docs") == F.coalesce("disk_docs", F.lit(0))).alias("ok"),
        )
    )


def shard_skew_profile(manifest: DataFrame, count_col: str = "n_docs") -> DataFrame:
    """One-row skew summary of an export manifest — the straggler
    check that runs after every write_training_shards / resharding
    pass, BEFORE a training job inherits the layout: a shard at 10x
    the median is a guaranteed straggler at load time (one reader task
    per shard), and the q86 planner's target only bounds the tail it
    repacked, not what later appends did. Exact percentiles (Spark
    ``percentile`` == DuckDB ``quantile_cont``, the q74 rule) and an
    integer micro-unit max/mean ratio so both engines agree bit-for-
    bit. Manifest-grain input (shards, not docs), single-row output.

    Returns (n_shards, min_docs, p50_docs, p90_docs, max_docs,
    max_over_mean_micro)."""
    c = F.col(count_col).cast("double")
    return manifest.agg(
        F.count("*").cast("long").alias("n_shards"),
        F.min(count_col).cast("long").alias("min_docs"),
        F.round(F.expr(f"percentile({count_col}, 0.5)"), 2).alias("p50_docs"),
        F.round(F.expr(f"percentile({count_col}, 0.9)"), 2).alias("p90_docs"),
        F.max(count_col).cast("long").alias("max_docs"),
        F.round(F.max(c) / F.avg(c) * 1e6, 0).cast("long").alias("max_over_mean_micro"),
    )
