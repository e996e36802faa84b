"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the same settings are what we would ship
on a multi-executor cluster: AQE on (runtime re-plan + skew-join
handling), shuffle partitions sized for the data scale, Arrow enabled for
the few Pandas-UDF paths (pipeline/ operators).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "tag-engine-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    shuffle_partitions defaults to the parallelism of the master; at
    100 TB scale this is instead sized so post-shuffle partitions stay
    in the 128-256 MB range — AQE coalesces down from a high initial
    number, so we set a generous initial and let AQE shrink it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE's sort-merge -> shuffled-hash rewrite
        # (maxShuffledHashJoinLocalMapThreshold, guide §3.1) was probed
        # r14 on the fingerprint/shingle pair joins (tools/shj_probe.py):
        # an apparent 2x on d25 under a loaded box did NOT reproduce on
        # a quiet one — in-process toggle A/B measured a wash on
        # d25/d29/q106 and ~0.5 s WORSE on d27 (the sort the rewrite
        # removes is cheap on 8-byte keys; the per-partition hash map
        # build is not free). Left at the default (off).
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or int(cpus)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # UI off for tests/bench (port + listener overhead); tools that
        # read per-stage shuffle metrics over the REST API (e.g.
        # tools/stress_pipeline.py) opt in via SPARK_GRAFT_UI=true
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        # LIMIT/first() probes: CollectLimitExec ramps up from 1
        # partition (x4 per retry), so a first() over a 32-partition
        # relation that doesn't fill the limit in partition 0 pays 3-4
        # successive jobs — measured 0.87s vs 0.34s on a dimension-sized
        # local relation. Size the first probe wave to the cluster's
        # parallelism instead: one wave regardless of where the rows
        # live. Per-task early-stop still bounds the cost of each probe
        # task on huge scans (lineitem first(): 0.10s under this
        # setting), and the engine's interactive paths (user-SQL
        # first-row-wins, merge size probes) are LIMIT-shaped.
        .config("spark.sql.limit.initialNumPartitions", cpus)
        # RDD-default parallelism governs how python-local data
        # (createDataFrame from driver rows) slices. In this engine that
        # data is dimension-sized by construction (fixtures, metadata,
        # centroid tables) — distributed work always enters through
        # parquet scans and SQL shuffles, governed by the SQL configs
        # above. Cluster-width parallelize fans a 3-row relation into
        # one near-empty task per core (thousands on a real cluster);
        # pin it small instead. Measured on the engine-fixture queries:
        # q26 2.8->1.7s, q18 1.7->1.1s, q33 1.9->1.1s at local[32].
        # Distributed code paths must NOT size themselves off the RDD
        # default: CPU-heavy repartitions (dedup shingling) read
        # spark.sql.shuffle.partitions instead; SQL-side leaf nodes keep
        # cluster width via the leaf-parallelism conf below (NOTE:
        # PySpark's session.range() bypasses it by filling numSlices
        # from the RDD default — synthetic range inventories must pass
        # an explicit width, as tools/scale_ladder.py does).
        .config("spark.default.parallelism", str(max(4, int(cpus) // 4)))
        .config("spark.sql.leafNodeDefaultParallelism", cpus)
    )
    return builder.getOrCreate()


def local_df(spark: SparkSession, data, schema, slices: int | None = None):
    """createDataFrame for dimension-sized data without the 32-way
    parallelize: the default slices driver-local rows across
    defaultParallelism partitions, so every downstream collect/count on
    a handful of rows schedules a full task wave (measured ~0.35s vs
    ~0.15s per action on local[32]). One slice per 4096 rows keeps
    engine-metadata relations (tag state mirrors, template/field
    tables, job ledgers) single-task while still splitting anything
    that grows. Accepts tuples or dicts (dicts are mapped through the
    StructType field order)."""
    data = list(data)
    if not data:
        return spark.createDataFrame([], schema)
    if isinstance(data[0], dict):
        if isinstance(schema, str):
            from pyspark.sql.types import StructType

            schema = StructType.fromDDL(schema)
        # fail fast on misspelled keys — the RDD path verifies lazily on
        # executors, so a silent r.get() None would surface (if at all)
        # as a wrong column far from the bug
        names = {f.name for f in schema.fields}
        for r in data:
            unknown = r.keys() - names
            if unknown:
                raise ValueError(f"local_df: keys {sorted(unknown)} not in schema {sorted(names)}")
        data = [tuple(r.get(f.name) for f in schema.fields) for r in data]
    if slices is None:
        slices = max(1, (len(data) + 4095) // 4096)
    return spark.createDataFrame(spark.sparkContext.parallelize(data, slices), schema)


def free_local_checkpoint(df) -> None:
    """Eagerly free the block-manager storage behind a
    ``localCheckpoint(eager=True)`` DataFrame whose data is no longer
    referenced. ``Dataset.unpersist()`` is a NO-OP for these (verified
    on Spark 4.1.2: it only uncaches CacheManager entries, while
    checkpoint blocks live on the internally cached RDD), so reach the
    RDD through the LogicalRDD plan root. Falls back silently if the
    plan shape ever changes — the ContextCleaner then frees the blocks
    when the RDD reference is GC'd, just later."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_parquet(spark: SparkSession, path: str):
    """Read a parquet file, tolerating TIMESTAMP(NANOS) columns.

    Spark rejects nano-precision parquet timestamps outright; we read
    them as raw nanos longs (legacy conf) and truncate to micros —
    byte-identical to how DuckDB/Arrow surface the same column, so
    oracle comparisons stay exact. Footer-only schema sniff, no data
    read on the driver.
    """
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    try:
        footer = pq.read_schema(path)
    except Exception:
        return df
    for field in footer:
        if str(field.type) == "timestamp[ns]" and field.name in df.columns:
            df = df.withColumn(
                field.name, F.timestamp_micros(F.expr(f"`{field.name}` div 1000"))
            )
    return df


def register_testdata(spark: SparkSession, sf_dir: str) -> None:
    """Register the driver's parquet tables as temp views.

    Parquet scans give Catalyst column pruning + predicate pushdown for
    free; at 100 TB these would be external tables with partition
    columns, and the same view names keep every query unchanged.

    Pins the session timezone to UTC: date-casting queries must agree
    with the (timezone-naive) DuckDB oracle even when the caller built
    the SparkSession without our factory.

    Idempotent per (session, sf_dir): repeated calls (every query entry
    calls this) skip the footer reads and catalog churn unless the
    directory changed.
    """
    key = id(spark)
    if _REGISTERED.get(key) == sf_dir:
        return
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_parquet(spark, path).createOrReplaceTempView(name)
    _REGISTERED[key] = sf_dir


_REGISTERED: dict[int, str] = {}
