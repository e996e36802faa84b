"""Asset-count scale ladder (SURVEY.md section 5.iv): the reference
load-tests 500 -> 1M assets (examples/load/configs/); this replays the
same shape locally — N schema-identical assets, the 11-expression
profile — on both execution paths and prints seconds per rung.

The point being demonstrated: per-asset cost grows with ASSET COUNT
(one Spark job each — driver scheduling bound), fused-union cost grows
with PLAN SIZE (N scan leaves — driver analysis bound, the cliff at
>= ~10k assets), and fused-inventory cost grows with DATA SIZE only:
one scan leaf regardless of N, the only shape that reaches the
reference's 500k/1M-asset ladder.

Per-mode caps keep the ladder runnable: per-asset stops at 200 rungs,
fused-union at 2000; fused-inventory runs every rung.

`--static` instead runs the STATIC_TAG_ASSET ladder (the reference's
flagship load shape, examples/load/configs/static_asset_1m.json: N
assets x 7 constant fields): a spark.range-derived synthetic inventory
through the engine's _run_static crossJoin plan + type coercion to a
noop sink — no createDataFrame-from-list anywhere in the path, so the
1M rung is a single distributed job.

`--columns` runs the DYNAMIC_TAG_COLUMN ladder: per-asset column
discovery + per-(asset, column) statements, both thread-pooled (the
discovery loop used to be serial on the driver).

`--merge` runs the tag-store MERGE ladder: distributed-path merges of
a fixed 10k batch into growing standing state (10k/100k/1M rows).

`--streaming` runs the Structured-Streaming throughput ladder: the sf
events file replicated N times, one file per micro-batch, through
read_events_stream -> daily_usage to a noop sink.

Usage: python tools/scale_ladder.py [--static|--columns|--merge|--streaming] [N ...]
(default 10 50 200)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from datacatalog_tag_engine_spark.operators import dynamic as DYN
from datacatalog_tag_engine_spark.session import get_spark, register_testdata

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


STATIC_FIELDS = [
    # mirrors examples/load/configs/static_asset_1m.json:5-33 (7 constant
    # fields), typed against this repo's test template vocabulary
    {"field_id": f"static_field_{i}", "field_type": "string", "field_value": f"VALUE_{i}"}
    for i in range(7)
]


def static_ladder(rungs: list[int]) -> None:
    from pyspark.sql import functions as F

    from datacatalog_tag_engine_spark.engine import TagEngine

    spark = get_spark("scale-ladder-static")
    spark.sparkContext.setLogLevel("ERROR")
    eng = TagEngine(spark)
    eng.create_template(
        "static_ladder", [{"field_id": f["field_id"], "field_type": "string"} for f in STATIC_FIELDS]
    )
    cfg_uuid = eng.create_config(
        "STATIC_TAG_ASSET", "static_ladder",
        included_uris="bigquery/project/p/dataset/d/*",
        fields=STATIC_FIELDS,
    )
    cfg = eng.configs[cfg_uuid]
    print(f"{'assets':>9} {'static(s)':>10}   (N assets x 7 fields -> coerced rows -> noop sink)")
    for n in rungs:
        width = int(spark.conf.get("spark.sql.shuffle.partitions"))
        assets = spark.range(0, n, 1, width).select(
            F.format_string("p/datasets/d/tables/t_%07d", F.col("id")).alias("asset_uri"),
            F.lit("bigquery").alias("asset_type"),
            F.lit("p").alias("project"),
            F.lit("d").alias("dataset"),
            F.format_string("t_%07d", F.col("id")).alias("table"),
        )
        t0 = time.time()
        from datacatalog_tag_engine_spark.operators import dynamic as DYN

        raw = eng._run_static(cfg, assets)
        DYN.coerce_long_rows(raw).write.mode("overwrite").format("noop").save()
        print(f"{n:>9} {time.time() - t0:>10.2f}")


def columns_ladder(rungs: list[int]) -> None:
    """DYNAMIC_TAG_COLUMN ladder: N assets x per-asset column discovery
    (included_columns_query) + per-(asset, column) statements, all
    through the engine's thread pools — the discovery phase used to be
    a serial driver loop, so this rung is the regression guard for it.
    Field expression is constant-cost so the number measures job
    scheduling, the actual bottleneck of the interactive path."""
    from pyspark.sql import functions as F

    from datacatalog_tag_engine_spark.engine import TagEngine

    spark = get_spark("scale-ladder-columns")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF_DIR)
    spark.table("lineitem").count()  # warm
    eng = TagEngine(spark, qualify=lambda p, d, t: "lineitem")
    eng.create_template("cols", [{"field_id": "tagged", "field_type": "double"}])
    print(f"{'assets':>8} {'columns(s)':>11}   (discovery + 2 stmts per asset, pooled)")
    for n in rungs:
        width = int(spark.conf.get("spark.sql.shuffle.partitions"))
        assets = spark.range(0, n, 1, width).select(
            F.format_string("p/datasets/d/tables/t_%05d", F.col("id")).alias("asset_uri"),
            F.lit("bigquery").alias("asset_type"),
            F.lit("p").alias("project"),
            F.lit("d").alias("dataset"),
            F.format_string("t_%05d", F.col("id")).alias("table"),
        )
        cfg = eng.create_config(
            "DYNAMIC_TAG_COLUMN", "cols",
            included_uris="bigquery/project/p/dataset/d/*",
            included_columns_query="select 'l_orderkey', 'l_partkey'",
            fields=[{"field_id": "tagged", "query_expression": "select 1"}],
        )
        t0 = time.time()
        eng.trigger_job(cfg, assets)
        print(f"{n:>8} {time.time() - t0:>11.2f}")


def discovery_ladder(rungs: list[int]) -> None:
    """Column-DISCOVERY ladder: the schema-shaped single pass (one
    distributed plan over the inventory's schema column — ZERO per-asset
    Spark jobs, engine._discover_columns 'schema' regime) against the
    opaque per-asset thread pool (one spark.sql job per asset, 8
    workers — the reference's own per-asset semantics, capped at 1000
    rungs here). The schema path's cost tracks inventory SIZE (one
    explode+filter+groupBy job); the pooled path tracks ASSET COUNT
    (driver job-scheduling bound) — the same cliff the static ladder
    demonstrates for tagging, now removed from discovery too."""
    from pyspark.sql import functions as F

    from datacatalog_tag_engine_spark.engine import TagEngine
    from datacatalog_tag_engine_spark.model.schemas import SUBCOLUMN_SCHEMA
    from pyspark.sql import types as T

    spark = get_spark("scale-ladder-discovery")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF_DIR)
    spark.table("lineitem").count()  # warm
    eng = TagEngine(spark, qualify=lambda p, d, t: "lineitem")
    sub_t = T.ArrayType(SUBCOLUMN_SCHEMA)
    col_struct = lambda name, typ: F.struct(
        F.lit(name).alias("name"),
        F.lit(typ).alias("type"),
        F.lit("NULLABLE").alias("mode"),
        F.lit(None).cast(sub_t).alias("subcolumns"),
    )
    schema_q = (
        "select column_name from $project.$dataset.INFORMATION_SCHEMA.COLUMNS "
        "where table_name = '$table' and data_type = 'STRING'"
    )
    # the same two columns via per-asset SQL (a $table reference that is
    # not information-schema-shaped -> the opaque thread-pool regime)
    opaque_q = "select 'l_returnflag', 'l_linestatus' from $table limit 1"
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    print(f"{'assets':>9} {'schema-pass(s)':>15} {'per-asset-pool(s)':>18}")
    for n in rungs:
        assets = spark.range(0, n, 1, width).select(
            F.format_string("p/datasets/d/tables/t_%07d", F.col("id")).alias("asset_uri"),
            F.lit("bigquery").alias("asset_type"),
            F.lit("p").alias("project"),
            F.lit("d").alias("dataset"),
            F.format_string("t_%07d", F.col("id")).alias("table"),
            F.array(
                col_struct("l_returnflag", "STRING"),
                col_struct("l_orderkey", "INT64"),
                col_struct("l_linestatus", "STRING"),
            ).alias("schema"),
        )
        uris = [f"p/datasets/d/tables/t_{i:07d}" for i in range(n)]

        t0 = time.time()
        found = eng._discover_columns({"included_columns_query": schema_q}, assets, uris)
        schema_s = time.time() - t0
        assert len(found) == n and found[uris[0]] == ["l_returnflag", "l_linestatus"]

        pooled_s = float("nan")
        if n <= 1000:
            t0 = time.time()
            found = eng._discover_columns({"included_columns_query": opaque_q}, assets, uris)
            pooled_s = time.time() - t0
            assert len(found) == n
        print(f"{n:>9} {schema_s:>15.2f} {pooled_s:>18.2f}")


def merge_ladder(rungs: list[int]) -> None:
    """Tag-store MERGE ladder: state-size rungs through the DISTRIBUTED
    path (state >> SMALL_STATE_MAX), batch fixed at 10k rows split
    half updates / half creates plus 2% delete groups — the bulk
    reconcile shape (S14) a nightly refresh applies to a large
    standing tag table. Measures one full merge: guard joins, CREATE/
    UPDATE classification, delete anti-join, and the eager checkpoint
    that materializes state + events."""
    from pyspark.sql import functions as F

    from datacatalog_tag_engine_spark.model.schemas import TAGS_SCHEMA
    from datacatalog_tag_engine_spark.store.tagstore import TagStore

    spark = get_spark("scale-ladder-merge")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).count()  # warm

    width = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def tag_rows(ids, value):
        out = ids.select(
            F.format_string("p/datasets/d/tables/t_%09d", F.col("id")).alias("asset_uri"),
            F.lit(None).cast("string").alias("column"),
            F.lit("t").alias("template_id"),
            F.lit("owner").alias("field_id"),
            F.lit("string").alias("field_type"),
            value.alias("field_value_string"),
            F.lit(None).cast("double").alias("field_value_double"),
            F.lit(None).cast("boolean").alias("field_value_bool"),
            F.lit(None).cast("timestamp").alias("field_value_ts"),
            F.lit(None).cast("string").alias("job_uuid"),
            F.lit(None).cast("timestamp").alias("updated_ts"),
        )
        return out.select(*[f.name for f in TAGS_SCHEMA.fields])

    batch_n = 10_000
    print(f"{'state':>9} {'merge(s)':>9}   (10k batch: 50% update / 48% create / 2% delete)")
    for s in rungs:
        store = TagStore(spark)
        store.set_state(tag_rows(spark.range(0, s, 1, width), F.lit("old")))
        upd = tag_rows(spark.range(0, batch_n // 2, 1, width), F.lit("new"))  # ids 0.. overlap
        crt = tag_rows(
            spark.range(s, s + batch_n // 2 - batch_n // 50, 1, width), F.lit("new")
        )
        dlt = tag_rows(
            spark.range(batch_n // 2, batch_n // 2 + batch_n // 50, 1, width),
            F.lit(None).cast("string"),
        )
        batch = upd.unionByName(crt).unionByName(dlt)
        t0 = time.time()
        ev = store.merge(batch)
        n_ev = ev.count()
        dt = time.time() - t0
        print(f"{s:>9} {dt:>9.2f}   ({n_ev} events)")


def streaming_ladder(reps: list[int]) -> None:
    """Structured-Streaming throughput: the sf events file replicated N
    times into a staging dir, streamed through read_events_stream ->
    daily_usage (watermark + tumbling window + approx_count_distinct)
    to a noop sink, one file per micro-batch (maxFilesPerTrigger=1 —
    the steady-state shape of a file-landing pipeline, not one giant
    batch). Reports wall seconds and events/s; state stays (window x
    event_type)-bounded however many files arrive."""
    import shutil
    import tempfile

    from datacatalog_tag_engine_spark.streaming.usage import daily_usage, read_events_stream

    spark = get_spark("scale-ladder-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    src = os.path.join(SF_DIR, "events.parquet")
    n_events = spark.read.parquet(src).count()
    print(f"{'files':>6} {'events':>10} {'wall(s)':>8} {'events/s':>10}   (1 file per micro-batch, noop sink)")
    for n in reps:
        stage = tempfile.mkdtemp(prefix="stream_ladder_")
        try:
            for i in range(n):
                shutil.copy(src, os.path.join(stage, f"events_{i:03d}.parquet"))
            stream = read_events_stream(spark, stage, glob="events_*.parquet", max_files_per_trigger=1)
            agg = daily_usage(stream)
            ckpt = tempfile.mkdtemp(prefix="stream_ladder_ckpt_")
            t0 = time.time()
            q = (
                agg.writeStream.outputMode("update")
                .format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            dt = time.time() - t0
            total = n * n_events
            print(f"{n:>6} {total:>10} {dt:>8.2f} {total / dt:>10.0f}")
            shutil.rmtree(ckpt, ignore_errors=True)
        finally:
            shutil.rmtree(stage, ignore_errors=True)


def clusters_ladder(rungs: list[int]) -> None:
    """Connected-components ladder: synthetic near-dup edge sets (90%
    disjoint pairs + 10% 3-chains — the realistic tiny-component shape)
    over a corpus 2x the edge count, timing both regimes of
    neardup_clusters: the driver union-find (default) and the
    distributed min-label propagation (driver_edge_limit=0). The
    propagation pays O(rounds) corpus-sized checkpoints regardless of
    edge count; the union-find pays one edge collect + one broadcast
    join, so its cost tracks the EDGE count while propagation tracks
    the CORPUS size."""
    import time

    from pyspark.sql import functions as F

    from datacatalog_tag_engine_spark.pipeline.dedup import neardup_clusters

    spark = get_spark("clusters-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    print(f"{'edges':>9} {'docs':>9} {'union-find(s)':>14} {'propagation(s)':>15}")
    for n_edges in rungs:
        n_docs = 2 * n_edges + 2
        docs = spark.range(n_docs, numPartitions=width).withColumnRenamed("id", "doc_id")
        base = spark.range(n_edges, numPartitions=width)
        pairs = base.select(
            (F.col("id") * 2).alias("doc_a"), (F.col("id") * 2 + 1).alias("doc_b")
        ).unionByName(
            base.filter(F.col("id") % 10 == 0).select(
                (F.col("id") * 2 + 1).alias("doc_a"), (F.col("id") * 2 + 2).alias("doc_b")
            )
        ).localCheckpoint(eager=True)  # time the clustering, not the edge gen

        t0 = time.time()
        neardup_clusters(docs, pairs).write.mode("overwrite").format("noop").save()
        uf = time.time() - t0
        t0 = time.time()
        neardup_clusters(docs, pairs, driver_edge_limit=0).write.mode(
            "overwrite"
        ).format("noop").save()
        prop = time.time() - t0
        print(f"{n_edges:>9} {n_docs:>9} {uf:>14.2f} {prop:>15.2f}")


def main() -> None:
    argv = sys.argv[1:]
    if argv and argv[0] == "--clusters":
        clusters_ladder([int(a) for a in argv[1:]] or [10_000, 100_000, 1_000_000])
        return
    if argv and argv[0] == "--streaming":
        streaming_ladder([int(a) for a in argv[1:]] or [1, 8, 32])
        return
    if argv and argv[0] == "--static":
        static_ladder([int(a) for a in argv[1:]] or [1000, 100_000, 1_000_000])
        return
    if argv and argv[0] == "--columns":
        columns_ladder([int(a) for a in argv[1:]] or [100, 1000])
        return
    if argv and argv[0] == "--discovery":
        discovery_ladder([int(a) for a in argv[1:]] or [100, 1000, 10_000, 100_000])
        return
    if argv and argv[0] == "--merge":
        merge_ladder([int(a) for a in argv[1:]] or [10_000, 100_000, 1_000_000])
        return
    rungs = [int(a) for a in sys.argv[1:]] or [10, 50, 200]
    spark = get_spark("scale-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, SF_DIR)
    li = spark.table("lineitem")
    li.count()  # warm

    from pyspark.sql import functions as F

    print(f"{'assets':>8} {'fused-inv(s)':>13} {'fused-union(s)':>15} {'per-asset(s)':>14}")
    for n in rungs:
        uris = [f"p/datasets/d/tables/clone_{i:04d}" for i in range(n)]

        # inventory form: ONE scan with a derived asset_uri column — the
        # same total data volume, split across n assets
        inv = li.withColumn(
            "asset_uri",
            F.format_string("p/datasets/d/tables/clone_%04d", F.pmod(F.hash("l_orderkey"), F.lit(n))),
        )
        t0 = time.time()
        DYN.run_config_fused(spark, E.FUSED_FIELDS, inv, "t").write.mode(
            "overwrite"
        ).format("noop").save()
        fused_inv = time.time() - t0

        fused = float("nan")
        if n <= 2000:
            t0 = time.time()
            DYN.run_config_fused(
                spark, E.FUSED_FIELDS, [(u, li) for u in uris], "t"
            ).write.mode("overwrite").format("noop").save()
            fused = time.time() - t0

        per_asset = float("nan")
        if n <= 200:
            t0 = time.time()
            DYN.run_config_per_asset(
                spark, E.FUSED_FIELDS, uris, "t", qualify=lambda p, d, t: "lineitem", max_workers=8
            )
            per_asset = time.time() - t0

        print(f"{n:>8} {fused_inv:>13.2f} {fused:>15.2f} {per_asset:>14.2f}")


if __name__ == "__main__":
    main()
