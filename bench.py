"""Benchmark harness: runs the engine's query inventory at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

The same payload is also written to bench_out.json next to this file —
the stdout capture that records bench runs has a bounded tail buffer
and has truncated the (long) per-query map before; the file is the
machine-readable copy.

Execution is forced with a noop sink (full computation, no driver-side
row transfer) so timings measure the distributed plan, not collect().
Between queries the harness drops references and runs gc.collect() so
the ContextCleaner frees superseded localCheckpoint blocks — without
it, block-manager pressure from dozens of accumulated checkpoints
inflates later queries' times by ~2x.

Each query is timed N times back to back (default 3, override with
$SPARK_GRAFT_BENCH_PASSES) and the recorded value is the min of the
passes. Rationale (measured, round 4): two identical full-inventory
runs on this shared box differed 125.5s vs 100.6s in total, with
single queries swinging 2.5x at the same position in the same order
(d04 3.78 vs 1.49, q25 5.76 vs 2.44) — single cold samples are
dominated by CPU-contention/GC noise plus one-time plan compilation,
neither of which exists in the steady state the engine targets.
min-of-2 was the smallest repeat count that suppressed both until
round 8, when ambient guest-neighbor bursts outlasted single passes
(both passes of untouched queries inflated 2-17x, different queries
each run — SCALE.md round-8 bench note); the default is now 3. The
JSON records the methodology ("timing") and all raw passes (per query
in bench_out.json) so cross-round comparisons can be made min-vs-min.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E
from datacatalog_tag_engine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# round-8 contention lesson (ambient guest-neighbor bursts outlasted
# single passes in every run — SCALE.md round-8 bench note): default
# min-of-3; tune with the env var without editing code.
N_PASSES = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))

# Ambient-load sentinels (round 11): four CODE-FROZEN queries spanning
# families (engine scan-agg, text, dedup, similarity) whose reference
# times below define a per-run ambient index = geometric mean of
# (measured / reference) — recorded in the JSON payload so cross-round
# mover analyses report control-normalized ratios mechanically instead
# of narrating "the box was noisy" (three rounds of diffuse 1.1-1.2x
# round-over-round drift with zero per-query movers made the narrative
# load-bearing; this makes it a computed number). References are each
# sentinel's best-known quiet-box time at sf0.1 across the committed
# full per-query records. Policy: a sentinel's reference is re-pinned
# ONLY when bench methodology changes, never because the box got
# faster/slower; if a sentinel's CODE must change, swap in a different
# frozen query instead. The index only applies to the default sf0.1
# run (ambient_index is null at other scales).
SENTINELS_SF01 = {
    "q01_row_count": 0.061,
    "t02_quality": 0.513,
    "d02_dedup_minhash": 1.405,
    "s01_ann_topk": 0.432,
}


def sf_from_dir(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _parse_args(argv: list[str]) -> tuple[set[str] | None, str]:
    """--only a,b,c limits the run to those queries (plus the ambient
    sentinels, so the subset record still normalizes); --out PATH
    redirects the JSON record so a targeted re-price can never clobber
    bench_out.json. Defaults preserve the full-record behavior."""
    only: set[str] | None = None
    out_path = None
    it = iter(argv)
    for a in it:
        if a == "--only":
            only = {s for s in next(it).split(",") if s}
            only |= set(SENTINELS_SF01)
        elif a == "--out":
            out_path = next(it)
    if out_path is None:
        # a partial record must never land in the committed full-record
        # file: --only without --out defaults to an untracked path
        out_path = (
            "/tmp/bench_only.json"
            if only is not None
            else os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "bench_out.json"
            )
        )
    return only, out_path


def main() -> None:
    only, out_path = _parse_args(sys.argv[1:])
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM / parquet footers outside the timed loop
    from datacatalog_tag_engine_spark.session import register_testdata

    register_testdata(spark, SF_DIR)
    for t in ("lineitem", "documents", "embeddings"):
        # register_testdata tolerates missing parquet files; warmup must
        # not be stricter than the queries themselves
        if spark.catalog.tableExists(t):
            spark.table(t).count()
    spark.range(10).groupBy("id").count().collect()
    # fork the Python/Arrow worker pool and the broadcast machinery once
    # outside the timed loop, so their one-time cost doesn't land on
    # whichever query happens to run first
    from pyspark.sql import functions as F

    spark.range(64).withColumn("g", F.col("id") % 2).groupBy("g").applyInPandas(
        lambda pdf: pdf, "id long, g long"
    ).write.mode("overwrite").format("noop").save()
    spark.range(100).join(
        F.broadcast(spark.range(10).withColumnRenamed("id", "k")),
        F.col("id") == F.col("k"),
    ).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    passes: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name, fn in E.queries().items():
        if only is not None and name not in only:
            continue
        runs: list[float] = []
        for _ in range(N_PASSES):
            t0 = time.time()
            try:
                df = fn(spark, SF_DIR)
                force(df)
                runs.append(round(time.time() - t0, 3))
            except Exception as ex:  # one broken query must not lose the whole run
                errors[name] = f"{type(ex).__name__}: {str(ex)[:120]}"
                print(f"bench error in {name}: {errors[name]}", file=sys.stderr)
            # free per-query state even after a failed pass: cached views
            # and the query's (now unreferenced) localCheckpoint blocks
            # must not tax the next measurement
            df = None
            spark.catalog.clearCache()
            gc.collect()
            if name in errors:
                break
        # a query is either timed or errored, never both — a pass-2
        # failure means the timing is not trustworthy either
        if runs and name not in errors:
            timings[name] = min(runs)
            passes[name] = runs

    total = round(sum(timings.values()), 3)
    sf = sf_from_dir(SF_DIR)
    ambient = None
    sentinels = None
    if sf == 0.1:
        import math

        ratios = [
            timings[s] / ref
            for s, ref in SENTINELS_SF01.items()
            if s in timings and ref > 0
        ]
        if ratios:
            ambient = round(
                math.exp(sum(math.log(max(r, 1e-9)) for r in ratios) / len(ratios)),
                4,
            )
        sentinels = {
            s: {"ref_sec": ref, "sec": timings.get(s)}
            for s, ref in SENTINELS_SF01.items()
        }
    out = {
        "metric": f"total wall-clock for the full query inventory (noop sink, min of {N_PASSES} passes)",
        "value": total,
        "unit": "sec",
        "timing": f"min-of-{N_PASSES} back-to-back passes per query",
        "ambient_index": ambient,
        "sentinels": sentinels,
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    file_out = dict(out, passes=passes)
    payload = json.dumps(out)
    # r14 ADVICE: a loaded-box run must not clobber the committed
    # quiet-box baseline that round-over-round comparisons read. When
    # this full-record run is ambient-hot (> 1.05) and the existing
    # bench_out.json holds a quiet record, divert the file copy to
    # bench_out_loaded.json. The stdout contract is unchanged — the
    # driver always gets this run's real JSON line.
    default_full = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_out.json"
    )
    if (
        out_path == default_full
        and ambient is not None
        and ambient > 1.05
        and os.path.exists(out_path)
    ):
        try:
            with open(out_path) as f:
                prev_amb = json.load(f).get("ambient_index")
            if prev_amb is not None and prev_amb <= 1.05:
                out_path = os.path.join(
                    os.path.dirname(default_full), "bench_out_loaded.json"
                )
                print(
                    f"ambient {ambient} > 1.05: keeping quiet baseline, "
                    f"record diverted to {out_path}",
                    file=sys.stderr,
                )
        except Exception:
            pass
    with open(out_path, "w") as f:
        f.write(json.dumps(file_out) + "\n")
    print(payload)


if __name__ == "__main__":
    main()
