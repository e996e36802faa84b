"""Checkpoint-lifecycle rung: how much block-manager storage the
cleaning-chain barriers pin across repeated pipeline calls, with the
shipped free_local_checkpoint releases vs the same code with the
releases disabled (monkeypatched to no-op) — the measured case for the
r9 lifecycle fixes (containment_dedup + _cleaned_canon).

Runs q59v2 then q71 back-to-back ``rounds`` times per mode in ONE
session each... storage is read from getRDDStorageInfo after every
query (sum of cached RDD memSize), reporting the running peak and the
final resident bytes.

Usage: python tools/stress_checkpoint_lifecycle.py [sf_dir] [rounds]
(defaults: /root/testdata/sf0.01, 2)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def storage_bytes(spark) -> int:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return sum(i.memSize() for i in infos)


def run(sf_dir: str, rounds: int, frees_enabled: bool) -> dict:
    # fresh interpreter state per mode would need subprocesses; instead
    # each mode gets its own SparkSession app name and starts from an
    # empty block manager (we stop the previous session)
    import datacatalog_tag_engine_spark.session as S

    if not frees_enabled:
        # disable ONLY the release — the checkpoints themselves stay
        real_free = S.free_local_checkpoint
        S.free_local_checkpoint = lambda df: None
        import datacatalog_tag_engine_spark.pipeline.dedup as DDmod

        DDmod.free_local_checkpoint = S.free_local_checkpoint
        import __spark_entry__ as E

        E.free_local_checkpoint = S.free_local_checkpoint
    import __spark_entry__ as E

    spark = S.get_spark(f"ckpt-rung-{frees_enabled}")
    spark.sparkContext.setLogLevel("ERROR")
    q = E.queries()
    peak = 0
    prompt_trace = []
    settled_trace = []
    for r in range(rounds):
        for name in ("q59v2_clean_pipeline", "q71_export_pipeline"):
            q[name](spark, sf_dir).count()
            # prompt = what the fix controls: resident the moment the
            # call returns, before any GC pass (at 100 TB this is the
            # memory a concurrent query actually contends with)
            b = storage_bytes(spark)
            peak = max(peak, b)
            prompt_trace.append(round(b / 1e6, 1))
            # settled = after Python + JVM GC give ContextCleaner its
            # shot at the now-unreferenced plan roots — the floor both
            # modes converge to eventually
            import gc
            import time

            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(3)
            settled_trace.append(round(storage_bytes(spark) / 1e6, 1))
    final = storage_bytes(spark)
    spark.stop()
    if not frees_enabled:
        S.free_local_checkpoint = real_free
        DDmod.free_local_checkpoint = real_free
        E.free_local_checkpoint = real_free
    return {
        "frees_enabled": frees_enabled,
        "rounds": rounds,
        "prompt_mb_after_each_query": prompt_trace,
        "settled_mb_after_gc": settled_trace,
        "peak_prompt_mb": round(peak / 1e6, 1),
        "final_mb": round(final / 1e6, 1),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    for mode in (False, True):
        print(json.dumps(run(sf_dir, rounds, mode)))


if __name__ == "__main__":
    main()
