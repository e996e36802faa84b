"""Winnowing-surface scale ladder — the measured evidence behind the
d25/d27/d28 cost claims (the hh_ladder discipline): at each scale
factor, the fingerprint surface (rows, distinct fps, max df) and the
capped join mass sum(df^2 | df <= cap) that BOUNDS the pair join, for
a sweep of max_df caps, plus the wall time of the d25 pair join at
each cap. The r13 SCALE rung's headline (6.6k distinct 8-grams
carrying 554k rows at sf0.1 — a synthetic-fixture hotspot) comes from
exactly this table; on a real corpus the distinct-gram space is
orders larger and the same caps cut orders more mass.

Usage: python tools/winnow_ladder.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline.dedup import winnowing_overlap_pairs
from datacatalog_tag_engine_spark.pipeline.text import winnowing_fingerprints
from datacatalog_tag_engine_spark.session import get_spark, load_parquet

CAPS = (100, 500, 1000, None)


def main() -> None:
    sfs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("winnow-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for sf in sfs:
        docs = load_parquet(spark, f"{sf}/documents.parquet")
        fps = (
            winnowing_fingerprints(docs)
            .select("doc_id", "fp")
            .distinct()
            .localCheckpoint(eager=True)
        )
        df_tbl = fps.groupBy("fp").agg(F.count("*").alias("df"))
        shape = df_tbl.agg(
            F.count("*").alias("n_distinct_fp"),
            F.sum("df").alias("fp_rows"),
            F.max("df").alias("max_df"),
        ).first()
        row = {
            "sf": sf,
            "n_docs": docs.count(),
            "fp_rows": shape["fp_rows"],
            "n_distinct_fp": shape["n_distinct_fp"],
            "max_df": shape["max_df"],
            "caps": {},
        }
        for cap in CAPS:
            mass = df_tbl.agg(
                F.sum(
                    F.when(
                        F.lit(cap is None) | (F.col("df") <= (cap or 0)),
                        F.col("df") * F.col("df"),
                    ).otherwise(0)
                )
            ).first()[0]
            t0 = time.time()
            n_pairs = winnowing_overlap_pairs(docs, max_df=cap).count()
            sec = round(time.time() - t0, 2)
            row["caps"][str(cap)] = {
                "join_mass": int(mass or 0),
                "n_pairs": n_pairs,
                "sec": sec,
            }
            print(
                f"{sf} cap={cap}: mass={mass} pairs={n_pairs} {sec}s",
                file=sys.stderr,
            )
        out.append(row)
        from datacatalog_tag_engine_spark.session import free_local_checkpoint

        free_local_checkpoint(fps)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
