"""The two optimizations QUEUED for r14 round start, as runnable
reference implementations with their identity/speed probes — so the
r14 session applies a measured patch instead of re-deriving it.
Both are value-identical variants of CERTIFIED operators (t43/d25 and
t39/t40 consumers), frozen in r13 by the window policy; apply them to
the package at r14 round start BEFORE the record, then re-certify
t43/d25/t39/t40 in the window (see tests/test_oracle_drafts_r14.py's
forecast).

Probe: python tools/queued_r14_patches.py  (prints identity + timings)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def winnowing_fingerprints_fused(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int | None = None,
    w: int | None = None,
) -> DataFrame:
    """PATCH 1 (measured 6.4s stable vs 10.3-21.3s volatile at sf0.1):
    hash each gram straight off the bound ``_t`` column inside ONE
    transform — the gram-string array is never materialized. Each
    element is used exactly once, so the r12 no-CSE rule is satisfied
    without the intermediate array; the string churn it removes is the
    likeliest source of the winnowing family's ~2x JVM-state variance.
    Everything from ``_hs`` on is byte-identical to the shipped
    operator."""
    from datacatalog_tag_engine_spark.pipeline.text import WINNOW_K, WINNOW_W

    k = WINNOW_K if k is None else k
    w = WINNOW_W if w is None else w
    if k < 1 or w < 1:
        raise ValueError("winnowing needs k >= 1 and w >= 1")
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    staged = docs.select(id_col, t.alias("_t"), F.length(t).alias("_n"))
    staged = staged.select(
        id_col,
        F.when(
            F.col("_n") >= k,
            F.transform(
                F.sequence(F.lit(1), F.col("_n") - k + 1),
                lambda i: F.conv(
                    F.substring(F.md5(F.substring(F.col("_t"), i, k)), 1, 8), 16, 10
                ).cast("long"),
            ),
        )
        .otherwise(F.array().cast("array<long>"))
        .alias("_hs"),
    ).select(id_col, "_hs", F.size("_hs").alias("_m"))
    hs, m = F.col("_hs"), F.col("_m")

    def window_pick(i):
        sl = F.slice(hs, i, F.lit(w))
        mn = F.array_min(sl)
        return F.struct(
            (i + F.lit(w) - F.array_position(F.reverse(sl), mn)).cast("int").alias("pos"),
            mn.alias("fp"),
        )

    picks = (
        F.when(m >= w, F.transform(F.sequence(F.lit(1), m - w + 1), window_pick))
        .when(
            m > 0,
            F.array(
                F.struct(
                    (m + 1 - F.array_position(F.reverse(hs), F.array_min(hs)))
                    .cast("int")
                    .alias("pos"),
                    F.array_min(hs).alias("fp"),
                )
            ),
        )
        .otherwise(F.array().cast("array<struct<pos:int,fp:bigint>>"))
    )
    return (
        staged.select(id_col, F.explode(picks).alias("_p"))
        .select(id_col, F.col("_p.pos").alias("pos"), F.col("_p.fp").alias("fp"))
        .distinct()
    )


def line_language_profile_staged(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PATCH 2 (measured 1.0s vs 5.9-7.0s at sf0.1): stage ``_lines``
    and ``_langs`` as bound columns so the six label counts + dominant
    walk read the materialized classification instead of re-deriving
    it per consumer (no CSE on the interpreted HOF path). The classify
    rule is byte-identical to the shipped operator's."""
    from datacatalog_tag_engine_spark.pipeline.text import LANG_MARKERS

    t = F.coalesce(F.col(text_col), F.lit(""))
    lines_e = F.filter(F.split(t, r"\n"), lambda l: F.length(F.trim(l)) > 0)

    def classify(line: Column) -> Column:
        words = F.filter(F.split(F.lower(line), r"\s+"), lambda w_: F.length(w_) > 0)
        scores = {}
        for lang, markers in LANG_MARKERS.items():
            arr = F.array(*[F.lit(mk) for mk in markers])
            scores[lang] = F.size(F.filter(words, lambda w_: F.array_contains(arr, w_)))
        has_cjk = F.size(F.regexp_extract_all(line, F.lit(r"[一-鿿]"), 0)) > 0
        best = F.lit("und")
        best_score = F.lit(0)
        for lang in reversed(list(LANG_MARKERS)):
            best = F.when(scores[lang] >= best_score, F.lit(lang)).otherwise(best)
            best_score = F.greatest(best_score, scores[lang])
        return F.when(has_cjk, F.lit("zh")).otherwise(
            F.when(best_score > 0, best).otherwise(F.lit("und"))
        )

    base = docs.select(id_col, lines_e.alias("_lines"))
    base = base.select(
        id_col, "_lines", F.transform(F.col("_lines"), classify).alias("_langs")
    )
    langs = F.col("_langs")
    labels = ["en", "de", "fr", "es", "zh", "und"]

    def _eq(lab: str):
        return lambda x: x == F.lit(lab)

    counts = {lab: F.size(F.filter(langs, _eq(lab))) for lab in labels}
    dom = F.lit("und")
    dom_n = F.lit(-1)
    for lab in reversed(labels):
        dom = F.when(counts[lab] >= dom_n, F.lit(lab)).otherwise(dom)
        dom_n = F.greatest(dom_n, counts[lab])
    n_langs = sum((counts[lab] > 0).cast("int") for lab in labels if lab != "und")
    dom = F.when(F.size(F.col("_lines")) == 0, F.lit("und")).otherwise(dom)
    return base.select(
        id_col,
        F.size(F.col("_lines")).cast("int").alias("n_lines"),
        dom.alias("dominant_lang"),
        dom_n.cast("int").alias("n_dominant_lines"),
        n_langs.cast("int").alias("n_langs"),
        (n_langs >= 2).alias("is_mixed"),
    )


def main() -> None:
    from datacatalog_tag_engine_spark.pipeline.text import (
        line_language_profile,
        winnowing_fingerprints,
    )
    from datacatalog_tag_engine_spark.session import get_spark, register_testdata

    spark = get_spark("queued-patches")
    spark.sparkContext.setLogLevel("ERROR")
    register_testdata(spark, sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    docs = spark.table("documents")

    sub = docs.limit(200)
    for label, old, new in (
        ("winnowing", winnowing_fingerprints, winnowing_fingerprints_fused),
        ("line_lang", line_language_profile, line_language_profile_staged),
    ):
        a = sorted(tuple(r) for r in old(sub).collect())
        b = sorted(tuple(r) for r in new(sub).collect())
        print(f"{label}: identical on 200 docs = {a == b}")
        for name, fn in (("shipped", old), ("patched", new)):
            times = []
            for _ in range(3):
                t0 = time.time()
                fn(docs).write.mode("overwrite").format("noop").save()
                times.append(round(time.time() - t0, 2))
            print(f"  {name}: {times}")


if __name__ == "__main__":
    main()
