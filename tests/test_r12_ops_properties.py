"""Exhaustive / model-based properties for the r12-queued operators'
arithmetic cores — the pieces whose edge cases (empty stages, more
stages than rows, cumsum boundaries) a single corpus draft can't
exercise."""

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline.export import resharding_plan
from datacatalog_tag_engine_spark.pipeline.sampling import (
    _ntile_from_rank,
    curriculum_order,
    global_rank,
)


def _py_ntile(rank: int, n_rows: int, n_stages: int) -> int:
    """The SQL-standard NTILE model: first (n mod s) stages get
    ceil(n/s) rows, the rest floor."""
    q, rem = divmod(n_rows, n_stages)
    boundary = rem * (q + 1)
    if rem > 0 and rank <= boundary:
        return (rank - 1) // (q + 1) + 1
    return rem + (rank - 1 - boundary) // max(q, 1) + 1


def test_ntile_from_rank_matches_model_exhaustively(spark):
    """The rank->stage formula equals the Python NTILE model on
    boundary-rich (n_rows, n_stages) pairs — including n_rows <
    n_stages (each row its own stage) and n_rows == 1 — and the model
    itself equals Spark's engine F.ntile, so formula == engine by
    transitivity over every rank of every checked pair."""
    # model vs formula for boundary-rich pairs, one job each
    for n, s in [(1, 1), (1, 8), (5, 8), (8, 8), (9, 8), (40, 7), (40, 8), (37, 5)]:
        rows = spark.createDataFrame([(r,) for r in range(1, n + 1)], "r long")
        out = {
            row["r"]: row["nt"]
            for row in rows.select(
                "r", _ntile_from_rank(F.col("r"), n, s).alias("nt")
            ).collect()
        }
        assert out == {r: _py_ntile(r, n, s) for r in range(1, n + 1)}, (n, s)
    # model vs Spark's F.ntile, exhaustively, driver-side
    from pyspark.sql.window import Window

    for n, s in [(5, 8), (9, 4), (40, 7), (1, 3)]:
        rows = spark.createDataFrame([(r,) for r in range(1, n + 1)], "r long")
        w = Window.orderBy("r")
        eng = {
            row["r"]: row["nt"]
            for row in rows.select("r", F.ntile(s).over(w).alias("nt")).collect()
        }
        assert eng == {r: _py_ntile(r, n, s) for r in range(1, n + 1)}, (n, s)


def test_resharding_plan_matches_cumsum_model(spark):
    """Deterministic model check over manifests with empty shards,
    gaps in shard ids, giant shards, and an all-tiny tail: new_shard ==
    cumsum_before // target, monotone, conservation holds."""
    manifests = [
        [(0, 10), (1, 0), (2, 999), (3, 1)],
        [(5, 100), (7, 100), (11, 100)],          # id gaps
        [(i, 3) for i in range(30)],               # all-tiny tail
        [(0, 5000)],                               # one giant shard
        [(0, 0), (1, 0)],                          # empty manifest rows
    ]
    for rows in manifests:
        target = 250
        m = spark.createDataFrame(rows, "shard int, n_docs long")
        out = sorted(resharding_plan(m, target).collect(), key=lambda r: r["shard"])
        acc = 0
        expect = []
        for shard, n in sorted(rows):
            expect.append((shard, n, acc // target, acc // target != shard, n > target))
            acc += n
        got = [
            (r["shard"], r["n_docs"], r["new_shard"], r["moved"], r["needs_split"])
            for r in out
        ]
        assert got == expect, rows
        ns = [r["new_shard"] for r in out]
        assert ns == sorted(ns)
        assert sum(r["n_docs"] for r in out) == sum(n for _, n in rows)


def test_global_rank_is_a_permutation_with_ties_broken(spark):
    """Duplicate scores with unique-id tie-break: ranks are exactly
    1..n, and equal-score rows rank in id order (the strict-total-order
    contract the caller provides)."""
    rows = [(i, float(i % 5)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = global_rank(
        df, [F.col("score").desc(), F.col("doc_id")], rank_col="r"
    ).collect()
    assert sorted(r["r"] for r in out) == list(range(1, 201))
    by_rank = sorted(out, key=lambda r: r["r"])
    for a, b in zip(by_rank, by_rank[1:]):
        assert (a["score"], -a["doc_id"]) >= (b["score"], -b["doc_id"]) or (
            a["score"] > b["score"]
        )
        if a["score"] == b["score"]:
            assert a["doc_id"] < b["doc_id"]


def test_curriculum_gate_boundary(spark):
    """At exactly the gate boundary both physical strategies produce
    the same rows (window_max == n uses the window; window_max == n-1
    uses global_rank)."""
    rows = [(i, float((i * 7) % 13)) for i in range(50)]
    scores = spark.createDataFrame(rows, "doc_id long, quality_score double")
    a = sorted(
        tuple(r) for r in curriculum_order(scores, window_max=50).collect()
    )
    b = sorted(
        tuple(r) for r in curriculum_order(scores, window_max=49).collect()
    )
    assert a == b


def _mg_fold(batches: list[list[str]], budget: int) -> tuple[dict, int]:
    """The per-partition fold exactly as mapInPandas runs it: exact
    batch counts merged in, then the PRODUCTION reduction
    (text._mg_reduce — the same single definition the batch pass and
    the streaming monitor import, so this model checks the shipped
    arithmetic, not a copy of it)."""
    import collections

    from datacatalog_tag_engine_spark.pipeline.text import _mg_reduce

    counters: collections.Counter = collections.Counter()
    total = 0
    for batch in batches:
        total += len(batch)
        counters.update(collections.Counter(batch))
        counters = _mg_reduce(counters, budget)
    return dict(counters), total


def test_mg_fold_guarantee_randomized():
    """The t37 completeness guarantee, model-checked over randomized
    streams/partitionings/budgets: for EVERY split of a stream into
    partitions and batches, the union of per-partition MG survivors
    contains every token whose global count strictly exceeds
    N/budget — hence every heavy hitter at any k <= budget. Also pins
    the size invariant (each summary <= budget keys) and the
    undercount direction (stored count never exceeds the true count)."""
    import random

    rng = random.Random(12)
    for trial in range(200):
        n = rng.randrange(1, 400)
        vocab = rng.randrange(1, 30)
        # zipf-ish skew so some tokens genuinely cross the threshold
        stream = [f"t{min(rng.randrange(vocab), rng.randrange(vocab))}" for _ in range(n)]
        budget = rng.randrange(1, 12)
        n_parts = rng.randrange(1, 5)
        parts: list[list[list[str]]] = [[] for _ in range(n_parts)]
        # random contiguous split into partitions, then random batching
        idx = sorted(rng.randrange(n + 1) for _ in range(n_parts - 1))
        for i, chunk in enumerate(zip([0] + idx, idx + [n])):
            lo, hi = chunk
            sub = stream[lo:hi]
            batches = []
            while sub:
                cut = rng.randrange(1, len(sub) + 1)
                batches.append(sub[:cut])
                sub = sub[cut:]
            parts[i] = batches
        true_counts: dict[str, int] = {}
        for t in stream:
            true_counts[t] = true_counts.get(t, 0) + 1
        survivors: set[str] = set()
        total_seen = 0
        for batches in parts:
            summary, part_total = _mg_fold(batches, budget)
            assert len(summary) <= budget
            for t, c in summary.items():
                assert 0 < c <= true_counts[t], (trial, t)
            survivors |= set(summary)
            total_seen += part_total
        assert total_seen == n
        for t, c in true_counts.items():
            if c * budget > n:  # strictly above N/budget
                assert t in survivors, (trial, t, c, n, budget)
