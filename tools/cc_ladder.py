"""Connected-components chain ladder: the d22 claim measured. For a
path graph of n nodes (the worst case for min-label propagation:
diameter = n), run star contraction on Spark, verify the labeling
exactly (every node -> 0), and report wall; rounds come from the
exact pure-Python replay of the same alternating large-star /
small-star operators (deterministic — the algorithms are
data-dependent only, so the replay's round count IS Spark's). The
min-label column is ANALYTIC: its round count on a path equals the
diameter by construction — running it is 100x the wall for the same
answer, which is the point of the table.

Usage: python tools/cc_ladder.py [chain_lengths ...]   (default 100 1000 10000)
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datacatalog_tag_engine_spark.pipeline.dedup import neardup_clusters_star
from datacatalog_tag_engine_spark.session import get_spark


def sim_rounds(n: int) -> int:
    """Exact replay of the alternating star operators on the n-chain."""

    def large_star(E):
        nb = defaultdict(set)
        for u, v in E:
            nb[u].add(v)
            nb[v].add(u)
        out = set()
        for u, N in nb.items():
            m = min(N | {u})
            for v in N:
                if v > u and v != m:
                    out.add((v, m))
        return out

    def small_star(E):
        nb = defaultdict(set)
        for u, v in E:
            nb[max(u, v)].add(min(u, v))
        out = set()
        for u, N in nb.items():
            m = min(N)
            for v in N:
                if v != m:
                    out.add((v, m))
            out.add((u, m))
        return {(a, b) for a, b in out if a != b}

    E = {(i, i + 1) for i in range(n)}
    for r in range(1, 100):
        E2 = small_star(large_star(E))
        if E2 == E:
            return r
        E = E2
    raise RuntimeError("no convergence in 100 rounds")


def shallow_case(spark, m: int = 10_000, size: int = 5) -> dict:
    """The COMMON near-dup shape (the r12 defaulting decision's other
    half): m star-topology clusters of ``size`` docs — diameter 2, the
    boilerplate/mirror cluster shape. Min-label (escalation off, so
    the pure propagation path is what's timed) vs star contraction,
    labels asserted identical."""
    from datacatalog_tag_engine_spark.pipeline.dedup import neardup_clusters

    n = m * size
    docs = spark.range(n).withColumnRenamed("id", "doc_id")
    # cluster c = ids [c*size, (c+1)*size); edges hang every member off
    # the cluster minimum (diameter 2 through the center)
    pairs = spark.range(n).filter(f"id % {size} != 0").selectExpr(
        f"(id - id % {size}) as doc_a", "id as doc_b"
    )
    t0 = time.time()
    ml = neardup_clusters(
        docs, pairs, driver_edge_limit=0, escalate_to_star=False
    ).collect()
    ml_wall = round(time.time() - t0, 1)
    t0 = time.time()
    st = neardup_clusters_star(docs, pairs).collect()
    st_wall = round(time.time() - t0, 1)
    want = {r["doc_id"]: r["doc_id"] - r["doc_id"] % size for r in ml}
    assert {r["doc_id"]: r["cluster_id"] for r in ml} == want
    assert {r["doc_id"]: r["cluster_id"] for r in st} == want
    return {
        "shape": f"{m} clusters x {size} docs (diameter 2)",
        "minlabel_wall_sec": ml_wall,
        "star_wall_sec": st_wall,
    }


def escalation_case(spark, n: int = 50_000) -> dict:
    """The r12 escalation contract at its design point: a 50k chain
    under the DEFAULT round budget — min-label burns its budget,
    escalates to star, and still returns the exact labeling (diameter
    50k >> 20 rounds; pre-r12 this raised)."""
    from datacatalog_tag_engine_spark.pipeline.dedup import neardup_clusters

    docs = spark.range(n + 1).withColumnRenamed("id", "doc_id")
    pairs = spark.range(n).selectExpr("id as doc_a", "id + 1 as doc_b")
    t0 = time.time()
    labels = neardup_clusters(docs, pairs, driver_edge_limit=0).collect()
    wall = round(time.time() - t0, 1)
    assert len(labels) == n + 1 and all(r["cluster_id"] == 0 for r in labels)
    t0 = time.time()
    direct = neardup_clusters_star(docs, pairs).collect()
    direct_wall = round(time.time() - t0, 1)
    assert all(r["cluster_id"] == 0 for r in direct)
    return {
        "chain": n,
        "escalated_wall_sec": wall,  # 20 min-label rounds + star
        "direct_star_wall_sec": direct_wall,
        "star_rounds": sim_rounds(n),
    }


def main() -> None:
    lengths = [int(a) for a in sys.argv[1:]] or [100, 1000, 10000]
    spark = get_spark("cc-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for n in lengths:
        docs = spark.range(n + 1).withColumnRenamed("id", "doc_id")
        pairs = (
            spark.range(n)
            .selectExpr("id as doc_a", "id + 1 as doc_b")
        )
        t0 = time.time()
        labels = neardup_clusters_star(docs, pairs).collect()
        wall = round(time.time() - t0, 1)
        assert len(labels) == n + 1 and all(r["cluster_id"] == 0 for r in labels)
        row = {
            "chain": n,
            "star_rounds": sim_rounds(n),
            "star_wall_sec": wall,
            "minlabel_rounds_needed": n,  # diameter, by construction
        }
        out.append(row)
        print(json.dumps(row), flush=True)
    shallow = shallow_case(spark)
    print(json.dumps(shallow), flush=True)
    esc = escalation_case(spark)
    print(json.dumps(esc), flush=True)
    print(json.dumps({"rungs": out, "shallow": shallow, "escalation": esc}))


if __name__ == "__main__":
    main()
