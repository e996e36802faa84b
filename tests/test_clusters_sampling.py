"""Near-dup clustering (connected components) and reproducible
sampling tests."""

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline import dedup as DD
from datacatalog_tag_engine_spark.pipeline import sampling as S


def test_clusters_transitive(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    # chain 0-1-2, pair 3-4, singleton 5
    pairs = spark.createDataFrame([(0, 1), (1, 2), (3, 4)], "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in DD.neardup_clusters(docs, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


def test_clusters_on_real_neardups(spark):
    docs = spark.table("documents")
    pairs = DD.minhash_dedup(docs, threshold=0.5)
    labels = DD.neardup_clusters(docs, pairs)
    n_pairs = pairs.count()
    merged = labels.filter(F.col("doc_id") != F.col("cluster_id")).count()
    assert labels.count() == docs.count()
    assert 0 < merged <= n_pairs
    # keeping only canonicals removes exactly the merged docs
    keep = labels.filter(F.col("doc_id") == F.col("cluster_id"))
    assert keep.count() == docs.count() - merged


def test_apply_neardup_dedup(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(6)], "doc_id long, source string"
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2), (3, 4)], "doc_a long, doc_b long")
    clusters = DD.neardup_clusters(docs, pairs)
    kept = DD.apply_neardup_dedup(docs, clusters)
    assert {r["doc_id"] for r in kept.collect()} == {0, 3, 5}
    assert kept.columns == docs.columns  # payload passes through


def test_deterministic_sample_reproducible(spark):
    docs = spark.table("documents")
    a = {r["doc_id"] for r in S.deterministic_sample(docs, "doc_id", 0.2).collect()}
    b = {r["doc_id"] for r in S.deterministic_sample(docs.repartition(3), "doc_id", 0.2).collect()}
    assert a == b  # partitioning-independent
    assert 0.1 < len(a) / docs.count() < 0.3
    # nested fractions: a 10% sample is a subset of the 20% sample
    c = {r["doc_id"] for r in S.deterministic_sample(docs, "doc_id", 0.1).collect()}
    assert c <= a


def test_stratified_sample(spark):
    docs = spark.table("documents")
    out = S.stratified_deterministic_sample(docs, "doc_id", "lang", {"en": 0.0})
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert "en" not in langs
    # unlisted strata keep everything
    others = docs.filter(F.col("lang") != "en").count()
    assert out.count() == others


def test_histogram_buckets(spark):
    df = spark.createDataFrame([(v,) for v in [1, 49, 50, 99, 100, 5000]], "v long")
    got = {r["bucket"]: (r["lo"], r["n"]) for r in S.histogram(df, F.col("v"), 50, max_buckets=3).collect()}
    assert got == {0: (0.0, 2), 1: (50.0, 2), 2: (100.0, 2)}  # 5000 clamps into last


def test_mixture_weights_invariants(spark):
    docs = spark.table("documents")
    rows = S.mixture_weights(docs, alpha=0.5, budget_tokens=10_000).collect()
    assert len(rows) == docs.select("source").distinct().count()
    total_w = sum(r["weight"] for r in rows)
    assert abs(total_w - 1.0) < 1e-4  # probabilities normalize
    for r in rows:
        assert 0 < r["rate"] <= 1.0
    # alpha -> 0 flattens toward uniform: max/min weight ratio shrinks
    flat = S.mixture_weights(docs, alpha=0.01).collect()
    ratio = lambda rs: max(r["weight"] for r in rs) / min(r["weight"] for r in rs)
    assert ratio(flat) < ratio(rows)


def test_temperature_mixture_sample_reproducible(spark):
    docs = spark.table("documents")
    a = {r["doc_id"] for r in S.temperature_mixture_sample(docs, budget_tokens=2000).collect()}
    b = {
        r["doc_id"]
        for r in S.temperature_mixture_sample(docs.repartition(5), budget_tokens=2000).collect()
    }
    assert a == b  # layout-independent membership
    assert 0 < len(a) < docs.count()  # the budget actually filters


def test_hashed_linear_score_bounds_and_weights_override(spark):
    from datacatalog_tag_engine_spark.pipeline import text as TXT

    docs = spark.table("documents")
    out = {r["doc_id"]: r for r in TXT.hashed_linear_score(docs).collect()}
    assert len(out) == docs.count()
    assert all(0.0 <= r["score"] <= 1.0 for r in out.values())
    # all-zero trained weights -> sigmoid(0) = 0.5 for every doc
    zeros = spark.range(1024).selectExpr("cast(id as int) as bucket", "cast(0.0 as double) as w")
    flat = TXT.hashed_linear_score(docs, weights=zeros).collect()
    assert all(r["score"] == 0.5 for r in flat)


def test_clusters_unconverged_chain_escalates_to_star(spark):
    """A chain whose diameter exceeds the min-label round budget must
    never silently return a split cluster. The r12 contract: the
    distributed regime ESCALATES to star contraction (identical
    labeling, O(log n) rounds) by default; escalate_to_star=False
    restores the old raise."""
    import pytest

    n = 12
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    chain = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long")
    # default: a 3-round budget on a 12-chain escalates and still
    # returns the EXACT answer (one component rooted at 0)
    esc = DD.neardup_clusters(docs, chain, max_iterations=3, driver_edge_limit=0)
    assert {r["cluster_id"] for r in esc.collect()} == {0}
    # opting out restores the raise-on-budget contract
    with pytest.raises(RuntimeError, match="did not converge"):
        DD.neardup_clusters(
            docs, chain, max_iterations=3, driver_edge_limit=0,
            escalate_to_star=False,
        )
    # enough rounds: min-label itself resolves the whole chain
    got = DD.neardup_clusters(docs, chain, max_iterations=n + 2, driver_edge_limit=0)
    assert {r["cluster_id"] for r in got.collect()} == {0}


def test_simhash_wide_bits_carry_signal(spark):
    """Regression: bits > 16 used to silently zero every bit above 15."""
    import pytest

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta{i}") for i in range(20)], "doc_id long, text string"
    )
    fp = {r["doc_id"]: r["simhash"] for r in DD.simhash(docs, bits=32).collect()}
    assert any(v >= (1 << 16) for v in fp.values())  # high bits are live
    with pytest.raises(ValueError, match="60"):
        DD.simhash(docs, bits=64)


def test_sample_threshold_rounds_half_up(spark):
    """Regression: int(0.57*10000) truncates to 5699 in binary float —
    the threshold must round half-up so any engine computing the
    product exactly agrees on every bucket."""
    df = spark.createDataFrame([(i,) for i in range(3000)], "doc_id long")
    got = S.deterministic_sample(df, "doc_id", 0.57)
    bucket = S.hash_bucket(F.col("doc_id"))
    expected = df.filter(bucket < 5700)  # the exact-decimal threshold
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
    strat = S.stratified_deterministic_sample(
        df.withColumn("src", F.lit("a")), "doc_id", "src", {"a": 0.57}
    )
    assert strat.count() == got.count()


def test_mixture_rate_zero_for_zero_token_source(spark):
    """Regression: least() skips NULLs, so budget*weight/0 used to give
    a zero-token source rate 1.0 instead of 0.0."""
    docs = spark.createDataFrame(
        [(i, "full", "alpha beta gamma") for i in range(10)]
        + [(100 + i, "empty", "   ") for i in range(5)],
        "doc_id long, source string, text string",
    )
    rates = {r["source"]: r for r in S.mixture_weights(docs, budget_tokens=10).collect()}
    assert rates["empty"]["n_tokens"] == 0
    assert rates["empty"]["rate"] == 0.0
    assert rates["full"]["rate"] > 0
    # and the materialized mix keeps nothing from the empty source
    mixed = S.temperature_mixture_sample(docs, budget_tokens=10)
    assert mixed.filter(F.col("source") == "empty").count() == 0


def test_unionfind_and_propagation_regimes_agree(spark):
    """The driver union-find (small edge sets) and the distributed
    min-label propagation must produce the IDENTICAL labeling on the
    real near-dup graph."""
    docs = spark.table("documents")
    pairs = DD.minhash_dedup(docs, threshold=0.5)
    fast = {(r["doc_id"], r["cluster_id"])
            for r in DD.neardup_clusters(docs, pairs).collect()}
    slow = {(r["doc_id"], r["cluster_id"])
            for r in DD.neardup_clusters(docs, pairs, driver_edge_limit=0).collect()}
    assert fast == slow and len(fast) == docs.count()


def test_unionfind_matches_propagation_on_random_graphs(spark):
    """Property check: on randomized graphs (self-loops, duplicate and
    reversed edges, chains, isolated docs) the driver union-find and
    the distributed propagation — two independent implementations —
    must agree exactly. A pure-Python BFS referee confirms both."""
    import random

    rng = random.Random(20260814)
    for trial in range(5):
        n = rng.randint(5, 40)
        m = rng.randint(0, 60)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        pairs = spark.createDataFrame(
            edges or [(0, 0)], "doc_a long, doc_b long"
        )
        fast = {r["doc_id"]: r["cluster_id"] for r in DD.neardup_clusters(docs, pairs).collect()}
        slow = {r["doc_id"]: r["cluster_id"]
                for r in DD.neardup_clusters(docs, pairs, driver_edge_limit=0,
                                             max_iterations=n + 2).collect()}
        # referee: BFS connected components, min-id label
        adj = {i: set() for i in range(n)}
        for a, b in (edges or [(0, 0)]):
            adj[a].add(b)
            adj[b].add(a)
        want = {}
        for start in range(n):
            if start in want:
                continue
            comp, queue = {start}, [start]
            while queue:
                x = queue.pop()
                for y in adj[x]:
                    if y not in comp:
                        comp.add(y)
                        queue.append(y)
            label = min(comp)
            for x in comp:
                want[x] = label
        assert fast == want, f"trial {trial}: union-find vs BFS"
        assert slow == want, f"trial {trial}: propagation vs BFS"


def test_sample_k_per_group_exact_counts_and_determinism(spark):
    from datacatalog_tag_engine_spark.pipeline.sampling import sample_k_per_group

    docs = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(100)], "doc_id long, source string"
    )
    out = sample_k_per_group(docs, k=7)
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per == {"src0": 7, "src1": 7, "src2": 7}
    # groups smaller than k keep everything
    small = docs.filter(F.col("doc_id") < 4)
    assert sample_k_per_group(small, k=7).count() == 4
    # deterministic under repartitioning: same rows selected anywhere
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in sample_k_per_group(docs.repartition(13), k=7).collect())
    assert a == b
    # append stability: adding one new doc displaces at most one prior
    # selection per group
    grown = docs.unionByName(spark.createDataFrame([(1000, "src0")], "doc_id long, source string"))
    c = set(r["doc_id"] for r in sample_k_per_group(grown, k=7).collect())
    assert len(set(a) - c) <= 3  # at most one displacement per group


def test_perplexity_buckets_split_and_ordering(spark):
    from datacatalog_tag_engine_spark.pipeline.text import perplexity_buckets

    # 30 docs with a varying mix of common vs one-off vocabulary (a
    # continuous score spread), 10 of purely rare vocabulary: rare-word
    # docs score lowest (least LM-typical) and land in the tail
    rows = [(i, ("the common words appear often " * (i + 1)) + f"once{i}") for i in range(30)]
    rows += [(100 + i, f"zxqv{i} wkjy{i} qqzz{i}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = perplexity_buckets(docs).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) == {"head", "middle", "tail"}
    # every rare-vocab doc lands in the tail (the tail is the bottom
    # third of 40 docs, so it also picks up the lowest common docs)
    assert all(r["bucket"] == "tail" for r in out if r["doc_id"] >= 100)
    # bucket score ordering is total: min(head) >= max(middle) >= ...
    assert min(r["avg_logprob"] for r in by_bucket["head"]) >= max(
        r["avg_logprob"] for r in by_bucket["middle"]
    )
    assert min(r["avg_logprob"] for r in by_bucket["middle"]) >= max(
        r["avg_logprob"] for r in by_bucket["tail"]
    )
    import pytest

    with pytest.raises(ValueError, match="boundaries"):
        perplexity_buckets(docs, boundaries=(0.9, 0.1))


def test_epoch_plan_regimes_and_validation(spark):
    """Both regimes in one corpus: a tiny source gets constrained (its
    temperature-boosted target exceeds max_epochs x available) while a
    large one subsamples; zero-token sources owe nothing; bad
    parameters fail at call time."""
    import pytest

    from datacatalog_tag_engine_spark.pipeline.sampling import epoch_plan

    rows = (
        [(i, "word " * 100, "big") for i in range(50)]
        + [(100, "tiny doc here", "small")]
        + [(101, "", "empty")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    plan = {r["source"]: r for r in
            epoch_plan(docs, budget_tokens=5000, max_epochs=2.0).collect()}
    small, big, empty = plan["small"], plan["big"], plan["empty"]
    # tiny source: alpha=0.5 boosts its share far past 2 epochs of data
    assert small["is_constrained"] and small["shortfall_tokens"] > 0
    assert small["planned_tokens"] == round(small["n_tokens"] * 2.0)
    assert small["epochs"] > 2.0
    # big source: subsampling regime — plan delivers the full target
    assert not big["is_constrained"] and big["shortfall_tokens"] == 0
    assert big["planned_tokens"] == big["target_tokens"]
    # zero tokens -> weight 0, target 0, epochs NULL, nothing owed
    assert empty["n_tokens"] == 0 and empty["target_tokens"] == 0
    assert empty["epochs"] is None and not empty["is_constrained"]
    # totals reconcile: planned + shortfall == target, per source
    for r in plan.values():
        assert r["planned_tokens"] + r["shortfall_tokens"] == r["target_tokens"]

    with pytest.raises(ValueError, match="budget_tokens"):
        epoch_plan(docs, budget_tokens=0)
    with pytest.raises(ValueError, match="max_epochs"):
        epoch_plan(docs, budget_tokens=100, max_epochs=0)


def test_materialize_mixture_delivers_the_plan(spark):
    """The emitted multiset matches the plan: repeated sources appear
    floor(e) times plus a hash-selected remainder, subsampled sources
    appear at most once, epoch indexes are dense per doc, and the mix
    is layout-independent."""
    from datacatalog_tag_engine_spark.pipeline.sampling import (
        epoch_plan,
        materialize_mixture,
    )

    rows = (
        [(i, "word " * 100, "big") for i in range(50)]
        + [(100 + i, "tiny doc here now", "small") for i in range(4)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    plan = epoch_plan(docs, budget_tokens=5000, max_epochs=3.0)
    out = materialize_mixture(docs, plan)
    prows = {r["source"]: r for r in plan.collect()}
    emitted = out.collect()

    # per-doc copies: epoch indexes dense from 0
    by_doc = {}
    for r in emitted:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    for eps in by_doc.values():
        assert sorted(eps) == list(range(len(eps)))

    for src in ("big", "small"):
        e = prows[src]["planned_tokens"] / prows[src]["n_tokens"]
        n_src = sum(1 for r in rows if r[2] == src)
        n_out = sum(1 for r in emitted if r["source"] == src)
        import math

        lo = math.floor(e) * n_src
        hi = math.ceil(e) * n_src
        assert lo <= n_out <= hi, (src, e, n_out)
    # the constrained source really repeats
    small_e = prows["small"]["planned_tokens"] / prows["small"]["n_tokens"]
    assert small_e > 1
    assert max(len(v) for k, v in by_doc.items() if k >= 100) >= 2

    # layout independence
    re_emitted = sorted(
        (r["doc_id"], r["epoch"])
        for r in materialize_mixture(docs.repartition(7), plan).collect()
    )
    assert re_emitted == sorted((r["doc_id"], r["epoch"]) for r in emitted)
