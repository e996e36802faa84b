"""KMV sketch tests: accuracy, exact-below-k, and the distributed
merge property."""

from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline import sketches as K


def test_exact_when_fewer_than_k(spark):
    df = spark.createDataFrame([(i % 17,) for i in range(1000)], "v long")
    sk = K.kmv_sketch(df, "v", k=256)
    assert K.kmv_estimate(sk, k=256) == 17.0


def test_estimate_accuracy(spark):
    df = spark.table("lineitem")
    true = df.select(F.countDistinct("l_orderkey")).first()[0]
    est = K.kmv_estimate(K.kmv_sketch(df, "l_orderkey", k=256), k=256)
    assert abs(est - true) / true < 0.15  # ~1/sqrt(254) ≈ 6% expected


def test_merge_equals_global(spark):
    df = spark.table("lineitem")
    # per-"partition" sketches (split by parity) merge to the global one
    a = K.kmv_sketch(df.filter(F.col("l_orderkey") % 2 == 0), "l_orderkey", k=64)
    b = K.kmv_sketch(df.filter(F.col("l_orderkey") % 2 == 1), "l_orderkey", k=64)
    merged = K.kmv_merge([a, b], k=64)
    direct = K.kmv_sketch(df, "l_orderkey", k=64)
    assert merged == direct
    assert K.kmv_estimate(merged, k=64) == K.kmv_estimate(direct, k=64)


def test_declarative_form_matches_driver_side(spark):
    df = spark.table("lineitem")
    row = K.kmv_distinct_df(df, "l_orderkey", k=64).first()
    est = K.kmv_estimate(K.kmv_sketch(df, "l_orderkey", k=64), k=64)
    assert row["k_used"] == 64
    assert abs(row["estimate"] - est) < 0.01


def test_ivf_kmeans_recall_beats_floor(spark):
    """k-means-trained IVF centroids: same search machinery as the
    deterministic seeding, recall@5 above a floor on the real corpus."""
    from pyspark.sql import functions as F

    from datacatalog_tag_engine_spark.pipeline.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.table("embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cents = kmeans_centroids(emb, num_cells=8)
    assert cents.count() == 8
    approx = ivf_topk(emb, queries, k=5, num_cells=8, cents=cents)
    exact = brute_force_topk(emb, queries, k=5)
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .count()
    )
    recall = hits / exact.count()
    assert recall >= 0.4  # one probe of eight cells; floor, not a tuning claim
    # every query returns exactly k rows (cells are non-degenerate)
    per_q = approx.groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in per_q)


def test_kmeans_exact_matches_pure_python_replay(spark):
    """kmeans_centroids_exact is engine-portable by construction: an
    independent pure-Python integer replay from the same parquet must
    reproduce the trained micro-unit centroids bit-for-bit, Lloyd
    iteration by Lloyd iteration (quantize -> first-k init -> exact
    integer argmin with lowest-cell ties -> integer-rounded update)."""
    import decimal

    import duckdb

    from datacatalog_tag_engine_spark.pipeline.similarity import (
        kmeans_centroids_exact,
    )

    K, ITERS = 8, 3
    emb = spark.table("embeddings")
    got = {
        r["cell"]: list(r["cent_q"])
        for r in kmeans_centroids_exact(emb, num_cells=K, iters=ITERS).collect()
    }

    # -- independent replay (no Spark) -----------------------------------
    con = duckdb.connect()
    rows = con.execute(
        "select vec_id, embedding from '/root/testdata/sf0.001/embeddings.parquet' order by vec_id"
    ).fetchall()

    def quant(x):
        # mirror Spark's round(double, 0): BigDecimal on the shortest
        # decimal repr, HALF_UP — Python's repr() is the same shortest
        # round-trip string, Decimal quantize the same HALF_UP
        return int(
            decimal.Decimal(repr(float(x) * 1e6)).quantize(
                0, rounding=decimal.ROUND_HALF_UP
            )
        )

    vecs = [[quant(x) for x in v] for _, v in rows]
    cents = [list(v) for v in vecs[:K]]

    def requant(s, c):
        return (2 * s + c) // (2 * c) if s >= 0 else -((2 * (-s) + c) // (2 * c))

    for _ in range(ITERS):
        sums = [[0] * len(cents[0]) for _ in range(K)]
        counts = [0] * K
        for v in vecs:
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(v, c)), ci)
                for ci, c in enumerate(cents)
            )[1]
            counts[best] += 1
            for i, x in enumerate(v):
                sums[best][i] += x
        cents = [
            [requant(s, counts[ci]) for s in sums[ci]] if counts[ci] else cents[ci]
            for ci in range(K)
        ]

    assert got == {ci: c for ci, c in enumerate(cents)}


def test_ivf_search_accepts_exact_centroids(spark):
    """The exact trainer's centroid table plugs into the shared IVF
    search path: full per-query result sets and recall above the same
    floor as the MLlib-trained form."""
    from pyspark.sql import functions as F

    from datacatalog_tag_engine_spark.pipeline.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids_exact,
    )

    emb = spark.table("embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cents = kmeans_centroids_exact(emb, num_cells=8, iters=2)
    approx = ivf_topk(emb, queries, k=5, num_cells=8, cents=cents)
    per_q = approx.groupBy("query_id").count().collect()
    assert len(per_q) == 5 and all(r["count"] == 5 for r in per_q)
    exact = brute_force_topk(emb, queries, k=5)
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .count()
    )
    assert hits / exact.count() >= 0.4


def test_ivf_external_queries_score_own_vectors(spark):
    """Queries that are NOT corpus rows probe with their own vectors
    (regression: the id-lookup form silently dropped them)."""
    from pyspark.sql import functions as F

    from datacatalog_tag_engine_spark.pipeline.similarity import brute_force_topk, ivf_topk

    emb = spark.table("embeddings")
    corpus = emb.filter(F.col("vec_id") >= 100)
    external = emb.filter(F.col("vec_id") < 3)  # ids absent from corpus
    got = ivf_topk(corpus, external, k=5, num_cells=8, nprobe=8)
    per_q = {r["query_id"]: r["count"] for r in got.groupBy("query_id").count().collect()}
    assert set(per_q) == {0, 1, 2} and all(c == 5 for c in per_q.values())
    # nprobe == num_cells degenerates to exact: must equal brute force
    exact = brute_force_topk(corpus, external, k=5)
    diff = got.select("query_id", "neighbor_id").exceptAll(
        exact.select("query_id", "neighbor_id")
    )
    assert diff.count() == 0


def test_pq_encode_valid_above_100_codes(spark):
    """Regression: the packed argmin must hold codebooks larger than the
    old fixed multiplier (num_codes > 100 silently corrupted codes)."""
    from pyspark.sql import functions as F

    from datacatalog_tag_engine_spark.pipeline.similarity import pq_codebook, pq_encode

    emb = spark.table("embeddings").filter(F.col("vec_id") < 150)
    cb = pq_codebook(emb, num_subspaces=2, num_codes=120, dim=64)
    codes = pq_encode(emb, num_subspaces=2, num_codes=120, dim=64, codebook=cb)
    rows = codes.collect()
    assert {r["m"] for r in rows} == {0, 1}
    assert all(0 <= r["code"] < 120 for r in rows)
    # a codebook row encodes as itself: vector c's subspace is exactly
    # codebook entry c, so distance 0 wins for every subspace
    cb_ids = [r["vec_id"] for r in emb.orderBy("vec_id").limit(120).collect()]
    own = {(r["vec_id"], r["m"]): r["code"] for r in rows}
    for c, vid in enumerate(cb_ids[:25]):
        assert own[(vid, 0)] == c and own[(vid, 1)] == c


def test_hll_sketch_family_accuracy_and_merge(spark):
    from datacatalog_tag_engine_spark.pipeline.sketches import (
        hll_estimate,
        hll_sketch_by_group,
    )

    li = spark.table("lineitem")
    sk = hll_sketch_by_group(li, "l_returnflag", "l_orderkey")
    per = {r["l_returnflag"]: r["estimate"] for r in hll_estimate(sk, "l_returnflag").collect()}
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    for flag, n in exact.items():
        assert abs(per[flag] - n) / n < 0.05, (flag, per[flag], n)
    # merged rollup ~= global distinct (per-group sketches union away
    # cross-group overlap, unlike summing the estimates)
    merged = hll_estimate(sk).first()["estimate"]
    g = li.select("l_orderkey").distinct().count()
    assert abs(merged - g) / g < 0.05, (merged, g)


def test_hll_estimate_merges_partials_per_group(spark):
    from datacatalog_tag_engine_spark.pipeline.sketches import (
        hll_estimate,
        hll_sketch_by_group,
    )

    li = spark.table("lineitem")
    # two "daily" partials per group, unioned — must roll up to ONE row
    # per group covering the union of both days
    day1 = hll_sketch_by_group(li.filter("l_orderkey % 2 = 0"), "l_returnflag", "l_orderkey")
    day2 = hll_sketch_by_group(li.filter("l_orderkey % 2 = 1"), "l_returnflag", "l_orderkey")
    merged = hll_estimate(day1.unionByName(day2), "l_returnflag")
    rows = merged.collect()
    assert len(rows) == li.select("l_returnflag").distinct().count()
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_orderkey").alias("n")).collect()
    }
    for r in rows:
        assert abs(r["estimate"] - exact[r["l_returnflag"]]) / exact[r["l_returnflag"]] < 0.05
