"""Round-14 rotation bank: operators built in round 13, AFTER the r13
window froze (14 drafts + 4 re-certs + 32 fillers left no slot).
Same contract as every drafts file: DuckDB-proven here, wired into
__spark_entry__ at their rotation with the SQL generator moved
verbatim.

- d27_winnowing_dedup — contained-copy removal over d25's pair
  surface (dedup.winnowing_dedup): for every pair clearing
  min_overlap, the side with fewer surviving fingerprints drops
  (tie -> larger id). The substring-grain complement of d17's
  cluster canonical: a short doc pasted into a long one near-dups
  nothing globally, yet is pure redundancy — winnowing's guarantee
  makes the pair visible and this rule deletes the copy. Drops are
  independent pair decisions (containment is not symmetric), so
  chains resolve to "everything contained anywhere goes, maximal
  docs stay". Oracle: the d25 derivation + the CASE drop rule +
  a left join back to every doc.

- d28_winnowing_contamination — train/test decontamination at
  SUBSTRING grain (dedup.winnowing_contamination): a train doc is
  flagged when it shares >= min_shared winnowing fingerprints with
  any test doc — catches a verbatim leaked run of w + k - 1 chars
  where whole-document similarity and fixed-n-gram containment (t24)
  dilute below threshold. The join is fingerprint-bucketed train x
  test ONLY (the within-split quadrant that dominates d25 is never
  generated); the hot-fingerprint cap is computed over both splits.
  Split rule: the q101/q58 md5 bucket (doc_id % 10 == 0 -> test).

- d30_threshold_sweep_vs_exact — the d24 decision table joined to
  GROUND TRUTH (dedup.threshold_sweep_vs_exact): every LSH candidate
  carries its signature estimate AND its exact verified Jaccard
  (d16's surface at threshold 0), rolled up per lattice value with
  n_true / dedup_precision against the 0.5 dedup threshold. d24 says
  how much mass a threshold keeps; this says how much is REAL.
  Means ride the 1e4 micro lattice (engine-identical integer
  division — the s28 drift_micro discipline).

- s34_ivfpq_recall_from_index — serving recall of the PERSISTED
  IVF-PQ path (similarity.recall_profile over ivfpq_topk_from_index
  vs brute force): ADC is lossy by construction, so unlike s33's
  identity this measures a real approximation. recall_profile is the
  packaged form of the one recall join s05/s33 inline. Oracle: the
  wired s10 chain nested as the approx CTE + the s05 exact CTEs +
  the recall join.

- s35_knn_rank_profile — neighbor-quality decay of the s30 graph at
  RANK grain (similarity.knn_rank_profile): per rank, the cosine
  distribution (micro-lattice mean, exact min/max) and the mutual
  fraction — the QA table read before trusting the graph for
  SemDeDup-style curation (a collapsed space shows rank-1 mutuality
  far below 1). Edge-grain in, <= k rows out. Oracle: the wired s30
  derivation + one GROUP BY rank.

- q103_sigstore_metrics — per-batch acceptance accounting of the
  continuous ingest loop (metrics_sink on streaming.dedup's
  _sigstore_ingest_batch): (batch, n_in, n_accepted, n_cross_losers,
  n_within_losers), written batch-keyed (retry-idempotent) by the
  SAME function the stream and the q102 replay run — the ops monitor
  a production crawl loop watches. Loser counts are evidence counts,
  not a partition (a doc can lose both ways). Oracle: the q102
  unrolled derivation with a per-stage metrics select.

- q104_corpus_health — the per-source corpus DASHBOARD
  (profiling.corpus_health_report): volume, Gopher-gate survival,
  quality mass (micro lattice), PII exposure, token mass — each
  column a certified operator's own formula (t16/t02/t06/t01) joined
  at doc grain and rolled up once. The corpus-grain form of the
  reference's per-column DLP/coverage rollups. Oracle: nests the
  wired t02 + t16 strings, the t42 sequential PII stages (doc grain),
  and the t01 token regex.

- q105_curriculum_token_budget — token mass per curriculum stage
  (sampling.curriculum_token_budget): stage doc/token counts,
  cumulative tokens through stage N (what "train the first 3 stages"
  costs), per-stage share. q90's certified staging joined to t01's
  certified count; <= n_stages rows out. Oracle: nests the wired t02
  string + the q90 ntile + the t01 regex.

- t44_winnowing_params — the winnowing (k, w) decision table
  (text.winnowing_parameter_table): the d18 discipline applied to
  t43's knobs — per parameter pair, the guarantee length (w + k - 1)
  against the selection density (expected 2/(w+1), measured on this
  corpus — which also prices the d25/d27 join surface). One
  shuffle-free winnowing scan per pair, |params| rows out; densities
  on the 1e6 micro lattice. Oracle: one parameterized t43 derivation
  per pair (E.winnowing_sql(k, w)) + the gram-count aggregate.

- s36_topk_regret — per-rank cosine regret of the ADC serving path
  (similarity.topk_regret_profile): the magnitude QA s34's recall
  can't see — recall counts membership, regret measures the cosine
  given up per rank (approximate picks re-scored with TRUE cosines;
  ADC distances never compared to cosines). Edge-grain joins only;
  micro-lattice means; summed regret >= 0 pinned. Oracle: the wired
  s10 chain + corpus re-scoring + the exact per-rank cosines.

- q106_copy_audit_profile — the per-source rollup of the contained-
  copy audit (dedup.copy_audit_profile; the q88 pattern on the
  winnowing surface): per source, d27-rule drops and how many are
  contained in ANOTHER source's documents — the scrape/mirror signal.
  Same pair surface and drop rule as d27 (one derivation), two
  id-grain source joins, dimension-grain output. Oracle: the d27
  derivation kept at pair grain + source attribution + rollup.

- s37_nprobe_sweep — the nprobe DECISION TABLE
  (similarity.nprobe_recall_sweep; the d24/d18/t44 discipline applied
  to IVF serving's runtime knob): per candidate nprobe, mean serving
  recall vs the WORK it costs (n_scored = probed-cell populations
  minus self-hits, counted analytically — the sweep never
  materializes a pair join to count it). Monotone-and-saturates
  physics pinned (nprobe == num_cells -> recall 1.0, work ==
  queries x (corpus - 1)). Oracle: shared s03/s04 CTEs + one
  probe/score/recall block per nprobe, unioned.

- d29_incremental_winnowing — the copy-audit family's persisted
  artifact (dedup.build_winnowing_store / append_to_winnowing_store /
  incremental_winnowing_overlap): the d23 template applied to d25 —
  fingerprint the archive once as DISTINCT (doc, fp) rows with a
  (k, w)-pinning meta, append accepted deltas (retry-idempotent
  anti-join), serve the daily copy audit as delta x (store ∪ delta)
  with the resident x resident quadrant never generated and resident
  TEXT never read. Lifecycle identities proven (from-store == fresh
  delta-touching pairs; build+append == build(union); torn build
  fails loud). Measured at sf0.1 with a 10% delta: 9.4s vs 14.8s for
  the fresh full d25 — and the fresh path re-fingerprints the entire
  archive, so the gap scales with archive size. Oracle: the d25
  derivation with the d19 delta flag and delta-touching candidates.

- m07_multimodal_dup_rates — per-kind near-dup exposure
  (multimodal.neardup_rate_profile): the m-family's q88 — one row
  per modality with item count, pair count, items-in-pairs, and the
  dup item rate, over the SAME fixtures and pair surfaces m02/m03/m04
  certify. Payloads never enter the plan (ids only). Oracle: nests
  the three wired pair strings + the fixtures' analytic item counts.

r14 WINDOW ARITHMETIC (forecast; the ledger computes the binding
list at rotation): 14 bank drafts = 14 rotation slots (t44, s36,
q106, s37, and d29 joined after the first pricing run) + 1 expected re-cert (q102,
whose cached builder gains metrics_sink at rotation so q103 shares
the replay — see below); the remaining ~35 slots drain the aging
ledger (the 11 remaining r9-last-green rows, then the r10 cohort by
name order). All other r13 post-freeze changes are additive
operators outside certified paths, and the d25/q102 default-path
refactors were re-verified strict BEFORE the r13 record. Cap the r14
wiring test's ledger at rounds < 14.

QUEUED r14 ROUND-START OPTIMIZATION (measured, waiting only on the
freeze): winnowing_fingerprints currently stages the gram-STRING
array before hashing (the r12 CSE lesson applied conservatively);
fusing the hash into the gram transform (each element used once — no
CSE hazard) is value-IDENTICAL (asserted on real docs) and measured
6.4s stable vs 10.3-21.3s volatile at sf0.1 — the string-array churn
is also the likeliest source of the winnowing family's ~2x JVM-state
variance. Apply at r14 round start BEFORE the record; re-certs: t43
+ d25 (wired consumers of the changed function; d27/d28/q106/t44 are
bank drafts and re-prove in place).

SECOND QUEUED OPTIMIZATION, same class (measured 6x): t39's
line_language_profile computes `langs` — the expensive per-line
classification — as an EXPRESSION consumed by six label counts plus
the dominant walk; on Spark's interpreted HOF path (no CSE) the
classification re-runs per consumer. Staging `_lines`/`_langs` as
bound columns is value-identical (asserted on real docs) and drops
t39 from 5.9-7.0s to 1.0s at sf0.1. t40 has the same shape (its
O(L^2) duplicate mask feeds two consumers per grain) at small
absolute cost — stage both at r14 round start; re-certs: t39 + t40.
GENERAL RULE (now thrice-learned: t41/winnowing at r12, t39/t40
here): any HOF-derived array consumed by more than one output column
must be staged as a real column first. Third CANDIDATE (not queued):
gopher_filter re-derives its words/lines arrays across ~20 feature +
rule + fail-reason consumers; staging would shave the whole gate
family (t16 0.87s alone, q98/q100/q72/q59v2/q61 composites) but the
re-cert blast radius is the largest in the inventory — weigh at r14
against the window budget before committing to it.

PRICED at sf0.1 (tools/price_drafts.py, warm pass): d27 40.7s and
d28 22.1s — both ride the winnowing fingerprint surface, whose cost
on THIS fixture sits near the capped-join bound (see the r13 d25
rung: 6.6k distinct 8-grams carrying 554k rows; real corpora are
orders sparser); the max_df lever is the tuning knob and the rung
documents it. q103 18.9s standalone — AT ROTATION its entry must
share q102's "sigstore_replay" cache key (one build with
metrics_sink on; q102 reads accepted, q103 reads metrics) so the
replay is priced once, making q103's bench cost a metrics-table
read. d30 2.9s, s34 6.0s, s35 9.1s (recomputes the s30 graph —
inherent), q104 4.2s, q105 1.4s, m07 2.2s. After the winnow-ladder
re-targeting, d27/d28 are wired at max_df=100 (proofs re-run at the
new cap; quiet-box re-price: d27 40.7 -> 21.6s — the pair join
halves; d28 21.4s at either cap, SCAN-dominated: its train x test
join is already bounded by the 10%-sized test side, and two winnowing
scans (~10s each at sf0.1) are the floor — kept at 100 for one proof
surface). EXPECTED RE-CERT at r14:
q102_sigstore_ingest — its cached builder gains metrics_sink so q103
reads the same replay's metrics table (one build, two readers);
value-identical for q102's accepted output, but the cached-build
code changes, so the family re-certifies by policy. t44 priced
12.9s (four shuffle-free scans, audit cadence); s36 priced 2.7s
(edge-grain joins only); s37 priced 10.4s (8 cell-restricted
scoring passes + one exact pass — certification cadence, sample the
queries in production); q106 priced 39.7-42.9s — NOTE the winnowing
family's single-run prices carry ~2x JVM-state variance (back-to-back
same-process probes measured d27@100 at 21.6s and 48.8s, and q106
BELOW its own d27 subset; GC-bound HOF gram arrays) — converged
floors for these rows need the 5-pass --only instrument, and their
rotation slots should expect record noise of the t27 class.
"""

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as E
from datacatalog_tag_engine_spark.pipeline import dedup as DD

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def ddb():
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    yield con
    con.close()


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _sql_rows(con, sql):
    rel = con.sql(sql)
    cols = sorted(rel.columns)
    return sorted(tuple(r) for r in con.sql(f"SELECT {', '.join(cols)} FROM rel").fetchall())


# --- d27: winnowing contained-copy dedup -----------------------------------------


winnowing_dedup_sql = E.winnowing_dedup_sql  # moved verbatim into __spark_entry__ at the r14 rotation


def test_oracle_draft_winnowing_dedup(spark, ddb):
    # max_df=100: the winnow-ladder knee for this fixture (SCALE.md —
    # 42x less join mass than the 1000 default on the synthetic 8-gram
    # space); the rotation wires the SAME cap on both sides
    got = _rows(DD.winnowing_dedup(spark.table("documents"), max_df=100))
    want = _sql_rows(
        ddb, winnowing_dedup_sql(E.oracle_sql()["t43_winnowing"], max_df=100)
    )
    assert got == want
    assert len(got) == 500


def test_winnowing_dedup_drops_the_contained_copy(spark):
    """The contract: the pasted copy goes, the containing original
    stays; unrelated docs are untouched; in a containment CHAIN
    (A inside B inside C) the maximal doc survives and both contained
    docs drop."""
    import random

    rng = random.Random(11)
    words = lambda n, tag: " ".join(f"{tag}{rng.randrange(10**6)}" for _ in range(n))
    core = "the exact same paragraph of text appears in both documents verbatim"
    mid = words(60, "m") + " " + core + " " + words(60, "n")
    rows = [
        (1, core),                                    # contained in 2 and 3
        (2, mid),                                     # contains 1, inside 3
        (3, words(80, "x") + " " + mid + " " + words(80, "y")),  # maximal
        (4, words(90, "z")),                          # unrelated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in DD.winnowing_dedup(docs, min_overlap=0.5).collect()}
    assert not out[1]["keep"] and out[1]["n_containers"] >= 1
    assert not out[2]["keep"]
    assert out[3]["keep"] and out[3]["n_containers"] == 0
    assert out[4]["keep"]


# --- d28: winnowing train/test contamination -------------------------------------


winnowing_contamination_sql = E.winnowing_contamination_sql  # moved verbatim into __spark_entry__ at the r14 rotation


def test_oracle_draft_winnowing_contamination(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.sampling import hash_bucket

    docs = spark.table("documents")
    test = docs.filter(hash_bucket(F.col("doc_id"), 10) == 0)
    train = docs.filter(hash_bucket(F.col("doc_id"), 10) != 0)
    # same profile-driven cap as d27 (the winnow-ladder knee)
    got = _rows(DD.winnowing_contamination(train, test, max_df=100))
    want = _sql_rows(
        ddb,
        winnowing_contamination_sql(E.oracle_sql()["t43_winnowing"], max_df=100),
    )
    assert got == want
    assert len(got) > 0


def test_winnowing_contamination_finds_the_planted_leak(spark):
    """A benchmark answer pasted verbatim into one train doc flags
    exactly that doc; clean train docs are absent; within-split
    near-dups are NOT contamination (the quadrant is never joined)."""
    import random

    rng = random.Random(5)
    words = lambda n, tag: " ".join(f"{tag}{rng.randrange(10**6)}" for _ in range(n))
    answer = "the capital of france is paris and the answer is forty two"
    train = spark.createDataFrame(
        [
            (1, words(50, "a") + " " + answer + " " + words(50, "b")),
            (2, words(80, "c")),
            (3, words(80, "c")),  # near-dup of 2, same split: not flagged
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame([(100, answer)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in DD.winnowing_contamination(train, test).collect()}
    assert set(out) == {1}
    assert out[1]["n_test_docs"] == 1 and out[1]["n_shared_max"] >= 2


# --- d30: threshold sweep vs exact ground truth -----------------------------------


threshold_sweep_vs_exact_sql = E.threshold_sweep_vs_exact_sql  # moved verbatim into __spark_entry__ at the r14 rotation


def test_oracle_draft_threshold_sweep_vs_exact(spark, ddb):
    got = _rows(DD.threshold_sweep_vs_exact(spark.table("documents")))
    want = _sql_rows(ddb, threshold_sweep_vs_exact_sql())
    assert got == want
    assert len(got) > 1


def test_threshold_sweep_vs_exact_agrees_with_d24_and_d16(spark):
    """Cross-operator consistency: the lattice pair counts equal
    d24's (same candidate surface), and summed n_true equals a d16
    run at the dedup threshold (same ground truth)."""
    docs = spark.table("documents")
    vs = {r["est_jaccard"]: r for r in DD.threshold_sweep_vs_exact(docs).collect()}
    d24 = {r["est_jaccard"]: r for r in DD.candidate_threshold_sweep(docs).collect()}
    assert set(vs) == set(d24)
    for v, r in vs.items():
        assert r["n_pairs"] == d24[v]["n_pairs"]
        assert 0 <= r["n_true"] <= r["n_pairs"]
        assert r["dedup_precision"] == round(r["n_true"] / r["n_pairs"], 4)
    n_true_total = sum(r["n_true"] for r in vs.values())
    assert n_true_total == DD.minhash_estimate_vs_exact(docs, threshold=0.0).filter(
        "jaccard >= 0.5"
    ).count()


# --- s34: IVF-PQ serving recall from the persisted index --------------------------


pq_recall_sql = E.pq_recall_sql  # moved verbatim into __spark_entry__ at the r14 rotation


def test_oracle_draft_pq_recall_from_index(spark, ddb, tmp_path):
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    emb = spark.table("embeddings")
    p = str(tmp_path / "ivfpq_recall")
    SIM.build_ivfpq_index(emb, p, num_cells=8)
    qs = emb.filter(F.col("vec_id") < 5)
    exact = SIM.brute_force_topk(emb, qs, k=5)
    approx = SIM.ivfpq_topk_from_index(spark, p, qs, k=5, nprobe=2)
    got = _rows(SIM.recall_profile(exact, approx))
    want = _sql_rows(ddb, pq_recall_sql(2, 5))
    assert got == want
    assert len(got) == 5


def test_recall_profile_is_the_shared_definition(spark):
    """recall_profile(exact, exact) is identically 1; and on the live
    IVF path it reproduces the inlined s05 computation row-for-row
    (the packaged join IS the certified one)."""
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    exact = SIM.brute_force_topk(emb, qs, k=5)
    perfect = SIM.recall_profile(exact, exact).collect()
    assert all(r["recall_at_k"] == 1.0 for r in perfect) and len(perfect) == 5
    approx = SIM.ivf_topk(emb, qs, k=5, num_cells=8)
    via_profile = _rows(
        SIM.recall_profile(exact, approx).withColumnRenamed(
            "recall_at_k", "recall_at_5"
        )
    )
    s05 = _rows(E.queries()["s05_ann_recall"](spark, SF))
    assert via_profile == s05


# --- s35: kNN graph rank profile ---------------------------------------------------


knn_rank_profile_sql = E.knn_rank_profile_sql  # moved verbatim into __spark_entry__ at the r14 rotation


def test_oracle_draft_knn_rank_profile(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    got = _rows(
        SIM.knn_rank_profile(SIM.knn_graph(spark.table("embeddings"), k=5, num_cells=8))
    )
    want = _sql_rows(ddb, knn_rank_profile_sql(5, 8))
    assert got == want
    assert len(got) == 5


def test_knn_rank_profile_reads_the_graph_exactly(spark):
    """Hand-checkable fixture: edge counts per rank match the graph,
    mutual fractions recompute from the edge list, and rank-1 cosine
    dominates rank-k on a well-separated space."""
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    emb = spark.table("embeddings")
    g = SIM.knn_graph(emb, k=5, num_cells=8).collect()
    prof = {r["rank"]: r for r in SIM.knn_rank_profile(
        SIM.knn_graph(emb, k=5, num_cells=8)
    ).collect()}
    from collections import Counter

    per_rank = Counter(r["rank"] for r in g)
    mut = Counter((r["rank"], bool(r["mutual"])) for r in g)
    for rank, row in prof.items():
        assert row["n_edges"] == per_rank[rank]
        assert row["n_mutual"] == mut[(rank, True)]
        assert row["mutual_frac"] == round(mut[(rank, True)] / per_rank[rank], 4)
        assert row["min_cosine"] <= row["max_cosine"]
    assert prof[1]["mean_cosine_micro"] >= prof[5]["mean_cosine_micro"]


# --- q103: sigstore ingest per-batch metrics ---------------------------------------


sigstore_metrics_sql = E.sigstore_metrics_sql  # moved verbatim into __spark_entry__ at the r14 rotation


def test_oracle_draft_sigstore_metrics(spark, ddb, tmp_path):
    from datacatalog_tag_engine_spark.pipeline.dedup import build_signature_store
    from datacatalog_tag_engine_spark.streaming.dedup import sigstore_ingest_replay

    docs = spark.table("documents").select("doc_id", "text")
    resident = docs.filter(F.col("doc_id") % 4 == 0)
    batches = [docs.filter(F.col("doc_id") % 4 == i) for i in (1, 2, 3)]
    store = str(tmp_path / "store")
    build_signature_store(resident, store)
    sigstore_ingest_replay(
        spark,
        store,
        batches,
        str(tmp_path / "accepted"),
        metrics_sink=str(tmp_path / "metrics"),
    )
    got = _rows(
        spark.read.parquet(str(tmp_path / "metrics")).select(
            F.col("batch").cast("int").alias("batch"),
            "n_in",
            "n_accepted",
            "n_cross_losers",
            "n_within_losers",
        )
    )
    want = _sql_rows(ddb, sigstore_metrics_sql())
    assert got == want
    assert len(got) == 3


def test_sigstore_metrics_conserve_the_corpus(spark, tmp_path):
    """Accounting invariants against the accepted corpus itself:
    per batch, n_in equals the drop's size, n_accepted equals the
    sink's batch partition, rejects are evidenced (a rejected doc
    appears in at least one loser count), and metrics are
    retry-idempotent (re-running a batch rewrites the same row)."""
    from datacatalog_tag_engine_spark.pipeline.dedup import build_signature_store
    from datacatalog_tag_engine_spark.streaming.dedup import (
        _sigstore_ingest_batch,
        sigstore_ingest_replay,
    )

    docs = spark.table("documents").select("doc_id", "text")
    resident = docs.filter(F.col("doc_id") % 4 == 0)
    batches = [docs.filter(F.col("doc_id") % 4 == i) for i in (1, 2, 3)]
    store = str(tmp_path / "store")
    build_signature_store(resident, store)
    accepted = str(tmp_path / "accepted")
    metrics = str(tmp_path / "metrics")
    out = sigstore_ingest_replay(spark, store, batches, accepted, metrics_sink=metrics)
    m = {r["batch"]: r for r in spark.read.parquet(metrics).collect()}
    acc_by_batch = {
        r["batch"]: r["n"]
        for r in out.groupBy("batch").agg(F.count("*").alias("n")).collect()
    }
    for i, b in enumerate(batches):
        assert m[i]["n_in"] == b.count()
        assert m[i]["n_accepted"] == acc_by_batch.get(i, 0)
        n_rejected = m[i]["n_in"] - m[i]["n_accepted"]
        assert n_rejected <= m[i]["n_cross_losers"] + m[i]["n_within_losers"]
        assert m[i]["n_cross_losers"] <= n_rejected or m[i]["n_within_losers"] <= n_rejected
    # retry: same batch_id again — the metrics row is REWRITTEN, and
    # n_in/n_accepted stay whole-batch (the already-split re-emit)
    _sigstore_ingest_batch(spark, batches[0], 0, store, accepted, metrics_sink=metrics)
    m2 = {r["batch"]: r for r in spark.read.parquet(metrics).collect()}
    assert m2[0]["n_in"] == m[0]["n_in"]
    assert m2[0]["n_accepted"] == m[0]["n_accepted"]


# --- q104: per-source corpus health dashboard --------------------------------------


corpus_health_sql = E.corpus_health_sql  # moved verbatim into __spark_entry__ at the r14 rotation


def test_oracle_draft_corpus_health(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.profiling import corpus_health_report

    got = _rows(corpus_health_report(spark.table("documents")))
    o = E.oracle_sql()
    want = _sql_rows(ddb, corpus_health_sql(o["t02_quality"], o["t16_gopher_filter"]))
    assert got == want
    assert len(got) > 1


def test_corpus_health_columns_recompute_from_their_operators(spark):
    """Each dashboard column equals its own certified operator's
    rollup computed independently — the composition adds joins, never
    formula drift."""
    from datacatalog_tag_engine_spark.pipeline import text as TXT
    from datacatalog_tag_engine_spark.pipeline.profiling import corpus_health_report

    docs = spark.table("documents")
    out = {r["source"]: r for r in corpus_health_report(docs).collect()}
    keep = {
        r["source"]: r
        for r in TXT.gopher_filter(docs, passthrough=True)
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("keep").cast("int")).alias("kept"),
        )
        .collect()
    }
    red = {
        r["source"]: r
        for r in TXT.redact_pii(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.sum("n_redactions").alias("hits"),
            F.sum((F.col("n_redactions") > 0).cast("int")).alias("docs_hit"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    for src, row in out.items():
        assert row["n_docs"] == keep[src]["n"]
        assert row["keep_rate"] == round(keep[src]["kept"] / keep[src]["n"], 4)
        assert row["pii_hits_per_doc"] == round(red[src]["hits"] / red[src]["n"], 4)
        assert row["pii_doc_frac"] == round(red[src]["docs_hit"] / red[src]["n"], 4)


# --- q105: curriculum token budget ---------------------------------------------------


curriculum_token_budget_sql = E.curriculum_token_budget_sql  # moved verbatim into __spark_entry__ at the r14 rotation


def test_oracle_draft_curriculum_token_budget(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.sampling import curriculum_token_budget

    got = _rows(curriculum_token_budget(spark.table("documents")))
    want = _sql_rows(ddb, curriculum_token_budget_sql(E.oracle_sql()["t02_quality"]))
    assert got == want
    assert len(got) == 10


def test_curriculum_token_budget_accounts_every_token(spark):
    """Conservation: stage doc counts follow the ntile distribution
    and sum to the corpus; the last cumulative equals the corpus token
    total; fractions sum to ~1; cum is strictly monotone."""
    from datacatalog_tag_engine_spark.pipeline.sampling import curriculum_token_budget
    from datacatalog_tag_engine_spark.pipeline.text import token_counts

    docs = spark.table("documents")
    rows = sorted(
        curriculum_token_budget(docs).collect(), key=lambda r: r["stage"]
    )
    n = docs.count()
    assert sum(r["n_docs"] for r in rows) == n
    total = token_counts(docs).agg(F.sum("n_tokens")).first()[0]
    assert rows[-1]["cum_tokens"] == total
    assert abs(sum(r["token_frac"] for r in rows) - 1.0) < 1e-4
    cums = [r["cum_tokens"] for r in rows]
    assert cums == sorted(cums) and all(b > a for a, b in zip(cums, cums[1:]))


# --- m07: per-kind multimodal near-dup exposure --------------------------------------


neardup_rate_sql = E.neardup_rate_sql  # moved verbatim into __spark_entry__ at the r14 rotation


def _m07_parts(spark):
    from datacatalog_tag_engine_spark.pipeline import multimodal as MM

    img = MM.make_fake_image_corpus(spark, n_groups=6, group_size=3)
    aud = MM.make_fake_audio_corpus(spark, 6, 3)
    vid = MM.make_fake_video_corpus(spark, 4, 3)
    img_pairs = DD.hamming_neardup_pairs(
        MM.image_phash(img), id_col="media_id", fp_col="phash",
        bits=64, bands=4, max_hamming=10,
    )
    aud_pairs = DD.hamming_neardup_pairs(
        MM.audio_fingerprint(aud), id_col="media_id", fp_col="afp",
        bits=64, bands=4, max_hamming=10,
    )
    vid_pairs = DD.frame_neardup_pairs(
        MM.video_frame_phashes(vid, sample_frames=4),
        min_matching_frames=3, max_hamming=10,
    )
    return [
        ("image", img, img_pairs, "media_id"),
        ("audio", aud, aud_pairs, "media_id"),
        ("video", vid, vid_pairs, "media_id"),
    ]


def test_oracle_draft_neardup_rate_profile(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import multimodal as MM

    got = _rows(MM.neardup_rate_profile(_m07_parts(spark)))
    o = E.oracle_sql()
    want = _sql_rows(
        ddb,
        neardup_rate_sql(
            o["m02_image_phash_neardup"],
            o["m03_audio_fp_neardup"],
            o["m04_video_frame_neardup"],
        ),
    )
    assert got == want
    assert len(got) == 3


def test_neardup_rate_profile_counts_the_planted_groups(spark):
    """The fixtures plant near-dup groups by construction: every kind
    shows pairs, rates stay in [0, 1], and items-in-pairs recomputes
    from the pair lists exactly."""
    from datacatalog_tag_engine_spark.pipeline import multimodal as MM

    parts = _m07_parts(spark)
    out = {r["kind"]: r for r in MM.neardup_rate_profile(parts).collect()}
    for kind, items, pairs, id_col in parts:
        prow = out[kind]
        ids = set()
        plist = pairs.collect()
        for r in plist:
            ids.add(r[0])
            ids.add(r[1])
        assert prow["n_dup_pairs"] == len(plist)
        assert prow["n_items_in_pairs"] == len(ids)
        assert prow["n_items"] == items.count()
        assert 0.0 <= prow["dup_item_rate"] <= 1.0
        assert prow["dup_item_rate"] == round(len(ids) / prow["n_items"], 4)
        assert prow["n_dup_pairs"] > 0


# --- t44: winnowing (k, w) parameter table -----------------------------------------


winnowing_parameter_table_sql = E.winnowing_parameter_table_sql  # moved verbatim into __spark_entry__ at the r14 rotation


def test_oracle_draft_winnowing_parameter_table(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.text import winnowing_parameter_table

    got = _rows(winnowing_parameter_table(spark.table("documents")))
    want = _sql_rows(ddb, winnowing_parameter_table_sql())
    assert got == want
    assert len(got) == 4


def test_winnowing_parameter_table_prices_the_tradeoff(spark):
    """The table's physics on the real corpus: density falls as w
    rises (the 2/(w+1) law, within tolerance), the guarantee length
    is exact arithmetic, measured density is within 2x of expected
    (dedup against w+1 window overlap makes it lower, never higher
    than 1), and n_fingerprints equals a direct t43 run per param."""
    from datacatalog_tag_engine_spark.pipeline.text import (
        winnowing_fingerprints,
        winnowing_parameter_table,
    )

    docs = spark.table("documents")
    rows = {(r["k"], r["w"]): r for r in winnowing_parameter_table(docs).collect()}
    assert rows[(8, 4)]["measured_density_micro"] > rows[(8, 8)]["measured_density_micro"]
    assert rows[(12, 4)]["guarantee_len"] == 15
    for (k, w), r in rows.items():
        assert r["n_fingerprints"] == winnowing_fingerprints(docs, k=k, w=w).count()
        assert r["expected_density_micro"] == round(2 / (w + 1) * 1e6)
        assert 0 < r["measured_density_micro"] <= 1_000_000


# --- s36: per-rank cosine regret of the ADC serving path ---------------------------


topk_regret_sql = E.topk_regret_sql  # moved verbatim into __spark_entry__ at the r14 rotation


def test_oracle_draft_topk_regret(spark, ddb, tmp_path):
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    emb = spark.table("embeddings")
    p = str(tmp_path / "ivfpq_regret")
    SIM.build_ivfpq_index(emb, p, num_cells=8)
    qs = emb.filter(F.col("vec_id") < 5)
    exact = SIM.brute_force_topk(emb, qs, k=5)
    approx = SIM.ivfpq_topk_from_index(spark, p, qs, k=5, nprobe=2)
    got = _rows(SIM.topk_regret_profile(emb, exact, approx))
    want = _sql_rows(ddb, topk_regret_sql(2, 5))
    assert got == want
    assert len(got) == 5


def test_topk_regret_semantics(spark):
    """(a) regret of exact against itself is identically zero;
    (b) summed mean regret of a lossy path is >= 0 even though a
    single rank can go negative (order permutation); (c) regret is
    bounded by the exact-approx cosine gap by construction."""
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    exact = SIM.brute_force_topk(emb, qs, k=5)
    zero = SIM.topk_regret_profile(emb, exact, exact).collect()
    assert all(
        r["mean_regret_micro"] == 0 and r["max_regret_micro"] == 0 for r in zero
    )
    approx = SIM.ivf_topk(emb, qs, k=5, num_cells=8)
    rows = SIM.topk_regret_profile(emb, exact, approx).collect()
    assert sum(r["mean_regret_micro"] for r in rows) >= 0
    for r in rows:
        assert r["n_queries"] == 5
        assert r["max_regret_micro"] >= r["mean_regret_micro"]


# --- q106: per-source copy-audit rollup --------------------------------------------


copy_audit_profile_sql = E.copy_audit_profile_sql  # moved verbatim into __spark_entry__ at the r14 rotation


def test_oracle_draft_copy_audit_profile(spark, ddb):
    got = _rows(DD.copy_audit_profile(spark.table("documents"), max_df=100))
    want = _sql_rows(
        ddb, copy_audit_profile_sql(E.oracle_sql()["t43_winnowing"], max_df=100)
    )
    assert got == want
    assert len(got) > 1


def test_copy_audit_profile_attributes_the_scrape(spark):
    """A mirror source that pastes another source's docs into wrappers
    reads as cross-source drops on the MIRROR side; the original
    source keeps its docs; drop counts agree with winnowing_dedup."""
    import random

    rng = random.Random(17)
    words = lambda n, tag: " ".join(f"{tag}{rng.randrange(10**6)}" for _ in range(n))
    core1 = "an original article body that the mirror republishes in full"
    core2 = "another distinct piece of source content scraped elsewhere"
    rows = [
        (1, "orig", core1 + " " + words(40, "a")),
        (2, "orig", core2 + " " + words(40, "b")),
        (10, "mirror", core1),        # contained in 1, cross-source
        (11, "mirror", core2),        # contained in 2, cross-source
        (20, "clean", words(60, "c")),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in DD.copy_audit_profile(
        docs, min_overlap=0.5
    ).collect()}
    assert out["mirror"]["n_dropped"] == 2
    assert out["mirror"]["n_dropped_by_other_source"] == 2
    assert out["orig"]["n_dropped"] == 0 and out["clean"]["n_dropped"] == 0
    verdicts = DD.winnowing_dedup(docs, min_overlap=0.5)
    assert verdicts.filter("NOT keep").count() == sum(
        r["n_dropped"] for r in out.values()
    )


# --- s37: recall-vs-work nprobe sweep ----------------------------------------------


nprobe_sweep_sql = E.nprobe_sweep_sql  # moved verbatim into __spark_entry__ at the r14 rotation


def test_oracle_draft_nprobe_sweep(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    emb = spark.table("embeddings")
    got = _rows(
        SIM.nprobe_recall_sweep(emb, emb.filter(F.col("vec_id") < 5), k=5, num_cells=8)
    )
    want = _sql_rows(ddb, nprobe_sweep_sql(5, 8))
    assert got == want
    assert len(got) == 8


def test_nprobe_sweep_is_monotone_and_saturates(spark):
    """The physics the table exists to show: recall and work are both
    non-decreasing in nprobe, and at nprobe == num_cells the sweep IS
    exact search (recall 1.0, work == n_queries x (corpus - 1))."""
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    rows = sorted(
        SIM.nprobe_recall_sweep(emb, qs, k=5, num_cells=8).collect(),
        key=lambda r: r["nprobe"],
    )
    recs = [r["mean_recall_micro"] for r in rows]
    work = [r["n_scored"] for r in rows]
    assert recs == sorted(recs) and work == sorted(work)
    assert rows[-1]["mean_recall_micro"] == 10000
    assert rows[-1]["n_scored"] == qs.count() * (emb.count() - 1)
    assert rows[0]["n_scored"] < rows[-1]["n_scored"]


# --- d29: incremental winnowing overlap from the persisted store --------------------


incremental_winnowing_sql = E.incremental_winnowing_sql  # moved verbatim into __spark_entry__ at the r14 rotation


def test_oracle_draft_incremental_winnowing(spark, ddb, tmp_path):
    from datacatalog_tag_engine_spark.pipeline.dedup import (
        build_winnowing_store,
        incremental_winnowing_overlap,
    )

    docs = spark.table("documents")
    resident = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0)
    store = str(tmp_path / "wstore")
    build_winnowing_store(resident, store)
    got = _rows(incremental_winnowing_overlap(spark, store, delta))
    want = _sql_rows(ddb, incremental_winnowing_sql(E.oracle_sql()["t43_winnowing"]))
    assert got == want
    assert len(got) > 0


def test_winnowing_store_identities(spark, tmp_path):
    """The d23 lifecycle discipline applied to the copy-audit artifact:
    (a) serving from the store equals the fresh two-sided computation
    restricted to delta-touching pairs; (b) build(A) + append(B) ==
    build(A ∪ B) row-for-row; (c) a retried append is a no-op with
    skip_existing on; (d) parameters are pinned by the meta, and a
    torn build (no meta) fails loud with a rebuild instruction."""
    import pytest as _pytest

    from datacatalog_tag_engine_spark.pipeline.dedup import (
        append_to_winnowing_store,
        build_winnowing_store,
        incremental_winnowing_overlap,
        winnowing_overlap_pairs,
    )

    docs = spark.table("documents")
    a = docs.filter(F.col("doc_id") % 3 == 1)
    b = docs.filter(F.col("doc_id") % 3 == 2)
    delta = docs.filter(F.col("doc_id") % 3 == 0)

    grown = str(tmp_path / "grown")
    n1 = build_winnowing_store(a, grown)
    n2 = append_to_winnowing_store(spark, grown, b)
    whole = str(tmp_path / "whole")
    n3 = build_winnowing_store(a.unionByName(b), whole)
    assert n1 + n2 == n3
    rows = lambda p: sorted(
        (r["doc_id"], r["fp"]) for r in spark.read.parquet(p).select("doc_id", "fp").collect()
    )
    assert rows(grown) == rows(whole)
    # retried append: idempotent
    assert append_to_winnowing_store(spark, grown, b) == 0
    assert rows(grown) == rows(whole)

    # serving identity: store output == fresh two-sided pairs
    # restricted to delta-touching (winnowing_overlap_pairs over the
    # union gives ALL pairs; drop resident x resident)
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_shared"], r["overlap"], r["is_cross"])
        for r in incremental_winnowing_overlap(spark, grown, delta).collect()
    }
    delta_ids = {r["doc_id"] for r in delta.select("doc_id").collect()}
    fresh = {
        (r["doc_a"], r["doc_b"]): (r["n_shared"], r["overlap"])
        for r in winnowing_overlap_pairs(docs).collect()
        if r["doc_a"] in delta_ids or r["doc_b"] in delta_ids
    }
    assert {k: v[:2] for k, v in got.items()} == fresh
    for (da, db), (_, _, cross) in got.items():
        assert cross == ((da in delta_ids) != (db in delta_ids))

    # torn build: data written, meta missing -> loud rebuild advice
    import shutil

    torn = str(tmp_path / "torn")
    build_winnowing_store(a, torn)
    from datacatalog_tag_engine_spark.pipeline.dedup import WINNOWSTORE_META_DIR

    shutil.rmtree(f"{torn}/{WINNOWSTORE_META_DIR}")
    spark.catalog.refreshByPath(torn)
    with _pytest.raises(ValueError, match="rebuild"):
        incremental_winnowing_overlap(spark, torn, delta)
