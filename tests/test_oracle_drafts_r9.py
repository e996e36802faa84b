"""Round-9 rotation prep: DuckDB oracle drafts for operators built in
round 8 but NOT wired into the frozen inventory (the freeze policy:
new queries enter only at round start, with a proven draft). This
module's generators are the work-list — at the r9 rotation, move each
SQL generator into __spark_entry__ verbatim (entry becomes the single
copy; this file imports it back) and wire the queries()/oracle_sql()
pairs:

- m03_audio_fp_neardup — chromaprint-shaped temporal-delta audio
  fingerprint (multimodal.audio_fingerprint) + the m02 banding
  machinery; corpus/energies/bits replayed analytically.
- m04_video_frame_neardup — per-sampled-frame perceptual hashes
  (multimodal.video_frame_phashes) + sequence-aware banding
  (dedup.frame_neardup_pairs: temporally-aligned frames, floor on
  matching frames); full analytic replay.
- t27_tokenizer_fertility — per-source tokens/word + chars/token of
  the frozen BPE merge list (bpe.tokenizer_fertility); reuses the
  proven t18 encode CTE chain aggregated at source grain.
- t28_corpus_divergence — per-source unigram JS divergence vs the
  corpus distribution (text.corpus_divergence); nano-unit terms.
- t29_vocab_growth — Heaps'-law vocabulary growth curve over
  id-range buckets (text.vocab_growth).
- q66_length_outliers — per-source median/MAD outlier profile
  (profiling.length_outliers).
- q67_event_funnel — ordered min-ts conversion funnel over events
  (profiling.event_funnel).
- s13_cell_balance — IVF cell-occupancy/skew profile
  (similarity.cell_balance); reuses the s03 assignment CTEs.
- d11_source_dup_profile — per-source exact-clone triage profile
  (dedup.source_dup_profile).
- q68_holdout_split — leakage-guarded eval holdout
  (sampling.holdout_split); hash-bucket rule replayed as in q58.
- d12_containment — n-gram containment inter/min(|A|,|B|) for
  doc-in-doc detection Jaccard misses (dedup.containment_pairs);
  d04's inverted-index derivation with the asymmetric denominator.
- d13_cross_source_overlap — pairwise source content-overlap matrix
  at shingle grain (dedup.cross_source_overlap), the between-source
  complement of d11; fingerprint unit covered by pytest.
- d14_containment_dedup — doc-in-doc dedup in the stress-rung-proven
  production order (dedup.containment_dedup): exact canonicals first,
  then single-pass containment dominance; (doc_id, keep) verdicts.
- s14_ivfpq_rerank — IVF-PQ + exact re-rank, the full FAISS serving
  recipe (similarity.ivfpq_topk_rerank): ADC shortlist, exact cosine
  on shortlisted rows only, brute-force-compatible output schema; at
  rotation parameterize E.ivfpq_sql on (nprobe, k) and build the
  rerank SQL on top of it as the single copy.
- q69_shard_balance — pre-write shard-balance/straggler profile
  (export.shard_balance): the q58 md5 bucket rule at shard grain,
  empty shards kept, doc_skew normalized to 1.0-is-even.
- q70_cohort_retention — first-activity cohort x day-offset return
  matrix over events (profiling.cohort_retention); users count once
  per active day.
- s15_ivfpq_rerank_from_index — the persisted serving path
  (similarity.ivfpq_topk_rerank_from_index): partition-pruned index
  shortlist + exact re-rank against the raw corpus table; replays
  s14's oracle verbatim (the s10/s11 value-identity pattern).

ROTATION LANDED (round-9 start): all seventeen queries are wired as
queries()/oracle_sql() pairs and the generator functions moved to
__spark_entry__ (one copy; this file imports them back — E.<name>);
ivfpq_rerank_sql now builds on the parameterized shared
_ivfpq_scored_cte chain exactly as planned above.
tests/test_r9_rotation_wiring.py holds the window invariants.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from datacatalog_tag_engine_spark.pipeline import dedup as DD
from datacatalog_tag_engine_spark.pipeline import multimodal as MM

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def ddb():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    yield con
    con.close()


def _rows(df):
    cols = sorted(df.columns)
    out = []
    for r in df.select(*cols).collect():
        out.append(tuple(round(v, 6) if isinstance(v, float) else v for v in r))
    return sorted(out)


def _sql_rows(con, sql):
    rel = con.sql(sql)
    cols = sorted(rel.columns)
    out = []
    for r in con.sql(f"SELECT {', '.join(cols)} FROM rel").fetchall():
        out.append(tuple(round(v, 6) if isinstance(v, float) else v for v in r))
    return sorted(out)


# --- m03: audio fingerprint near-dup ---------------------------------------


def _m03(spark):
    fps = MM.audio_fingerprint(MM.make_fake_audio_corpus(spark, 6, 3))
    return DD.hamming_neardup_pairs(
        fps, id_col="media_id", fp_col="afp", bits=64, bands=4, max_hamming=10
    )


def test_oracle_draft_audio_fp_neardup(spark, ddb):
    got = _rows(_m03(spark))
    want = _sql_rows(ddb, E.audio_fp_neardup_sql())
    assert got == want
    assert len(got) > 0


def test_audio_fp_neardup_semantics(spark):
    rows = [(r["id_a"], r["id_b"], r["hamming"]) for r in _m03(spark).collect()]
    assert len(rows) == 18  # all intra-group variant pairs found
    assert all(a // 3 == b // 3 for a, b, _ in rows)


# --- m04: video frame-sequence near-dup ------------------------------------


def _m04(spark):
    vfp = MM.video_frame_phashes(MM.make_fake_video_corpus(spark, 4, 3), sample_frames=4)
    return DD.frame_neardup_pairs(
        vfp, min_matching_frames=3, max_hamming=10
    )


def test_oracle_draft_video_frame_neardup(spark, ddb):
    got = _rows(_m04(spark))
    want = _sql_rows(ddb, E.video_frame_neardup_sql())
    assert got == want
    assert len(got) > 0


def test_video_frame_neardup_semantics(spark):
    rows = [
        (r["id_a"], r["id_b"], r["n_matching_frames"]) for r in _m04(spark).collect()
    ]
    assert len(rows) == 12  # all intra-group pairs, all 4 frames aligned
    assert all(a // 3 == b // 3 for a, b, _ in rows)
    assert all(n == 4 for _, _, n in rows)


def test_frame_floor_rejects_single_frame_coincidence(spark):
    """The min_matching_frames floor is real: raising it above the
    number of aligned frames empties the result."""
    vfp = MM.video_frame_phashes(MM.make_fake_video_corpus(spark, 2, 2), sample_frames=4)
    assert DD.frame_neardup_pairs(vfp, min_matching_frames=5).count() == 0


# --- t27: tokenizer fertility ----------------------------------------------


def test_oracle_draft_tokenizer_fertility(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import bpe

    docs = spark.table("documents")
    got = _rows(bpe.tokenizer_fertility(docs, E.BPE_MERGES))
    want = _sql_rows(ddb, E.tokenizer_fertility_sql(E.BPE_MERGES))
    assert got == want
    assert len(got) > 1  # multiple sources profiled


def test_tokenizer_fertility_sanity(spark):
    """Fertility must sit in the physically meaningful band: >= 1
    token per word (BPE never merges across words) and chars/token
    between 1 and the longest word."""
    from datacatalog_tag_engine_spark.pipeline import bpe

    rows = bpe.tokenizer_fertility(spark.table("documents"), E.BPE_MERGES).collect()
    for r in rows:
        assert r["tokens_per_word"] >= 1.0
        assert 1.0 <= r["chars_per_token"] <= 30.0


# --- t28: corpus divergence ------------------------------------------------


def test_oracle_draft_corpus_divergence(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import text as TXT

    got = _rows(TXT.corpus_divergence(spark.table("documents")))
    want = _sql_rows(ddb, E.corpus_divergence_sql())
    assert got == want
    assert len(got) > 1


def test_corpus_divergence_bounds(spark):
    """JSD is bounded by ln(2) and non-negative; a source identical to
    the corpus scores ~0."""
    from datacatalog_tag_engine_spark.pipeline import text as TXT

    rows = TXT.corpus_divergence(spark.table("documents")).collect()
    for r in rows:
        assert -1e-6 <= r["js_divergence"] <= 0.6931472
    one = spark.table("documents").withColumn("source", F.lit("all"))
    solo = TXT.corpus_divergence(one).collect()
    assert len(solo) == 1 and abs(solo[0]["js_divergence"]) < 1e-6


# --- t29: vocab growth (Heaps) ---------------------------------------------


def test_oracle_draft_vocab_growth(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import text as TXT

    got = _rows(TXT.vocab_growth(spark.table("documents")))
    want = _sql_rows(ddb, E.vocab_growth_sql())
    assert got == want
    assert len(got) > 1


def test_vocab_growth_monotone(spark):
    """Cumulative curves are non-decreasing and the last cum_types
    equals the corpus type count."""
    from datacatalog_tag_engine_spark.pipeline import text as TXT

    rows = sorted(
        TXT.vocab_growth(spark.table("documents")).collect(), key=lambda r: r["bucket"]
    )
    for a, b in zip(rows, rows[1:]):
        assert b["cum_tokens"] >= a["cum_tokens"]
        assert b["cum_types"] >= a["cum_types"]
    n_types = (
        spark.table("documents")
        .select(F.explode(F.filter(F.split(F.lower("text"), r"\s+"),
                                   lambda w: F.length(w) > 0)).alias("w"))
        .select("w").distinct().count()
    )
    assert rows[-1]["cum_types"] == n_types


# --- q66: length outliers (median/MAD) -------------------------------------


def test_oracle_draft_length_outliers(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import profiling as PRO

    got = _rows(PRO.length_outliers(spark.table("documents")))
    want = _sql_rows(ddb, E.length_outliers_sql())
    assert got == want
    assert len(got) > 1


def test_length_outliers_flags_planted(spark):
    """A planted extreme row is flagged; a constant-length group has
    MAD 0 and flags every deviant."""
    from datacatalog_tag_engine_spark.pipeline import profiling as PRO

    rows = [(i, "s", 100) for i in range(20)] + [(99, "s", 100000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = PRO.length_outliers(df).collect()
    assert len(out) == 1
    assert out[0]["n_outliers"] == 1 and out[0]["mad_val"] == 0.0


# --- q67: event funnel -----------------------------------------------------

def test_oracle_draft_event_funnel(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import profiling as PRO

    got = _rows(PRO.event_funnel(spark.table("events"), E.FUNNEL_STEPS))
    want = _sql_rows(ddb, E.event_funnel_sql())
    assert got == want
    assert len(got) == 3


def test_event_funnel_ordering_matters(spark):
    """A user whose purchase precedes every click does NOT convert the
    final step."""
    from datacatalog_tag_engine_spark.pipeline import profiling as PRO
    import datetime as dt

    t = dt.datetime(2026, 1, 1)
    rows = [
        (1, t, 7, "view", 0.0, ""),
        (2, t + dt.timedelta(minutes=1), 7, "purchase", 0.0, ""),
        (3, t + dt.timedelta(minutes=2), 7, "click", 0.0, ""),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {r["step"]: r["n_users"] for r in PRO.event_funnel(df, E.FUNNEL_STEPS).collect()}
    assert out == {"view": 1, "click": 1, "purchase": 0}


# --- s13: IVF cell balance -------------------------------------------------


def test_oracle_draft_cell_balance(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    got = _rows(SIM.cell_balance(spark.table("embeddings")))
    want = _sql_rows(ddb, E.cell_balance_sql())
    assert got == want
    assert len(got) > 1


def test_cell_balance_conserves_mass(spark):
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    emb = spark.table("embeddings")
    rows = SIM.cell_balance(emb).collect()
    assert sum(r["n_vectors"] for r in rows) == emb.count()
    assert abs(sum(r["frac"] for r in rows) - 1.0) < 1e-4


# --- d11: source dup profile -----------------------------------------------


def test_oracle_draft_source_dup_profile(spark, ddb):
    got = _rows(DD.source_dup_profile(spark.table("documents")))
    want = _sql_rows(ddb, E.source_dup_profile_sql())
    assert got == want
    assert len(got) > 1


def test_source_dup_profile_normalization(spark):
    """Whitespace-variant copies count as the same family (the
    fingerprints rule), so dup_frac sees them."""
    rows = [(1, "a", "hello  world"), (2, "a", "Hello World"), (3, "a", "other")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = DD.source_dup_profile(df).collect()
    assert out[0]["n_docs"] == 3 and out[0]["n_distinct"] == 2
    assert out[0]["max_clone"] == 2


# --- q68: leakage-guarded holdout split ------------------------------------


def test_oracle_draft_holdout_split(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline import sampling as SMP

    got = _rows(SMP.holdout_split(spark.table("documents")))
    want = _sql_rows(ddb, E.holdout_split_sql())
    assert got == want
    assert len(got) == spark.table("documents").count()


def test_holdout_split_quarantines_clones(spark):
    """A train-side exact clone of an eval doc is quarantined; the
    eval doc itself stays eval."""
    from datacatalog_tag_engine_spark.pipeline import sampling as SMP

    docs = spark.table("documents")
    out = SMP.holdout_split(docs)
    splits = {r["split"] for r in out.collect()}
    assert "eval" in splits and "train" in splits
    # synthetic clone pair straddling the boundary: find one eval doc,
    # clone its text onto a fresh high id that buckets to train
    ev_id = out.filter("split = 'eval'").agg(F.min("doc_id")).first()[0]
    ev_text = docs.filter(F.col("doc_id") == ev_id).first()["text"]
    clone_id = None
    for cand in range(10**6, 10**6 + 200):
        row = spark.createDataFrame([(cand,)], "doc_id long")
        from datacatalog_tag_engine_spark.pipeline.sampling import hash_bucket
        b = row.select(hash_bucket(F.col("doc_id")).alias("b")).first()["b"]
        if b >= 1000:
            clone_id = cand
            break
    extra = spark.createDataFrame(
        [(clone_id, ev_text, "xx", "srcX", len(ev_text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out2 = SMP.holdout_split(docs.unionByName(extra))
    assert out2.filter(F.col("doc_id") == clone_id).first()["split"] == "quarantined"


# --- d12: n-gram containment (doc-in-doc) -----------------------------------


def test_oracle_draft_containment(spark, ddb):
    got = _rows(
        DD.containment_pairs(
            DD.shingle_table(spark.table("documents")), candidates=None, threshold=0.8
        )
    )
    want = _sql_rows(ddb, E.containment_sql(0.8))
    assert got == want
    assert len(got) > 0  # the corpus has exact clones -> containment 1.0


def test_containment_catches_doc_in_doc(spark):
    """A small doc pasted verbatim into a much larger one: containment
    1.0, Jaccard far below any useful threshold — the pair d12 exists
    to catch."""
    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"filler{i} word{i} pad{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, small), (2, big)], "doc_id long, text string"
    )
    sh = DD.shingle_table(df)
    cont = DD.containment_pairs(sh, threshold=0.9).collect()
    assert len(cont) == 1 and cont[0]["containment"] == 1.0
    jac = DD.jaccard_pairs(sh, threshold=0.5).collect()
    assert jac == []  # symmetric Jaccard misses the pair


def test_containment_max_df_drops_join_side_only(spark):
    """max_df prunes stop-shingles from the join, not from sizes: a
    pair whose only overlap is the stop-shingle disappears, while a
    genuine subset pair keeps its exact score."""
    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"filler{i} word{i} pad{i}" for i in range(40))
    stop = "the common header"
    rows = [(1, small), (2, big)] + [(10 + i, stop + f" tail{i} x{i} y{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = DD.shingle_table(df)
    loose = DD.containment_pairs(sh, threshold=0.15)
    assert loose.filter("doc_a >= 10").count() > 0  # header-only pairs leak through
    pruned = DD.containment_pairs(sh, threshold=0.15, max_df=3).collect()
    assert all(r["doc_a"] < 10 for r in pruned)  # stop-shingle pairs gone
    keep = [r for r in pruned if r["doc_a"] == 1 and r["doc_b"] == 2]
    assert len(keep) == 1 and keep[0]["containment"] == 1.0  # true pair untouched


# --- d13: cross-source clone overlap matrix ---------------------------------


def test_oracle_draft_cross_source_overlap(spark, ddb):
    got = _rows(DD.cross_source_overlap(spark.table("documents")))
    want = _sql_rows(ddb, E.cross_source_overlap_sql())
    assert got == want
    assert len(got) > 0  # phrase-level overlap exists at every sf


def test_cross_source_overlap_fingerprint_unit(spark):
    """unit='fingerprint' (exact clone families across sources): A and
    B share one whitespace-variant clone family, C is disjoint ->
    exactly one pair row with the right fractions."""
    rows = [
        (1, "A", "shared doc body"),
        (2, "A", "a-only one"),
        (3, "B", "Shared  Doc Body"),
        (4, "B", "b-only one"),
        (5, "B", "b-only two"),
        (6, "C", "c-only one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = DD.cross_source_overlap(df, unit="fingerprint").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"], r["shared"]) == ("A", "B", 1)
    assert r["frac_a"] == 0.5 and r["frac_b"] == round(1 / 3, 4)


# --- d14: containment dedup (exact-first production order) ------------------


def test_oracle_draft_containment_dedup(spark, ddb):
    got = _rows(DD.containment_dedup(spark.table("documents")))
    want = _sql_rows(ddb, E.containment_dedup_sql())
    assert got == want
    docs = spark.table("documents")
    assert len(got) == docs.count()  # a verdict for every input doc
    assert sum(1 for _, k in got if k) < docs.count()  # and it drops something


def test_containment_dedup_semantics(spark):
    """Exact clone drops as non-canonical; the doc contained in a
    larger one drops as dominated; the large doc and the unrelated doc
    keep. Tie pair (same text reordered, same shingle count) drops the
    higher id."""
    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"filler{i} word{i} pad{i}" for i in range(40))
    rows = [
        (1, small),
        (2, big),
        (3, small),            # exact clone of 1 -> non-canonical
        (4, "totally different content here okay"),
        # tie pair: doc 6 is doc 5 with a doubled space — different md5
        # (both survive exact dedup) but identical shingle SET (split is
        # on whitespace runs), so containment = 1.0 with equal sizes;
        # the tie rule drops the higher id (doc_b of the ascending pair)
        (5, "omega psi chi phi upsilon tau"),
        (6, "omega psi chi phi upsilon  tau"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["keep"] for r in DD.containment_dedup(df).collect()}
    assert out == {1: False, 2: True, 3: False, 4: True, 5: True, 6: False}


# --- s14: IVF-PQ + exact re-rank --------------------------------------------


def _s14(spark):
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    emb = spark.table("embeddings")
    return SIM.ivfpq_topk_rerank(
        emb, emb.filter(F.col("vec_id") < 5), k=5, shortlist=20, num_cells=8, nprobe=2
    )


def test_oracle_draft_ivfpq_rerank(spark, ddb):
    got = _rows(_s14(spark))
    want = _sql_rows(ddb, E.ivfpq_rerank_sql(nprobe=2, shortlist=20, k=5))
    assert got == want
    assert len(got) > 0


def test_rerank_recall_at_least_adc(spark):
    """Exact refinement can only improve recall vs truth within the
    same shortlist: recall@5(rerank) >= recall@5(plain ADC ranking)
    against brute force, on the real sf0.001 corpus."""
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(emb, qs, k=5).collect()
    }
    adc = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.ivfpq_topk(emb, qs, k=5, num_cells=8, nprobe=2).collect()
    }
    rer = {(r["query_id"], r["neighbor_id"]) for r in _s14(spark).collect()}
    assert len(rer & truth) >= len(adc & truth)
    assert len(rer) > 0


# --- q69: shard-balance profile ----------------------------------------------


def test_oracle_draft_shard_balance(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.export import shard_balance

    got = _rows(shard_balance(spark.table("documents"), 16, token_col="n_chars"))
    want = _sql_rows(ddb, E.shard_balance_sql(16))
    assert got == want
    assert len(got) == 16


def test_shard_balance_semantics(spark):
    """Conservation + the empty-shard row + uniform-ish skew on the
    real corpus; a single-doc corpus puts skew num_shards on its one
    shard and 0 elsewhere."""
    from datacatalog_tag_engine_spark.pipeline.export import shard_balance

    docs = spark.table("documents")
    out = shard_balance(docs, 16).collect()
    assert sum(r["n_docs"] for r in out) == docs.count()
    one = spark.createDataFrame([(7, "x")], "doc_id long, text string")
    rows = shard_balance(one, 4).collect()
    assert len(rows) == 4 and sum(r["n_docs"] for r in rows) == 1
    hot = [r for r in rows if r["n_docs"] == 1][0]
    assert hot["doc_skew"] == 4.0
    assert all(r["doc_skew"] == 0.0 for r in rows if r["n_docs"] == 0)


# --- q70: cohort retention ---------------------------------------------------


def test_oracle_draft_cohort_retention(spark, ddb):
    from datacatalog_tag_engine_spark.pipeline.profiling import cohort_retention

    got = _rows(cohort_retention(spark.table("events")))
    want = _sql_rows(ddb, E.cohort_retention_sql())
    assert got == want
    assert len(got) > 1


def test_cohort_retention_semantics(spark):
    """Two users, staggered starts: offsets anchor to each user's own
    first day; a user active twice in one day counts once."""
    from datacatalog_tag_engine_spark.pipeline.profiling import cohort_retention

    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 11:00:00"),  # same-day dup
        (1, "2024-01-03 09:00:00"),
        (2, "2024-01-02 08:00:00"), (2, "2024-01-03 08:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.to_timestamp("ts").alias("ts")
    )
    got = {
        (str(r["cohort_day"]), r["day_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,  # user 1 day 0 (once, despite two events)
        ("2024-01-01", 2): 1,  # user 1 returns on offset 2
        ("2024-01-02", 0): 1,  # user 2's own cohort starts Jan 2
        ("2024-01-02", 1): 1,  # user 2 returns next day
    }


# --- s15: persisted-index rerank (value-identity with s14) -------------------


def test_oracle_draft_ivfpq_rerank_from_index(spark, ddb, tmp_path):
    """The persisted form replays s14's oracle EXACTLY (the s10/s11
    pattern: index round-trip must not change a single value), so its
    r9 wiring reuses ivfpq_rerank_sql verbatim."""
    from datacatalog_tag_engine_spark.pipeline import similarity as SIM

    emb = spark.table("embeddings")
    path = str(tmp_path / "ivfpq_idx")
    SIM.build_ivfpq_index(emb, path, num_cells=8)
    got = _rows(
        SIM.ivfpq_topk_rerank_from_index(
            spark, path, emb, emb.filter(F.col("vec_id") < 5),
            k=5, shortlist=20, nprobe=2,
        )
    )
    want = _sql_rows(ddb, E.ivfpq_rerank_sql(nprobe=2, shortlist=20, k=5))
    assert got == want
    assert got == _rows(_s14(spark))  # in-memory/persisted value identity


def test_containment_dominates_jaccard_everywhere(spark):
    """Metric invariant: inter/min(|A|,|B|) >= inter/union on EVERY
    pair (min <= union always), and both metrics see the same pair
    set at threshold 0 — a divergence would mean the two operators
    disagree on the inverted index itself."""
    pool = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    rows = [
        (i, " ".join(pool[(i * 3 + j) % len(pool)] for j in range(4 + i % 5)))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = DD.shingle_table(df)
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in DD.jaccard_pairs(sh, threshold=0.0).collect()}
    con = {(r["doc_a"], r["doc_b"]): r["containment"]
           for r in DD.containment_pairs(sh, threshold=0.0).collect()}
    assert set(jac) == set(con) and len(jac) > 0
    assert all(con[p] >= jac[p] for p in jac)
