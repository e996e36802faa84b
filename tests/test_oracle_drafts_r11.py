"""Round-11 rotation prep: DuckDB oracle drafts for operators built in
round 10 but NOT wired into the frozen inventory (the freeze policy:
new queries enter only at round start, with a proven draft). This
module's generators are the work-list — at the r11 rotation, move each
SQL generator into __spark_entry__ verbatim (entry becomes the single
copy; this file imports it back) and wire the queries()/oracle_sql()
pairs:

- s22_ivf_delete — vector deletion from the persisted IVF index
  (similarity.remove_from_ivf_index): rewrite-affected-cells under the
  frozen quantizer; post-delete serving is row-identical to a fresh
  rebuild over the survivors, so the oracle is the wired s04 string
  with the survivor predicate pushed into its `e` CTE. Untouched
  cells' files stay byte-identical; a fully-emptied cell's directory
  disappears. The r9 verdict's ask #4 second half (append landed as
  s21; delete completes grow/shrink).
- s23_ivf_compact — small-file compaction of appended cells
  (similarity.compact_ivf_index): value-invariant (the s04 oracle
  verbatim, like s21), one file per compacted cell, under-threshold
  cells untouched. Completes the lifecycle: grow / shrink / compact.
- q80_incremental_pipeline — the daily-refresh composition the r9
  verdict asked for (ask #5): q51 delta detection -> q61 clean-ingest
  of ONLY the new docs -> q79 dirty-shard planning against the prior
  export. The oracle composes the WIRED q51 fingerprint rule, the
  WIRED clean-ingest chain (delta-restricted by string surgery), and
  the q79 full-join tail — the incremental counterpart of q71, and
  the shape a daily 100 TB refresh actually runs (reference analog:
  scheduled auto-updates re-tag only ready configs, main.py:3075).
- d15_minhash_estimate — signature-agreement Jaccard scoring
  (dedup.minhash_estimate_pairs): LSH candidates scored from the
  doc-grain signature table alone (est = agreeing components /
  num_hashes, Broder 1997), never re-reading shingles — the 100 TB
  scoring path when the exact verify is the bottleneck. md5 minhash
  is deterministic, so the oracle replays the estimate EXACTLY.
- t33_token_entropy — per-source unigram Shannon entropy in bits
  (text.token_entropy): the diversity-QA companion to t28; nano-unit
  quantization before the cross-partition sum keeps engines bit-equal.
- s24_ivfpq_delete — codes-layout deletion
  (similarity.remove_from_ivfpq_index, shared _rewrite_cells_without
  core): both serving layouts get the full lifecycle; oracle is the
  wired s10 string with the survivor predicate in its corpus CTE.
- d16_minhash_estimate_vs_exact — the estimator's certification
  surface (dedup.minhash_estimate_vs_exact): every LSH candidate pair
  carries estimate, exact Jaccard, and abs error — all deterministic,
  all oracle-checked (the q74/q60 sketch-quality pattern).
- q82_mixture_rebalance — corrective post-gate sampling weights
  (text.mixture_rebalance) from the q72 drift table: weight =
  share_before/share_after capped, 0 for annihilated sources; oracle
  wraps the WIRED q72 generator as a CTE (one copy of the gate chain).
- s25_ivfpq_append — codes-layout growth
  (similarity.append_to_ivfpq_index): the delta is encoded by the
  STORED codebook and assigned by the STORED centroids (every
  quantization parameter derived from the resident _codebook);
  grow == rebuild, oracle = the wired s10 string verbatim (the s21
  pattern). Both layouts now have the full grow/shrink/compact
  lifecycle.
- s26_ivfpq_compact — codes-layout compaction
  (similarity.compact_ivfpq_index): matters MORE than the raw form
  (4-byte code payloads make append files almost all footer);
  value-invariant, oracle = the wired s10 string verbatim.
- d17_quality_canonical — near-dup dedup with quality-aware canonical
  selection (dedup.quality_canonical_dedup): keep the highest-
  quality_score member of each cluster, tie -> lowest id — the clean
  original beats a boilerplate-wrapped mirror that happened to crawl
  first. Oracle = the wired q34 chain (final-SELECT surgery, the q73
  pattern) joined with the WIRED t02 quality oracle nested as a CTE.
- s27_cluster_balanced_sample — diversity sampling over embedding
  space (similarity.cluster_balanced_sample): the certified s03 cell
  assignment + the q62 deterministic md5 k-per-group rule at cell
  grain; flattens semantic imbalance the way q54/q63 flatten
  provenance imbalance. Stability under corpus append pinned (one
  displaced selection per cell at most).
- q84_dirty_shards_assigned — the incremental-export planner for
  EXPLICIT shard assignments (export.dirty_shards_assigned +
  range_shard_assignments): any policy plugs in, moved docs are
  visible as removed@old + added@new, and locality sharding closes
  the saturation the r10 rung measured — a 200-doc trickle append
  dirties <=3 range shards vs 62/64 md5 shards (both asserted).

ROTATION LANDED (round-11 start): all thirteen queries (plus q85, the
streaming session funnel's batch replay) are wired as
queries()/oracle_sql() pairs and the generator functions moved to
__spark_entry__ (one copy; this file imports them back — E.<name>);
the window invariants live in tests/test_r11_rotation_wiring.py,
which also carries the mechanical rounds-since-green aging ledger
(capped at rounds below the rotation round, so the suite stays green
after the driver's own r11 record lands).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from datacatalog_tag_engine_spark.pipeline import dedup as DD
from datacatalog_tag_engine_spark.pipeline import similarity as SIM
from datacatalog_tag_engine_spark.pipeline import text as TXT

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


# --- s22: IVF delete ---------------------------------------------------------

# survivors keep the quantizer seeds (ids 0..7) and the query set
# (ids < 5), so the frozen stored centroids equal a fresh build's
# seeding over the survivors and rebuild-identity is provable
DELETE_PRED = E.DELETE_PRED


def ivf_delete_sql(nprobe: int = 2) -> str:
    """The wired generator applied to the wired s04 string — exactly
    what oracle_sql() wires for s22."""
    return E.ivf_delete_sql(E.oracle_sql()["s04_ann_ivf_nprobe"])


def test_oracle_draft_ivf_delete(spark, ddb, tmp_path):
    """Build on the full corpus, delete, serve: row-identical to the
    survivor-filtered s04 oracle AND to a fresh rebuild over the
    survivors."""
    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "ivf_del")
    SIM.build_ivf_index(emb, path, num_cells=8)
    doomed = emb.filter(F.expr(DELETE_PRED))
    n = SIM.remove_from_ivf_index(spark, path, doomed.select("vec_id"))
    assert n == doomed.count() > 0
    got = _rows(SIM.ivf_topk_from_index(spark, path, qs, k=5, nprobe=2))
    assert got == _sql_rows(ddb, ivf_delete_sql())
    fresh = str(tmp_path / "ivf_fresh")
    SIM.build_ivf_index(emb.filter(~F.expr(DELETE_PRED)), fresh, num_cells=8)
    assert got == _rows(SIM.ivf_topk_from_index(spark, fresh, qs, k=5, nprobe=2))


def test_ivf_delete_touches_only_affected_cells(spark, tmp_path):
    """Cells holding no deleted id keep byte-identical files; a cell
    whose every vector is deleted disappears outright (no stale files
    a dynamic-overwrite would have left); deleted ids are gone from
    the resident rows."""
    import glob
    import os

    emb = spark.table("embeddings")
    path = str(tmp_path / "ivf_del2")
    SIM.build_ivf_index(emb, path, num_cells=8)
    resident = spark.read.parquet(path)
    # delete every vector of ONE cell plus one vector of another
    cells = sorted(r["cell"] for r in resident.select("cell").distinct().collect())
    whole, partial = cells[-1], cells[-2]
    doomed_ids = [
        r["vec_id"]
        for r in resident.filter(
            (F.col("cell") == whole)
            | ((F.col("cell") == partial) & (F.col("vec_id") >= 100))
        ).collect()
    ]
    doomed = spark.createDataFrame([(i,) for i in doomed_ids], "vec_id long")

    def snap():
        return {
            p: os.path.getsize(p)
            for p in glob.glob(os.path.join(path, "cell=*", "*.parquet"))
        }

    before = snap()
    n = SIM.remove_from_ivf_index(spark, path, doomed)
    assert n > 0
    after = snap()
    untouched = {
        p for p in before if f"cell={whole}" not in p and f"cell={partial}" not in p
    }
    assert untouched and all(after[p] == before[p] for p in untouched)
    assert not os.path.isdir(os.path.join(path, f"cell={whole}"))
    left = spark.read.parquet(path)
    assert left.filter(F.col("vec_id").isin(doomed_ids)).count() == 0


def test_ivf_delete_crash_between_stage_and_swap_loses_nothing(
    spark, tmp_path, monkeypatch
):
    """Fault-inject a crash between the stage commit and the first
    live-cell delete. The live index must be byte-untouched — a reader
    mid-crash sees the full old index, the stage dir is invisible to
    it — and the staged survivors are durable REAL files on disk (not
    session-lifetime checkpoint blocks). Recovery is re-running the
    delete: since r12 a COMMITTED stage is the operation's commit
    point, so the rerun first completes the crashed swap from the
    stage (recover_index_stage) and then finds nothing left to delete
    (returns 0), leaving the index identical to a fresh rebuild over
    the survivors."""
    import glob
    import os

    emb = spark.table("embeddings")
    path = str(tmp_path / "ivf_crash")
    SIM.build_ivf_index(emb, path, num_cells=8)
    doomed = emb.filter(F.expr(DELETE_PRED)).select("vec_id")
    n_doomed = doomed.count()

    def snap():
        return {
            p: os.path.getsize(p)
            for p in glob.glob(os.path.join(path, "cell=*", "*.parquet"))
        }

    before = snap()

    class CrashingFS:
        """Delegating wrapper over the Hadoop FileSystem that raises on
        the first LIVE cell-directory delete (stage-dir deletes pass)."""

        def __init__(self, fs):
            self._fs = fs

        def delete(self, p, recursive=True):
            s = str(p)
            if "cell=" in s and SIM.REWRITE_TMP_DIR not in s:
                raise RuntimeError("injected crash before swap")
            return self._fs.delete(p, recursive)

        def __getattr__(self, name):
            return getattr(self._fs, name)

    real_index_fs = SIM._index_fs

    def crashing_index_fs(spark_, path_):
        fs, jvm = real_index_fs(spark_, path_)
        return CrashingFS(fs), jvm

    monkeypatch.setattr(SIM, "_index_fs", crashing_index_fs)
    with pytest.raises(RuntimeError, match="injected crash"):
        SIM.remove_from_ivf_index(spark, path, doomed)
    monkeypatch.setattr(SIM, "_index_fs", real_index_fs)

    # live index byte-untouched; a reader sees the full pre-delete index
    assert snap() == before
    spark.catalog.refreshByPath(path)
    assert spark.read.parquet(path).count() == emb.count()
    # the survivors are durable real files in the stage dir
    stage = os.path.join(path, SIM.REWRITE_TMP_DIR)
    assert glob.glob(os.path.join(stage, "cell=*", "*.parquet"))
    # recovery: the rerun completes the committed stage first (the
    # crashed delete had already committed), so it reports 0 NEW
    # removals and serving equals a fresh rebuild
    n = SIM.remove_from_ivf_index(spark, path, doomed)
    assert n == 0
    assert not os.path.isdir(stage)
    qs = emb.filter(F.col("vec_id") < 5)
    got = _rows(SIM.ivf_topk_from_index(spark, path, qs, k=5, nprobe=2))
    fresh = str(tmp_path / "ivf_crash_fresh")
    SIM.build_ivf_index(emb.filter(~F.expr(DELETE_PRED)), fresh, num_cells=8)
    assert got == _rows(SIM.ivf_topk_from_index(spark, fresh, qs, k=5, nprobe=2))
    assert spark.read.parquet(path).count() == emb.count() - n_doomed


def test_ivf_delete_crash_mid_swap_recovers_from_stage(
    spark, tmp_path, monkeypatch
):
    """The r11 verdict's torn-SWAP ask, red->green: fault-inject a kill
    BETWEEN ``fs.delete(cell)`` and ``fs.rename(staged)`` — the one
    window where a cell's survivors exist ONLY in the stage dir. The
    old recovery (discard the stale stage, re-derive from live cells)
    would have lost that cell's survivors permanently, because the
    live dir is already gone. Since r12 a committed stage is the
    commit point: the rerun completes the swap FROM the stage
    (recover_index_stage), reports 0 new removals, and serving equals
    a fresh rebuild over the survivors. Also pins the torn-STAGE case:
    a stage without the _SUCCESS marker is discarded, not completed."""
    import glob
    import os
    import shutil

    emb = spark.table("embeddings")
    path = str(tmp_path / "ivf_midswap")
    SIM.build_ivf_index(emb, path, num_cells=8)
    doomed = emb.filter(F.expr(DELETE_PRED)).select("vec_id")
    n_doomed = doomed.count()

    class MidSwapCrashFS:
        """Raises on the first staged->live rename: the targeted live
        cell dir is already deleted, its survivors exist only in the
        stage — the exact torn-swap window."""

        def __init__(self, fs):
            self._fs = fs

        def rename(self, src, dst):
            # target the staged->live CELL renames only: since the r13
            # hardening the commit record itself publishes via a
            # .tmp->final rename inside the stage dir, and crashing
            # THAT rename is the (also-covered) before-commit case,
            # not the torn-swap window this test pins
            if SIM.REWRITE_TMP_DIR in str(src) and "cell=" in str(src):
                raise RuntimeError("injected crash mid-swap")
            return self._fs.rename(src, dst)

        def __getattr__(self, name):
            return getattr(self._fs, name)

    real_index_fs = SIM._index_fs

    def crashing_index_fs(spark_, path_):
        fs, jvm = real_index_fs(spark_, path_)
        return MidSwapCrashFS(fs), jvm

    monkeypatch.setattr(SIM, "_index_fs", crashing_index_fs)
    with pytest.raises(RuntimeError, match="mid-swap"):
        SIM.remove_from_ivf_index(spark, path, doomed)
    monkeypatch.setattr(SIM, "_index_fs", real_index_fs)

    # the torn state is real: at least one live cell dir is gone, its
    # survivors are durable parquet in the committed stage
    stage = os.path.join(path, SIM.REWRITE_TMP_DIR)
    assert os.path.exists(os.path.join(stage, SIM.REWRITE_COMMIT_FILE))
    staged_cells = {
        os.path.basename(d)
        for d in glob.glob(os.path.join(stage, "cell=*"))
    }
    live_cells = {
        os.path.basename(d) for d in glob.glob(os.path.join(path, "cell=*"))
    }
    assert staged_cells - live_cells  # the deleted-but-unrenamed cell(s)

    # recovery: the rerun completes the swap from the stage; nothing
    # is lost and nothing is left to delete
    spark.catalog.refreshByPath(path)
    n = SIM.remove_from_ivf_index(spark, path, doomed)
    assert n == 0
    assert not os.path.isdir(stage)
    assert spark.read.parquet(path).count() == emb.count() - n_doomed
    qs = emb.filter(F.col("vec_id") < 5)
    got = _rows(SIM.ivf_topk_from_index(spark, path, qs, k=5, nprobe=2))
    fresh = str(tmp_path / "ivf_midswap_fresh")
    SIM.build_ivf_index(emb.filter(~F.expr(DELETE_PRED)), fresh, num_cells=8)
    assert got == _rows(SIM.ivf_topk_from_index(spark, fresh, qs, k=5, nprobe=2))

    # torn-STAGE contract: an uncommitted stage (no commit record)
    # over an intact index is discarded by the next rewrite, never
    # completed
    path2 = str(tmp_path / "ivf_tornstage")
    SIM.build_ivf_index(emb, path2, num_cells=8)
    stage2 = os.path.join(path2, SIM.REWRITE_TMP_DIR)
    os.makedirs(os.path.join(stage2, "cell=9999"))
    donor = glob.glob(os.path.join(path2, "cell=*", "*.parquet"))[0]
    shutil.copy(donor, os.path.join(stage2, "cell=9999", "garbage.parquet"))
    assert SIM.recover_index_stage(spark, path2) == 0  # marker absent
    n2 = SIM.remove_from_ivf_index(spark, path2, doomed)
    assert n2 == n_doomed  # the real delete ran; the torn stage did not leak in
    assert not glob.glob(os.path.join(path2, "cell=9999"))


def test_ivf_delete_rejects_codes_layout_and_noop(spark, tmp_path):
    emb = spark.table("embeddings")
    pq_path = str(tmp_path / "pq_idx")
    SIM.build_ivfpq_index(emb, pq_path, num_cells=8)
    with pytest.raises(ValueError, match="raw-vector"):
        SIM.remove_from_ivf_index(spark, pq_path, emb.select("vec_id").limit(3))
    ivf_path = str(tmp_path / "ivf_noop")
    SIM.build_ivf_index(emb, ivf_path, num_cells=8)
    ghost = spark.createDataFrame([(10**9,)], "vec_id long")
    assert SIM.remove_from_ivf_index(spark, ivf_path, ghost) == 0


# --- s23: IVF compaction -----------------------------------------------------


def test_oracle_draft_ivf_compact(spark, ddb, tmp_path):
    """Three append deltas pile small files into the cells; compaction
    rewrites over-threshold cells to ONE file each and serving stays
    row-identical to the wired s04 oracle (the s21 value-identity:
    same rows, same cells, fewer files)."""
    import glob
    import os

    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "ivf_cpt")
    SIM.build_ivf_index(emb.filter(F.col("vec_id") < 100), path, num_cells=8)
    for lo, hi in ((100, 200), (200, 300), (300, 10**9)):
        SIM.append_to_ivf_index(
            spark, path, emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        )
    stats = SIM.compact_ivf_index(spark, path, max_files_per_cell=2)
    assert stats["cells_compacted"] > 0
    assert stats["files_after"] == stats["cells_compacted"] < stats["files_before"]
    for d in glob.glob(os.path.join(path, "cell=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) <= 2
    got = _rows(SIM.ivf_topk_from_index(spark, path, qs, k=5, nprobe=2))
    assert got == _sql_rows(ddb, E.oracle_sql()["s04_ann_ivf_nprobe"])


def test_ivf_compact_noop_leaves_files_alone(spark, tmp_path):
    """Under-threshold cells are never rewritten: with a high
    threshold the call is a no-op and every file stays byte-identical
    (size+mtime)."""
    import glob
    import os

    emb = spark.table("embeddings")
    path = str(tmp_path / "ivf_cptn")
    SIM.build_ivf_index(emb, path, num_cells=8)

    def snap():
        return {
            p: (os.path.getsize(p), os.path.getmtime(p))
            for p in glob.glob(os.path.join(path, "cell=*", "*.parquet"))
        }

    before = snap()
    stats = SIM.compact_ivf_index(spark, path, max_files_per_cell=64)
    assert stats == {"cells_compacted": 0, "files_before": 0, "files_after": 0}
    assert snap() == before


# --- q80: incremental refresh composition ------------------------------------


def incremental_pipeline_sql(num_shards: int = 8) -> str:
    """The wired generator (one copy in __spark_entry__); the q51
    fingerprint-rule consistency it used to assert inline now lives in
    tests/test_r11_rotation_wiring.py (the generator can't call
    oracle_sql() without recursing once wired inside it)."""
    assert E.Q51_FINGERPRINT_EXPR in E.oracle_sql()["q51_corpus_delta"]
    return E.incremental_pipeline_sql(num_shards)


def _q80(spark):
    from datacatalog_tag_engine_spark.pipeline.export import dirty_shards
    from datacatalog_tag_engine_spark.streaming.dedup import clean_ingest_stream

    docs = spark.table("documents")
    prior = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    delta = DD.incremental_delta(batch, prior).select("doc_id")
    fresh = batch.join(delta, "doc_id", "left_semi")
    cleaned = clean_ingest_stream(
        fresh,
        min_words=20,
        min_stopword_hits=0,
        max_dup_word_frac=1.0,
        max_top_bigram_frac=1.0,
    )
    new_ids = prior.select("doc_id").unionByName(cleaned.select("doc_id"))
    return dirty_shards(prior.select("doc_id"), new_ids, 8)


def test_oracle_draft_incremental_pipeline(spark, ddb):
    got = _rows(_q80(spark))
    want = _sql_rows(ddb, incremental_pipeline_sql(8))
    assert got == want
    assert len(got) == 8


def test_incremental_pipeline_is_append_only_and_gated(spark):
    """A daily refresh never removes from the prior export; the added
    mass is bounded by the delta and strictly smaller than the raw
    batch when the gate bites."""
    rows = _q80(spark).collect()
    assert all(r["n_removed"] == 0 for r in rows)
    added = sum(r["n_added"] for r in rows)
    docs = spark.table("documents")
    batch_n = docs.filter(F.col("doc_id") % 3 == 0).count()
    prior_n = docs.filter(F.col("doc_id") % 3 != 0).count()
    assert 0 < added < batch_n
    assert sum(r["n_kept"] for r in rows) == prior_n


# --- d15: minhash estimate ---------------------------------------------------


minhash_estimate_sql = E.minhash_estimate_sql


def test_oracle_draft_minhash_estimate(spark, ddb):
    got = _rows(DD.minhash_estimate_pairs(spark.table("documents")))
    want = _sql_rows(ddb, minhash_estimate_sql())
    assert got == want
    assert len(got) > 0


def test_minhash_estimate_exact_on_clones_and_screens_verify(spark):
    """Exact clones estimate 1.0 (every component agrees); and every
    exact-verified pair at the same threshold is an LSH candidate the
    estimator also surfaces at SOME estimate (the screen never drops
    a candidate the verify path would see)."""
    docs = spark.table("documents")
    clones = docs.select("doc_id", "text").unionByName(
        docs.select((F.col("doc_id") + 10**6).alias("doc_id"), "text")
    )
    est = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in DD.minhash_estimate_pairs(clones, threshold=0.99).collect()
    }
    n = docs.count()
    assert all(est.get((i, i + 10**6)) == 1.0 for i in range(5))
    assert sum(1 for (a, b) in est if b - a == 10**6) == n
    screened = {
        (r["doc_a"], r["doc_b"])
        for r in DD.minhash_estimate_pairs(docs, threshold=0.0).collect()
    }
    verified = {
        (r["doc_a"], r["doc_b"]) for r in DD.minhash_dedup(docs).collect()
    }
    assert verified <= screened


# --- t33: token entropy ------------------------------------------------------


token_entropy_sql = E.token_entropy_sql


def test_oracle_draft_token_entropy(spark, ddb):
    got = _rows(TXT.token_entropy(spark.table("documents")))
    want = _sql_rows(ddb, token_entropy_sql())
    assert got == want
    assert len(got) > 1


def test_token_entropy_limits(spark):
    """A single-type source scores 0 bits; a uniform k-type source
    scores exactly log2(k)."""
    rows = [
        (1, "mono", "same same same same"),
        (2, "flat", "a b c d e f g h"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in TXT.token_entropy(df).collect()}
    assert out["mono"]["entropy_bits"] == 0.0
    assert out["flat"]["entropy_bits"] == 3.0  # log2(8)
    assert out["flat"]["n_types"] == 8 and out["flat"]["n_tokens"] == 8


# --- s24: IVF-PQ delete ------------------------------------------------------


def ivfpq_delete_sql(nprobe: int = 2) -> str:
    """The wired generator applied to the wired s10 string — exactly
    what oracle_sql() wires for s24."""
    return E.ivfpq_delete_sql(E.oracle_sql()["s10_ivfpq_topk"])


def test_oracle_draft_ivfpq_delete(spark, ddb, tmp_path):
    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "pq_del")
    SIM.build_ivfpq_index(emb, path, num_cells=8)
    doomed = emb.filter(F.expr(DELETE_PRED)).select("vec_id")
    n = SIM.remove_from_ivfpq_index(spark, path, doomed)
    assert n == doomed.count() * 4  # num_subspaces code rows per vector
    got = _rows(SIM.ivfpq_topk_from_index(spark, path, qs, k=5, nprobe=2))
    assert got == _sql_rows(ddb, ivfpq_delete_sql())
    fresh = str(tmp_path / "pq_fresh")
    SIM.build_ivfpq_index(emb.filter(~F.expr(DELETE_PRED)), fresh, num_cells=8)
    assert got == _rows(SIM.ivfpq_topk_from_index(spark, fresh, qs, k=5, nprobe=2))


def test_ivfpq_delete_rejects_raw_layout(spark, tmp_path):
    emb = spark.table("embeddings")
    path = str(tmp_path / "raw_idx")
    SIM.build_ivf_index(emb, path, num_cells=8)
    with pytest.raises(ValueError, match="codes layout"):
        SIM.remove_from_ivfpq_index(spark, path, emb.select("vec_id").limit(3))


# --- d16: minhash estimate vs exact ------------------------------------------


minhash_estimate_vs_exact_sql = E.minhash_estimate_vs_exact_sql


def test_oracle_draft_minhash_estimate_vs_exact(spark, ddb):
    got = _rows(DD.minhash_estimate_vs_exact(spark.table("documents")))
    want = _sql_rows(ddb, minhash_estimate_vs_exact_sql())
    assert got == want
    assert len(got) > 0


def test_minhash_estimate_error_is_bounded_on_corpus(spark):
    """The 8-hash estimator's measured error on the real corpus's
    verified pairs stays inside the coarse-screen envelope (granularity
    1/8 => abs_err < 0.5 everywhere, and clones are exact)."""
    rows = DD.minhash_estimate_vs_exact(spark.table("documents")).collect()
    assert all(r["abs_err"] < 0.5 for r in rows)
    exact_ones = [r for r in rows if r["jaccard"] == 1.0]
    assert all(r["est_jaccard"] == 1.0 for r in exact_ones)


# --- q82: mixture rebalance --------------------------------------------------


mixture_rebalance_sql = E.mixture_rebalance_sql


def _q82(spark):
    drift = TXT.gate_mixture_drift(
        spark.table("documents"),
        min_words=20,
        min_stopword_hits=0,
        max_dup_word_frac=1.0,
        max_top_bigram_frac=1.0,
    )
    return TXT.mixture_rebalance(drift)


def test_oracle_draft_mixture_rebalance(spark, ddb):
    got = _rows(_q82(spark))
    want = _sql_rows(ddb, mixture_rebalance_sql())
    assert got == want
    assert len(got) > 1


def test_mixture_rebalance_restores_the_pre_gate_mixture(spark):
    """Weighted post-gate shares reproduce the pre-gate mixture where
    the cap doesn't bind, decimated sources are capped not exploded,
    and annihilated sources weight 0 (constructed fixture: one clean
    source, one decimated, one annihilated)."""
    good = [(i, "clean", "the quick brown fox jumps over the lazy dog " * 5)
            for i in range(40)]
    bad_keep = [(100, "mostly_bad",
                 "the quick brown fox jumps over the lazy dog " * 5)]
    bad_drop = [(200 + i, "mostly_bad", "### ### ###") for i in range(39)]
    gone = [(300 + i, "gone", "!!!") for i in range(20)]
    df = spark.createDataFrame(
        good + bad_keep + bad_drop + gone, "doc_id long, source string, text string"
    )
    drift = TXT.gate_mixture_drift(
        df, min_words=20, min_stopword_hits=0,
        max_dup_word_frac=1.0, max_top_bigram_frac=1.0,
    )
    out = {r["source"]: r for r in TXT.mixture_rebalance(drift, cap=10.0).collect()}
    assert out["gone"]["weight"] == 0.0
    assert out["mostly_bad"]["weight"] == 10.0  # true ratio ~16x -> capped
    # weighted share of the clean source ~= its pre-gate share
    w = out["clean"]
    assert abs(w["weight"] * w["share_after"] - w["share_before"]) < 0.01


# --- s25: IVF-PQ append ------------------------------------------------------


def test_oracle_draft_ivfpq_append(spark, ddb, tmp_path):
    """Codes-layout grow-vs-rebuild identity: build on the first half,
    append the rest (encoded by the STORED codebook, assigned by the
    STORED centroids — every quantization parameter derived from the
    resident _codebook), serve — row-identical to a fresh full build
    AND to the wired s10 oracle (seeds 0..15 sit in the first half).
    The r11 wiring therefore reuses E.oracle_sql()['s10_ivfpq_topk']
    verbatim, the s21 pattern."""
    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "pq_grow")
    SIM.build_ivfpq_index(emb.filter(F.col("vec_id") < 100), path, num_cells=8)
    n = SIM.append_to_ivfpq_index(
        spark, path, emb.filter(F.col("vec_id") >= 100)
    )
    assert n == (emb.count() - 100) * 4  # num_subspaces code rows per vector
    got = _rows(SIM.ivfpq_topk_from_index(spark, path, qs, k=5, nprobe=2))
    assert got == _sql_rows(ddb, E.oracle_sql()["s10_ivfpq_topk"])
    full = str(tmp_path / "pq_full")
    SIM.build_ivfpq_index(emb, full, num_cells=8)
    assert got == _rows(SIM.ivfpq_topk_from_index(spark, full, qs, k=5, nprobe=2))


def test_ivfpq_append_is_file_additive_and_validates(spark, tmp_path):
    """Resident files byte-untouched after the append (the concurrent-
    serving property); a raw-vector layout is rejected."""
    import glob
    import os

    emb = spark.table("embeddings")
    path = str(tmp_path / "pq_inc")
    SIM.build_ivfpq_index(emb.filter(F.col("vec_id") < 100), path, num_cells=8)

    def snap():
        return {
            p: (os.path.getsize(p), os.path.getmtime(p))
            for p in glob.glob(os.path.join(path, "cell=*", "*.parquet"))
        }

    before = snap()
    SIM.append_to_ivfpq_index(spark, path, emb.filter(F.col("vec_id") >= 100))
    after = snap()
    assert set(before) <= set(after)
    assert all(after[p] == before[p] for p in before)
    assert len(after) > len(before)
    raw = str(tmp_path / "raw_idx2")
    SIM.build_ivf_index(emb, raw, num_cells=8)
    with pytest.raises(ValueError, match="codes layout"):
        SIM.append_to_ivfpq_index(spark, raw, emb.filter(F.col("vec_id") >= 100))


# --- s26: IVF-PQ compaction --------------------------------------------------


def test_oracle_draft_ivfpq_compact(spark, ddb, tmp_path):
    """Codes-layout compaction after three appends: over-threshold
    cells collapse to one file each, serving row-identical to the
    wired s10 oracle."""
    import glob
    import os

    emb = spark.table("embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "pq_cpt")
    SIM.build_ivfpq_index(emb.filter(F.col("vec_id") < 100), path, num_cells=8)
    for lo, hi in ((100, 200), (200, 300), (300, 10**12)):
        SIM.append_to_ivfpq_index(
            spark, path, emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        )
    stats = SIM.compact_ivfpq_index(spark, path, max_files_per_cell=2)
    assert stats["cells_compacted"] > 0
    assert stats["files_after"] == stats["cells_compacted"] < stats["files_before"]
    for d in glob.glob(os.path.join(path, "cell=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) <= 2
    got = _rows(SIM.ivfpq_topk_from_index(spark, path, qs, k=5, nprobe=2))
    assert got == _sql_rows(ddb, E.oracle_sql()["s10_ivfpq_topk"])


# --- d17: quality-aware canonical selection ----------------------------------


def quality_canonical_sql() -> str:
    """The wired generator applied to the wired q34 + t02 strings —
    exactly what oracle_sql() wires for d17."""
    o = E.oracle_sql()
    return E.quality_canonical_sql(o["q34_dedup_clusters"], o["t02_quality"])


def test_oracle_draft_quality_canonical(spark, ddb):
    got = _rows(DD.quality_canonical_dedup(spark.table("documents")))
    want = _sql_rows(ddb, quality_canonical_sql())
    assert got == want
    assert len(got) == spark.table("documents").count()


def test_quality_canonical_keeps_the_clean_copy(spark):
    """A clone family spanning a clean original and a punctuation-
    noised mirror keeps the CLEAN one even when the noisy copy has the
    lower id — exactly the case lowest-id keep gets wrong — and
    conservation holds (one keeper per cluster)."""
    clean = (
        "the quick brown fox jumps over the lazy dog and it is a good day "
        "for the animals to be out in the sun with all of this fine weather"
    )
    noisy = clean + " ### !!! $$$ %%% ^^^ &&& *** ((( )))"
    rows = [
        (1, noisy),   # lower id, worse quality
        (2, clean),
        (10, "an unrelated singleton document that is entirely its own thing here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in DD.quality_canonical_dedup(df).collect()}
    assert out[1]["cluster_id"] == out[2]["cluster_id"]  # same family
    assert out[2]["keep"] and not out[1]["keep"]         # clean copy wins
    assert out[10]["keep"]
    # lowest-id keep would have chosen doc 1
    low = {r["doc_id"]: r for r in DD.apply_neardup_dedup(
        df, DD.neardup_clusters(df, DD.minhash_dedup(df))
    ).collect()}
    assert 1 in low and 2 not in low
    # exactly one keeper per cluster
    from collections import Counter
    keepers = Counter(r["cluster_id"] for r in out.values() if r["keep"])
    assert all(v == 1 for v in keepers.values())


def test_quality_canonical_tolerates_partial_scores(spark):
    """A caller-supplied scores table that misses some ids must not
    silently drop those docs (the documented every-input-doc
    contract): unscored docs still get a row, rank last within their
    cluster (nulls-last), and never beat a scored member."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 4),
        (2, "the quick brown fox jumps over the lazy dog " * 4),
        (9, "a singleton document that is entirely its own thing here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # scores cover doc 2 only: doc 1 (lower id, same cluster) must
    # still appear, unscored, and LOSE to the scored doc 2
    scores = spark.createDataFrame([(2, 0.9)], "doc_id long, quality_score double")
    out = {r["doc_id"]: r for r in DD.quality_canonical_dedup(df, scores).collect()}
    assert set(out) == {1, 2, 9}
    assert out[1]["quality_score"] is None and not out[1]["keep"]
    assert out[2]["keep"]
    assert out[9]["keep"] and out[9]["quality_score"] is None


# --- s27: cluster-balanced sample --------------------------------------------


cluster_balanced_sample_sql = E.cluster_balanced_sample_sql


def test_oracle_draft_cluster_balanced_sample(spark, ddb):
    got = _rows(SIM.cluster_balanced_sample(spark.table("embeddings")))
    want = _sql_rows(ddb, cluster_balanced_sample_sql())
    assert got == want
    assert len(got) > 1


def test_cluster_balanced_sample_flattens_and_is_stable(spark):
    """Exactly min(k, cell size) per cell; the sample is a subset of
    the full assignment; appending a vector displaces at most one
    selection per cell (the md5-order stability contract)."""
    emb = spark.table("embeddings")
    out = SIM.cluster_balanced_sample(emb, k_per_cell=3).collect()
    from collections import Counter
    per = Counter(r["cell"] for r in out)
    sizes = Counter(
        r["cell"]
        for r in SIM.cell_balance(emb).collect()
        for _ in range(r["n_vectors"])
    )
    assert all(per[c] == min(3, sizes[c]) for c in per)
    before = {(r["vec_id"], r["cell"]) for r in out}
    base = emb.select("vec_id", "embedding")
    grown = base.unionByName(
        base.limit(1).select(
            (F.col("vec_id") + 10**9).alias("vec_id"), "embedding"
        )
    )
    after = {
        (r["vec_id"], r["cell"])
        for r in SIM.cluster_balanced_sample(grown, k_per_cell=3).collect()
    }
    assert len(before - after) <= 1


# --- q84: assignment-based dirty shards (locality sharding) ------------------


dirty_shards_assigned_sql = E.dirty_shards_assigned_sql


def _q84(spark):
    from datacatalog_tag_engine_spark.pipeline.export import (
        dirty_shards_assigned,
        range_shard_assignments,
    )

    docs = spark.table("documents")
    old = range_shard_assignments(docs, 100)
    new = range_shard_assignments(docs.filter(F.col("doc_id") % 17 != 0), 100)
    return dirty_shards_assigned(old, new)


def test_oracle_draft_dirty_shards_assigned(spark, ddb):
    got = _rows(_q84(spark))
    want = _sql_rows(ddb, dirty_shards_assigned_sql(100))
    assert got == want
    assert len(got) > 1


def test_range_sharding_localizes_appends_and_surfaces_moves(spark):
    """The design lever the r10 incremental rung surfaced: a 200-doc
    trickle APPEND dirties 62/64 md5 shards (measured) but only
    ceil(200/width) range shards — here exactly 2 of ~50. And a doc
    whose shard changed between versions shows as removed@old +
    added@new (resharding cost is visible, not silent)."""
    from datacatalog_tag_engine_spark.pipeline.export import (
        dirty_shards,
        dirty_shards_assigned,
        range_shard_assignments,
    )

    docs = spark.table("documents").select("doc_id")
    top = docs.agg(F.max("doc_id")).first()[0]
    extra = spark.range(top + 1, top + 201).select(F.col("id").alias("doc_id"))
    grown = docs.unionByName(extra)
    ranged = dirty_shards_assigned(
        range_shard_assignments(docs, 100), range_shard_assignments(grown, 100)
    ).collect()
    dirty_ranged = [r for r in ranged if r["needs_rewrite"]]
    assert 1 <= len(dirty_ranged) <= 3  # ceil(200/100) + boundary shard
    assert sum(r["n_added"] for r in dirty_ranged) == 200
    hash_dirty = (
        dirty_shards(docs, grown, 64).filter("needs_rewrite").count()
    )
    assert hash_dirty > 50  # the saturation the rung measured
    # a moved doc is visible on both sides of the diff
    old_a = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, shard int")
    new_a = spark.createDataFrame([(1, 0), (2, 1)], "doc_id long, shard int")
    out = {r["shard"]: r for r in dirty_shards_assigned(old_a, new_a).collect()}
    assert out[0]["n_kept"] == 1 and out[0]["n_removed"] == 1
    assert out[1]["n_added"] == 1
    assert out[0]["needs_rewrite"] and out[1]["needs_rewrite"]


def test_recovery_replays_emptied_cell_deletions(spark, tmp_path, monkeypatch):
    """Review finding, red->green: a delete that EMPTIES a cell stages
    no rows for it, so a marker-only recovery would leave that cell
    fully live (resurrecting its deleted vectors) while completing the
    other cells' renames. The commit record carries the explicit
    empty-cell intent: recover_index_stage ALONE (no rerun of the
    delete) must remove the emptied cell and swap the staged one,
    leaving the index row-identical (and serving-identical) to the
    same delete run WITHOUT a crash on a twin index — both sides keep
    the same frozen stored quantizer, so the comparison is exact."""
    import collections
    import glob
    import os

    emb = spark.table("embeddings")
    path = str(tmp_path / "ivf_emptycell")
    twin = str(tmp_path / "ivf_emptycell_twin")
    SIM.build_ivf_index(emb, path, num_cells=8)
    SIM.build_ivf_index(emb, twin, num_cells=8)
    cells = {
        r["vec_id"]: r["cell"]
        for r in spark.read.parquet(path).select("vec_id", "cell").collect()
    }
    by_cell = collections.defaultdict(list)
    for vid, c in cells.items():
        by_cell[c].append(vid)
    victim_cell = min(by_cell, key=lambda c: len(by_cell[c]))
    partial_cell = next(c for c in by_cell if c != victim_cell)
    doomed_ids = by_cell[victim_cell] + sorted(by_cell[partial_cell])[-3:]
    doomed = spark.createDataFrame([(i,) for i in doomed_ids], "vec_id long")

    class CrashAtSwapFS:
        def __init__(self, fs):
            self._fs = fs

        def delete(self, p, recursive=True):
            s = str(p)
            if "cell=" in s and SIM.REWRITE_TMP_DIR not in s:
                raise RuntimeError("injected crash before swap")
            return self._fs.delete(p, recursive)

        def __getattr__(self, name):
            return getattr(self._fs, name)

    real_index_fs = SIM._index_fs
    monkeypatch.setattr(
        SIM,
        "_index_fs",
        lambda s_, p_: (CrashAtSwapFS(real_index_fs(s_, p_)[0]), real_index_fs(s_, p_)[1]),
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        SIM.remove_from_ivf_index(spark, path, doomed)
    monkeypatch.setattr(SIM, "_index_fs", real_index_fs)

    # the reference: the same delete, no crash
    n_ref = SIM.remove_from_ivf_index(spark, twin, doomed)
    assert n_ref == len(doomed_ids)

    # recovery ALONE (no rerun of the delete) on the crashed index
    n = SIM.recover_index_stage(spark, path)
    assert n >= 2
    assert not os.path.isdir(os.path.join(path, SIM.REWRITE_TMP_DIR))
    assert not glob.glob(os.path.join(path, f"cell={victim_cell}"))
    rows = lambda p: sorted(
        (r["vec_id"], r["cell"]) for r in spark.read.parquet(p).select("vec_id", "cell").collect()
    )
    assert rows(path) == rows(twin)
    survivors = {v for v in cells if v not in set(doomed_ids)}
    assert {v for v, _ in rows(path)} == survivors
    qs = emb.filter(F.col("vec_id") < 5)
    assert _rows(SIM.ivf_topk_from_index(spark, path, qs, k=5, nprobe=2)) == _rows(
        SIM.ivf_topk_from_index(spark, twin, qs, k=5, nprobe=2)
    )


def test_torn_commit_record_treated_as_uncommitted(spark, tmp_path):
    """r12 ADVICE medium, red->green: on HDFS/local filesystems a file
    is VISIBLE from create, so the pre-fix single-create commit write
    could crash mid-write and leave a partial/empty _commit.json;
    recovery would then raise JSONDecodeError at the TOP of every
    remove/compact/_swap_cells call — one torn byte wedging all index
    maintenance forever. The fixed protocol (write .tmp, close, rename)
    can't leave a torn final record on rename-atomic filesystems, and
    the reader additionally treats an unparseable record as
    UNCOMMITTED (safe: the swap loop only starts after the record is
    fully written and renamed, so a torn record implies a
    byte-untouched live index). recover_index_stage must report 0 and
    a follow-up delete must discard the torn stage and proceed."""
    import os

    emb = spark.table("embeddings")
    path = str(tmp_path / "ivf_torn_commit")
    SIM.build_ivf_index(emb, path, num_cells=8)
    before = sorted(
        r["vec_id"] for r in spark.read.parquet(path).select("vec_id").collect()
    )

    # simulate the pre-fix torn write: a stage dir whose commit record
    # is garbage bytes (crash mid-write on a visible-from-create FS)
    tmp_dir = os.path.join(path, SIM.REWRITE_TMP_DIR)
    os.makedirs(tmp_dir, exist_ok=True)
    for torn in (b"", b'{"staged": [1, 2', b"\xff\xfe garbage"):
        with open(os.path.join(tmp_dir, SIM.REWRITE_COMMIT_FILE), "wb") as f:
            f.write(torn)
        assert SIM.recover_index_stage(spark, path) == 0
        # the live index is untouched
        assert sorted(
            r["vec_id"] for r in spark.read.parquet(path).select("vec_id").collect()
        ) == before

    # and index maintenance is NOT wedged: the next delete discards the
    # torn stage and completes normally
    with open(os.path.join(tmp_dir, SIM.REWRITE_COMMIT_FILE), "wb") as f:
        f.write(b'{"torn": tru')
    doomed = spark.createDataFrame([(before[0],), (before[1],)], "vec_id long")
    n = SIM.remove_from_ivf_index(spark, path, doomed)
    assert n == 2
    assert not os.path.isdir(tmp_dir)
    left = sorted(
        r["vec_id"] for r in spark.read.parquet(path).select("vec_id").collect()
    )
    assert left == before[2:]
    # the healthy protocol leaves no .tmp sibling behind either
    assert not any(
        name.endswith(".tmp")
        for _r, _d, files in os.walk(path)
        for name in files
    )
