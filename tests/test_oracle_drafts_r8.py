"""Round-8 rotation prep: DuckDB oracle proofs for the two queries
entering the inventory this round, run against the SAME generator
functions the wired oracle_sql() calls (the strings live in
__spark_entry__; one copy, no drift):

- m02_image_phash_neardup — payload-level image near-dup: perceptual
  average-hash over the fake-decoded pixel grid (integer-exact bit
  rule, two's-complement packing) + banded Hamming LSH
  (dedup.hamming_neardup_pairs). The fixture corpus is parameter-fixed
  (6 groups x 3 variants), so the SQL replays corpus, hash, banding,
  and verify analytically.
- t12b_packing_invariants — the stateful greedy packer's
  oracle-checkable derivative: chunk/token conservation replayed from
  the t09 manifest; duplicate/offset/overfull counters pinned to zero.

Also the semantic floor for m02 the hash alone doesn't show: every
intra-group variant pair is found, nothing pairs across groups.

ROTATION LANDED (round-8 start): both queries are wired as
queries()/oracle_sql() pairs; tests/test_r8_rotation_wiring.py holds
the window invariants."""

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def ddb():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
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


def _m02(spark):
    from datacatalog_tag_engine_spark.pipeline import dedup as DD
    from datacatalog_tag_engine_spark.pipeline import multimodal as MM

    fps = MM.image_phash(MM.make_fake_image_corpus(spark, n_groups=6, group_size=3))
    return DD.hamming_neardup_pairs(
        fps, id_col="media_id", fp_col="phash", bits=64, bands=4, max_hamming=10
    )


def test_oracle_draft_image_phash_neardup(spark, ddb):
    got = _rows(_m02(spark))
    want = _sql_rows(ddb, E.phash_neardup_sql(n_groups=6, group_size=3, max_hamming=10))
    assert got == want
    assert len(got) > 0  # the banding actually surfaced candidates


def test_image_phash_neardup_semantics(spark):
    """The floor the hash match doesn't show: with 6 groups x 3 seed
    variants (seed j flips <= j grid cells), ALL 18 intra-group pairs
    are found and NO cross-group pair sneaks under max_hamming."""
    rows = [(r["id_a"], r["id_b"], r["hamming"]) for r in _m02(spark).collect()]
    assert len(rows) == 18
    assert all(a // 3 == b // 3 for a, b, _ in rows)
    assert all(0 < h <= 10 for _, _, h in rows)


def test_image_phash_two_complement_bit63(spark):
    """At least one fixture fingerprint must exercise the negative
    (bit-63) range across the corpus lifetime of the test suite — the
    packing rule is the cross-engine contract. If the parameter-fixed
    corpus never sets bit 63, prove the rule directly on a crafted
    payload instead."""
    from datacatalog_tag_engine_spark.pipeline import multimodal as MM

    fps = [
        r["phash"]
        for r in MM.image_phash(
            MM.make_fake_image_corpus(spark, n_groups=6, group_size=3)
        ).collect()
    ]
    if not any(f < 0 for f in fps):
        # direct rule check: a grid whose cell 63 is above the mean
        vals = MM._fake_pixel_grid(64, 48, 0)
        s = sum(vals)
        fp = 0
        for cell, v in enumerate(vals):
            if 64 * v > s:
                fp |= 1 << cell
        assert (fp - (1 << 64) if fp >= 1 << 63 else fp) == int(
            duckdb.sql(
                "SELECT sum(CASE WHEN b THEN CASE WHEN c = 63 THEN "
                "-9223372036854775808 ELSE (1::BIGINT << c) END ELSE 0 END)::BIGINT "
                "FROM (SELECT unnest(range(64)) c, unnest(?) > ? * 64 / 64.0 b)",
                params=[[64 * v for v in vals], s],
            ).fetchone()[0]
        )


def test_oracle_draft_packing_invariants(spark, ddb):
    got = _rows(E.queries()["t12b_packing_invariants"](spark, SF))
    want = _sql_rows(ddb, E.packing_invariants_sql())
    assert got == want
    # and the row is non-degenerate: the corpus actually has chunks
    # (sorted cols: n_chunks, n_dup_chunks, n_offset_violations,
    # n_overfull_bins, total_tokens)
    assert got[0][0] > 0 and got[0][4] > 0


def test_packing_invariants_catch_violations(spark):
    """The zero counters are real tripwires: a corrupted packing
    (duplicated chunk / broken offset / overfull bin) must drive the
    Spark-side counters nonzero — otherwise t12b certifies nothing."""
    from pyspark.sql import Window

    from datacatalog_tag_engine_spark.pipeline import text as TXT

    docs = spark.table("documents")
    packed = TXT.pack_chunks(TXT.chunk_documents(docs), capacity=64)
    # corrupt: duplicate one chunk and break one offset
    bad = packed.unionByName(packed.limit(1)).withColumn(
        "bin_offset",
        F.when(
            (F.col("doc_id") == packed.limit(1).collect()[0]["doc_id"])
            & (F.col("chunk_id") == 0),
            F.col("bin_offset") + 1,
        ).otherwise(F.col("bin_offset")),
    )
    w = (
        Window.partitionBy("shard", "bin_id")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunks = bad.withColumn("_exp", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    stats = chunks.agg(
        (F.count("*") - F.count_distinct(F.struct("doc_id", "chunk_id")))
        .cast("long")
        .alias("n_dup_chunks"),
        F.sum((F.col("bin_offset") != F.col("_exp")).cast("int"))
        .cast("long")
        .alias("n_offset_violations"),
    ).collect()[0]
    assert stats["n_dup_chunks"] > 0
    assert stats["n_offset_violations"] > 0
