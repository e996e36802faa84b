"""Training-shard export (pipeline/export.py): deterministic shard
assignment, manifest accounting, and read-back round-trip."""

import pytest
from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.pipeline import export as EX


def test_write_training_shards_roundtrip(spark, tmp_path):
    docs = spark.table("documents").select("doc_id", "text").withColumn(
        "n_tokens", F.size(F.split("text", r"\s+"))
    )
    path = str(tmp_path / "shards")
    manifest = EX.write_training_shards(docs, path, num_shards=4, token_col="n_tokens")
    rows = {r["shard"]: r for r in manifest.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert sum(r["n_docs"] for r in rows.values()) == docs.count()
    assert sum(r["n_tokens"] for r in rows.values()) == (
        docs.agg(F.sum("n_tokens")).first()[0]
    )
    # written data reads back complete; the _manifest dir is invisible
    # to the data read (leading underscore)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert set(back.columns) == {"doc_id", "text", "n_tokens", "shard"}


def test_shard_assignment_deterministic(spark):
    docs = spark.table("documents").select("doc_id")
    a = {r["doc_id"]: r["shard"] for r in EX.shard_assignments(docs, 8).collect()}
    b = {
        r["doc_id"]: r["shard"]
        for r in EX.shard_assignments(docs.repartition(13), 8).collect()
    }
    assert a == b
    # md5 buckets spread roughly uniformly
    from collections import Counter

    c = Counter(a.values())
    assert len(c) == 8 and max(c.values()) < 3 * min(c.values())


def test_write_training_shards_rejects_bad_count(spark, tmp_path):
    with pytest.raises(ValueError, match="num_shards"):
        EX.shard_assignments(spark.table("documents"), 0)


def test_manifest_keeps_empty_shards(spark, tmp_path):
    # 3 docs into 16 shards: most buckets receive nothing, but the
    # manifest must still enumerate the full fixed shard set
    docs = spark.table("documents").select("doc_id", "text").limit(3).withColumn(
        "n_tokens", F.size(F.split("text", r"\s+"))
    )
    manifest = EX.write_training_shards(
        docs, str(tmp_path / "s"), num_shards=16, token_col="n_tokens"
    )
    rows = {r["shard"]: r for r in manifest.collect()}
    assert set(rows) == set(range(16))
    assert sum(r["n_docs"] for r in rows.values()) == 3
    empty = [s for s, r in rows.items() if r["n_docs"] == 0]
    assert len(empty) >= 13
    assert all(rows[s]["n_tokens"] == 0 for s in empty)


def test_empty_input_manifest_all_zero(spark, tmp_path):
    docs = spark.table("documents").select("doc_id", "text").filter("doc_id < 0")
    manifest = EX.write_training_shards(docs, str(tmp_path / "e"), num_shards=4)
    rows = {r["shard"]: r["n_docs"] for r in manifest.collect()}
    assert rows == {0: 0, 1: 0, 2: 0, 3: 0}


def test_null_ids_rejected(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "a"), (None, "b")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="NULL"):
        EX.write_training_shards(docs, str(tmp_path / "n"), num_shards=2)


def test_jsonl_shards_match_parquet_and_stream_as_lines(spark, tmp_path):
    """data_format='json' + gzip: the conventional .jsonl.gz training
    shards. Same manifest contract, same deterministic shard
    membership as parquet; the files are literally one JSON doc per
    line and a loader-style read round-trips every row."""
    import gzip
    import json
    import os

    from datacatalog_tag_engine_spark.pipeline.export import write_training_shards

    docs = spark.table("documents").select("doc_id", "text", "n_chars")
    pq = write_training_shards(docs, str(tmp_path / "pq"), 4, token_col="n_chars")
    jl = write_training_shards(
        docs, str(tmp_path / "jl"), 4, token_col="n_chars",
        data_format="json", compression="gzip",
    )
    assert sorted(map(tuple, jl.collect())) == sorted(map(tuple, pq.collect()))

    # shard membership identical row-for-row
    a = spark.read.parquet(str(tmp_path / "pq")).select("doc_id", "shard")
    b = spark.read.schema(
        "doc_id long, text string, n_chars long, shard int"
    ).json(str(tmp_path / "jl")).select("doc_id", "shard")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    # raw loader path: gunzip one file, one JSON object per line
    shard0 = os.path.join(str(tmp_path / "jl"), "shard=0")
    fn = next(f for f in os.listdir(shard0) if f.endswith(".json.gz"))
    with gzip.open(os.path.join(shard0, fn), "rt") as f:
        lines = [json.loads(line) for line in f]
    assert lines and all("doc_id" in d and "text" in d for d in lines)

    with __import__("pytest").raises(ValueError, match="data_format"):
        write_training_shards(docs, str(tmp_path / "bad"), 2, data_format="csv")
