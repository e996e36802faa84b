"""Dedup diagnostics (the xxhash64 join-key substitution guard)."""


def test_hash_collision_diagnostic_zero(spark):
    from datacatalog_tag_engine_spark.pipeline.dedup import hash_collision_count, shingle_table

    docs = spark.table("documents")
    assert hash_collision_count(shingle_table(docs)) == 0
