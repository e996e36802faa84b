"""Round-7 rotation wiring proof: the oracle strings the driver runs
(__spark_entry__.oracle_sql()) are byte-identical to the derivations
tests/test_oracle_drafts_r7.py proved value-equal against DuckDB — so
the draft proofs transfer to the wired inventory with zero drift — and
the window invariants the freeze policy depends on hold."""

import __spark_entry__ as E

import test_oracle_drafts_r7 as D


def test_wired_oracles_match_proven_drafts():
    o = E.oracle_sql()
    assert o["t19_perplexity_buckets"] == D.PERPLEXITY_SQL
    assert o["q61_clean_ingest"] == D.CLEAN_INGEST_SQL
    assert o["q62_sample_k_per_group"] == D.SAMPLE_K_SQL
    assert o["t21_normalize_text"] == D.NORMALIZE_SQL
    assert o["t22_vocab_stats"] == D.VOCAB_STATS_SQL
    assert o["d10_line_dedup"] == D.LINE_DEDUP_SQL
    assert o["t23_collapse_lines"] == D.COLLAPSE_LINES_SQL
    assert o["q63_epoch_plan"] == D.EPOCH_PLAN_SQL
    assert o["t24_decontamination"] == D.DECONTAM_SQL
    assert o["q64_gate_metrics"] == D.GATE_METRICS_SQL
    assert o["q65_materialize_mixture"] == D.MATERIALIZE_SQL
    assert o["t25_chunk_text"] == D.CHUNK_TEXT_SQL
    assert o["s10_ivfpq_topk"] == D.ivfpq_sql(2)
    assert o["s11_ivfpq_from_index"] == D.ivfpq_sql(2)
    assert o["s12_ivfpq_residual"] == D.ivfpq_residual_sql(2)
    assert o["t26_strip_html"] == D.strip_html_sql("documents")
    assert o["t20_classifier_weights"] == D.classifier_sql(
        iterations=3, num_buckets=64, lr=2.0
    )
    assert o["t18_bpe_apply"] == D.bpe_apply_sql(E.BPE_MERGES)
    # the persisted-index paths replay the same SQL as their in-memory
    # counterparts (what makes pruning hash-checkable, not just faster)
    assert o["s09_ivf_from_index"] == o["s03_ann_ivf"]
    assert E.normalize_expr_sql("text") == D._normalize_expr_sql("text")


def test_frozen_bpe_merges_match_fresh_train(spark):
    """BPE_MERGES was frozen from bpe_train(documents@sf0.001, 16) —
    if bpe_train's merge selection ever drifts, the t18 inventory row
    would silently certify a stale artifact; this pins them equal."""
    from datacatalog_tag_engine_spark.pipeline import bpe

    merges, _ = bpe.bpe_train(spark.table("documents"), num_merges=16)
    assert merges == E.BPE_MERGES


# The r7 window-invariants snapshot moved to tests/test_r8_rotation_
# wiring.py, which asserts the CURRENT window; the string-pinning tests
# above stay valid for as long as the r7-rotated oracles are wired.
