"""Round-9 rotation wiring proof: the r9 oracle wiring pins (the
window-invariants test moved to test_r10_rotation_wiring when the
window rotated at round-10 start, the same hand-off this file
received from test_r8_rotation_wiring)."""

import __spark_entry__ as E


def test_wired_r9_oracles_are_the_proven_generators():
    """oracle_sql() must route through the SAME generator calls the
    r9 draft proofs exercised (one copy; a parameter drift here would
    sever the proof from the wired string)."""
    o = E.oracle_sql()
    assert o["m03_audio_fp_neardup"] == E.audio_fp_neardup_sql()
    assert o["m04_video_frame_neardup"] == E.video_frame_neardup_sql()
    assert o["d11_source_dup_profile"] == E.source_dup_profile_sql()
    # r10: the containment family's stop-shingle cap defaulted ON;
    # the wired strings carry it (proven in test_oracle_drafts_r10)
    from datacatalog_tag_engine_spark.pipeline.dedup import (
        DEFAULT_CONTAINMENT_MAX_DF,
    )

    assert o["d12_containment"] == E.containment_sql(0.8, DEFAULT_CONTAINMENT_MAX_DF)
    assert o["d13_cross_source_overlap"] == E.cross_source_overlap_sql()
    assert o["d14_containment_dedup"] == E.containment_dedup_sql(
        max_df=DEFAULT_CONTAINMENT_MAX_DF
    )
    assert o["s13_cell_balance"] == E.cell_balance_sql()
    assert o["s14_ivfpq_rerank"] == E.ivfpq_rerank_sql(nprobe=2, shortlist=20, k=5)
    assert o["s15_ivfpq_rerank_from_index"] == o["s14_ivfpq_rerank"]
    assert o["t27_tokenizer_fertility"] == E.tokenizer_fertility_sql(E.BPE_MERGES)
    assert o["t28_corpus_divergence"] == E.corpus_divergence_sql()
    assert o["t29_vocab_growth"] == E.vocab_growth_sql()
    assert o["q66_length_outliers"] == E.length_outliers_sql()
    assert o["q67_event_funnel"] == E.event_funnel_sql()
    assert o["q68_holdout_split"] == E.holdout_split_sql()
    assert o["q69_shard_balance"] == E.shard_balance_sql(16)
    assert o["q70_cohort_retention"] == E.cohort_retention_sql()


def test_ivfpq_refactor_preserves_s10_oracle():
    """The rerank refactor split ivfpq_sql into a shared scored-CTE
    prefix + ranked tail; the s10/s11 wired string must still be the
    pre-refactor form (same chain, QUALIFY rank <= 5) and the rerank
    string must extend the IDENTICAL prefix."""
    o = E.oracle_sql()
    s10 = o["s10_ivfpq_topk"]
    prefix = E._ivfpq_scored_cte(2)
    assert s10.startswith(prefix)
    assert "QUALIFY rank <= 5" in s10
    assert o["s14_ivfpq_rerank"].startswith(prefix)
    assert "QUALIFY srank <= 20" in o["s14_ivfpq_rerank"]
    assert o["s10_ivfpq_topk"] == o["s11_ivfpq_from_index"]


def test_q71_oracle_extends_the_q59_chain():
    """q71's oracle is the q59v2 prefix (stage-0-injected cleaning
    chain through clusters) plus the d14 containment + q69
    shard-balance tails — the composition reads ONE source (cleaned),
    and the q59v2 string itself is untouched by the refactor."""
    o = E.oracle_sql()
    q71 = o["q71_export_pipeline"]
    q59 = o["q59v2_clean_pipeline"]
    # both begin with the identical stage-0-injected prefix
    head = q59.split("SELECT c.doc_id")[0]
    assert q71.startswith(head.rstrip().rstrip(","))
    for marker in ("ccan", "ct_sh", "closers", "all_shards", "doc_skew"):
        assert marker in q71
    assert q71.count("FROM documents") == 1  # only stage-0's n0 reads raw
