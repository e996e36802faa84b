"""Round-10 rotation wiring proof: the r10 oracle wiring pins (the
window-invariants test and the mechanical aging ledger moved to
test_r11_rotation_wiring when the window rotated at round-11 start —
the same hand-off this file received from test_r9_rotation_wiring —
with the ledger now capped at rounds below the rotation round, fixing
the r10 design flaw where the driver's own current-round record
inverted the filler assertion mid-round)."""

import __spark_entry__ as E


def test_wired_r10_oracles_are_the_proven_generators():
    """oracle_sql() must route through the SAME generator calls the
    r10 draft proofs exercised (one copy; a parameter drift here would
    sever the proof from the wired string)."""
    o = E.oracle_sql()
    assert o["s16_range_search"] == E.range_search_sql(0.2, 2)
    assert o["s17_cell_inertia"] == E.cell_inertia_sql()
    assert o["s18_pq_code_histogram"] == E.pq_code_histogram_sql()
    assert o["s19_embedding_stats"] == E.embedding_stats_sql()
    # persisted-layout identities: the index round-trip changes no value
    assert o["s20_cell_balance_from_index"] == E.cell_balance_sql(8)
    assert o["s20_cell_balance_from_index"] == o["s13_cell_balance"]
    assert o["s21_ivf_append"] == o["s04_ann_ivf_nprobe"]
    assert o["t30_char_coverage"] == E.char_coverage_sql()
    assert o["t31_ngram_novelty"] == E.ngram_novelty_sql()
    assert o["t32_top_ngrams"] == E.top_ngrams_sql()
    assert o["q72_gate_mixture_drift"] == E.gate_mixture_drift_sql()
    assert o["q73_cluster_size_profile"] == E.cluster_size_profile_sql(
        o["q34_dedup_clusters"]
    )
    assert o["q74_percentile_tolerance"] == E.percentile_tolerance_sql()
    assert o["q75_session_funnel"] == E.session_funnel_sql(tuple(E.FUNNEL_STEPS))
    assert o["q76_event_rate_anomaly"] == E.event_rate_anomaly_sql()
    assert o["q77_lang_source_profile"] == E.lang_source_profile_sql()
    assert o["q78_cohort_via_state"] == E.cohort_retention_sql()
    assert o["q78_cohort_via_state"] == o["q70_cohort_retention"]
    assert o["q79_dirty_shards"] == E.dirty_shards_sql(8)
    assert o["m05_manifest_stats"] == E.manifest_stats_sql(
        o["m01_multimodal_features"]
    )


def test_containment_recerts_carry_the_capped_oracles():
    """The re-certified d12/d14/q71 strings must apply the SAME df
    filter the Spark default applies (the r10 semantic change is in
    both engines or the rows would be vacuously green)."""
    from datacatalog_tag_engine_spark.pipeline.dedup import (
        DEFAULT_CONTAINMENT_MAX_DF,
    )

    o = E.oracle_sql()
    cap = f"count(*) <= {DEFAULT_CONTAINMENT_MAX_DF}"
    assert cap in o["d12_containment"]
    assert cap in o["d14_containment_dedup"]
    assert cap in o["q71_export_pipeline"]
