"""Round-13 rotation wiring proof, trimmed at the round-14 rotation:
the window-invariants, mechanical-ledger, and round-artifact tests
moved to test_r14_rotation_wiring when the window rotated at round-14
start — what remains is the permanent assertion that the r13 oracle
strings still route through the SAME generator calls their draft
proofs exercised (one copy; a parameter drift here would sever the
proof from the wired string)."""

import __spark_entry__ as E


def test_wired_r13_oracles_are_the_proven_generators():
    """oracle_sql() must route through the SAME generator calls the
    r13 draft proofs exercised (one copy; a parameter drift here would
    sever the proof from the wired string)."""
    o = E.oracle_sql()
    # identity oracles: star contraction == min-label propagation
    # (the s29/s31 pattern); recall-from-index == in-memory recall
    assert o["d22_clusters_star"] == o["q34_dedup_clusters"]
    assert o["s33_recall_from_index"] == o["s05_ann_recall"]
    assert o["t39_line_lang_profile"] == E.line_lang_profile_sql()
    assert o["t40_line_repetition"] == E.line_repetition_sql()
    assert o["t41_ngram_coverage"] == E.ngram_coverage_sql()
    # nesting compositions: each wired string nests its source verbatim
    assert o["q100_score_gate_calibration"] == E.score_gate_calibration_sql(
        o["t02_quality"], o["t16_gopher_filter"]
    )
    assert o["s32_mutual_knn_clusters"] == E.mutual_knn_clusters_sql(5, 8)
    assert o["t42_pii_incidence"] == E.pii_incidence_sql()
    assert o["t43_winnowing"] == E.winnowing_sql()
    assert o["d24_threshold_sweep"] == E.threshold_sweep_sql()
    assert o["q101_shard_skew"] == E.shard_skew_sql(16)
    assert o["d25_winnowing_overlap"] == E.winnowing_overlap_sql(
        o["t43_winnowing"]
    )
    # chain-surgery composition: ONE copy of the q34 cluster chain
    assert o["d26_cluster_purity"] == E.cluster_purity_sql(
        o["q34_dedup_clusters"]
    )
    assert o["q102_sigstore_ingest"] == E.sigstore_replay_sql()
