"""Round-11 rotation wiring proof: the r11 oracle wiring pins (the
window-invariants test and the mechanical aging ledger moved to
test_r12_rotation_wiring when the window rotated at round-12 start —
the same hand-off this file received from test_r10_rotation_wiring)."""


import __spark_entry__ as E

ROTATED_R11 = {
    "s22_ivf_delete", "s23_ivf_compact", "s24_ivfpq_delete",
    "s25_ivfpq_append", "s26_ivfpq_compact", "s27_cluster_balanced_sample",
    "d15_minhash_estimate", "d16_minhash_estimate_vs_exact",
    "d17_quality_canonical", "t33_token_entropy",
    "q80_incremental_pipeline", "q82_mixture_rebalance",
    "q84_dirty_shards_assigned", "q85_session_funnel_state",
}

# code-changed this round: the containment family's max_df filter
# inverted to a hot-set anti-join (value-identical, plan changed)
RECERTS_R11 = {"d12_containment", "d14_containment_dedup", "q71_export_pipeline"}


def test_wired_r11_oracles_are_the_proven_generators():
    """oracle_sql() must route through the SAME generator calls the
    r11 draft proofs exercised (one copy; a parameter drift here would
    sever the proof from the wired string)."""
    o = E.oracle_sql()
    # lifecycle identities: delete = serving chain over survivors;
    # append/compact are value-invariant (the s21 pattern)
    assert o["s22_ivf_delete"] == E.ivf_delete_sql(o["s04_ann_ivf_nprobe"])
    assert o["s23_ivf_compact"] == o["s04_ann_ivf_nprobe"]
    assert o["s24_ivfpq_delete"] == E.ivfpq_delete_sql(o["s10_ivfpq_topk"])
    assert o["s25_ivfpq_append"] == o["s10_ivfpq_topk"]
    assert o["s26_ivfpq_compact"] == o["s10_ivfpq_topk"]
    assert o["s27_cluster_balanced_sample"] == E.cluster_balanced_sample_sql(5, 8)
    assert o["d15_minhash_estimate"] == E.minhash_estimate_sql(0.5)
    assert o["d16_minhash_estimate_vs_exact"] == E.minhash_estimate_vs_exact_sql(0.5)
    assert o["d17_quality_canonical"] == E.quality_canonical_sql(
        o["q34_dedup_clusters"], o["t02_quality"]
    )
    assert o["t33_token_entropy"] == E.token_entropy_sql()
    assert o["q80_incremental_pipeline"] == E.incremental_pipeline_sql(8)
    assert o["q82_mixture_rebalance"] == E.mixture_rebalance_sql(10.0)
    assert o["q84_dirty_shards_assigned"] == E.dirty_shards_assigned_sql(100)
    # the streaming decomposition's batch replay reproduces q75 exactly
    assert o["q85_session_funnel_state"] == o["q75_session_funnel"]


def test_q80_composition_strings_stay_consistent():
    """q80's oracle composes three wired derivations by string surgery;
    pin the seams so a drift in any source string is caught here (the
    inline asserts the draft generator carried before it was wired —
    a generator inside oracle_sql() cannot call oracle_sql()):
    the q51 fingerprint rule, the clean-ingest anchor, and the q79
    bucket rule must all appear verbatim."""
    o = E.oracle_sql()
    assert E.Q51_FINGERPRINT_EXPR in o["q51_corpus_delta"]
    assert E.Q51_FINGERPRINT_EXPR in o["q80_incremental_pipeline"]
    assert E.CLEAN_INGEST_SQL.count("FROM documents)") == 1
    assert "FROM documents JOIN delta USING (doc_id))" in o["q80_incremental_pipeline"]
    bucket = "(('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 8)"
    assert bucket in o["q80_incremental_pipeline"]
    assert bucket in o["q79_dirty_shards"]


def test_delete_pred_keeps_seeds_and_queries():
    """The rebuild-identity proofs (s22/s24) hold only because the
    survivor set keeps the quantizer seeds (ids 0..15 cover both
    layouts' seeding) and the query set (ids < 5); pin the predicate's
    floor so a casual edit can't silently break the identity."""
    assert E.DELETE_PRED.startswith("vec_id >= 100")
