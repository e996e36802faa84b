"""Round-12 rotation wiring proof: the current window invariants the
freeze policy depends on, the r12 oracle wiring pins, and the
MECHANICAL rounds-since-green aging ledger capped at rounds BELOW the
rotation round (so the driver's own current-round record cannot invert
the filler assertion mid-round — the r11 design, inherited)."""

import glob
import json
import os
import re

import __spark_entry__ as E

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the round this window was frozen at: ledger rows from this round on
# are the window's OWN output, not inputs to its selection
ROTATION_ROUND = 12

# the three oracle-less-by-nature queries the window excludes by policy
ROWS_ONLY = {"q09_current_timestamp", "t12_packing", "s06_ann_ivf_kmeans"}

ROTATED_R12 = {
    "q86_resharding_plan", "d18_lsh_parameter_table",
    "t34_code_prose_profile", "q88_source_dup_rate",
    "d19_incremental_neardup", "s28_quantizer_drift",
    "s29_quantizer_drift_from_index", "q90_curriculum_order",
    "q91_stage_mixture", "m06_payload_size_profile",
    "d20_shingle_df_profile", "q93_contamination_profile",
    "t36_langid_margin", "q94_verify_shards",
    "q95_source_relative_curriculum", "t37_heavy_hitters",
    "q97_snapshot_diff", "q98_gate_overlap",
    "s30_knn_graph", "s31_knn_graph_from_index",
    # the two rows the r11 VERDICT asked forward out of the r13 bank
    "q99_heavy_hitter_state", "d23_neardup_from_store",
}

# code-changed this round: quality_scores gained an ANSI
# division-by-zero guard late in r11 (value-identical on non-empty
# text; t02 is also a bench ambient sentinel, so it re-certifies with
# an explicit witness slot), and the rewrite-path lifecycle core
# gained the committed-stage recovery contract (recover_index_stage),
# so the four delete/compact queries re-certify
RECERTS_R12 = {
    "t02_quality",
    "s22_ivf_delete", "s23_ivf_compact", "s24_ivfpq_delete",
    "s26_ivfpq_compact",
}


def ledger() -> dict[str, int]:
    """query -> most recent round with a green (rows_match) driver row,
    from the CORRECTNESS_r*.json records committed BEFORE this window's
    rotation (rounds < ROTATION_ROUND)."""
    last: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        if rnd >= ROTATION_ROUND:
            continue
        data = json.load(open(p))
        if not isinstance(data, dict):
            continue
        for qname, row in data.items():
            if isinstance(row, dict) and row.get("rows_match"):
                last[qname] = max(last.get(qname, 0), rnd)
    return last


def test_window_invariants():
    """50-slot window, every entry resolvable and oracle-backed, the
    rotation + re-certification sets sit inside; inventory is 188."""
    qs = E.queries()
    os_ = E.oracle_sql()
    names = list(qs)
    assert len(names) == 188
    window = names[:50]
    assert [n for n in window if n not in os_] == []
    assert ROTATED_R12 <= set(window)
    assert RECERTS_R12 <= set(window)
    assert ROWS_ONLY.isdisjoint(window)


def test_filler_slots_are_mechanically_the_oldest_rows():
    """The drip is computed, not curated: filler slots (window minus
    rotation minus re-certs) == the N oldest as-of-rotation ledger rows
    among eligible queries, oldest-first with name tie-break."""
    names = list(E.queries())
    window = set(names[:50])
    fillers = window - ROTATED_R12 - RECERTS_R12
    last = ledger()
    eligible = [
        n for n in names
        if n not in ROTATED_R12 and n not in RECERTS_R12 and n not in ROWS_ONLY
    ]
    # every eligible query has SOME green driver row as of rotation
    # (never-windowed: none) — the union invariant
    assert [n for n in eligible if n not in last] == []
    expect = {n for _, n in sorted((last[n], n) for n in eligible)[: len(fillers)]}
    assert fillers == expect
    # and the oldest eligible row left OUT of the window is no older
    # than every filler (the boundary is clean)
    out = [last[n] for n in eligible if n not in window]
    assert max(last[n] for n in fillers) <= min(out)


def test_ledger_reaches_every_inventory_query():
    """The as-of-rotation union + this window covers the whole
    inventory: each query either has a green row already or is entering
    the window for its first one (the 20 rotated) or is rows-only by
    nature."""
    names = list(E.queries())
    last = ledger()
    window = set(names[:50])
    uncovered = [
        n for n in names
        if n not in last and n not in window and n not in ROWS_ONLY
    ]
    assert uncovered == []


def test_wired_r12_oracles_are_the_proven_generators():
    """oracle_sql() must route through the SAME generator calls the
    r12 draft proofs exercised (one copy; a parameter drift here would
    sever the proof from the wired string)."""
    o = E.oracle_sql()
    assert o["q86_resharding_plan"] == E.resharding_plan_sql(100, 500)
    assert o["d18_lsh_parameter_table"] == E.lsh_parameter_table_sql()
    assert o["t34_code_prose_profile"] == E.code_prose_profile_sql()
    # chain-surgery composition: ONE copy of the q34 cluster chain
    assert o["q88_source_dup_rate"] == E.source_dup_rate_sql(
        o["q34_dedup_clusters"]
    )
    assert o["d19_incremental_neardup"] == E.incremental_neardup_sql()
    assert o["s28_quantizer_drift"] == E.quantizer_drift_sql()
    # fresh-index identity: stored assignment == ranked assignment
    assert o["s29_quantizer_drift_from_index"] == o["s28_quantizer_drift"]
    assert o["q90_curriculum_order"] == E.curriculum_order_sql(o["t02_quality"])
    # nesting compositions: each wired string nests its source verbatim
    assert o["q91_stage_mixture"] == E.stage_mixture_sql(
        o["q90_curriculum_order"]
    )
    assert o["m06_payload_size_profile"] == E.payload_size_profile_sql(
        o["m01_multimodal_features"]
    )
    assert o["d20_shingle_df_profile"] == E.shingle_df_profile_sql()
    assert o["q93_contamination_profile"] == E.contamination_profile_sql(
        o["t10_contamination"]
    )
    assert o["t36_langid_margin"] == E.langid_margin_sql()
    assert o["q94_verify_shards"] == E.verify_shards_sql(8)
    assert o["q95_source_relative_curriculum"] == E.source_relative_curriculum_sql(
        o["t02_quality"]
    )
    assert o["t37_heavy_hitters"] == E.heavy_hitters_sql(100)
    assert o["q97_snapshot_diff"] == E.snapshot_diff_sql()
    assert o["q98_gate_overlap"] == E.gate_overlap_sql(o["t16_gopher_filter"])
    assert o["s30_knn_graph"] == E.knn_graph_sql(5, 8)
    # fresh-index identity again (the s20/s29 pattern)
    assert o["s31_knn_graph_from_index"] == o["s30_knn_graph"]
    # the streaming monitor's batch replay reproduces t37 exactly
    assert o["q99_heavy_hitter_state"] == o["t37_heavy_hitters"]
    # the persisted signature store serves the d19 answer verbatim
    assert o["d23_neardup_from_store"] == o["d19_incremental_neardup"]
