"""Round-10 rotation wiring proof: the current window invariants the
freeze policy depends on, the r10 oracle wiring pins, and — new this
round (the r9 verdict's ask #7) — a MECHANICAL rounds-since-green
aging ledger: the window's filler slots must be exactly the oldest
driver rows, computed from the committed CORRECTNESS_r*.json records
rather than hand-maintained in a SCALE.md honesty note.
"""

import glob
import json
import os
import re

import __spark_entry__ as E

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the three oracle-less-by-nature queries the window excludes by policy
ROWS_ONLY = {"q09_current_timestamp", "t12_packing", "s06_ann_ivf_kmeans"}

ROTATED_R10 = {
    "s16_range_search", "s17_cell_inertia", "s18_pq_code_histogram",
    "s19_embedding_stats", "s20_cell_balance_from_index", "s21_ivf_append",
    "t30_char_coverage", "t31_ngram_novelty", "t32_top_ngrams",
    "q72_gate_mixture_drift", "q73_cluster_size_profile",
    "q74_percentile_tolerance", "q75_session_funnel",
    "q76_event_rate_anomaly", "q77_lang_source_profile",
    "q78_cohort_via_state", "q79_dirty_shards", "m05_manifest_stats",
}

# code-changed this round: the containment family's max_df default
RECERTS_R10 = {"d12_containment", "d14_containment_dedup", "q71_export_pipeline"}


def ledger() -> dict[str, int]:
    """query -> most recent round with a green (rows_match) driver row,
    from the committed CORRECTNESS_r*.json records."""
    last: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        data = json.load(open(p))
        if not isinstance(data, dict):
            continue
        for qname, row in data.items():
            if isinstance(row, dict) and row.get("rows_match"):
                last[qname] = max(last.get(qname, 0), rnd)
    return last


def test_window_invariants():
    """50-slot window, every entry resolvable and oracle-backed, the
    rotation + re-certification sets sit inside; inventory is 152."""
    qs = E.queries()
    os_ = E.oracle_sql()
    names = list(qs)
    assert len(names) == 152
    window = names[:50]
    assert [n for n in window if n not in os_] == []
    assert ROTATED_R10 <= set(window)
    assert RECERTS_R10 <= set(window)
    assert ROWS_ONLY.isdisjoint(window)


def test_filler_slots_are_mechanically_the_oldest_rows():
    """The drip is computed, not curated: filler slots (window minus
    rotation minus re-certs) == the N oldest ledger rows among
    eligible queries, oldest-first with name tie-break — so 'window
    honesty' is an assertion, not a hand-written note."""
    names = list(E.queries())
    window = set(names[:50])
    fillers = window - ROTATED_R10 - RECERTS_R10
    last = ledger()
    eligible = [
        n for n in names
        if n not in ROTATED_R10 and n not in RECERTS_R10 and n not in ROWS_ONLY
    ]
    # every eligible query has SOME green driver row (never-windowed:
    # none) — the union invariant prior verdicts checked by hand
    assert [n for n in eligible if n not in last] == []
    expect = {n for _, n in sorted((last[n], n) for n in eligible)[: len(fillers)]}
    assert fillers == expect
    # and the oldest eligible row left OUT of the window is no older
    # than every filler (the boundary is clean)
    out = [last[n] for n in eligible if n not in window]
    assert max(last[n] for n in fillers) <= min(out)


def test_ledger_reaches_every_inventory_query():
    """r1-r9 union + the r10 window covers the whole inventory: each
    query either has a green row already or is entering the window for
    its first one (the 18 rotated) or is rows-only by nature."""
    names = list(E.queries())
    last = ledger()
    window = set(names[:50])
    uncovered = [
        n for n in names
        if n not in last and n not in window and n not in ROWS_ONLY
    ]
    assert uncovered == []


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
