"""Round-14 rotation wiring proof: the current window invariants the
freeze policy depends on, the r14 oracle wiring pins, the MECHANICAL
rounds-since-green aging ledger capped at rounds BELOW the rotation
round (so the driver's own current-round record cannot invert the
filler assertion mid-round — the r11 design, inherited), and the
clean-round-artifact invariant ``tools/round_start.py`` enforces
(the r12 verdict's ask, mechanized at r13 and kept)."""

import glob
import json
import os
import re

import __spark_entry__ as E

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the round this window was frozen at: ledger rows from this round on
# are the window's OWN output, not inputs to its selection
ROTATION_ROUND = 14

# the three oracle-less-by-nature queries the window excludes by policy
ROWS_ONLY = {"q09_current_timestamp", "t12_packing", "s06_ann_ivf_kmeans"}

ROTATED_R14 = {
    "d27_winnowing_dedup", "d28_winnowing_contamination",
    "d29_incremental_winnowing", "d30_threshold_sweep_vs_exact",
    "s34_ivfpq_recall_from_index", "s35_knn_rank_profile",
    "s36_topk_regret", "s37_nprobe_sweep",
    "q103_sigstore_metrics", "q104_corpus_health",
    "q105_curriculum_token_budget", "q106_copy_audit_profile",
    "m07_multimodal_dup_rates", "t44_winnowing_params",
}

# code-changed this round: q102's cached replay builder gained
# metrics_sink at the rotation (one build now serves q102's accepted
# rows AND q103's metrics table) — value-identical for q102's output,
# but the cached-build code changed, so it re-certifies by policy
RECERTS_R14 = {"q102_sigstore_ingest"}


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
    rotation + re-certification sets sit inside; inventory is 216."""
    qs = E.queries()
    os_ = E.oracle_sql()
    names = list(qs)
    assert len(names) == 216
    window = names[:50]
    assert [n for n in window if n not in os_] == []
    assert ROTATED_R14 <= set(window)
    assert RECERTS_R14 <= set(window)
    assert ROWS_ONLY.isdisjoint(window)


def test_filler_slots_are_mechanically_the_oldest_rows():
    """The drip is computed, not curated: filler slots (window minus
    rotation minus re-certs) == the N oldest as-of-rotation ledger rows
    among eligible queries, oldest-first with name tie-break."""
    names = list(E.queries())
    window = set(names[:50])
    fillers = window - ROTATED_R14 - RECERTS_R14
    last = ledger()
    eligible = [
        n for n in names
        if n not in ROTATED_R14 and n not in RECERTS_R14 and n not in ROWS_ONLY
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
    the window for its first one (the 14 rotated) or is rows-only by
    nature."""
    names = list(E.queries())
    last = ledger()
    window = set(names[:50])
    uncovered = [
        n for n in names
        if n not in last and n not in window and n not in ROWS_ONLY
    ]
    assert uncovered == []


def test_wired_r14_oracles_are_the_proven_generators():
    """oracle_sql() must route through the SAME generator calls the
    r14 draft proofs exercised (one copy; a parameter drift here would
    sever the proof from the wired string). The winnowing consumers
    nest the wired t43 string at max_df=100 — the winnow-ladder knee
    the Spark side runs."""
    o = E.oracle_sql()
    t43 = o["t43_winnowing"]
    assert o["d27_winnowing_dedup"] == E.winnowing_dedup_sql(t43, max_df=100)
    assert o["d28_winnowing_contamination"] == E.winnowing_contamination_sql(
        t43, max_df=100
    )
    assert o["d29_incremental_winnowing"] == E.incremental_winnowing_sql(t43)
    assert o["d30_threshold_sweep_vs_exact"] == E.threshold_sweep_vs_exact_sql()
    assert o["s34_ivfpq_recall_from_index"] == E.pq_recall_sql(2, 5)
    assert o["s35_knn_rank_profile"] == E.knn_rank_profile_sql(5, 8)
    assert o["s36_topk_regret"] == E.topk_regret_sql(2, 5)
    assert o["s37_nprobe_sweep"] == E.nprobe_sweep_sql(5, 8)
    assert o["q103_sigstore_metrics"] == E.sigstore_metrics_sql()
    assert o["q104_corpus_health"] == E.corpus_health_sql(
        o["t02_quality"], o["t16_gopher_filter"]
    )
    assert o["q105_curriculum_token_budget"] == E.curriculum_token_budget_sql(
        o["t02_quality"]
    )
    assert o["q106_copy_audit_profile"] == E.copy_audit_profile_sql(
        t43, max_df=100
    )
    assert o["m07_multimodal_dup_rates"] == E.neardup_rate_sql(
        o["m02_image_phash_neardup"],
        o["m03_audio_fp_neardup"],
        o["m04_video_frame_neardup"],
    )
    assert o["t44_winnowing_params"] == E.winnowing_parameter_table_sql()


def test_round_artifacts_are_committed():
    """The round-boundary artifact invariant (mechanized at r13): every
    BENCH_r*/CORRECTNESS_r*/bench_out.json on disk is git-tracked and
    clean. ``tools/round_start.py --commit`` is the mechanical fix when
    this fails."""
    import subprocess
    import sys

    sys.path.insert(0, os.path.join(ROOT, "tools"))
    try:
        from round_start import dirty_artifacts
    finally:
        sys.path.pop(0)
    try:
        dirty = dirty_artifacts()
    except (subprocess.CalledProcessError, FileNotFoundError):
        # not a git checkout (e.g. an exported tree) — nothing to assert
        return
    assert dirty == [], (
        f"uncommitted round artifacts {dirty}: run "
        "`python tools/round_start.py --commit`"
    )
