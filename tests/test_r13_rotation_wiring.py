"""Round-13 rotation wiring proof: the current window invariants the
freeze policy depends on, the r13 oracle wiring pins, the MECHANICAL
rounds-since-green aging ledger capped at rounds BELOW the rotation
round (so the driver's own current-round record cannot invert the
filler assertion mid-round — the r11 design, inherited), and — new
this round (the r12 verdict's ask #1, fourth recurrence of the
round-boundary artifact gap) — the clean-round-artifact invariant
``tools/round_start.py`` exists to enforce."""

import glob
import json
import os
import re

import __spark_entry__ as E

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the round this window was frozen at: ledger rows from this round on
# are the window's OWN output, not inputs to its selection
ROTATION_ROUND = 13

# the three oracle-less-by-nature queries the window excludes by policy
ROWS_ONLY = {"q09_current_timestamp", "t12_packing", "s06_ann_ivf_kmeans"}

ROTATED_R13 = {
    "d22_clusters_star", "t39_line_lang_profile",
    "t40_line_repetition", "t41_ngram_coverage",
    "q100_score_gate_calibration", "s32_mutual_knn_clusters",
    "t42_pii_incidence", "t43_winnowing",
    "d24_threshold_sweep", "q101_shard_skew",
    "d25_winnowing_overlap", "d26_cluster_purity",
    "s33_recall_from_index",
    # the streaming signature-store ingest loop's batch replay — the
    # r12 VERDICT's ask #4, draft-proven in the same bank before freeze
    "q102_sigstore_ingest",
}

# code-changed this round: the rewrite commit-record core gained the
# r12 ADVICE hardening at round start (tmp+rename publication,
# torn-record-as-uncommitted reads, hadoop-common byte reads), so the
# four delete/compact queries that run recover_index_stage re-certify
RECERTS_R13 = {
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
    rotation + re-certification sets sit inside; inventory is 202."""
    qs = E.queries()
    os_ = E.oracle_sql()
    names = list(qs)
    assert len(names) == 202
    window = names[:50]
    assert [n for n in window if n not in os_] == []
    assert ROTATED_R13 <= set(window)
    assert RECERTS_R13 <= set(window)
    assert ROWS_ONLY.isdisjoint(window)


def test_filler_slots_are_mechanically_the_oldest_rows():
    """The drip is computed, not curated: filler slots (window minus
    rotation minus re-certs) == the N oldest as-of-rotation ledger rows
    among eligible queries, oldest-first with name tie-break."""
    names = list(E.queries())
    window = set(names[:50])
    fillers = window - ROTATED_R13 - RECERTS_R13
    last = ledger()
    eligible = [
        n for n in names
        if n not in ROTATED_R13 and n not in RECERTS_R13 and n not in ROWS_ONLY
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


def test_round_artifacts_are_committed():
    """The round-boundary artifact invariant (r12 verdict ask #1,
    fourth recurrence): every BENCH_r*/CORRECTNESS_r*/bench_out.json
    on disk is git-tracked and clean. ``tools/round_start.py --commit``
    is the mechanical fix when this fails."""
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
