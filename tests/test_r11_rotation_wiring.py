"""Round-11 rotation wiring proof: the current window invariants the
freeze policy depends on, the r11 oracle wiring pins, and the
MECHANICAL rounds-since-green aging ledger — now capped at rounds
BELOW the rotation round. The r10 version globbed every committed
CORRECTNESS_r*.json, so the moment the driver's own current-round
record landed on disk the window's filler slots were no longer "the
oldest rows" and the assertion inverted mid-round (the r10 verdict's
What's-wrong #1). The ledger therefore asserts "fillers were the
oldest rows AS OF ROTATION", which is the statement the freeze policy
actually makes, and stays green for the whole round.
"""

import glob
import json
import os
import re

import __spark_entry__ as E

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the round this window was frozen at: ledger rows from this round on
# are the window's OWN output, not inputs to its selection
ROTATION_ROUND = 11

# the three oracle-less-by-nature queries the window excludes by policy
ROWS_ONLY = {"q09_current_timestamp", "t12_packing", "s06_ann_ivf_kmeans"}

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
    rotation + re-certification sets sit inside; inventory is 166."""
    qs = E.queries()
    os_ = E.oracle_sql()
    names = list(qs)
    assert len(names) == 166
    window = names[:50]
    assert [n for n in window if n not in os_] == []
    assert ROTATED_R11 <= set(window)
    assert RECERTS_R11 <= set(window)
    assert ROWS_ONLY.isdisjoint(window)


def test_filler_slots_are_mechanically_the_oldest_rows():
    """The drip is computed, not curated: filler slots (window minus
    rotation minus re-certs) == the N oldest as-of-rotation ledger rows
    among eligible queries, oldest-first with name tie-break."""
    names = list(E.queries())
    window = set(names[:50])
    fillers = window - ROTATED_R11 - RECERTS_R11
    last = ledger()
    eligible = [
        n for n in names
        if n not in ROTATED_R11 and n not in RECERTS_R11 and n not in ROWS_ONLY
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
