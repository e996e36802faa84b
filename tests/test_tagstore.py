"""TagStore MERGE semantics tests (SURVEY S13/S14/P5, 2.10 #18, R6)."""

import pytest
from pyspark.sql import functions as F

from datacatalog_tag_engine_spark.model.schemas import TAGS_SCHEMA
from datacatalog_tag_engine_spark.store.tagstore import TagStore


def tag_row(asset, field, value=None, column=None, template="t", ftype="string", **kw):
    return {
        "asset_uri": asset,
        "column": column,
        "template_id": template,
        "field_id": field,
        "field_type": ftype,
        "field_value_string": value,
        "field_value_double": kw.get("double"),
        "field_value_bool": kw.get("bool"),
        "field_value_ts": None,
        "job_uuid": None,
        "updated_ts": None,
    }


def mk(spark, rows):
    return spark.createDataFrame(rows, TAGS_SCHEMA)


def state(store):
    return {
        (r["asset_uri"], r["column"], r["template_id"], r["field_id"]): r["field_value_string"]
        for r in store.all().collect()
    }


def test_create_then_update(spark):
    ts = TagStore(spark)
    hist1 = ts.merge(mk(spark, [tag_row("a", "owner", "alice")])).collect()
    assert [h["action"] for h in hist1] == ["CREATE"]
    assert state(ts) == {("a", None, "t", "owner"): "alice"}

    hist2 = ts.merge(mk(spark, [tag_row("a", "owner", "bob")])).collect()
    assert [h["action"] for h in hist2] == ["UPDATE"]
    assert state(ts) == {("a", None, "t", "owner"): "bob"}


def test_merge_is_idempotent(spark):
    ts = TagStore(spark)
    batch = mk(spark, [tag_row("a", "owner", "alice"), tag_row("b", "owner", "bee")])
    ts.merge(batch)
    first = state(ts)
    ts.merge(batch)
    assert state(ts) == first
    assert ts.all().count() == 2


def test_overwrite_false_skips_existing_tag(spark):
    ts = TagStore(spark)
    ts.merge(mk(spark, [tag_row("a", "owner", "alice")]))
    hist = ts.merge(
        mk(spark, [tag_row("a", "owner", "mallory"), tag_row("b", "owner", "bee")]),
        overwrite=False,
    ).collect()
    assert [h["action"] for h in hist] == ["CREATE"]  # only b
    assert state(ts)[("a", None, "t", "owner")] == "alice"
    assert state(ts)[("b", None, "t", "owner")] == "bee"


def test_delete_when_all_empty(spark):
    ts = TagStore(spark)
    ts.merge(mk(spark, [tag_row("a", "owner", "alice"), tag_row("a", "domain", "X")]))
    # all-null values for the tag group -> delete the whole tag
    hist = ts.merge(mk(spark, [tag_row("a", "owner", None), tag_row("a", "domain", None)])).collect()
    assert sorted(h["action"] for h in hist) == ["DELETE", "DELETE"]
    assert state(ts) == {}


def test_partial_empty_rows_are_skipped_not_deleted(spark):
    ts = TagStore(spark)
    ts.merge(mk(spark, [tag_row("a", "owner", "alice")]))
    # one empty + one non-empty row in the same tag group: the group is
    # not a delete; the empty row is just skipped
    ts.merge(mk(spark, [tag_row("a", "owner", None), tag_row("a", "domain", "X")]))
    assert state(ts) == {
        ("a", None, "t", "owner"): "alice",
        ("a", None, "t", "domain"): "X",
    }


def test_delete_when_empty_false_is_noop(spark):
    ts = TagStore(spark)
    ts.merge(mk(spark, [tag_row("a", "owner", "alice")]))
    hist = ts.merge(
        mk(spark, [tag_row("a", "owner", None)]), delete_when_empty=False
    ).collect()
    assert hist == []  # all-empty group neither deletes nor upserts
    assert state(ts) == {("a", None, "t", "owner"): "alice"}


def test_column_tags_distinct_from_table_tags(spark):
    ts = TagStore(spark)
    ts.merge(
        mk(
            spark,
            [
                tag_row("a", "owner", "table-level"),
                tag_row("a", "owner", "col-level", column="c1"),
            ],
        )
    )
    s = state(ts)
    assert s[("a", None, "t", "owner")] == "table-level"
    assert s[("a", "c1", "t", "owner")] == "col-level"


def test_persistence_roundtrip(spark, tmp_path):
    path = str(tmp_path / "tags.parquet")
    ts = TagStore(spark, path=path)
    ts.merge(mk(spark, [tag_row("a", "owner", "alice")]))
    reloaded = TagStore(spark, path=path)
    assert state(reloaded) == {("a", None, "t", "owner"): "alice"}


def test_small_state_promotes_to_distributed(spark, monkeypatch):
    # shrink the driver-resident threshold so the third merge crosses it:
    # the store must promote one-way to the distributed MERGE and keep
    # identical semantics (upsert wins, UPDATE classified, no dupes)
    monkeypatch.setattr(TagStore, "SMALL_STATE_MAX", 4)
    ts = TagStore(spark)
    ts.merge(mk(spark, [tag_row("a", "owner", "alice"), tag_row("a", "domain", "OPS")]))
    assert ts._rows is not None  # still driver-resident

    big = [tag_row(f"b{i}", "owner", f"u{i}") for i in range(6)]
    big.append(tag_row("a", "owner", "bob"))  # same-key overwrite across the promotion
    hist = ts.merge(mk(spark, big)).collect()
    assert ts._rows is None  # promoted
    assert {h["action"] for h in hist} == {"CREATE", "UPDATE"}
    assert sum(1 for h in hist if h["action"] == "UPDATE") == 1

    s = state(ts)
    assert s[("a", None, "t", "owner")] == "bob"
    assert s[("a", None, "t", "domain")] == "OPS"
    assert len(s) == 8

    # a later merge stays distributed and still updates in place
    ts.merge(mk(spark, [tag_row("b3", "owner", "carol")]))
    s = state(ts)
    assert s[("b3", None, "t", "owner")] == "carol"
    assert len(s) == 8


def test_driver_and_distributed_paths_agree_on_random_sequences(spark):
    # Property: the driver-resident merge and the distributed merge are
    # the SAME operator. Replay identical randomized merge sequences
    # (upserts, overwrite=False guards, delete-when-empty batches,
    # column/table tags, repeated keys) against one store pinned small
    # and one pinned distributed; state and event multiset must match
    # after every step.
    import random

    rng = random.Random(20260814)
    assets = ["a", "b", "c"]
    fields = ["owner", "domain"]
    columns = [None, "c1"]

    def random_batch():
        rows = []
        for _ in range(rng.randint(1, 5)):
            empty = rng.random() < 0.3
            rows.append(
                tag_row(
                    rng.choice(assets),
                    rng.choice(fields),
                    None if empty else rng.choice(["x", "y", "z"]),
                    column=rng.choice(columns),
                )
            )
        return rows

    small = TagStore(spark)
    dist = TagStore(spark)
    dist.SMALL_STATE_MAX = 0  # instance override: promotes on first merge

    def key(r):
        return (r["asset_uri"], r["column"] or "", r["template_id"], r["field_id"])

    for step in range(12):
        rows = random_batch()
        overwrite = rng.random() < 0.7
        dwe = rng.random() < 0.7
        ev_s = small.merge(mk(spark, rows), overwrite=overwrite, delete_when_empty=dwe)
        ev_d = dist.merge(mk(spark, rows), overwrite=overwrite, delete_when_empty=dwe)
        small_events = sorted((key(r), r["action"]) for r in ev_s.collect())
        dist_events = sorted((key(r), r["action"]) for r in ev_d.collect())
        assert small_events == dist_events, f"step {step} events diverge"
        s_state = {key(r): r["field_value_string"] for r in small.all().collect()}
        d_state = {key(r): r["field_value_string"] for r in dist.all().collect()}
        assert s_state == d_state, f"step {step} state diverges"
    assert small._rows is not None  # stayed driver-resident throughout


def test_history_readable_across_many_distributed_merges(spark):
    # Regression: each distributed merge's returned event rows read THAT
    # generation's checkpoint; an accumulated history union (the engine
    # pattern) must stay readable after later merges supersede the
    # state. An eager free of the previous generation broke this.
    ts = TagStore(spark)
    ts.SMALL_STATE_MAX = 0  # force the distributed path from merge 1
    history = None
    for i in range(4):
        ev = ts.merge(mk(spark, [tag_row("a", "owner", f"v{i}"), tag_row(f"b{i}", "owner", "x")]))
        history = ev if history is None else history.unionByName(ev)
    rows = history.collect()
    assert len(rows) == 8  # 2 events per merge, all generations readable
    assert {r["action"] for r in rows} == {"CREATE", "UPDATE"}
    assert ts.all().count() == 5


def test_persistence_reload_stays_distributed_past_threshold(spark, tmp_path):
    # a reloaded store whose persisted state exceeds the driver-resident
    # cap must come back on the distributed path and keep merging
    path = str(tmp_path / "tags.parquet")
    ts = TagStore(spark, path=path)
    ts.SMALL_STATE_MAX = 4
    ts.merge(mk(spark, [tag_row(f"a{i}", "owner", f"u{i}") for i in range(8)]))
    assert ts._rows is None  # promoted during the merge

    reloaded = TagStore(spark, path=path)
    reloaded.SMALL_STATE_MAX = 4
    # class-level probe in __init__ used the class cap (4096), so mirror
    # the instance cap by re-probing through set_state
    reloaded.set_state(spark.read.parquet(path))
    assert reloaded._rows is None  # distributed from the start
    hist = reloaded.merge(mk(spark, [tag_row("a3", "owner", "new")])).collect()
    assert [h["action"] for h in hist] == ["UPDATE"]
    assert state(reloaded)[("a3", None, "t", "owner")] == "new"
    assert reloaded.all().count() == 8


def test_history_auto_spill_bounds_generations(spark):
    """A long interactive merge chain stays O(1): past the spill
    threshold the engine writes its lazy history union to parquet,
    resets the union, and deterministically frees every superseded
    merge checkpoint — yet history reads still return every event
    (r4 verdict item 3)."""
    from datacatalog_tag_engine_spark.engine import TagEngine

    eng = TagEngine(spark, history_spill_every=5)
    eng.store.SMALL_STATE_MAX = 0  # force the distributed MERGE path
    n_merges = 23
    for i in range(n_merges):
        ev = eng.store.merge(mk(spark, [tag_row("a", "owner", f"v{i}")]))
        eng._append_history(ev, f"job{i}")

    # generations released at every spill: never more than one
    # spill-window's worth pinned, regardless of chain length
    assert len(getattr(eng.store, "_event_generations", [])) < 5
    # union depth bounded the same way
    assert eng._history_appends < 5
    assert eng._history_base is not None

    # every event of every generation still readable, exactly once
    rows = eng.history().collect()
    assert len(rows) == n_merges
    assert {r["field_value"] for r in rows} == {f"v{i}" for i in range(n_merges)}
    assert [r["action"] for r in sorted(rows, key=lambda r: r["field_value"])][0] == "CREATE"
    assert {r["job_uuid"] for r in rows} == {f"job{i}" for i in range(n_merges)}


def test_history_spill_threshold_not_reached_is_noop(spark):
    from datacatalog_tag_engine_spark.engine import TagEngine

    eng = TagEngine(spark, history_spill_every=50)
    eng.store.SMALL_STATE_MAX = 0
    for i in range(3):
        ev = eng.store.merge(mk(spark, [tag_row("a", "owner", f"v{i}")]))
        eng._append_history(ev, f"job{i}")
    assert eng._history_base is None and eng._history_spill_dir is None
    assert eng.history().count() == 3


def test_history_spill_with_held_handout_stays_readable(spark):
    """A lazily-held history() plan must survive later auto-spills
    (code-review r5): the engine tracks the handout and DROPS the
    superseded merge checkpoints (JVM ContextCleaner reclaims them once
    the caller's plans are garbage) instead of freeing blocks a held
    plan still needs."""
    from datacatalog_tag_engine_spark.engine import TagEngine

    eng = TagEngine(spark, history_spill_every=4)
    eng.store.SMALL_STATE_MAX = 0  # force the distributed MERGE path
    for i in range(2):
        ev = eng.store.merge(mk(spark, [tag_row("a", "owner", f"v{i}")]))
        eng._append_history(ev, f"job{i}")
    held = eng.history()  # pins the two in-memory union branches
    for i in range(2, 9):  # crosses the spill threshold twice
        ev = eng.store.merge(mk(spark, [tag_row("a", "owner", f"v{i}")]))
        eng._append_history(ev, f"job{i}")
    # the held snapshot still reads — nothing was freed underneath it
    assert {r["field_value"] for r in held.collect()} == {"v0", "v1"}
    # the engine's own view has every event, exactly once
    rows = eng.history().collect()
    assert {r["field_value"] for r in rows} == {f"v{i}" for i in range(9)}
    assert len(rows) == 9
    # and with no handout the second spill still freed deterministically
    # (the union stayed bounded either way)
    assert eng._history_appends < 4
