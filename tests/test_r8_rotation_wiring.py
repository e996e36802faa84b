"""Round-8 rotation wiring proof: the current window invariants the
freeze policy depends on (moved here from test_r7_rotation_wiring when
the window rotated), plus the r8 oracle wiring pins."""

import __spark_entry__ as E


def test_window_invariants():
    """50-slot window, every entry resolvable, every windowed query
    except the by-design rows-only t12 (stateful packing; its t12b
    derivative IS value-checked) has an oracle; inventory is 116."""
    qs = E.queries()
    os_ = E.oracle_sql()
    names = list(qs)
    assert len(names) == 116
    window = names[:50]
    no_oracle = [n for n in window if n not in os_]
    assert no_oracle == ["t12_packing"]
    # this round's must-certify set (new + code-changed) sits inside
    rotated = {
        "m02_image_phash_neardup", "t12b_packing_invariants",
        "q59v2_clean_pipeline", "t18_bpe_apply",
        "s09_ivf_from_index", "s11_ivfpq_from_index",
        "s10_ivfpq_topk", "s12_ivfpq_residual",
        "s03_ann_ivf", "s04_ann_ivf_nprobe", "s07_pq_adc",
        "m01_multimodal_features",
    }
    assert rotated <= set(window)


def test_wired_r8_oracles_are_the_proven_generators():
    """oracle_sql() must route through the SAME generator calls the
    r8 draft proofs exercised (one copy; a parameter drift here would
    sever the proof from the wired string)."""
    o = E.oracle_sql()
    assert o["m02_image_phash_neardup"] == E.phash_neardup_sql(
        n_groups=6, group_size=3, max_hamming=10
    )
    assert o["t12b_packing_invariants"] == E.packing_invariants_sql()


def test_hamming_band_masks_cover_and_partition():
    """The one mask definition both engines band with: 4 x 16-bit
    masks partition the 64-bit space (disjoint, union = all ones) and
    the top mask is negative (two's complement) — the property that
    makes AND-banding signed-safe."""
    from datacatalog_tag_engine_spark.pipeline.dedup import hamming_band_masks

    masks = hamming_band_masks(64, 4)
    assert len(masks) == 4
    u = 0
    for m in masks:
        mu = m & ((1 << 64) - 1)
        assert u & mu == 0
        u |= mu
    assert u == (1 << 64) - 1
    assert masks[-1] < 0
