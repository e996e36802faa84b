"""Round-8 rotation wiring proof: the r8 oracle wiring pins (the
window-invariants test moved to test_r9_rotation_wiring when the
window rotated at round-9 start, the same hand-off this file received
from test_r7_rotation_wiring)."""

import __spark_entry__ as E


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
