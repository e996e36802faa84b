"""Mechanical cross-round bench comparison — the mover analysis as a
one-command artifact instead of a hand-built table (the r10 verdict's
control-normalization ask, finished: bench.py computes the ambient
index per run; this computes the normalized diff between two
records).

Given two bench_out.json-shaped records (each with queries{} and,
when taken at sf0.1, sentinels{}/ambient_index), prints:

- totals and ambient indexes of both records,
- the common-query geomean ratio, raw and divided by the ratio of
  the two records' ambient indexes (so a quiet-vs-loaded pair
  normalizes instead of narrating),
- every common mover whose NORMALIZED ratio is >= the threshold
  (default 1.3), with raw and normalized ratios and absolute deltas,
- the counts of faster/slower common queries,
- queries present in only one record (rotations).

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold]
"""

from __future__ import annotations

import json
import math
import sys


def load(path: str) -> dict:
    d = json.load(open(path))
    # tolerate the driver's BENCH_r*.json wrapper ({"parsed": {...}})
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d


def ambient(d: dict) -> float | None:
    if d.get("ambient_index"):
        return float(d["ambient_index"])
    # recompute from the sentinels block, or — for records that
    # PREDATE the field (r10 and earlier) — retroactively from the
    # pinned references against the record's own per-query times
    s = d.get("sentinels")
    if s:
        ratios = [
            v["sec"] / v["ref_sec"]
            for v in s.values()
            if v.get("sec") and v.get("ref_sec")
        ]
    else:
        import os
        import sys as _sys

        _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from bench import SENTINELS_SF01

        qs = d.get("queries", {})
        ratios = [qs[k] / ref for k, ref in SENTINELS_SF01.items() if k in qs]
    if not ratios:
        return None
    return math.exp(sum(math.log(r) for r in ratios) / len(ratios))


def main() -> None:
    old_p, new_p = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    old, new = load(old_p), load(new_p)
    qo, qn = old["queries"], new["queries"]
    ao, an = ambient(old), ambient(new)
    norm = (an / ao) if (ao and an) else 1.0
    common = sorted(k for k in qo if k in qn and qo[k] >= 0.05)
    ratios = {k: qn[k] / qo[k] for k in common}
    geo = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    print(f"old: {old.get('value')} s / {len(qo)} queries, ambient {ao and round(ao,3)}")
    print(f"new: {new.get('value')} s / {len(qn)} queries, ambient {an and round(an,3)}")
    print(
        f"common {len(common)}: geomean {geo:.3f} raw"
        + (f", {geo / norm:.3f} normalized (ambient ratio {norm:.3f})" if norm != 1.0 else "")
    )
    faster = sum(1 for r in ratios.values() if r < 1)
    print(f"faster raw: {faster}/{len(common)}")
    movers = sorted(
        ((r / norm, r, k) for k, r in ratios.items() if r / norm >= threshold),
        reverse=True,
    )
    if movers:
        print(f"movers >= {threshold}x NORMALIZED:")
        for nr, r, k in movers:
            print(
                f"  {k}: {qo[k]} -> {qn[k]}  ({r:.2f}x raw, {nr:.2f}x norm, "
                f"+{qn[k]-qo[k]:.2f} s)"
            )
    else:
        print(f"no movers >= {threshold}x normalized")
    only_new = sorted(k for k in qn if k not in qo)
    only_old = sorted(k for k in qo if k not in qn)
    if only_new:
        print(f"new-only ({len(only_new)}, {sum(qn[k] for k in only_new):.1f} s): {' '.join(only_new)}")
    if only_old:
        print(f"old-only ({len(only_old)}): {' '.join(only_old)}")


if __name__ == "__main__":
    main()
