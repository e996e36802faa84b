"""Print the rounds-since-green aging ledger — the SAME computation
tests/test_r14_rotation_wiring.py asserts at rotation time — so the
SCALE.md window-honesty note is generated, not hand-maintained (the
r9 verdict's ask #7: at 166 queries and a 50-slot window a hand
-written note eventually drifts). The ledger is capped at rounds
below the current window's rotation round (the r10 verdict's
What's-wrong #1): rows from the rotation round onward are the
window's own OUTPUT, not inputs to its selection.

Usage: python tools/window_ledger.py
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from tests.test_r14_rotation_wiring import ROWS_ONLY, ledger


def main() -> None:
    names = list(E.queries())
    window = set(names[:50])
    last = ledger()
    eligible = [n for n in names if n not in ROWS_ONLY]
    never = [n for n in eligible if n not in last and n not in window]
    outside = {n: last[n] for n in eligible if n not in window and n in last}
    hist = Counter(sorted(outside.values()))
    oldest = min(outside.values()) if outside else None
    print(f"inventory: {len(names)}  window: 50  rows-only excluded: {sorted(ROWS_ONLY)}")
    print(f"never-windowed (no row, not in window): {never or 'none'}")
    print(f"entering for a first row this round: "
          f"{sorted(n for n in window if n not in last)}")
    print(f"oldest green row OUTSIDE the window: r{oldest}")
    print("rows outside the window by last-green round: "
          + ", ".join(f"r{r}: {c}" for r, c in sorted(hist.items())))


if __name__ == "__main__":
    main()
