"""Mechanize the round-start artifact sync — the r12 VERDICT's ask #1
(the BENCH/CORRECTNESS round-boundary gap recurred four rounds in a
row; a remembered step must become a computed one).

At every round start the driver has just written its round-end
artifacts (``BENCH_r{N}.json``, ``CORRECTNESS_r{N}.json``) and its own
``bench.py`` run has overwritten ``bench_out.json``. This tool:

1. finds every round artifact that is untracked or modified,
2. prints the ambient-NORMALIZED reconciliation between the working
   tree's ``bench_out.json`` (the driver's run) and the version at
   HEAD (the committed record) — geomean over shared queries after
   dividing each side by its own ambient index, so the line in
   SCALE.md is computed, never narrated,
3. with ``--commit``, stages exactly those artifacts and commits them
   as the round's sync commit.

The r13+ rotation wiring test asserts the resulting invariant (no
dirty round artifacts), so a skipped sync fails the suite instead of
waiting for the judge.

Usage: python tools/round_start.py [--commit]
"""

from __future__ import annotations

import fnmatch
import glob
import json
import math
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARTIFACT_PATTERNS = ("BENCH_r*.json", "CORRECTNESS_r*.json", "bench_out.json")


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=ROOT, check=True, capture_output=True, text=True
    ).stdout


def dirty_artifacts() -> list[str]:
    """Round artifacts that are untracked or differ from HEAD."""
    status = _git("status", "--porcelain")
    dirty = []
    for line in status.splitlines():
        path = line[3:].strip()
        base = os.path.basename(path)
        if any(fnmatch.fnmatch(base, p) for p in ARTIFACT_PATTERNS):
            dirty.append(path)
    return sorted(dirty)


def latest_round() -> int | None:
    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(ROOT, "BENCH_r*.json"))
    ]
    return max(rounds) if rounds else None


def bench_reconciliation() -> str | None:
    """Normalized geomean of working-tree bench_out.json vs the HEAD
    version on shared queries (each side divided by its own ambient
    index). None when bench_out.json is clean or either side is
    unreadable."""
    try:
        head_raw = _git("show", "HEAD:bench_out.json")
    except subprocess.CalledProcessError:
        return None
    try:
        with open(os.path.join(ROOT, "bench_out.json")) as f:
            work = json.load(f)
        head = json.loads(head_raw)
    except (OSError, ValueError):
        return None
    if work == head:
        return None
    wq, hq = work.get("queries", {}), head.get("queries", {})
    wa, ha = work.get("ambient_index", 1.0), head.get("ambient_index", 1.0)
    shared = [
        n
        for n in wq
        if n in hq and wq[n] and hq[n] and wq[n] > 0 and hq[n] > 0
    ]
    if not shared:
        return "bench_out.json differs from HEAD but shares no queries"
    logsum = sum(
        math.log((wq[n] / wa) / (hq[n] / ha)) for n in shared
    )
    geo = math.exp(logsum / len(shared))
    return (
        f"bench reconciliation: working-tree run {work.get('value')}s "
        f"@ambient {wa} vs HEAD record {head.get('value')}s @ambient {ha}; "
        f"normalized geomean over {len(shared)} shared queries = {geo:.3f} "
        f"({'contention-shaped, record stands' if geo > 1.02 else 'flat'})"
    )


def main() -> int:
    commit = "--commit" in sys.argv
    n = latest_round()
    dirty = dirty_artifacts()
    rec = bench_reconciliation()
    print(f"latest round artifact: r{n}")
    if rec:
        print(rec)
    if not dirty:
        print("round artifacts: clean — nothing to sync")
        return 0
    print(f"dirty round artifacts: {dirty}")
    if commit:
        _git("add", "--", *dirty)
        _git(
            "commit",
            "-m",
            f"round {n}: sync driver bench/correctness artifacts",
        )
        print("sync commit created")
    else:
        print("re-run with --commit to create the sync commit")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
