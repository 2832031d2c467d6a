"""Round-over-round bench comparison: flag per-query regressions.

Usage:
    python bench_diff.py [OLD.json NEW.json]

With no arguments, compares the two most recent BENCH_r*.json in the
repo root.  Exits non-zero if any query regressed more than
REGRESSION_FACTOR (new/old > 1.3) — small absolute times are exempt
(sub-0.3 s queries are scheduler noise on local[32]).
"""

from __future__ import annotations

import glob
import json
import re
import sys

REGRESSION_FACTOR = 1.3
NOISE_FLOOR_SEC = 0.3


def load(path: str) -> dict:
    """Load a bench result — either bench.py's raw JSON line or the
    driver's BENCH_r{N}.json wrapper (payload under 'parsed')."""
    with open(path) as f:
        doc = json.load(f)
    if not isinstance(doc, dict):
        return {}
    if "queries" not in doc and isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    return doc


def _usable(path: str) -> bool:
    """True iff the file holds a per-query payload.  Any failure mode —
    invalid JSON, a bare ``null``, a parsed=null wrapper — counts as
    'no parsed bench payload' rather than crashing the auto-pick."""
    try:
        return "queries" in load(path)
    except Exception:
        return False


def pick_latest_two() -> tuple[str, str]:
    def round_no(p: str) -> int:
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    files = sorted(glob.glob("BENCH_r*.json"), key=round_no)
    # a crashed round leaves parsed=null (BENCH_r02) — skip files with
    # no usable payload instead of KeyError-ing on them
    usable = [p for p in files if _usable(p)]
    skipped = [p for p in files if p not in usable]
    for p in skipped:
        print(f"skipping {p}: no parsed bench payload")
    if len(usable) < 2:
        raise SystemExit(
            "need two parseable BENCH_r*.json files"
            " (or pass OLD NEW explicitly)"
        )
    return usable[-2], usable[-1]


def diff(old_path: str, new_path: str) -> int:
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    regressions, improvements = [], []
    for name in sorted(set(oq) & set(nq)):
        o, n = oq[name], nq[name]
        ratio = n / o if o else float("inf")
        if ratio > REGRESSION_FACTOR and n > NOISE_FLOOR_SEC:
            regressions.append((name, o, n, ratio))
        elif ratio < 1 / REGRESSION_FACTOR and o > NOISE_FLOOR_SEC:
            improvements.append((name, o, n, ratio))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    print(f"old: {old_path}  total={old['value']:.1f}s  n={len(oq)}")
    print(f"new: {new_path}  total={new['value']:.1f}s  n={len(nq)}")
    for name, o, n, r in sorted(improvements, key=lambda x: x[3]):
        print(f"  improved  {name}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    for name in added:
        print(f"  added     {name}: {nq[name]:.2f}s")
    for name in removed:
        print(f"  removed   {name} (was {oq[name]:.2f}s)")
    for name, o, n, r in sorted(regressions, key=lambda x: -x[3]):
        print(f"  REGRESSED {name}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    if not regressions:
        print("no regressions above "
              f"{REGRESSION_FACTOR}x (noise floor {NOISE_FLOOR_SEC}s)")
    return 1 if regressions else 0


if __name__ == "__main__":
    if len(sys.argv) == 3:
        sys.exit(diff(sys.argv[1], sys.argv[2]))
    sys.exit(diff(*pick_latest_two()))
