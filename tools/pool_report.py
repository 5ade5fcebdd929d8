#!/usr/bin/env python
"""Print the bench trial pool (.scratch/scaling_trials.json): per key,
all trials plus the FIXED-WINDOW statistics bench.py reports (min and
median over the most recent POOL_K trials — VERDICT r4 #2: pool-wide
min drifts downward as n grows). Read-only; does not touch the timed
code fingerprint."""

from __future__ import annotations

import json
import sys
from pathlib import Path


def main() -> None:
    path = Path(__file__).resolve().parent.parent / ".scratch" / "scaling_trials.json"
    if not path.exists():
        print("no pool file at", path)
        sys.exit(1)
    pool = json.loads(path.read_text())
    print(f"fingerprint: {pool.get('rev')}")
    trials = pool.get("trials", {})
    width = max((len(k) for k in trials), default=10)
    sys.path.insert(0, str(path.parent.parent))
    from bench import _stats

    for key in sorted(trials):
        vals = trials[key]
        st = _stats(vals)
        print(
            f"{key:<{width}}  min={st['min']:>9.3f}s  "
            f"median={st['median']:>9.3f}s  window={st['n']:<2d} "
            f"pool_n={st['pool_n']:<3d} trials={[round(v, 1) for v in vals]}"
        )


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into head
        pass
