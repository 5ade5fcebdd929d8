#!/usr/bin/env python
"""Print the bench trial pool (.scratch/scaling_trials.json): per key,
all trials, the pooled best, and the trial count — the numbers the
BENCH/BASELINE.md headline/per-query sections are refreshed from at
round end. Read-only; does not touch the timed code fingerprint."""

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
    for key in sorted(trials):
        vals = trials[key]
        print(
            f"{key:<{width}}  best={min(vals):>9.3f}s  n={len(vals):<3d} "
            f"trials={[round(v, 1) for v in vals]}"
        )


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into head
        pass
