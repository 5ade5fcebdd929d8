#!/usr/bin/env python
"""Capture .explain('formatted') for the declared queries (r06 evidence).

Usage: python tools/explain_r06.py <before|after> [name ...]

Writes plans/r06/<name>_<tag>.txt for every non-planted query (or the
named subset). Plans only — nothing is executed except the construction
jobs some queries run by design (ann_ivf's sizing count).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# planted_* / predict / sketch_cardinality run the full murmur pipeline
# eagerly at construction; their plans are the pipeline's (covered by the
# headline evidence), so the plan dump skips them.
SKIP = {
    "planted_clusters", "planted_verified_pairs", "planted_containment",
    "predict_topk", "sketch_cardinality",
}


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    import __spark_entry__ as entry
    from sketchy_spark.session import get_spark

    spark = get_spark("explain-r06", master="local[8]")
    out_dir = ROOT / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, fn in entry.queries().items():
        if name in SKIP or (only and name not in only):
            continue
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
