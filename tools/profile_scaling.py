#!/usr/bin/env python
"""Per-stage scaling profile: run the dedup pipeline's stages separately at
two parallelism levels and report each stage's wall time + scaling ratio.

Usage: python tools/profile_scaling.py [N] [levels...]
  e.g. python tools/profile_scaling.py 100000 8 32
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
LEVELS = sys.argv[2:] or ["8", "32"]
CORPUS = str(Path(__file__).resolve().parent.parent / ".scratch" / f"bench_corpus_{N}")


def profile(cpus: str) -> dict[str, float]:
    from sketchy_spark.config import SketchConfig
    from sketchy_spark.operators.cluster import assign_clusters
    from sketchy_spark.operators.lsh import candidate_pairs_fid, exact_dup_edges
    from sketchy_spark.operators.sketch import sketch_files
    from sketchy_spark.operators.verify import verified_pairs_cascade
    from sketchy_spark.session import get_spark

    spark = get_spark(
        f"profile-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 8),
    )
    cfg = SketchConfig()
    files = spark.read.parquet(CORPUS)

    # warmup (codegen caches, python workers)
    from sketchy_spark.pipeline import run_pipeline
    run_pipeline(files.limit(2000), cfg, with_containment=False).clusters.count()

    t: dict[str, float] = {}
    t0 = time.time()

    signatures = sketch_files(files, cfg, with_sig=False, with_fp=False).cache()
    n_files = signatures.count()
    t["sketch"] = time.time() - t0

    t1 = time.time()
    candidates = candidate_pairs_fid(signatures, cfg)
    verified = verified_pairs_cascade(
        candidates, signatures, cfg, files=files, n_files=n_files
    )
    # cascade internals already barrier on coarse.count(); measure through
    # the full verified materialization
    n_ver = verified.count()
    t["cand_verify"] = time.time() - t1

    t2 = time.time()
    exact = exact_dup_edges(signatures)
    edges = (
        exact.unionByName(verified.select("a_id", "b_id")).distinct().persist()
    )
    n_edges = edges.count()
    t["edges"] = time.time() - t2

    t3 = time.time()
    clusters = assign_clusters(signatures, edges)
    clusters.groupBy().count().collect()
    t["cluster"] = time.time() - t3

    t["total"] = time.time() - t0
    t["_n_ver"] = n_ver
    t["_n_edges"] = n_edges
    spark.stop()
    return t


def main() -> None:
    results = {}
    for cpus in LEVELS:
        results[cpus] = profile(cpus)
        print(f"local[{cpus}]: " + json.dumps(
            {k: round(v, 2) for k, v in results[cpus].items()}), flush=True)
    if len(LEVELS) == 2:
        lo, hi = LEVELS
        factor = int(hi) / int(lo)
        print("\nstage            lo(s)    hi(s)   speedup   eff")
        for k in results[lo]:
            if k.startswith("_"):
                continue
            sp = results[lo][k] / max(results[hi][k], 1e-9)
            print(f"{k:<15} {results[lo][k]:>7.2f} {results[hi][k]:>7.2f} "
                  f"{sp:>8.2f} {sp / factor:>6.3f}")


if __name__ == "__main__":
    main()
