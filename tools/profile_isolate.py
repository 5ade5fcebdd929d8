#!/usr/bin/env python
"""Isolate WHICH component of the sketch stage stops scaling 8->32.

Variants, each timed at two parallelism levels on the same corpus:
  kernel   — murmur shingle kernel only, tiny output (known-good ~1.0)
  sketch   — full sketch UDF, full-width output, count() (no cache)
  cache    — full sketch UDF + .cache() materialization
  bandagg  — band-key groupBy count over the cached signatures
  sha      — JVM-only sha256 + octet_length projection, no UDF

Usage: python tools/profile_isolate.py [N] [levels...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1600000
LEVELS = sys.argv[2:] or ["8", "32"]
CORPUS = str(
    Path(__file__).resolve().parent.parent / ".scratch" / f"bench_corpus_{N}"
)


def run_level(cpus: str) -> dict[str, float]:
    import pandas as pd
    import pyspark.sql.functions as F

    from sketchy_spark.config import SketchConfig
    from sketchy_spark.operators.lsh import band_table, with_fid
    from sketchy_spark.operators.sketch import sketch_files
    from sketchy_spark.session import get_spark

    import os
    os.environ.setdefault("SKETCHY_DRIVER_MEM", "24g")
    spark = get_spark(
        f"isolate-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 8),
    )
    cfg = SketchConfig()
    files = spark.read.parquet(CORPUS)

    def timed(fn):
        fn()  # warm
        t0 = time.time()
        fn()
        return round(time.time() - t0, 1)

    t: dict[str, float] = {}

    def kernel_fn(batches):
        from sketchy_spark.hashing import batch_shingle_hashes

        for pdf in batches:
            h, counts = batch_shingle_hashes(list(pdf["content"]), 16, 0)
            yield pd.DataFrame({"n": [int(counts.sum())]})

    prepared = files.select(F.col("content").cast("binary").alias("content"))
    t["kernel"] = timed(
        lambda: prepared.mapInPandas(kernel_fn, "n long")
        .groupBy().count().collect()
    )

    t["sha"] = timed(
        lambda: files.select(
            F.sha2(F.col("content"), 256).alias("sha256"),
            F.octet_length("content").alias("nb"),
        ).groupBy().count().collect()
    )

    sk = sketch_files(files, cfg, with_sig=False, with_fp=False)
    t["sketch"] = timed(lambda: sk.groupBy().count().collect())

    def cache_run():
        c = sk.cache()
        c.count()
        c.unpersist()

    t["cache"] = timed(cache_run)

    sigs = with_fid(sk).cache()
    sigs.count()
    t["bandagg"] = timed(
        lambda: band_table(sigs, cfg, id_col="fid")
        .groupBy("band_key").agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > cfg.band_skew_cap).collect()
    )
    sigs.unpersist()
    spark.stop()
    return t


def main() -> None:
    results = {}
    for cpus in LEVELS:
        results[cpus] = run_level(cpus)
        print(f"local[{cpus}]: {json.dumps(results[cpus])}", flush=True)
    if len(LEVELS) == 2:
        lo, hi = LEVELS
        factor = int(hi) / int(lo)
        print("\nvariant          lo(s)    hi(s)   speedup   eff")
        for k in results[lo]:
            sp = results[lo][k] / max(results[hi][k], 1e-9)
            print(f"{k:<15} {results[lo][k]:>7.1f} {results[hi][k]:>7.1f} "
                  f"{sp:>8.2f} {sp / factor:>6.3f}")


if __name__ == "__main__":
    main()
