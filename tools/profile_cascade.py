#!/usr/bin/env python
"""Fine-grained cascade profile: barrier after each sub-stage of the fid
pipeline to localize serial time.

Usage: python tools/profile_cascade.py [N] [cpus]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400000
CPUS = sys.argv[2] if len(sys.argv) > 2 else "32"
CORPUS = str(Path(__file__).resolve().parent.parent / ".scratch" / f"bench_corpus_{N}")


def main() -> None:
    import pyspark.sql.functions as F

    from sketchy_spark.config import SketchConfig
    from sketchy_spark.operators.lsh import candidate_pairs_fid, with_fid
    from sketchy_spark.operators.sketch import sketch_files
    from sketchy_spark.operators.verify import _with_sides, verified_pairs
    from sketchy_spark.session import get_spark

    spark = get_spark(
        f"cascade-profile-{CPUS}", master=f"local[{CPUS}]",
        shuffle_partitions=max(int(CPUS) * 2, 8),
    )
    cfg = SketchConfig()
    files = spark.read.parquet(CORPUS)

    from sketchy_spark.pipeline import run_pipeline
    run_pipeline(files.limit(2000), cfg, with_containment=False).clusters.count()
    print("warmup done", flush=True)

    t = {}
    t0 = time.time()
    sigs = with_fid(
        sketch_files(files, cfg, with_sig=False, with_fp=False)
    ).cache()
    n_files = sigs.count()
    t["sketch"] = time.time() - t0
    print(f"sketch {t['sketch']:.1f}s n={n_files}", flush=True)

    t1 = time.time()
    cand = candidate_pairs_fid(sigs, cfg).persist()
    n_cand = cand.count()
    t["candidates"] = time.time() - t1
    print(f"candidates {t['candidates']:.1f}s n={n_cand}", flush=True)

    # stage 1 scan-side attach + coarse estimate
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    num_perm = cfg.num_perm
    tau = cfg.jaccard_threshold
    margin = 0.15
    min_sh = num_perm
    from sketchy_spark.operators.verify import _POPCNT8

    t2 = time.time()
    src = _with_sides(
        cand, sigs, ["sig_perm", "simhash", "n_shingles"]
    ).select(
        "a_fid", "b_fid", "a_sig_perm", "b_sig_perm", "a_simhash",
        "b_simhash", "a_n_shingles", "b_n_shingles",
    )

    def stage1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            a = np.vstack(pdf["a_sig_perm"].to_numpy())
            b = np.vstack(pdf["b_sig_perm"].to_numpy())
            est = (a == b).sum(axis=1) / num_perm
            x = (
                pdf["a_simhash"].to_numpy(dtype=np.int64)
                ^ pdf["b_simhash"].to_numpy(dtype=np.int64)
            )
            ham = _POPCNT8[x.view(np.uint8).reshape(n, 8)].sum(axis=1)
            small = (
                (pdf["a_n_shingles"].to_numpy(dtype=np.int64) < min_sh)
                | (pdf["b_n_shingles"].to_numpy(dtype=np.int64) < min_sh)
            )
            out = pd.DataFrame(
                {
                    "a_fid": pdf["a_fid"],
                    "b_fid": pdf["b_fid"],
                    "jaccard": est,
                    "hamming": ham,
                    "needs_exact": small,
                }
            )
            yield out[small | (est >= tau - margin)]

    coarse = src.mapInPandas(
        stage1,
        schema=(
            "a_fid long, b_fid long, jaccard double, "
            "hamming long, needs_exact boolean"
        ),
    ).persist()
    n_coarse = coarse.count()
    t["coarse"] = time.time() - t2
    print(f"coarse {t['coarse']:.1f}s n={n_coarse}", flush=True)

    t3 = time.time()
    borderline = coarse.where(
        F.col("needs_exact") | (F.col("jaccard") < tau + margin)
    ).select("a_fid", "b_fid").persist()
    n_border = borderline.count()
    t["borderline_count"] = time.time() - t3
    print(f"borderline {t['borderline_count']:.1f}s n={n_border}", flush=True)

    t4 = time.time()
    wanted_keys = (
        borderline.select(F.col("a_fid").alias("fid"))
        .unionAll(borderline.select(F.col("b_fid").alias("fid")))
        .distinct()
    )
    wanted_ids = (
        sigs.select("fid", "file_id")
        .join(F.broadcast(wanted_keys), "fid", "left_semi")
        .select("file_id")
    )
    wanted = files.join(
        F.broadcast(wanted_ids),
        F.concat_ws("/", "repo", "path") == F.col("file_id"),
        "left_semi",
    )
    sig_source = with_fid(sketch_files(wanted, cfg, with_sig=True)).persist()
    n_resk = sig_source.count()
    t["resketch"] = time.time() - t4
    print(f"resketch {t['resketch']:.1f}s n={n_resk}", flush=True)

    t5 = time.time()
    refined = verified_pairs(borderline, sig_source, cfg)
    n_ref = refined.count()
    t["refine"] = time.time() - t5
    print(f"refine {t['refine']:.1f}s n={n_ref}", flush=True)

    t["total"] = time.time() - t0
    print({k: round(v, 2) for k, v in t.items()}, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
