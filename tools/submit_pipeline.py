#!/usr/bin/env python
"""spark-submit driver for the dedup pipeline (north-rule launch form:
``spark-submit --py-files sketchy_spark.zip tools/submit_pipeline.py``).

Runs table scan -> sketch -> LSH -> cascade verify -> connected
components on a parquet corpus and writes cluster assignments.

    spark-submit \\
      --master local-cluster[4,4,11264] \\
      --py-files /tmp/sketchy_spark.zip \\
      tools/submit_pipeline.py <corpus_parquet> <out_dir> [n_limit]

Build the zip with ``tools/make_pyfiles_zip.sh`` (or any zip of the
``sketchy_spark`` package directory). On a real cluster swap the master
for spark://... or yarn; nothing in the driver changes.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    corpus, out_dir = sys.argv[1], sys.argv[2]
    n_limit = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    # spark-submit owns master/memory/py-files; the session here only
    # sets the engine confs the package expects (mirrors session.py —
    # imported lazily so the --py-files zip is already on sys.path).
    spark = (
        SparkSession.builder.appName("sketchy-dedup-submit")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    from sketchy_spark.config import SketchConfig
    from sketchy_spark.pipeline import run_pipeline

    files = spark.read.parquet(corpus)
    if n_limit:
        files = files.limit(n_limit)
    t0 = time.time()
    res = run_pipeline(files, SketchConfig(), with_containment=False)
    res.clusters.write.mode("overwrite").parquet(out_dir)
    n = spark.read.parquet(out_dir).count()
    print(f"clusters_rows={n} wall_s={time.time() - t0:.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
