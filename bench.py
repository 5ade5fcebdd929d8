#!/usr/bin/env python
"""Benchmark entry point (driver contract).

Default: runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": seconds, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The headline metric is the end-to-end dedup pipeline (ingest -> sketch ->
LSH -> verify -> cluster) on the deterministic planted corpus at
``$SKETCHY_BENCH_N`` rows (default 50000) — BASELINE.md row 6 (files/sec).

``--scaling`` additionally runs the same pipeline at local[8] and
local[32] on the same input and writes BENCH/BASELINE.md with throughput
at both plus scaling efficiency (BASELINE.md row 8 sandbox proxy for the
north rule's N-vs-4N-executors criterion).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BENCH_N = int(os.environ.get("SKETCHY_BENCH_N", "50000"))


def _session(cpus: str):
    from sketchy_spark.session import get_spark

    return get_spark(
        f"sketchy-bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 16),
    )


def run_dedup_pipeline(spark, n: int) -> float:
    """End-to-end dedup on the planted corpus; returns wall seconds.
    Corpus rendering happens inside the timed region deliberately: the
    metric is ingest -> clusters (BASELINE.json 'end-to-end')."""
    from sketchy_spark.config import SketchConfig
    from sketchy_spark.corpus import corpus_df
    from sketchy_spark.pipeline import run_pipeline

    t0 = time.time()
    files = corpus_df(spark, n, partitions=int(CPUS) * 2)
    res = run_pipeline(files, SketchConfig(), with_containment=False)
    res.clusters.groupBy().count().collect()  # materialize end-to-end
    wall = time.time() - t0
    res.signatures.unpersist()
    return wall


def run_sf_queries(spark) -> dict[str, float]:
    """Representative operator queries on the sf-dir tables."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    names = [
        "token_count", "quality_score", "minhash_signatures",
        "lsh_candidate_pairs", "ngram_jaccard_pairs", "simhash_dup_pairs",
        "cosine_topk", "ann_bucketed", "cumsum_stream", "topk_rank",
    ]
    out = {}
    for name in names:
        t0 = time.time()
        q[name](spark, SF_DIR).groupBy().count().collect()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    scaling = "--scaling" in sys.argv

    spark = _session(CPUS)
    queries = run_sf_queries(spark)
    pipeline_s = run_dedup_pipeline(spark, BENCH_N)
    queries["pipeline_dedup"] = round(pipeline_s, 3)
    spark.stop()

    result = {
        "metric": "end_to_end_dedup_wall_sec",
        "value": round(pipeline_s, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "bench_rows": BENCH_N,
        "files_per_sec": round(BENCH_N / pipeline_s, 1),
        "cpus": int(CPUS),
    }

    if scaling:
        rates = {}
        for cpus in ("8", "32"):
            s = _session(cpus)
            wall = run_dedup_pipeline(s, BENCH_N)
            s.stop()
            rates[cpus] = BENCH_N / wall
        eff = (rates["32"] / rates["8"]) / 4.0
        result["scaling"] = {
            "files_per_sec_local8": round(rates["8"], 1),
            "files_per_sec_local32": round(rates["32"], 1),
            "efficiency": round(eff, 3),
        }
        _write_baseline_md(result)

    print(json.dumps(result))


def _write_baseline_md(result: dict) -> None:
    s = result["scaling"]
    md = f"""# BENCH — measured baseline (sandbox)

Headline: end-to-end dedup (ingest -> sketch -> LSH -> verify -> cluster)
on the deterministic planted corpus, {result["bench_rows"]} files,
config k=16 s=1000 seed=0 (BASELINE.json).

| parallelism | files/sec |
|---|---|
| local[8]  | {s["files_per_sec_local8"]} |
| local[32] | {s["files_per_sec_local32"]} |

**Scaling efficiency (T32/T8)/4 = {s["efficiency"]}** (target >= 0.8,
BASELINE.md row 8 — sandbox proxy for N vs 4N executors).

Per-query timings at sf{result["sf"]} on local[{result["cpus"]}]:

| query | sec |
|---|---|
""" + "\n".join(
        f"| {k} | {v} |" for k, v in sorted(result["queries"].items())
    ) + "\n"
    Path(__file__).parent.joinpath("BENCH", "BASELINE.md").write_text(md)


if __name__ == "__main__":
    main()
