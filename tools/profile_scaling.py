#!/usr/bin/env python
"""Two-level scaling profile of the REAL pipeline with a driver-gap and
per-stage task-time decomposition (VERDICT r2: name the non-scaling
stage, don't guess).

For each parallelism level it runs ``run_pipeline`` exactly as bench.py
does, then pulls the Spark REST API (/api/v1) for:

- per-job submission/completion -> **driver gaps**: wall time where NO
  job is running = serial driver work + scheduling, the Amdahl term a
  N-vs-4N ratio punishes (it does not shrink with executors);
- per-stage executorRunTime / executorCpuTime / GC / shuffle bytes ->
  task-time totals. If total CPU time is level-invariant but wall is
  not 4x lower, the residual is contention or scheduling, not plan
  shape.

Usage: python tools/profile_scaling.py [N] [levels...]
  e.g. python tools/profile_scaling.py 1600000 8 32
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1600000
# level spec: "8" (local[8]) or "local-cluster[4,4,11264]" (total cores
# inferred from executors x cores-per-executor)
LEVELS = sys.argv[2:] or ["8", "32"]
CORPUS = str(
    Path(__file__).resolve().parent.parent / ".scratch" / f"bench_corpus_{N}"
)
UI_PORT = 4049


def _spec(level: str) -> tuple[str, int]:
    """(master, total_cores) from a level spec."""
    if level.startswith("local-cluster["):
        n_exec, cores = map(int, level.split("[")[1].split(",")[:2])
        return level, n_exec * cores
    return f"local[{level}]", int(level)


def _rest(path: str):
    with urllib.request.urlopen(
        f"http://localhost:{UI_PORT}/api/v1/{path}", timeout=10
    ) as r:
        return json.load(r)


def _iso_ms(ts: str) -> float:
    from datetime import datetime

    return datetime.strptime(ts, "%Y-%m-%dT%H:%M:%S.%fGMT").timestamp()


def profile(cpus: str) -> dict:
    import os

    from sketchy_spark.config import SketchConfig
    from sketchy_spark.pipeline import run_pipeline
    from sketchy_spark.session import get_spark

    os.environ.setdefault("SKETCHY_DRIVER_MEM", "24g")
    master, total_cores = _spec(cpus)
    spark = get_spark(
        f"profile-{cpus}", master=master,
        shuffle_partitions=max(total_cores * 2, 8),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
        },
    )
    cfg = SketchConfig()
    files = spark.read.parquet(CORPUS)

    # warmup (codegen caches, python workers, first-touch)
    run_pipeline(files.limit(2000), cfg, with_containment=False).clusters.count()

    app_id = spark.sparkContext.applicationId
    jobs_before = {j["jobId"] for j in _rest(f"applications/{app_id}/jobs")}

    t0 = time.time()
    res = run_pipeline(files, cfg, with_containment=False)
    res.clusters.groupBy().count().collect()
    wall = time.time() - t0
    res.unpersist()

    jobs = [
        j for j in _rest(f"applications/{app_id}/jobs")
        if j["jobId"] not in jobs_before and j["status"] != "RUNNING"
    ]
    jobs.sort(key=lambda j: j["jobId"])
    spans = [
        (_iso_ms(j["submissionTime"]), _iso_ms(j["completionTime"]))
        for j in jobs
    ]
    # driver gaps: wall not covered by ANY running job (merge intervals)
    covered = 0.0
    if spans:
        spans.sort()
        cur_lo, cur_hi = spans[0]
        for lo, hi in spans[1:]:
            if lo > cur_hi:
                covered += cur_hi - cur_lo
                cur_lo, cur_hi = lo, hi
            else:
                cur_hi = max(cur_hi, hi)
        covered += cur_hi - cur_lo
    gap = wall - covered

    # top inter-job gaps: which job boundary eats driver time
    gaps = []
    for i in range(1, len(spans)):
        g = spans[i][0] - spans[i - 1][1]
        if g > 0.2:
            gaps.append(
                {
                    "after_job": jobs[i - 1]["jobId"],
                    "before_job": jobs[i]["jobId"],
                    "gap_s": round(g, 2),
                    "next_desc": (jobs[i].get("description") or jobs[i]["name"])[:60],
                }
            )
    gaps.sort(key=lambda x: -x["gap_s"])
    if os.environ.get("PROFILE_DUMP_JOBS"):
        prev_end = None
        for j, (slo, shi) in zip(jobs, spans):
            g = slo - prev_end if prev_end is not None else 0.0
            prev_end = shi
            print(
                f"  job {j['jobId']:>3} dur={shi - slo:>6.2f}s "
                f"gap_before={g:>5.2f}s "
                f"{(j.get('description') or j['name'])[:90]}",
                flush=True,
            )

    stages = _rest(f"applications/{app_id}/stages?status=complete")
    agg = {
        "executorRunTime_s": 0.0,
        "executorCpuTime_s": 0.0,
        "jvmGcTime_s": 0.0,
        "shuffleWrite_mb": 0.0,
        "shuffleRead_mb": 0.0,
        "input_mb": 0.0,
    }
    by_stage = []
    for st in stages:
        agg["executorRunTime_s"] += st["executorRunTime"] / 1e3
        agg["executorCpuTime_s"] += st["executorCpuTime"] / 1e9
        agg["jvmGcTime_s"] += st.get("jvmGcTime", 0) / 1e3
        agg["shuffleWrite_mb"] += st["shuffleWriteBytes"] / 1e6
        agg["shuffleRead_mb"] += st["shuffleReadBytes"] / 1e6
        agg["input_mb"] += st["inputBytes"] / 1e6
        by_stage.append(
            {
                "id": st["stageId"],
                "name": st["name"].split("\n")[0][:48],
                "tasks": st["numCompleteTasks"],
                "run_s": round(st["executorRunTime"] / 1e3, 1),
                "cpu_s": round(st["executorCpuTime"] / 1e9, 1),
            }
        )
    by_stage.sort(key=lambda s: -s["run_s"])
    out = {
        "wall_s": round(wall, 1),
        "driver_gap_s": round(gap, 1),
        "n_jobs": len(jobs),
        **{k: round(v, 1) for k, v in agg.items()},
        "core_idle_s": round(
            wall * total_cores - agg["executorRunTime_s"], 1
        ),
        "top_stages": by_stage[:10],
        "top_gaps": gaps[:6],
    }
    spark.stop()
    return out


def main() -> None:
    results = {}
    for cpus in LEVELS:
        results[cpus] = profile(cpus)
        top = results[cpus].pop("top_stages")
        print(f"local[{cpus}]: {json.dumps(results[cpus])}", flush=True)
        for s in top:
            print(f"  stage {s['id']:>4} run={s['run_s']:>7.1f}s "
                  f"cpu={s['cpu_s']:>7.1f}s tasks={s['tasks']:>4} {s['name']}")
        for g in results[cpus].pop("top_gaps"):
            print(f"  gap {g['gap_s']:>5.2f}s before job {g['before_job']}"
                  f" ({g['next_desc']})")
        results[cpus]["top_stages"] = top
    if len(LEVELS) == 2:
        lo, hi = LEVELS
        factor = _spec(hi)[1] / _spec(lo)[1]
        wlo, whi = results[lo]["wall_s"], results[hi]["wall_s"]
        print(f"\nwall {wlo:.1f} -> {whi:.1f}  speedup {wlo / whi:.2f}  "
              f"eff {(wlo / whi) / factor:.3f}")
        print(f"driver gaps: {results[lo]['driver_gap_s']:.1f}s (lo) "
              f"{results[hi]['driver_gap_s']:.1f}s (hi)")
        print(f"executor CPU: {results[lo]['executorCpuTime_s']:.1f}s (lo) "
              f"{results[hi]['executorCpuTime_s']:.1f}s (hi)")
        print(f"executor run: {results[lo]['executorRunTime_s']:.1f}s (lo) "
              f"{results[hi]['executorRunTime_s']:.1f}s (hi)")


if __name__ == "__main__":
    main()
