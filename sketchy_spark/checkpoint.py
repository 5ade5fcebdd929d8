"""Stage checkpointing + resume (G6) over a parquet-backed table store.

North rule: "resumable from checkpoint with per-partition lineage +
metrics". The store is an Iceberg-shaped shim (SURVEY §7 hard part 6):
each stage is a table directory plus a JSON manifest row carrying row
count, per-partition lineage, wall time, and the config hash. On a real
cluster the same API maps 1:1 onto Iceberg tables
(``df.writeTo(...).createOrReplace()`` + snapshot metadata); the shim
keeps tests hermetic in the sandbox.

Resume contract: a completed stage (manifest status=complete, matching
config_hash) is read back, not recomputed; an incomplete/missing stage
recomputes. Stage outputs are immutable once complete.
"""

from __future__ import annotations

import json
import shutil
import time
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MANIFEST_DIR = "_manifest"


class CheckpointStore:
    def __init__(self, root: str, config_hash: str):
        self.root = Path(root)
        self.config_hash = config_hash
        (self.root / MANIFEST_DIR).mkdir(parents=True, exist_ok=True)

    # -- manifest -----------------------------------------------------
    def _manifest_path(self, stage: str) -> Path:
        return self.root / MANIFEST_DIR / f"{stage}.json"

    def manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def manifests(self) -> list[dict]:
        return [
            json.loads(p.read_text())
            for p in sorted((self.root / MANIFEST_DIR).glob("*.json"))
        ]

    def is_complete(self, stage: str) -> bool:
        m = self.manifest(stage)
        return (
            m is not None
            and m["status"] == "complete"
            and m["config_hash"] == self.config_hash
        )

    # -- stage io -----------------------------------------------------
    def stage_path(self, stage: str) -> str:
        return str(self.root / stage)

    def write_stage(self, stage: str, df: DataFrame) -> None:
        """Write a stage table + manifest with per-WRITE-TASK lineage.

        Each parquet part file is the output of exactly one write task,
        so lineage = (part file, row count from its parquet footer) audits
        what each task actually produced (G7) — unlike a re-scan, whose
        partitioning reflects the read side, not the write. Footers are
        read driver-side (metadata only, no data scan). On Iceberg this
        maps to the snapshot's manifest-entry (file, record_count) list.
        """
        t0 = time.time()
        path = self.stage_path(stage)
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        df.write.mode("overwrite").parquet(tmp)
        import pyarrow.parquet as pq

        lineage = []
        for part in sorted(Path(tmp).glob("part-*.parquet")):
            lineage.append(
                {
                    "file": part.name,
                    "task_id": int(part.name.split("-")[1]),
                    "rows": pq.ParquetFile(part).metadata.num_rows,
                }
            )
        n_rows = sum(e["rows"] for e in lineage)
        shutil.rmtree(path, ignore_errors=True)
        Path(tmp).rename(path)
        self._manifest_path(stage).write_text(
            json.dumps(
                {
                    "stage": stage,
                    "status": "complete",
                    "rows": n_rows,
                    "partitions": lineage,
                    "wall_ms": int((time.time() - t0) * 1000),
                    "config_hash": self.config_hash,
                    "ts": time.time(),
                }
            )
        )

    def read_stage(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(self.stage_path(stage))

    def get_or_compute(
        self, spark: SparkSession, stage: str, compute
    ) -> tuple[DataFrame, bool]:
        """Returns (df, resumed): resumed=True when read from checkpoint."""
        if self.is_complete(stage):
            return self.read_stage(spark, stage), True
        self.write_stage(stage, compute())
        return self.read_stage(spark, stage), False

    def invalidate_from(self, stages: list[str], failed: str) -> None:
        """Drop manifests for ``failed`` and everything after it."""
        idx = stages.index(failed)
        for s in stages[idx:]:
            self._manifest_path(s).unlink(missing_ok=True)
            shutil.rmtree(self.stage_path(s), ignore_errors=True)


STAGES = ["signatures", "edges", "clusters", "containment"]


def run_pipeline_checkpointed(
    files: DataFrame, cfg, store: CheckpointStore
) -> dict:
    """Checkpointed end-to-end run; each completed stage is skipped on
    resume. Returns {stage: DataFrame} plus a ``resumed`` map."""
    from sketchy_spark.operators.cluster import assign_clusters
    from sketchy_spark.operators.lsh import candidate_pairs, exact_dup_edges
    from sketchy_spark.operators.sketch import sketch_files
    from sketchy_spark.operators.verify import (
        containment_candidates,
        containment_verified,
        verified_pairs,
    )

    spark = files.sparkSession
    resumed: dict[str, bool] = {}

    signatures, resumed["signatures"] = store.get_or_compute(
        spark, "signatures", lambda: sketch_files(files, cfg)
    )

    held: list[DataFrame] = []

    def _edges():
        # candidate_pairs is lazy (single-evaluation contract) but
        # verified_pairs broadcasts the pair frame twice; persist it for
        # the duration of the stage write, released right after.
        cand = candidate_pairs(signatures, cfg).persist()
        held.append(cand)
        ver = verified_pairs(cand, signatures, cfg)
        return (
            exact_dup_edges(signatures)
            .unionByName(ver.select("a_id", "b_id"))
            .distinct()
        )

    edges, resumed["edges"] = store.get_or_compute(spark, "edges", _edges)
    for df in held:  # stage parquet is written; the cache served its job
        df.unpersist()

    clusters, resumed["clusters"] = store.get_or_compute(
        spark, "clusters", lambda: assign_clusters(signatures, edges)
    )
    containment, resumed["containment"] = store.get_or_compute(
        spark,
        "containment",
        lambda: containment_verified(
            containment_candidates(signatures, cfg), files
        ),
    )
    return {
        "signatures": signatures,
        "edges": edges,
        "clusters": clusters,
        "containment": containment,
        "resumed": resumed,
    }
