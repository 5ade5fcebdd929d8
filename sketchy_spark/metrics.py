"""Per-stage / per-partition metrics (G7).

North rule: "per-partition lineage and metrics". Stage-level wall time and
row counts are captured by :mod:`sketchy_spark.checkpoint`; this module adds
a reusable partition-lineage aggregate and a driver-side stage timer whose
records land in a metrics table.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def partition_lineage(df: DataFrame) -> DataFrame:
    """(partition_id, rows) for the DataFrame's current partitioning —
    the per-partition lineage record attached to every checkpointed stage."""
    return df.groupBy(
        F.spark_partition_id().alias("partition_id")
    ).agg(F.count("*").alias("rows"))


@dataclass
class StageMetrics:
    records: list[dict] = field(default_factory=list)

    def time_stage(self, name: str):
        return _Timer(self, name)

    def record(self, name: str, wall_s: float, rows: int | None = None):
        self.records.append({"stage": name, "wall_s": wall_s, "rows": rows})

    def to_df(self, spark) -> DataFrame:
        return spark.createDataFrame(
            [(r["stage"], float(r["wall_s"]), r["rows"]) for r in self.records],
            "stage string, wall_s double, rows long",
        )


class _Timer:
    def __init__(self, metrics: StageMetrics, name: str):
        self.metrics = metrics
        self.name = name

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.metrics.record(self.name, time.time() - self.t0)
        return False
