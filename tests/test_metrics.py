"""G7 metrics / lineage and R36 params introspection."""

import pyspark.sql.functions as F

from sketchy_spark.config import SketchConfig
from sketchy_spark.corpus import corpus_df
from sketchy_spark.metrics import StageMetrics, partition_lineage


def test_partition_lineage_sums_to_rowcount(spark):
    df = corpus_df(spark, 150).repartition(7)
    lin = partition_lineage(df).collect()
    assert sum(r["rows"] for r in lin) == 150
    assert len(lin) <= 7


def test_stage_metrics_records(spark):
    m = StageMetrics()
    with m.time_stage("sketch"):
        pass
    m.record("verify", 1.5, rows=42)
    df = m.to_df(spark)
    rows = {r["stage"]: r for r in df.collect()}
    assert rows["verify"]["rows"] == 42
    assert rows["sketch"]["wall_s"] >= 0


def test_config_introspection(spark):
    """R36 (info -p): the run's sketch params as a one-row table, joined
    to outputs via config_hash — the Iceberg-table-properties stand-in."""
    cfg = SketchConfig()
    from dataclasses import asdict

    props = spark.createDataFrame(
        [tuple(str(v) for v in asdict(cfg).values()) + (cfg.config_hash,)],
        [*asdict(cfg).keys(), "config_hash"],
    )
    row = props.collect()[0]
    assert row["k"] == "16" and row["s"] == "1000"
    assert row["config_hash"] == cfg.config_hash
