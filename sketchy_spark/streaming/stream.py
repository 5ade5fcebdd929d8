"""Structured-Streaming ingest (R2's Spark form).

The reference's stream mode consumes stdin records and re-ranks after
each one (src/sketchy.rs:317-356). The Spark-native equivalent is a
``readStream`` file source feeding the incremental dedup through
``foreachBatch`` — each micro-batch runs the same new-vs-all band join
and accumulates edges through the CheckpointStore, so the stream is
resumable (kill the query, restart, no batch is reprocessed thanks to
both Spark's checkpointLocation and the store's batch manifests).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from sketchy_spark.checkpoint import CheckpointStore
from sketchy_spark.config import SketchConfig
from sketchy_spark.sources.tables import FILES_SCHEMA
from sketchy_spark.streaming.incremental import IncrementalDedup


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    store: CheckpointStore,
    cfg: SketchConfig,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start a streaming query that dedups files as they arrive in
    ``input_dir`` (parquet drops). Returns the StreamingQuery.

    ``available_now=True`` processes the backlog then stops — the batch
    test mode; ``False`` runs continuously (production tail -f).
    """
    inc = IncrementalDedup(spark, store, cfg)
    stream = (
        spark.readStream.schema(FILES_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # R12's limit analogue per trigger
        .parquet(input_dir)
    )

    def process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        inc.ingest_batch(int(batch_id), batch_df)

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
