"""Stateful streaming sum-of-shared-hashes (R22/R38).

The reference's stream mode keeps a dense ``sum_of_shared_hashes`` state
vector over the reference collection and re-emits a ranked snapshot
after every read (src/sketchy.rs:317-356). Spark-native form:

  readStream (arriving files)
    -> sketch mapInPandas (stateless, resident reference collection
       broadcast — the reference holds all ref sketches in memory,
       src/sketchy.rs:81)
    -> per-batch (read_id, ref_id, shared) rows
    -> applyInPandasWithState keyed by ref_id accumulating cum_shared

Output stream: one row per (ref_id) update carrying the running total —
the state vector externalized. Ranking a snapshot is a batch query over
the sink table (R26/R28).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sketchy_spark.config import SketchConfig
from sketchy_spark.hashing import batch_shingle_hashes, bottom_s, i64_to_u64
from sketchy_spark.sources.tables import FILES_SCHEMA

SHARED_SCHEMA = "read_id string, ref_id string, shared long"
STATE_SCHEMA = "cum_shared long"
OUT_SCHEMA = "ref_id string, cum_shared long, n_reads long"


def _shared_vs_refs(spark: SparkSession, refs: DataFrame, cfg: SketchConfig):
    """Stateless stage: sketch each arriving file and count shared hashes
    against the resident reference collection."""
    ref_rows = refs.select("file_id", "sig").collect()
    ref_ids = [r["file_id"] for r in ref_rows]
    ref_sigs = [
        i64_to_u64(np.array(r["sig"], dtype=np.int64)) for r in ref_rows
    ]
    bc = spark.sparkContext.broadcast((ref_ids, ref_sigs))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, sigs = bc.value
        for pdf in batches:
            out = []
            for repo, path, content in zip(
                pdf["repo"], pdf["path"], pdf["content"]
            ):
                h, _ = batch_shingle_hashes(
                    [content.encode("utf-8", "surrogatepass")],
                    cfg.k,
                    cfg.seed,
                )
                q = bottom_s(np.unique(h), cfg.s)
                rid = f"{repo}/{path}"
                for ref_id, rsig in zip(ids, sigs):
                    shared = np.intersect1d(
                        q, rsig, assume_unique=True
                    ).size
                    if shared:
                        out.append((rid, ref_id, int(shared)))
            yield pd.DataFrame(
                out, columns=["read_id", "ref_id", "shared"]
            )

    return fn


def _accumulate(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """State update: cum_shared += sum(shared), n_reads += rows."""
    total = 0
    n = 0
    for pdf in pdfs:
        total += int(pdf["shared"].sum())
        n += len(pdf)
    if state.exists:
        (prev_total, prev_n) = state.get
    else:
        prev_total, prev_n = 0, 0
    state.update((prev_total + total, prev_n + n))
    yield pd.DataFrame(
        {
            "ref_id": [key[0]],
            "cum_shared": [prev_total + total],
            "n_reads": [prev_n + n],
        }
    )


def streaming_sum_of_shared(
    spark: SparkSession,
    input_dir: str,
    ref_signatures: DataFrame,
    cfg: SketchConfig,
    checkpoint_dir: str,
    output_table: str = "sum_of_shared",
    available_now: bool = True,
):
    """Start the stateful streaming query; results land in the in-memory
    sink ``output_table`` (swap for an Iceberg sink in production)."""
    stream = (
        spark.readStream.schema(FILES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    shared = stream.mapInPandas(
        _shared_vs_refs(spark, ref_signatures, cfg), schema=SHARED_SCHEMA
    )
    totals = shared.groupBy("ref_id").applyInPandasWithState(
        _accumulate,
        outputStructType=OUT_SCHEMA,
        stateStructType="cum_shared long, n_reads long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        totals.writeStream.format("memory")
        .queryName(output_table)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
