"""The reference's flagship entry point re-expressed: ``predict``.

``sketchy predict`` (SURVEY §3.1, src/sketchy.rs:66-124): sketch the
query input, count shared hashes against every reference sketch, rank
descending, keep top-k, attach genotype metadata (and optionally take a
consensus over the top rows). Composition of R15-R18 + R26-R27 + R23 on
the DataFrame API — no new machinery.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from sketchy_spark.config import SketchConfig
from sketchy_spark.operators.rank import (
    consensus_mode,
    genotype_join,
    rank_top_k,
    shared_counts_broadcast,
    shared_counts_exploded,
)
from sketchy_spark.operators.sketch import sketch_files


def predict(
    query_files: DataFrame,
    ref_signatures: DataFrame,
    cfg: SketchConfig,
    top: int = 1,
    metadata: DataFrame | None = None,
    consensus: bool = False,
    feature_cols: list[str] | None = None,
    broadcast_refs: bool = True,
) -> DataFrame:
    """Nearest-reference prediction for each query file.

    Returns (query_id, ref_id, shared, rank [, metadata...]) — the Spark
    form of the reference's TSV row stream (src/sketchy.rs:391-399).
    With ``consensus=True`` (requires odd ``top``, mirroring
    src/sketchy.rs:73-79) returns one row per query with the per-feature
    mode over its top-k matches.
    """
    if consensus:
        if top % 2 == 0:
            # InvalidConsensusTop analogue (src/sketchy.rs:25,:73-79)
            raise ValueError("consensus requires an odd top")
        if not feature_cols:
            raise ValueError("consensus requires feature_cols")

    query_sigs = sketch_files(query_files, cfg).select("file_id", "sig")
    refs = ref_signatures.select("file_id", "sig")
    if broadcast_refs:
        shared = shared_counts_broadcast(query_sigs, refs)
    else:
        shared = shared_counts_exploded(query_sigs, refs)
    ranked = rank_top_k(shared, top=top)

    if metadata is not None:
        ranked = genotype_join(
            ranked.withColumnRenamed("ref_id", "file_id"), metadata
        ).withColumnRenamed("file_id", "ref_id")

    if consensus:
        return consensus_mode(ranked, feature_cols)
    return ranked
