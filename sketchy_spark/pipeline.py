"""End-to-end dedup pipeline orchestration.

files(repo, path, commit, lang, content)
  -> sketch (mapInPandas, the only UDF stage)
  -> signatures            [narrow table: content pruned]
  -> exact edges (sha256)  + LSH candidates -> Jaccard-verified pairs
  -> connected components  -> clusters
  -> containment pairs     [fingerprint candidates -> instr verification]

The Spark re-expression of `sketchy predict` end-to-end (SURVEY §3.1),
with the all-pairs kernel replaced by LSH (G1) and ranking replaced by
clustering (the dedup graft's goal).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from sketchy_spark.config import DEFAULT_CONFIG, SketchConfig
from sketchy_spark.operators.cluster import assign_clusters
from sketchy_spark.operators.lsh import candidate_pairs, exact_dup_edges
from sketchy_spark.operators.sketch import sketch_files
from sketchy_spark.operators.verify import (
    containment_candidates,
    containment_verified,
    verified_pairs_cascade,
)


@dataclass
class PipelineResult:
    signatures: DataFrame
    candidates: DataFrame
    verified: DataFrame
    clusters: DataFrame
    containment: DataFrame
    edges: DataFrame | None = None

    def unpersist(self) -> None:
        """Release every frame the pipeline persisted (bench hygiene)."""
        for df in (self.signatures, self.candidates, self.edges):
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass


def run_pipeline(
    files: DataFrame,
    cfg: SketchConfig = DEFAULT_CONFIG,
    with_containment: bool = True,
    cache_signatures: bool = True,
) -> PipelineResult:
    """Run the full dedup pipeline lazily; materialization points are the
    caller's choice (tests collect; bench writes; checkpointed runs go
    through streaming/incremental.py)."""
    # Slim sketch pass: the bottom-s sig column (8 KB/row) is only ever
    # read for borderline pairs, which the cascade re-sketches on demand —
    # the cached working set stays ~2 KB/row. Winnow fingerprints are
    # skipped entirely when the containment pass is off.
    signatures = sketch_files(
        files, cfg, with_sig=False, with_fp=with_containment
    )
    n_files = None
    if cache_signatures:
        # signatures feed 3+ downstream stages; recomputing the UDF stage
        # per consumer would triple the dominant cost. Materialize EAGERLY:
        # AQE submits query-stage jobs concurrently, and concurrent
        # consumers of a lazily-cached frame each run their own duplicate
        # UDF evaluation (observed: 2x full sketch scans back to back).
        # The count doubles as the cascade's resident-broadcast sizing —
        # ONE barrier, not two.
        signatures = signatures.cache()
        n_files = signatures.count()

    exact = exact_dup_edges(signatures)
    # candidates are consumed once by the cascade's stage-1 kernel (whose
    # output is what gets persisted); no eager barrier needed here
    candidates = candidate_pairs(signatures, cfg)
    verified = verified_pairs_cascade(
        candidates, signatures, cfg, files=files, n_files=n_files
    )

    # persist: connected_components consumes edges twice (size probe +
    # label pass) — without this the whole verify lineage re-executes
    edges = (
        exact.unionByName(verified.select("a_id", "b_id"))
        .distinct()
        .persist()
    )
    clusters = assign_clusters(signatures, edges)

    if with_containment:
        cont = containment_verified(
            containment_candidates(signatures, cfg), files
        )
    else:
        cont = (
            signatures.sparkSession.createDataFrame(
                [], "small_id string, big_id string, containment double"
            )
        )
    return PipelineResult(
        signatures, candidates, verified, clusters, cont, edges
    )


def cluster_consensus(
    clusters: DataFrame, signatures: DataFrame
) -> DataFrame:
    """Per-cluster majority metadata (the 'genotype' of a cluster, SURVEY
    §1.4): majority lang + member count + representative (min file_id)."""
    joined = clusters.join(
        signatures.select("file_id", "lang", "repo"), "file_id"
    )
    lang_counts = joined.groupBy("cluster_id", "lang").agg(
        F.count("*").alias("cnt")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("cnt"), F.asc("lang")
    )
    majority = (
        lang_counts.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("cluster_id", F.col("lang").alias("majority_lang"))
    )
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.min("file_id").alias("representative"),
    )
    return sizes.join(majority, "cluster_id")
