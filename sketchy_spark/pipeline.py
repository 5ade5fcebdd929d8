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
    verified_pairs,
)


@dataclass
class PipelineResult:
    signatures: DataFrame
    candidates: DataFrame
    verified: DataFrame
    clusters: DataFrame
    containment: DataFrame


def run_pipeline(
    files: DataFrame,
    cfg: SketchConfig = DEFAULT_CONFIG,
    with_containment: bool = True,
    cache_signatures: bool = True,
) -> PipelineResult:
    """Run the full dedup pipeline lazily; materialization points are the
    caller's choice (tests collect; bench writes; checkpointed runs go
    through streaming/incremental.py)."""
    signatures = sketch_files(files, cfg)
    if cache_signatures:
        # signatures feed 3+ downstream stages; recomputing the UDF stage
        # per consumer would triple the dominant cost
        signatures = signatures.cache()

    exact = exact_dup_edges(signatures)
    candidates = candidate_pairs(signatures, cfg)
    verified = verified_pairs(candidates, signatures, cfg)

    edges = exact.unionByName(
        verified.select("a_id", "b_id")
    ).distinct()
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
    return PipelineResult(signatures, candidates, verified, clusters, cont)


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
