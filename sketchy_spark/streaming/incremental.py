"""Incremental-arrival dedup (the reference's streaming analogue).

The reference's stream mode re-ranks after every read with a running
sum-of-shared state vector (``/root/reference/src/sketchy.rs:317-356``).
The dedup graft models incremental arrival as snapshot-increment batches
(SURVEY §1.5, §2.7 R38): each new batch is sketched, banded against the
*accumulated* signature store (new x all — never all x all), verified,
and the edge set grows monotonically; clusters are recomputed from the
full edge set (cheap: edges ≪ files). Invariant (FIXTURES §3): after N
batches the clusters equal the single-shot run on the union.

True sub-second streaming would swap the batch source for
``readStream`` + ``applyInPandasWithState``; the north rule requires
resumable incremental batches, which is what this is.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from sketchy_spark.checkpoint import CheckpointStore
from sketchy_spark.config import SketchConfig
from sketchy_spark.operators.cluster import assign_clusters
from sketchy_spark.operators.lsh import band_table, exact_dup_edges, hot_band_keys
from sketchy_spark.operators.sketch import sketch_files
from sketchy_spark.operators.verify import verified_pairs


def _new_vs_all_candidates(
    new_sigs: DataFrame, all_sigs: DataFrame, cfg: SketchConfig
) -> DataFrame:
    """Band join restricted to pairs touching a new file: the incremental
    form of G1. Work is O(|new| x collision) instead of O(|all|²)."""
    new_bands = band_table(new_sigs, cfg)
    all_bands = band_table(all_sigs, cfg)
    hot = hot_band_keys(all_bands, cfg.band_skew_cap)
    new_cold = new_bands.join(F.broadcast(hot), "band_key", "left_anti")
    all_cold = all_bands.join(F.broadcast(hot), "band_key", "left_anti")
    n = new_cold.select(F.col("file_id").alias("n_id"), "band_key")
    m = all_cold.select(F.col("file_id").alias("m_id"), "band_key")
    pairs = (
        n.join(m, "band_key")
        .where(F.col("n_id") != F.col("m_id"))
        .select(
            F.least("n_id", "m_id").alias("a_id"),
            F.greatest("n_id", "m_id").alias("b_id"),
        )
        .distinct()
    )
    return pairs


class IncrementalDedup:
    """Accumulates signatures and verified edges across arriving batches
    through a CheckpointStore, so a killed run resumes at the last batch."""

    def __init__(self, spark: SparkSession, store: CheckpointStore,
                 cfg: SketchConfig):
        self.spark = spark
        self.store = store
        self.cfg = cfg

    def _read_or_none(self, stage: str) -> DataFrame | None:
        if self.store.is_complete(stage):
            return self.store.read_stage(self.spark, stage)
        return None

    def ingest_batch(self, batch_id: int, files: DataFrame) -> None:
        """Sketch + band-join one arriving batch against the store."""
        stage_sig = f"sig_batch_{batch_id:05d}"
        stage_edge = f"edges_through_{batch_id:05d}"
        prev_sigs = self._read_or_none("sig_all")
        if self.store.is_complete(stage_sig) and self.store.is_complete(
            stage_edge
        ):
            return  # batch fully ingested in a previous run

        new_sigs, _ = self.store.get_or_compute(
            self.spark, stage_sig, lambda: sketch_files(files, self.cfg)
        )
        all_sigs = (
            prev_sigs.unionByName(new_sigs) if prev_sigs is not None else new_sigs
        )
        cand = _new_vs_all_candidates(new_sigs, all_sigs, self.cfg)
        ver = verified_pairs(cand, all_sigs, self.cfg).select("a_id", "b_id")
        exact = exact_dup_edges(all_sigs)
        prev_edges = self._read_or_none("edges_all")
        edges = ver.unionByName(exact)
        if prev_edges is not None:
            edges = edges.unionByName(prev_edges)
        edges = edges.distinct()
        # accumulate: rewrite the rolling tables, then mark the batch done
        self.store.write_stage("sig_all_next", all_sigs)
        self.store.write_stage("edges_all_next", edges)
        self._promote("sig_all_next", "sig_all")
        self._promote("edges_all_next", "edges_all")
        self.store.write_stage(
            stage_edge, self.store.read_stage(self.spark, "edges_all")
        )

    def _promote(self, src: str, dst: str) -> None:
        import shutil
        from pathlib import Path

        src_p, dst_p = self.store.stage_path(src), self.store.stage_path(dst)
        shutil.rmtree(dst_p, ignore_errors=True)
        Path(src_p).rename(dst_p)
        m = self.store.manifest(src)
        m["stage"] = dst
        self.store._manifest_path(dst).write_text(__import__("json").dumps(m))
        self.store._manifest_path(src).unlink(missing_ok=True)

    def clusters(self) -> DataFrame:
        sigs = self.store.read_stage(self.spark, "sig_all")
        edges = self.store.read_stage(self.spark, "edges_all")
        return assign_clusters(sigs, edges)
