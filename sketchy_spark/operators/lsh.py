"""LSH banding + candidate self-join (G1) — the scale replacement for the
reference's all-pairs nested loop (src/sketchy.rs:251-277).

b bands x r rows over the fixed-width permutation signature; files sharing
any band key become candidate pairs. With b=32, r=4 the capture probability
at Jaccard j is 1-(1-j^4)^32 (≥ 0.9998 at j=0.7), which is what makes the
recall ≥ 0.99 gate achievable without the O(n²) join.

Skew (SURVEY §4.1): boilerplate-heavy shingles create hot band keys whose
self-join is quadratic. Two defenses: (1) band keys hotter than
``cfg.band_skew_cap`` are dropped before the join — a degenerate key shared
by thousands of files carries no pair-specific signal (true near-dup pairs
share many other bands); (2) AQE skew-join splitting handles residual skew.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from sketchy_spark.config import SketchConfig


def band_table(signatures: DataFrame, cfg: SketchConfig) -> DataFrame:
    """(file_id, band_key) — one row per band per file.

    band_key = xxhash64(band_index, r signature values): JVM-side, no UDF;
    the band index in the hash input keeps keys from different bands
    disjoint without a separate column.
    """
    r = cfg.rows_per_band
    keys = F.array(
        *[
            F.xxhash64(F.lit(i), F.slice("sig_perm", i * r + 1, r))
            for i in range(cfg.bands)
        ]
    )
    return signatures.select(
        "file_id", F.explode(keys).alias("band_key")
    )


def hot_band_keys(bands: DataFrame, cap: int) -> DataFrame:
    """Band keys with more than ``cap`` members (the skew set)."""
    return (
        bands.groupBy("band_key")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > cap)
        .select("band_key")
    )


def candidate_pairs(
    signatures: DataFrame, cfg: SketchConfig, cache_bands: bool = True
) -> DataFrame:
    """Distinct candidate (a_id, b_id) with a_id < b_id.

    Plan shape: explode bands -> groupBy(band_key) collecting member ids
    (skew cap applied in the same aggregate: keys hotter than
    ``band_skew_cap`` are dropped — boilerplate carries no pair signal)
    -> chained explodes emit i<j pairs map-side -> distinct. Exactly two
    shuffles (the groupBy and the distinct); the former self-join +
    anti-join formulation cost ~7 stages for the same result — at a
    fixed ~1s scheduling latency per stage, stage count is what caps
    scaling efficiency on fast clusters.
    """
    bands = band_table(signatures, cfg)
    groups = (
        bands.groupBy("band_key")
        .agg(F.collect_list("file_id").alias("ids"))
        .where(
            (F.size("ids") >= 2) & (F.size("ids") <= cfg.band_skew_cap)
        )
    )
    # chained Generates are pipelined (no materialized k^2 blowup)
    return (
        groups.select(F.explode("ids").alias("a_id"), "ids")
        .select("a_id", F.explode("ids").alias("b_id"))
        .where(F.col("a_id") < F.col("b_id"))
        .distinct()
    )


def candidate_pairs_join(
    signatures: DataFrame, cfg: SketchConfig
) -> DataFrame:
    """Self-join formulation of candidate generation (kept as the
    reference plan shape; more stages, same output as candidate_pairs)."""
    bands = band_table(signatures, cfg).persist()
    hot = hot_band_keys(bands, cfg.band_skew_cap)
    cold = bands.join(F.broadcast(hot), "band_key", "left_anti")
    a = cold.alias("a")
    b = cold.alias("b")
    return (
        a.join(b, "band_key")
        .where(F.col("a.file_id") < F.col("b.file_id"))
        .select(
            F.col("a.file_id").alias("a_id"),
            F.col("b.file_id").alias("b_id"),
        )
        .distinct()
    )


def exact_dup_edges(signatures: DataFrame) -> DataFrame:
    """Star edges (member -> group-min) within identical-sha256 groups.

    Exact duplicates connect in O(group) edges instead of O(group²) pairs —
    the cheap path the LSH join never needs to see. Analogue of the
    self-match == s invariant (docs/index.md:149): identical content is a
    duplicate by definition. One slim window shuffle — no driver-side
    broadcast build (a ~sha256-cardinality broadcast is serial time).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("sha256")
    return (
        signatures.select("sha256", "file_id")
        .withColumn("hub", F.min("file_id").over(w))
        .where(F.col("file_id") != F.col("hub"))
        .select(F.col("hub").alias("a_id"), F.col("file_id").alias("b_id"))
    )
