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


def candidate_pairs(signatures: DataFrame, cfg: SketchConfig) -> DataFrame:
    """Distinct candidate (a_id, b_id) with a_id < b_id.

    Plan shape: explode bands -> drop hot keys (broadcast anti-join) ->
    repartition on band_key -> self equi-join -> distinct. The distinct is
    the one unavoidable pair-level shuffle; AQE coalesces its output.
    """
    bands = band_table(signatures, cfg)
    hot = hot_band_keys(bands, cfg.band_skew_cap)
    cold = bands.join(F.broadcast(hot), "band_key", "left_anti")
    cold = cold.repartition("band_key")
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
    duplicate by definition.
    """
    hubs = signatures.groupBy("sha256").agg(
        F.min("file_id").alias("hub"), F.count("*").alias("n")
    )
    return (
        signatures.join(F.broadcast(hubs.where(F.col("n") > 1)), "sha256")
        .where(F.col("file_id") != F.col("hub"))
        .select(F.col("hub").alias("a_id"), F.col("file_id").alias("b_id"))
    )
