"""Reference-kernel parity operators: shared-hash counting, ranking,
top-k, consensus, cumulative streaming sum, metadata join.

Spark re-expressions of the reference's fixed-function stages
(SURVEY §2.3-§2.5). All built-in SQL — no UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def shared_counts_broadcast(
    queries: DataFrame, refs: DataFrame, query_id: str = "query_id",
    ref_id: str = "ref_id",
) -> DataFrame:
    """All-pairs shared-hash counts with the reference collection broadcast.

    The reference's nested-loop ``shared`` command + resident reference
    collection (src/sketchy.rs:251-277, :81) — every query row joined
    against every reference sketch, shared = |sig_q ∩ sig_r|. The sorted
    two-pointer merge (src/sketchy.rs:419-459) becomes ``array_intersect``
    on the (already ascending) sig arrays; Catalyst broadcasts the small
    side, so no shuffle. Use only when refs is broadcast-sized — the
    scale path is the LSH band join (operators/lsh.py).
    """
    q = queries.select(
        F.col("file_id").alias(query_id), F.col("sig").alias("_qsig")
    )
    r = refs.select(F.col("file_id").alias(ref_id), F.col("sig").alias("_rsig"))
    return (
        q.crossJoin(F.broadcast(r))
        .select(
            query_id,
            ref_id,
            F.size(F.array_intersect("_qsig", "_rsig")).alias("shared"),
        )
    )


def shared_counts_exploded(
    queries: DataFrame, refs: DataFrame, query_id: str = "query_id",
    ref_id: str = "ref_id",
) -> DataFrame:
    """Distributed form of the shared-hash kernel: explode sig -> shuffle
    equi-join on hash value -> count per pair. Scales when neither side
    broadcasts; partial aggregation is map-side (hash aggregate)."""
    q = queries.select(
        F.col("file_id").alias(query_id), F.explode("sig").alias("h")
    )
    r = refs.select(F.col("file_id").alias(ref_id), F.explode("sig").alias("h"))
    return q.join(r, "h").groupBy(query_id, ref_id).agg(
        F.count("*").alias("shared")
    )


def rank_top_k(
    shared: DataFrame, top: int, partition_col: str = "query_id",
    ref_col: str = "ref_id",
) -> DataFrame:
    """Rank references per query by shared desc, keep top-k.

    Mirrors src/sketchy.rs:310 (sort desc by count) + :371/:391 (top slice),
    with an explicit ``ref_id`` tiebreak the reference lacks (its ties keep
    incidental vector order) so results are deterministic.

    Scale note: the ``row_number() <= top`` pattern compiles to a
    map-side Partial ``WindowGroupLimit`` before the partition exchange
    (Spark >= 3.5), so at most ``top`` rows per query survive each map
    partition — the full (query, ref) matrix from the exploded form
    never crosses the shuffle. Pinned by
    tests/test_rank_operators.py::test_rank_top_k_partial_limit_before_exchange.
    """
    w = Window.partitionBy(partition_col).orderBy(
        F.desc("shared"), F.asc(ref_col)
    )
    return (
        shared.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top)
    )


def consensus_mode(
    top_rows: DataFrame, feature_cols: list[str],
    partition_col: str = "query_id",
) -> DataFrame:
    """Per-feature majority vote over each query's top-k rows.

    The reference's consensus (src/sketchy.rs:365-413) transposes the
    genotype columns of the top rows and takes the per-column mode; its
    HashMap tie-break is nondeterministic (src/sketchy.rs:408) — we order
    ties by value, which is deterministic (documented deviation).
    """
    out = top_rows.select(partition_col).distinct()
    for col in feature_cols:
        w = Window.partitionBy(partition_col).orderBy(
            F.desc("cnt"), F.asc(col)
        )
        mode_df = (
            top_rows.groupBy(partition_col, col)
            .agg(F.count("*").alias("cnt"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(partition_col, F.col(col))
        )
        out = out.join(mode_df, partition_col)
    return out


def cumulative_shared(
    per_read_shared: DataFrame, read_col: str = "read",
    ref_col: str = "ref_id",
) -> DataFrame:
    """Streaming sum-of-shared-hashes as a cumulative window
    (src/sketchy.rs:326-347: state vector += shared per read). Batch
    re-expression: running sum per reference ordered by read arrival."""
    w = (
        Window.partitionBy(ref_col)
        .orderBy(read_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_read_shared.withColumn(
        "cum_shared", F.sum("shared").over(w)
    )


def cardinality_estimate(signatures: DataFrame, cfg) -> DataFrame:
    """Distinct-shingle cardinality estimate from the sketch alone (R24,
    src/sketchy.rs:200-205 via finch::statistics::cardinality).

    bottom-s estimator: n ≈ (s-1) * 2^64 / kth_min (k-minimum-values,
    Bar-Yossef et al.); scaled mode: n ≈ |sketch| / scale. The shifted
    int64 storage converts back with + 2^63. When a doc has fewer than s
    distinct shingles the sketch IS the set and the estimate is exact.
    """
    sz = F.size("sig")
    if cfg.mode == "scaled":
        est = (sz / F.lit(cfg.scale)).cast("double")
    else:
        kth_unsigned = (
            F.element_at("sig", -1).cast("double") + F.lit(float(2**63))
        )
        est = F.when(
            sz < cfg.s, sz.cast("double")  # exact: sketch == full set
        ).otherwise(
            (F.lit(float(cfg.s - 1)) * F.lit(float(2**64))) / kth_unsigned
        )
    return signatures.select(
        "file_id",
        F.col("n_shingles").alias("true_positional"),
        F.round(est, 2).alias("est_cardinality"),
    )


class MissingMetadataError(ValueError):
    """Analogue of the reference's panic on a missing genotype key
    (src/sketchy.rs:308,:345 — map lookup panics => strict inner join)."""


def genotype_join(
    results: DataFrame, metadata: DataFrame, on: str = "file_id",
    strict: bool = True,
) -> DataFrame:
    """Broadcast inner equi-join to metadata with a loud missing-key guard.

    The reference panics when a sketch name has no genotype row; we surface
    the same contract as an explicit error listing missing keys (R18).
    """
    if strict:
        missing = results.join(F.broadcast(metadata), on, "left_anti")
        n = missing.count()
        if n:
            sample = [r[on] for r in missing.select(on).head(5)]
            raise MissingMetadataError(
                f"{n} result rows have no metadata row; e.g. {sample}"
            )
    return results.join(F.broadcast(metadata), on, "inner")


def congruence_check(
    sketches: DataFrame, metadata: DataFrame, on: str = "file_id"
) -> None:
    """The ``check`` command (src/sketchy.rs:212-236): sketch collection and
    metadata table must match 1:1. The reference constructs but DISCARDS the
    identifier-mismatch error (src/sketchy.rs:222-227) so only the length
    check can fail — we do not replicate that bug: both checks fail here.
    """
    n_s, n_m = sketches.count(), metadata.count()
    if n_s != n_m:
        raise MissingMetadataError(f"length mismatch: {n_s} sketches vs {n_m}")
    unmatched = sketches.select(on).join(metadata.select(on), on, "left_anti")
    n = unmatched.count()
    if n:
        raise MissingMetadataError(f"{n} sketch names missing from metadata")


def format_result_rows(
    results: DataFrame, cols: list[str], out_col: str = "row"
) -> DataFrame:
    """Reference-style TSV row assembly (R31, src/sketchy.rs:388-399):
    ``reads \\t sketch_id \\t shared \\t genotype...`` becomes one
    tab-joined string column per result row. Structured columns remain
    the preferred output (SURVEY §2.6); this exists for byte-parity with
    the reference's stdout stream and for plain-text sinks.
    """
    return results.select(
        F.concat_ws(
            "\t", *[F.col(c).cast("string") for c in cols]
        ).alias(out_col)
    )
