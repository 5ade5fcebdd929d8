"""Candidate verification (G2/G3/G4): Jaccard estimate, SimHash distance,
exact-substring containment. All built-in SQL on the narrow signatures
table; content is re-joined only for the (tiny) containment-candidate set.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from sketchy_spark.config import SketchConfig


def _with_sides(pairs: DataFrame, signatures: DataFrame, cols: list[str]) -> DataFrame:
    a = signatures.select(
        F.col("file_id").alias("a_id"),
        *[F.col(c).alias(f"a_{c}") for c in cols],
    )
    b = signatures.select(
        F.col("file_id").alias("b_id"),
        *[F.col(c).alias(f"b_{c}") for c in cols],
    )
    return pairs.join(a, "a_id").join(b, "b_id")


def verified_pairs(
    pairs: DataFrame, signatures: DataFrame, cfg: SketchConfig
) -> DataFrame:
    """Estimate Jaccard per candidate pair; keep pairs >= tau.

    Bottom-s estimator (unbiased for sets larger than s): with
    U = bottom_s(A ∪ B), j ≈ |U ∩ A ∩ B| / |U|. The shifted-int64 storage
    (SURVEY §4.2) makes ``array_sort``'s signed order equal unsigned hash
    order, so slice-after-sort is exactly bottom-s of the union. For docs
    with < s shingles the sketches are the full sets and the estimate is
    exact. SimHash hamming distance is reported (filtering on it is the
    caller's choice — G2 is a secondary signal, not a recall gate).
    """
    df = _with_sides(pairs, signatures, ["sig", "simhash"])
    union_s = F.slice(
        F.array_sort(F.array_union("a_sig", "b_sig")), 1, cfg.s
    )
    inter3 = F.array_intersect(
        F.array_intersect(union_s, F.col("a_sig")), F.col("b_sig")
    )
    return (
        df.withColumn("union_k", F.size(union_s))
        .withColumn(
            "jaccard",
            F.when(
                F.col("union_k") > 0,
                F.size(inter3) / F.col("union_k"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("a_simhash").bitwiseXOR(F.col("b_simhash"))
            ),
        )
        .where(F.col("jaccard") >= cfg.jaccard_threshold)
        .select("a_id", "b_id", "jaccard", "hamming")
    )


def containment_candidates(
    signatures: DataFrame, cfg: SketchConfig
) -> DataFrame:
    """Fingerprint-overlap containment candidates (G3, candidate stage).

    Winnowing fingerprints are position-robust: if A is embedded verbatim
    in B, most of A's fingerprints appear in B's. Explode -> self-join ->
    per-pair overlap count, normalized by the smaller side's fingerprint
    count (containment score). Pairs at any Jaccard can surface here —
    this is the path that catches low-Jaccard verbatim embeddings LSH
    misses.
    """
    fp = signatures.select(
        "file_id",
        F.size("fingerprints").alias("n_fp"),
        F.explode("fingerprints").alias("fp"),
    )
    a = fp.select(
        F.col("file_id").alias("a_id"), F.col("n_fp").alias("a_nfp"), "fp"
    )
    b = fp.select(
        F.col("file_id").alias("b_id"), F.col("n_fp").alias("b_nfp"), "fp"
    )
    shared = (
        a.join(b, "fp")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id", "a_nfp", "b_nfp")
        .agg(F.count("*").alias("shared_fp"))
    )
    return shared.withColumn(
        "containment",
        F.col("shared_fp") / F.least("a_nfp", "b_nfp"),
    ).where(F.col("containment") >= cfg.containment_threshold).select(
        "a_id", "b_id", "containment"
    )


def containment_verified(
    candidates: DataFrame, files: DataFrame
) -> DataFrame:
    """Exact verification: is the smaller content a verbatim substring of
    the larger? JVM-side ``instr`` on candidate pairs only (no UDF); the
    pair set is post-fingerprint-filter, i.e. tiny relative to the corpus.
    Output: (small_id, big_id, containment).
    """
    c = files.select(
        F.concat_ws("/", "repo", "path").alias("file_id"),
        F.col("content"),
        F.octet_length("content").alias("nb"),
    )
    a = c.select(
        F.col("file_id").alias("a_id"),
        F.col("content").alias("a_content"),
        F.col("nb").alias("a_nb"),
    )
    b = c.select(
        F.col("file_id").alias("b_id"),
        F.col("content").alias("b_content"),
        F.col("nb").alias("b_nb"),
    )
    df = candidates.join(a, "a_id").join(b, "b_id")
    small_first = F.col("a_nb") <= F.col("b_nb")
    small_id = F.when(small_first, F.col("a_id")).otherwise(F.col("b_id"))
    big_id = F.when(small_first, F.col("b_id")).otherwise(F.col("a_id"))
    small_c = F.when(small_first, F.col("a_content")).otherwise(F.col("b_content"))
    big_c = F.when(small_first, F.col("b_content")).otherwise(F.col("a_content"))
    return (
        df.where(F.instr(big_c, small_c) > 0)
        .select(
            small_id.alias("small_id"),
            big_id.alias("big_id"),
            "containment",
        )
    )
