"""Oracle-parity dedup operators over the ``documents`` table.

Same semantics as the production pipeline (shingle -> MinHash -> band ->
candidate pairs -> verify; SimHash; exact dedup), but expressed in pure
Spark SQL with the shared md5-based 60-bit hash so a DuckDB oracle can
compute bit-identical results on the same parquet (the driver's
correctness gate). The production path (operators/) uses the murmur3
Arrow kernels instead — faster, reference-config — these exist to make
every dedup operator oracle-checkable end to end.

Shingling here is word 3-grams (distinct); documents.text is word soup,
so word shingles give meaningful Jaccard granularity at ~50 words/doc.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from sketchy_spark.functions.text import SQL_HASH_SPARK, _words_expr

NUM_PERM = 16
ROWS_PER_BAND = 4


def _shingles_expr(n: int = 3) -> str:
    words = _words_expr("text")
    return (
        f"array_distinct(transform(sequence(1, greatest(size({words}) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice({words}, i, {n}))))"
    )


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by md5(text): hash-groupBy dedup."""
    return (
        docs.select("doc_id", F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("representative"),
        )
        .where(F.col("n_docs") > 1)
    )


def exact_dup_pairs(docs: DataFrame) -> DataFrame:
    h = docs.select("doc_id", F.md5("text").alias("text_hash"))
    a = h.select(F.col("doc_id").alias("a_id"), "text_hash")
    b = h.select(F.col("doc_id").alias("b_id"), "text_hash")
    return (
        a.join(b, "text_hash")
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
    )


def shingle_table(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(F.expr(_shingles_expr())).alias("shingle")
    )


def minhash_signatures(docs: DataFrame, num_perm: int = NUM_PERM) -> DataFrame:
    """(doc_id, perm, minhash): classic k-permutation MinHash where
    h_j(x) = hash(j || ':' || x).

    Plan shape: ONE explode + ONE wide min-aggregate — all ``num_perm``
    permutation hashes are computed per shingle in a single projection
    and reduced by ``num_perm`` map-side-combinable mins, so the shuffle
    carries one row per (doc, partition), NOT the num_perm x row blowup
    of a perms crossJoin (the r1 bench's slowest-query cause). The
    (perm, minhash) long form is unpivoted AFTER aggregation, map-side.
    """
    sh = shingle_table(docs)
    hashes = [
        F.expr(SQL_HASH_SPARK.format(x=f"concat('{p}:', shingle)")).alias(
            f"h{p}"
        )
        for p in range(num_perm)
    ]
    wide = (
        sh.select("doc_id", *hashes)
        .groupBy("doc_id")
        .agg(*[F.min(f"h{p}").alias(f"m{p}") for p in range(num_perm)])
    )
    stack = ", ".join(f"{p}, m{p}" for p in range(num_perm))
    return wide.select(
        "doc_id",
        F.expr(f"stack({num_perm}, {stack})").alias("perm", "minhash"),
    ).select("doc_id", F.col("perm").cast("int").alias("perm"), "minhash")


def lsh_candidate_pairs(
    docs: DataFrame,
    num_perm: int = NUM_PERM,
    rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """Band the signature, join docs sharing a band key (G1, SQL form)."""
    sig = minhash_signatures(docs, num_perm)
    banded = (
        sig.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("perm", "minhash"))
                        ),
                        lambda x: x["minhash"].cast("string"),
                    ),
                    ",",
                )
            ).alias("band_key")
        )
    )
    a = banded.select(F.col("doc_id").alias("a_id"), "band", "band_key")
    b = banded.select(F.col("doc_id").alias("b_id"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def minhash_similarity_pairs(
    docs: DataFrame, min_matching: int = 8, num_perm: int = NUM_PERM
) -> DataFrame:
    """Estimated-similarity pairs: count of matching signature slots;
    est_jaccard = matching / num_perm (the shared-hash kernel, R15, in
    its k-permutation form)."""
    sig = minhash_signatures(docs, num_perm)
    a = sig.select(F.col("doc_id").alias("a_id"), "perm", "minhash")
    b = sig.select(F.col("doc_id").alias("b_id"), "perm", "minhash")
    return (
        a.join(b, ["perm", "minhash"])
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("matching"))
        .where(F.col("matching") >= min_matching)
        .withColumn(
            "est_jaccard", F.round(F.col("matching") / num_perm, 6)
        )
    )


def simhash16(docs: DataFrame) -> DataFrame:
    """16-bit SimHash over word hashes (multiset-weighted); bit b set iff
    the signed sum of word-hash bits at position b is > 0. 16 explicit
    bit expressions keep shifts literal (portable to the oracle)."""
    words = _words_expr("text")
    w = docs.select(
        "doc_id", F.explode(F.expr(words)).alias("word")
    ).where(F.col("word") != "")
    h = SQL_HASH_SPARK.format(x="word")
    bit_sums = [
        F.sum(
            F.expr(f"2 * cast((shiftright({h}, {b}) & 1) as int) - 1")
        ).alias(f"s{b}")
        for b in range(16)
    ]
    agg = w.groupBy("doc_id").agg(*bit_sums)
    sim = " + ".join(
        f"if(s{b} > 0, {1 << b}, 0)" for b in range(16)
    )
    return agg.select("doc_id", F.expr(f"cast({sim} as bigint)").alias("simhash"))


def simhash_dup_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs within hamming distance of the 16-bit simhash (G2, SQL form).

    Hamming multi-index instead of a crossJoin: split the 16 bits into
    4 bands of 4; if hamming(a, b) <= 3 then by pigeonhole at least one
    band is bit-identical, so an equi-join on (band, band_bits) finds
    every qualifying pair — same output as the O(n²) form, equi-join
    plan (no CartesianProduct). Pairs matching several bands are deduped
    by the groupBy before the hamming verify.
    """
    n_bands = max_hamming + 1  # pigeonhole: <= 3 flipped bits, 4 bands
    bits = 16 // n_bands
    # The simhash16 aggregate (word explode + md5 oracle-parity hash +
    # 16 bit-sums) is the measured floor of this query (~7s at sf0.1,
    # regardless of join shape) — so the join must consume it ONCE.
    # simhash rides along through the band self-join and the distinct
    # (functionally dependent on doc_id, so distinct over the extra two
    # longs dedupes identically); the two join sides are canonically
    # identical subtrees that AQE stage-reuses at runtime. r2's plan
    # aggregated first(simhash) post-join (6x wall); a post-distinct
    # attach (r3 first cut) added two MORE consumers of the aggregate,
    # each a full recompute — measured 4 scans, zero ReusedExchange.
    s = simhash16(docs)
    bands = s.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", i * bits)
                        .bitwiseAND(F.lit((1 << bits) - 1))
                        .alias("key"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(
        "doc_id",
        "simhash",
        F.col("bk.band").alias("band"),
        F.col("bk.key").alias("key"),
    )
    a = bands.select(
        F.col("doc_id").alias("a_id"), F.col("simhash").alias("a_sim"),
        "band", "key",
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"), F.col("simhash").alias("b_sim"),
        "band", "key",
    )
    return (
        a.join(b, ["band", "key"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sim", "b_sim")
        .distinct()
        .select(
            "a_id",
            "b_id",
            F.bit_count(
                F.col("a_sim").bitwiseXOR(F.col("b_sim"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def scaled_hash_counts(docs: DataFrame, scale: float = 0.001) -> DataFrame:
    """FracMinHash clamp in SQL (R11): per doc, how many shingle hashes
    fall below 2^60 * scale."""
    threshold = int((1 << 60) * scale)
    sh = shingle_table(docs)
    h = SQL_HASH_SPARK.format(x="shingle")
    return (
        sh.select("doc_id", F.expr(h).alias("h"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("h") < threshold, 1).otherwise(0)).alias(
                "n_scaled"
            ),
            F.count("*").alias("n_shingles"),
        )
    )


def shingle_cardinality(docs: DataFrame) -> DataFrame:
    """Distinct-shingle cardinality per doc (R24's estimate, exact in
    SQL form — the estimate variant is approx_count_distinct)."""
    sh = shingle_table(docs)
    return sh.groupBy("doc_id").agg(
        F.countDistinct("shingle").alias("n_distinct_shingles")
    )
