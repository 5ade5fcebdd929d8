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

_M30 = (1 << 30) - 1
_M60 = (1 << 60) - 1


def _mix_consts(n: int) -> list[tuple[int, int, int]]:
    """Deterministic per-permutation constants (a, b, c) for the linear
    mix h_p(H) = (a*lo(H) + b*hi(H) + c) & M60 over the 30-bit halves of
    the shared 60-bit base hash — a 2-universal-style family computed
    with ONE md5 per shingle instead of num_perm md5s (VERDICT r3 #3:
    the 16x md5 fan-out dominated minhash_signatures/lsh_candidate_pairs
    wall). All operands stay < 2^62, so the arithmetic is exact int64 in
    BOTH engines (no ANSI overflow, bit-identical DuckDB mirror)."""
    out = []
    x = 0x9E3779B97F4A7C15
    for _ in range(n):
        abc = []
        for _ in range(3):
            x = (x * 6364136223846793005 + 1442695040888963407) & (
                (1 << 64) - 1
            )
            abc.append(x >> 34)  # 30-bit draw
        a, b, c = abc
        out.append((a | 1, b | 1, c))
    return out


PERM_MIX = _mix_consts(64)


def perm_hash_cols(h, num_perm: int = NUM_PERM) -> list:
    """The num_perm mixed hash columns derived from base-hash column h."""
    if num_perm > len(PERM_MIX):
        raise ValueError(
            f"num_perm={num_perm} exceeds the {len(PERM_MIX)} "
            "precomputed permutation constants (PERM_MIX); widen "
            "_mix_consts if more permutations are needed"
        )
    lo = h.bitwiseAND(F.lit(_M30))
    hi = F.shiftright(h, 30)
    return [
        (
            F.lit(a).cast("long") * lo
            + F.lit(b).cast("long") * hi
            + F.lit(c).cast("long")
        )
        .bitwiseAND(F.lit(_M60))
        .alias(f"h{p}")
        for p, (a, b, c) in enumerate(PERM_MIX[:num_perm])
    ]


def _shingles_from_ws(n: int = 3) -> str:
    """Shingle expression over an already-projected ``ws`` word-array
    column. The word split MUST be staged as a real column first: a
    lambda body referencing the raw split expression re-evaluates the
    regexp+split PER ELEMENT (Catalyst does no CSE into higher-order
    function lambdas — measured 9.2s -> 0.6s for the shingle explode at
    sf0.1, the actual dominant cost r3 attributed to the 16x md5)."""
    return (
        f"array_distinct(transform(sequence(1, greatest(size(ws) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice(ws, i, {n}))))"
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
        "doc_id", F.expr(_words_expr("text")).alias("ws")
    ).select("doc_id", F.explode(F.expr(_shingles_from_ws())).alias("shingle"))


def minhash_signatures(docs: DataFrame, num_perm: int = NUM_PERM) -> DataFrame:
    """(doc_id, perm, minhash): classic k-permutation MinHash where
    h_j(x) = hash(j || ':' || x).

    Plan shape: ONE explode + ONE wide min-aggregate — all ``num_perm``
    permutation hashes are computed per shingle in a single projection
    and reduced by ``num_perm`` map-side-combinable mins, so the shuffle
    carries one row per (doc, partition), NOT the num_perm x row blowup
    of a perms crossJoin (the r1 bench's slowest-query cause). The
    (perm, minhash) long form is unpivoted AFTER aggregation, map-side.

    Hash cost: ONE md5 per shingle; the per-permutation hashes are cheap
    linear mixes of its 30-bit halves (see :func:`_mix_consts` — r3's
    16-md5s-per-shingle was the measured dominant cost of this query and
    lsh_candidate_pairs). The base hash is staged as its own projection
    so it provably evaluates once, not once per referencing mix.
    """
    sh = shingle_table(docs)
    base = sh.select(
        "doc_id", F.expr(SQL_HASH_SPARK.format(x="shingle")).alias("h")
    )
    wide = (
        base.select("doc_id", *perm_hash_cols(F.col("h"), num_perm))
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
    w = (
        docs.select("doc_id", F.explode(F.expr(words)).alias("word"))
        .where(F.col("word") != "")
        # stage the word hash as a real column: the 16 bit-sum aggregates
        # below would otherwise each re-evaluate the md5 (16x per word —
        # same no-CSE-into-aggregates trap as the lambda case in
        # _shingles_from_ws)
        .select("doc_id", F.expr(SQL_HASH_SPARK.format(x="word")).alias("h"))
    )
    bit_sums = [
        F.sum(
            F.expr(f"2 * cast((shiftright(h, {b}) & 1) as int) - 1")
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
    plan (no CartesianProduct). A pair matching several bands is emitted
    exactly once by the first-matching-band filter (no dedup shuffle —
    see the in-body measurement note).
    """
    n_bands = max_hamming + 1  # pigeonhole: <= 3 flipped bits, 4 bands
    bits = 16 // n_bands
    # simhash rides along through the band self-join (functionally
    # dependent on doc_id); the two join sides are canonically identical
    # subtrees that AQE stage-reuses at runtime. r2's plan aggregated
    # first(simhash) post-join (6x wall); a post-distinct attach (r3
    # first cut) added two MORE consumers of the aggregate, each a full
    # recompute — measured 4 scans, zero ReusedExchange. r4: the
    # ``distinct`` itself (the second shuffle, over the multi-band join
    # fan-out) was the measured dominant cost (simhash16 is 0.7s at
    # sf0.1; the query was ~6s) — replaced by the FIRST-MATCHING-BAND
    # filter below: a pair is kept only on its lowest bit-identical
    # band, so every qualifying pair is emitted exactly once and the
    # plan is one equi-join + a map-side filter, no dedup shuffle.
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
    x = F.col("a_sim").bitwiseXOR(F.col("b_sim"))
    # index of the lowest bit-identical band of the pair (pigeonhole: at
    # hamming <= max_hamming at least one exists, so every qualifying
    # pair matches exactly one first band)
    first_band = F.lit(None).cast("int")
    for i in range(n_bands - 1, -1, -1):
        nibble = F.shiftright(x, i * bits).bitwiseAND(F.lit((1 << bits) - 1))
        first_band = F.when(nibble == 0, F.lit(i)).otherwise(first_band)
    return (
        a.join(b, ["band", "key"])
        .where(F.col("a_id") < F.col("b_id"))
        .where(F.col("band") == first_band)
        .select(
            "a_id",
            "b_id",
            F.bit_count(x).alias("hamming"),
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
