"""Text-analysis operators for a training-data pipeline: language ID,
quality scoring, token counting, fingerprinting (SURVEY-mandated
training-data extensions).

Every function here is pure built-in Spark SQL (JVM, whole-stage codegen —
no UDFs) and has an exactly-matching DuckDB oracle in
``__spark_entry__.oracle_sql`` built from the same constants below. The
shared 60-bit hash (md5-hex prefix) exists so Spark and the SQL oracle
compute identical hash values; the engine's production sketch path uses
the murmur3 Arrow kernels instead (operators/sketch.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# shared 60-bit hash: identical in Spark and DuckDB (verified both produce
# 419982666956583591 for 'hello')
SQL_HASH_SPARK = "cast(conv(substr(md5({x}),1,15),16,10) as bigint)"
SQL_HASH_DUCK = "(('0x'||substr(md5({x}),1,15))::BIGINT)"

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "be", "this", "that", "from",
]

# marker words per language for the n-gram/marker language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "los", "que", "es", "las"],
}

def _words_expr(col: str) -> str:
    # trim AFTER the punctuation->space replace: Spark's split drops
    # trailing empty strings but DuckDB's regexp_split_to_array keeps
    # them, so both sides must see no leading/trailing separators
    return (
        f"split(trim(regexp_replace(lower({col}), '[^a-z0-9 ]', ' ')), ' +')"
    )


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish regex token count per document."""
    return docs.select(
        "doc_id",
        F.expr("size(split(trim(text), '\\\\s+'))").alias("ws_tokens"),
        F.expr(
            "size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0))"
        ).alias("bpe_tokens"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a score.

    The classic cheap-quality gate for pretraining corpora: too short,
    punctuation-soaked, or stopword-free documents score low.
    """
    # the word split is staged as its own projection so it provably
    # evaluates once per row, not once per referencing sibling expression
    # (deterministic plan; CSE is not guaranteed across projections)
    return docs.select(
        "doc_id",
        F.expr("length(text)").alias("n_chars"),
        F.expr(
            "round(size(regexp_extract_all(text, '[.,;:!?]', 0)) / length(text), 6)"
        ).alias("punct_ratio"),
        F.expr(_words_expr("text")).alias("ws"),
    ).select(
        "doc_id",
        "n_chars",
        F.expr("size(ws)").alias("n_words"),
        "punct_ratio",
        F.expr(
            "round(size(filter(ws, x -> array_contains(array({s}), x))) "
            "/ size(ws), 6)".format(
                s=",".join(f"'{w}'" for w in STOPWORDS)
            )
        ).alias("stopword_ratio"),
    ).select(
        "doc_id", "n_chars", "n_words", "punct_ratio", "stopword_ratio",
        F.expr(
            "round(least(n_chars / 200.0, 1.0) * 0.4 "
            "+ least(stopword_ratio * 4.0, 1.0) * 0.4 "
            "+ (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2, 6)"
        ).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: argmax language by marker hits, ties to
    the lexicographically first language (deterministic)."""
    score_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        marr = ",".join(f"'{m}'" for m in markers)
        score_cols.append(
            F.expr(
                f"size(filter(ws, x -> array_contains(array({marr}), x)))"
            ).alias(f"score_{lang}")
        )
    # ws staged once: one split per row, not one per language score
    scored = docs.select(
        "doc_id", F.expr(_words_expr("text")).alias("ws")
    ).select("doc_id", *score_cols)
    langs = sorted(LANG_MARKERS)
    best = F.expr(
        "greatest(" + ",".join(f"score_{l}" for l in langs) + ")"
    )
    pred = None
    for l in langs:  # first (sorted) language wins ties
        cond = F.col(f"score_{l}") == F.col("best_score")
        pred = F.when(cond, F.lit(l)) if pred is None else pred.when(cond, F.lit(l))
    return (
        scored.withColumn("best_score", best)
        .select("doc_id", pred.alias("pred_lang"), "best_score")
    )


def doc_fingerprint(docs: DataFrame, gram: int = 8) -> DataFrame:
    """Rolling-hash document fingerprint: min and count-distinct of the
    character n-gram hashes (SQL-expressible winnowing-lite). The
    production fingerprint path is the winnowing kernel in the sketch
    stage; this variant exists for oracle-checkable parity."""
    h = SQL_HASH_SPARK.format(x=f"substr(text, i, {gram})")
    grams = (
        f"transform(sequence(1, greatest(length(text) - {gram - 1}, 1)), "
        f"i -> {h})"
    )
    return docs.select(
        "doc_id",
        F.expr(f"array_min({grams})").alias("min_gram_hash"),
        F.expr(f"size(array_distinct({grams}))").alias("n_distinct_grams"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.5,
    shingle_cap: int = 1000,
) -> DataFrame:
    """Exact word n-gram Jaccard near-dup pairs (the UDF-free exact
    baseline the MinHash estimate approximates).

    Skew defense (the same cap-in-aggregate shape as the LSH band join,
    operators/lsh.py): a shingle shared by more than ``shingle_cap``
    documents is boilerplate — its pair contribution is quadratic and
    carries no similarity signal — so it is excluded from BOTH the
    shared counts and the per-doc denominators (Jaccard over retained
    shingles). Pair generation is ONE groupBy(shingle) + pipelined
    double-explode, never a shingle self-join of two full tables.
    """
    # ws staged as a real column: a lambda body referencing the raw
    # split expression re-evaluates the regexp+split per element
    # (no CSE into higher-order-function lambdas; measured 15x)
    shingles = (
        f"array_distinct(transform(sequence(1, greatest(size(ws) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice(ws, i, {n}))))"
    )
    sh = docs.select(
        "doc_id", F.expr(_words_expr("text")).alias("ws")
    ).select("doc_id", F.explode(F.expr(shingles)).alias("shingle"))
    groups = (
        sh.groupBy("shingle")
        .agg(F.collect_list("doc_id").alias("ids"))
        .where(F.size("ids") <= shingle_cap)
        .persist()  # consumed by the pair explode AND the denominators
    )
    # Eager: collect_list is flagged non-deterministic, which disables
    # ReusedExchange; two consumers racing the unpopulated cache would
    # each re-run the full shingle explode + groupBy (operators/lsh.py
    # learned the same lesson).
    groups.count()
    shared = (
        groups.where(F.size("ids") >= 2)
        .select(F.explode("ids").alias("a_id"), "ids")
        .select("a_id", F.explode("ids").alias("b_id"))
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("shared"))
    )
    counts = (
        groups.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_sh"))
    )
    return (
        shared.join(counts.withColumnRenamed("doc_id", "a_id")
                    .withColumnRenamed("n_sh", "a_n"), "a_id")
        .join(counts.withColumnRenamed("doc_id", "b_id")
              .withColumnRenamed("n_sh", "b_n"), "b_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared") / (F.col("a_n") + F.col("b_n") - F.col("shared")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )
