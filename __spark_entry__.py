"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every oracle-checkable operator (SURVEY §2 + the
training-data extensions); ``oracle_sql()`` carries the DuckDB-equivalent
SQL. Hash-bearing queries use the shared md5-based 60-bit hash
(``sketchy_spark.functions.text.SQL_HASH_*``) so both engines compute
bit-identical values. Murmur-pipeline operators (non-SQL-expressible:
iterative connected components, Arrow sketch kernels) are exposed as
rows-only queries on the deterministic planted corpus.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from sketchy_spark.config import SketchConfig
from sketchy_spark.functions import similarity as sim
from sketchy_spark.functions import sql_dedup as sd
from sketchy_spark.functions import text as tx

CFG = SketchConfig()

# One pipeline run shared by the three planted_* queries (same 400-file
# corpus; clusters/verified are identical with or without the containment
# pass, so one containment-enabled run serves all three). Keyed by the
# session's applicationId — stable for a session's lifetime, never reused
# across sessions (ADVICE r3: ``id(session)`` can be recycled by CPython
# after a stop+gc, returning frames bound to a dead session). Evicting an
# old entry releases its persisted frames.
_PLANTED: dict[str, object] = {}


def _planted_pipeline(s: SparkSession):
    key = s.sparkContext.applicationId
    if key not in _PLANTED:
        for old in _PLANTED.values():
            old.unpersist()  # PipelineResult.unpersist swallows dead-session errors
        _PLANTED.clear()
        from sketchy_spark.corpus import corpus_df
        from sketchy_spark.pipeline import run_pipeline

        _PLANTED[key] = run_pipeline(
            corpus_df(s, 400), CFG, with_containment=True
        )
    return _PLANTED[key]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _docs_doubled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ shifted copy — synthesizes exact duplicates so the
    exact-dedup operators group something real."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.unionAll(
        d.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full murmur dedup pipeline over sf0.001 documents mapped
    to the input_hint shape -> cluster assignments with consensus size."""
    from sketchy_spark.pipeline import run_pipeline

    docs = _docs(spark, "/root/testdata/sf0.001")
    files = docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.md5("text").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    res = run_pipeline(files, CFG, with_containment=False)
    sizes = res.clusters.groupBy("cluster_id").agg(
        F.count("*").alias("n_members")
    )
    return (
        res.clusters.join(sizes, "cluster_id")
        .select("file_id", "cluster_id", "n_members")
        .orderBy("file_id")
    )


# ---------------------------------------------------------------- queries


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- dedup / text over documents (SQL-parity hash) ---
    q["exact_dedup_groups"] = lambda s, d: sd.exact_dedup_groups(
        _docs_doubled(s, d)
    )
    q["exact_dup_pairs"] = lambda s, d: sd.exact_dup_pairs(_docs_doubled(s, d))
    q["token_count"] = lambda s, d: tx.token_count(_docs(s, d))
    q["quality_score"] = lambda s, d: tx.quality_score(_docs(s, d))
    q["lang_id"] = lambda s, d: tx.lang_id(_docs(s, d))
    q["doc_fingerprint"] = lambda s, d: tx.doc_fingerprint(_docs(s, d))
    q["ngram_jaccard_pairs"] = lambda s, d: tx.ngram_jaccard_pairs(_docs(s, d))
    q["minhash_signatures"] = lambda s, d: sd.minhash_signatures(_docs(s, d))
    q["lsh_candidate_pairs"] = lambda s, d: sd.lsh_candidate_pairs(_docs(s, d))
    q["minhash_similarity_pairs"] = lambda s, d: sd.minhash_similarity_pairs(
        _docs(s, d)
    )
    q["simhash16"] = lambda s, d: sd.simhash16(_docs(s, d))
    q["simhash_dup_pairs"] = lambda s, d: sd.simhash_dup_pairs(_docs(s, d))
    q["scaled_hash_counts"] = lambda s, d: sd.scaled_hash_counts(_docs(s, d))
    q["shingle_cardinality"] = lambda s, d: sd.shingle_cardinality(_docs(s, d))

    # --- reference-kernel parity on TPC-H-ish tables ---
    def topk_rank(s, d):
        from pyspark.sql import Window

        sup = _tbl(s, d, "supplier")
        w = Window.partitionBy("s_nationkey").orderBy(
            F.desc("s_acctbal"), F.asc("s_suppkey")
        )
        return (
            sup.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 2)
            .select(
                F.col("s_nationkey").alias("nationkey"),
                F.col("s_suppkey").alias("suppkey"),
                F.round("s_acctbal", 2).alias("acctbal"),
                "rank",
            )
        )

    q["topk_rank"] = topk_rank

    def result_rows_tsv(s, d):
        """R31 TSV row assembly: the reference's stdout row stream
        (reads \\t sketch_id \\t shared \\t ...) as one tab-joined string
        per result row (integer cents avoid float-format divergence)."""
        from sketchy_spark.operators.rank import format_result_rows

        base = topk_rank(s, d).select(
            "nationkey",
            "suppkey",
            F.round(F.col("acctbal") * 100).cast("long").alias("cents"),
            "rank",
        )
        return format_result_rows(
            base, ["nationkey", "suppkey", "cents", "rank"]
        )

    q["result_rows_tsv"] = result_rows_tsv

    def mode_consensus(s, d):
        from pyspark.sql import Window

        cust = _tbl(s, d, "customer").select("c_custkey", "c_mktsegment")
        orders = _tbl(s, d, "orders").select("o_custkey", "o_orderpriority")
        joined = cust.join(
            orders, cust["c_custkey"] == orders["o_custkey"]
        )
        counts = joined.groupBy("c_mktsegment", "o_orderpriority").agg(
            F.count("*").alias("cnt")
        )
        w = Window.partitionBy("c_mktsegment").orderBy(
            F.desc("cnt"), F.asc("o_orderpriority")
        )
        return (
            counts.withColumn("rn", F.row_number().over(w))
            .where("rn = 1")
            .select(
                F.col("c_mktsegment").alias("mktsegment"),
                F.col("o_orderpriority").alias("top_priority"),
                "cnt",
            )
        )

    q["mode_consensus"] = mode_consensus

    def cumsum_stream(s, d):
        from pyspark.sql import Window

        ev = _tbl(s, d, "events")
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return ev.select(
            "user_id",
            "event_id",
            F.round(F.sum("value").over(w), 4).alias("cum_value"),
        )

    q["cumsum_stream"] = cumsum_stream

    def shared_count_join(s, d):
        ev = _tbl(s, d, "events").where(F.col("user_id") < 30)
        types = ev.select("user_id", "event_type").distinct()
        a = types.select(
            F.col("user_id").alias("a_user"), "event_type"
        )
        b = types.select(
            F.col("user_id").alias("b_user"), "event_type"
        )
        return (
            a.join(b, "event_type")
            .where(F.col("a_user") < F.col("b_user"))
            .groupBy("a_user", "b_user")
            .agg(F.count("*").alias("shared"))
        )

    q["shared_count_join"] = shared_count_join

    # --- similarity search over embeddings ---
    q["cosine_topk"] = lambda s, d: sim.cosine_topk_bruteforce(_emb(s, d))
    q["embedding_dup_pairs"] = lambda s, d: sim.embedding_dup_pairs(
        _emb(s, d), threshold=0.45
    )
    q["ann_bucketed"] = lambda s, d: sim.ann_bucketed(
        _emb(s, d), threshold=0.30, bits=10
    )
    q["ann_multiprobe"] = lambda s, d: sim.ann_multiprobe(
        _emb(s, d), threshold=0.45, bits=4, probes=12
    )
    # the production default (VERDICT r4 #1): bits/probes DERIVED from
    # the dup-detection threshold via ann_params(0.9) -> (10, 10) —
    # 1024-way buckets, the scale-safe density. Verified at 0.30 so the
    # synthetic embeddings (no planted c>=0.9 pairs) yield nonzero rows
    # for the value-hash; the candidate set is the sparse config's own.
    scale_bits, scale_probes = sim.ann_params(0.9)
    q["ann_multiprobe_scale"] = lambda s, d: sim.ann_multiprobe(
        _emb(s, d), threshold=0.30, bits=scale_bits, probes=scale_probes
    )
    # IVF: the low-threshold regime ann_params refuses ("use IVF").
    # This is the PRODUCTION default path — n_cells derived as
    # ceil(sqrt(n)) — oracle-able because the hash-sampled quantizer is
    # deterministic given n (the oracle hardcodes sf0.01's n=500 ->
    # 23 cells; the driver's correctness compare runs at sf0.01 only).
    q["ann_ivf"] = lambda s, d: sim.ann_ivf(_emb(s, d), threshold=0.30)

    # --- murmur pipeline on the planted corpus (non-SQL-expressible:
    #     Arrow kernels + iterative CC -> rows-only driver check) ---
    def planted_clusters(s, d):
        res = _planted_pipeline(s)
        return res.clusters.groupBy("cluster_id").agg(
            F.count("*").alias("n_members")
        )

    q["planted_clusters"] = planted_clusters

    def planted_verified_pairs(s, d):
        res = _planted_pipeline(s)
        return res.verified.select(
            "a_id", "b_id", F.round("jaccard", 4).alias("jaccard")
        )

    q["planted_verified_pairs"] = planted_verified_pairs

    def predict_topk(s, d):
        """Flagship 'sketchy predict' analogue: each of 20 query docs
        ranked against the full reference collection (rows-only: murmur
        sketches are not SQL-expressible)."""
        from sketchy_spark.corpus import corpus_df
        from sketchy_spark.operators.predict import predict
        from sketchy_spark.operators.sketch import sketch_files

        refs = sketch_files(corpus_df(s, 200), CFG)
        queries_df = corpus_df(s, 200).limit(20)
        return predict(queries_df, refs, CFG, top=3)

    q["predict_topk"] = predict_topk

    def sketch_cardinality(s, d):
        from sketchy_spark.corpus import corpus_df
        from sketchy_spark.operators.rank import cardinality_estimate
        from sketchy_spark.operators.sketch import sketch_files

        sigs = sketch_files(corpus_df(s, 300), CFG)
        return cardinality_estimate(sigs, CFG)

    q["sketch_cardinality"] = sketch_cardinality

    def planted_containment(s, d):
        res = _planted_pipeline(s)
        return res.containment.select(
            "small_id", "big_id", F.round("containment", 4).alias("containment")
        )

    q["planted_containment"] = planted_containment

    return q


# ---------------------------------------------------------------- oracles

# DuckDB dialect building blocks, mirroring sketchy_spark.functions.text
_DW = "regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')), ' +')"
_DH = "(('0x'||substr(md5({x}),1,15))::BIGINT)"
_STOP = ",".join(f"'{w}'" for w in tx.STOPWORDS)
_SHD = (
    "list_distinct(list_transform(range(1, greatest(len(ws) - 2, 1) + 1), "
    "i -> array_to_string(list_slice(ws, i, i + 2), ' ')))"
)
_DOUBLED = (
    "(select doc_id, text from documents "
    "union all select doc_id + 100000, text from documents)"
)
def _cos_d(x: str, y: str) -> str:
    """DuckDB mirror of similarity.cos_expr for arbitrary column names."""
    return (
        f"round(list_sum(list_transform(range(1, len({x}) + 1), "
        f"i -> {x}[i]::DOUBLE * {y}[i])) / "
        f"(sqrt(list_sum(list_transform({x}, x -> x::DOUBLE * x))) * "
        f" sqrt(list_sum(list_transform({y}, x -> x::DOUBLE * x)))), 6)"
    )


_COS_D = _cos_d("a_emb", "b_emb")


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["exact_dedup_groups"] = f"""
        select md5(text) as text_hash, count(*) as n_docs,
               min(doc_id) as representative
        from {_DOUBLED} t group by 1 having count(*) > 1
    """
    o["exact_dup_pairs"] = f"""
        with h as (select doc_id, md5(text) th from {_DOUBLED} t)
        select a.doc_id as a_id, b.doc_id as b_id
        from h a join h b on a.th = b.th and a.doc_id < b.doc_id
    """
    o["token_count"] = """
        select doc_id,
               len(regexp_split_to_array(trim(text), '\\s+')) as ws_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                   as bpe_tokens
        from documents
    """
    o["quality_score"] = f"""
        with f as (
          select doc_id, length(text) as n_chars, {_DW} as ws,
                 round(len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE
                       / length(text), 6) as punct_ratio
          from documents),
        g as (
          select doc_id, n_chars, len(ws) as n_words, punct_ratio,
                 round(len(list_filter(ws, x -> list_contains([{_STOP}], x)))::DOUBLE
                       / len(ws), 6) as stopword_ratio
          from f)
        select doc_id, n_chars, n_words, punct_ratio, stopword_ratio,
               round(least(n_chars / 200.0, 1.0) * 0.4
                     + least(stopword_ratio * 4.0, 1.0) * 0.4
                     + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2, 6)
                   as quality
        from g
    """
    marker_score = ", ".join(
        "len(list_filter(ws, x -> list_contains([{m}], x))) as score_{l}".format(
            m=",".join(f"'{w}'" for w in tx.LANG_MARKERS[l]), l=l
        )
        for l in sorted(tx.LANG_MARKERS)
    )
    langs = sorted(tx.LANG_MARKERS)
    best = "greatest(" + ",".join(f"score_{l}" for l in langs) + ")"
    case = "case " + " ".join(
        f"when score_{l} = best_score then '{l}'" for l in langs
    ) + " end"
    o["lang_id"] = f"""
        with f as (select doc_id, {_DW} as ws from documents),
        s as (select doc_id, {marker_score} from f),
        t as (select *, {best} as best_score from s)
        select doc_id, {case} as pred_lang, best_score from t
    """
    gram_h = _DH.format(x="substr(text, i, 8)")
    o["doc_fingerprint"] = f"""
        with g as (select doc_id,
              list_transform(range(1, greatest(length(text) - 7, 1) + 1),
                             i -> {gram_h}) as gs
            from documents)
        select doc_id, list_min(gs) as min_gram_hash,
               len(list_distinct(gs)) as n_distinct_grams
        from g
    """
    # retained = shingles shared by <= 1000 docs (hot-shingle cap,
    # mirrored from functions/text.py:ngram_jaccard_pairs)
    o["ngram_jaccard_pairs"] = f"""
        with w as (select doc_id, {_DW} as ws from documents),
        s as (select doc_id, unnest({_SHD}) as shingle from w),
        hot as (select shingle from s group by 1 having count(*) > 1000),
        r as (select * from s where shingle not in (select shingle from hot)),
        c as (select doc_id, count(*) as n from r group by 1),
        p as (select a.doc_id a_id, b.doc_id b_id, count(*) shared
              from r a join r b on a.shingle = b.shingle
                                and a.doc_id < b.doc_id
              group by 1, 2)
        select a_id, b_id,
               round(shared::DOUBLE / (ca.n + cb.n - shared), 6) as jaccard
        from p join c ca on p.a_id = ca.doc_id
               join c cb on p.b_id = cb.doc_id
        where shared::DOUBLE / (ca.n + cb.n - shared) >= 0.5
    """
    # One md5 per shingle + per-perm linear mixes of its 30-bit halves —
    # the identical constants and arithmetic as sql_dedup.perm_hash_cols
    # (exact int64 in both engines; fully parenthesized for precedence).
    permvals = ", ".join(
        f"({p}, {a}, {b}, {c})"
        for p, (a, b, c) in enumerate(sd.PERM_MIX[:16])
    )
    mix = (
        f"(((pa::BIGINT * (h & {sd._M30})) + (pb::BIGINT * (h >> 30))"
        f" + pc::BIGINT) & {sd._M60})"
    )
    _MINHASH = f"""
        with w as (select doc_id, {_DW} as ws from documents),
        s as (select doc_id, unnest({_SHD}) as shingle from w),
        hs as (select doc_id, {_DH.format(x="shingle")} as h from s),
        sig as (select doc_id, perm::INT as perm, min({mix}) as minhash
                from hs cross join (values {permvals})
                     as pm(perm, pa, pb, pc)
                group by 1, 2)
    """
    o["minhash_signatures"] = _MINHASH + "select doc_id, perm, minhash from sig"
    o["lsh_candidate_pairs"] = _MINHASH + """
        , banded as (
          select doc_id, (perm // 4) as band,
                 md5(string_agg(minhash::VARCHAR, ',' order by perm))
                     as band_key
          from sig group by doc_id, (perm // 4))
        select distinct a.doc_id as a_id, b.doc_id as b_id
        from banded a join banded b
          on a.band = b.band and a.band_key = b.band_key
         and a.doc_id < b.doc_id
    """
    o["minhash_similarity_pairs"] = _MINHASH + """
        select a.doc_id a_id, b.doc_id b_id, count(*) as matching,
               round(count(*) / 16.0, 6) as est_jaccard
        from sig a join sig b
          on a.perm = b.perm and a.minhash = b.minhash
         and a.doc_id < b.doc_id
        group by 1, 2 having count(*) >= 8
    """
    word_h = _DH.format(x="word")
    bit_sums = ", ".join(
        f"sum(2 * ((h >> {b}) & 1) - 1) as s{b}" for b in range(16)
    )
    sim_expr = " + ".join(f"(case when s{b} > 0 then {1 << b} else 0 end)" for b in range(16))
    _SIMHASH = f"""
        with w as (select doc_id, unnest({_DW}) as word from documents),
        hw as (select doc_id, {word_h} as h from w where word != ''),
        bs as (select doc_id, {bit_sums} from hw group by 1),
        sh as (select doc_id, ({sim_expr})::BIGINT as simhash from bs)
    """
    o["simhash16"] = _SIMHASH + "select doc_id, simhash from sh"
    o["simhash_dup_pairs"] = _SIMHASH + """
        select a.doc_id a_id, b.doc_id b_id,
               bit_count(xor(a.simhash, b.simhash)) as hamming
        from sh a, sh b
        where a.doc_id < b.doc_id
          and bit_count(xor(a.simhash, b.simhash)) <= 3
    """
    sh_h = _DH.format(x="shingle")
    o["scaled_hash_counts"] = f"""
        with w as (select doc_id, {_DW} as ws from documents),
        s as (select doc_id, unnest({_SHD}) as shingle from w)
        select doc_id,
               cast(sum(case when {sh_h} < {int((1 << 60) * 0.001)}
                        then 1 else 0 end) as bigint) as n_scaled,
               count(*) as n_shingles
        from s group by 1
    """
    o["shingle_cardinality"] = f"""
        with w as (select doc_id, {_DW} as ws from documents),
        s as (select doc_id, unnest({_SHD}) as shingle from w)
        select doc_id, count(distinct shingle) as n_distinct_shingles
        from s group by 1
    """

    o["topk_rank"] = """
        select s_nationkey as nationkey, s_suppkey as suppkey,
               round(s_acctbal, 2) as acctbal, rank
        from (select *, row_number() over
                (partition by s_nationkey
                 order by s_acctbal desc, s_suppkey asc) as rank
              from supplier)
        where rank <= 2
    """
    o["result_rows_tsv"] = """
        select concat_ws(chr(9), nationkey, suppkey, cents, rank) as row
        from (select s_nationkey as nationkey, s_suppkey as suppkey,
                     cast(round(round(s_acctbal, 2) * 100) as bigint)
                       as cents, rank
              from (select *, row_number() over
                      (partition by s_nationkey
                       order by s_acctbal desc, s_suppkey asc) as rank
                    from supplier)
              where rank <= 2)
    """
    o["mode_consensus"] = """
        with c as (select c_mktsegment, o_orderpriority, count(*) cnt
                   from customer join orders on c_custkey = o_custkey
                   group by 1, 2)
        select c_mktsegment as mktsegment,
               o_orderpriority as top_priority, cnt
        from (select *, row_number() over
                (partition by c_mktsegment
                 order by cnt desc, o_orderpriority asc) rn from c)
        where rn = 1
    """
    o["cumsum_stream"] = """
        select user_id, event_id,
               round(sum(value) over
                 (partition by user_id order by ts, event_id
                  rows between unbounded preceding and current row), 4)
                   as cum_value
        from events
    """
    o["shared_count_join"] = """
        with t as (select distinct user_id, event_type from events
                   where user_id < 30)
        select a.user_id a_user, b.user_id b_user, count(*) as shared
        from t a join t b on a.event_type = b.event_type
                          and a.user_id < b.user_id
        group by 1, 2
    """

    o["cosine_topk"] = f"""
        with p as (
          select a.vec_id a_id, b.vec_id b_id,
                 a.embedding a_emb, b.embedding b_emb
          from embeddings a, embeddings b
          where a.vec_id < 50 and a.vec_id != b.vec_id),
        s as (select a_id, b_id, {_COS_D} as cosine from p)
        select a_id, b_id, cosine, rank from
          (select *, row_number() over
             (partition by a_id order by cosine desc, b_id asc) as rank
           from s)
        where rank <= 3
    """
    o["embedding_dup_pairs"] = f"""
        with p as (
          select a.vec_id a_id, b.vec_id b_id,
                 a.embedding a_emb, b.embedding b_emb
          from embeddings a, embeddings b where a.vec_id < b.vec_id)
        select a_id, b_id, {_COS_D} as cosine from p
        where {_COS_D} >= 0.45
    """
    bucket = (
        "list_sum(list_transform(range(0, 10), d -> case when "
        "embedding[d + 1] > 0 then (1::BIGINT << d) else 0 end))"
    )
    o["ann_bucketed"] = f"""
        with bkt as (select vec_id, embedding, {bucket} as bucket
                     from embeddings),
        p as (select a.vec_id a_id, b.vec_id b_id,
                     a.embedding a_emb, b.embedding b_emb
              from bkt a join bkt b on a.bucket = b.bucket
                                    and a.vec_id < b.vec_id)
        select a_id, b_id, {_COS_D} as cosine from p
        where {_COS_D} >= 0.30
    """
    def _multiprobe_oracle(bits: int, probes: int, threshold: float) -> str:
        probe_ctes = []
        probe_sels = []
        for t in range(probes):
            bkt = (
                f"list_sum(list_transform(range(0, {bits}), d -> case when "
                f"embedding[(({t * bits} + d) % len(embedding)) + 1] > 0 "
                "then (1::BIGINT << d) else 0 end))"
            )
            probe_ctes.append(
                f"p{t} as (select vec_id, {bkt} as bucket from embeddings)"
            )
            probe_sels.append(
                f"select a.vec_id a_id, b.vec_id b_id from p{t} a "
                f"join p{t} b on a.bucket = b.bucket and a.vec_id < b.vec_id"
            )
        return f"""
        with {", ".join(probe_ctes)},
        c as ({" union ".join(probe_sels)}),
        j as (select c.a_id, c.b_id, ea.embedding a_emb, eb.embedding b_emb
              from c join embeddings ea on c.a_id = ea.vec_id
                     join embeddings eb on c.b_id = eb.vec_id)
        select a_id, b_id, {_COS_D} as cosine from j
        where {_COS_D} >= {threshold}
    """

    o["ann_multiprobe"] = _multiprobe_oracle(4, 12, 0.45)
    o["ann_multiprobe_scale"] = _multiprobe_oracle(
        *sim.ann_params(0.9), 0.30
    )
    # IVF production default (n_cells=ceil(sqrt(n)), nprobe=2,
    # threshold=0.30): hash-sampled centroids (smallest md5 of the id
    # string — Spark md5(cast(vec_id as string)) and DuckDB
    # md5(vec_id::VARCHAR) agree byte-for-byte), rounded-cosine
    # assignment with cid-asc tie-break, top-2 cells per vector,
    # same-cell candidates, exact verify. `limit 23` IS the derived
    # default at the driver's sf0.01 (ceil(sqrt(500)) = 23) — the
    # oracle pins what ann_ivf computes for itself from emb.count().
    # cosine mirrored as dot * a_inv * b_inv (inverse norms computed once
    # per vector, exactly as ann_ivf does to keep the interpreted
    # higher-order-function work linear in n, not in candidate pairs).
    ivf_inv = (
        "(1.0::DOUBLE / sqrt(list_sum("
        "list_transform({x}, v -> v::DOUBLE * v))))"
    )
    ivf_dot = (
        "list_sum(list_transform(range(1, len({x}) + 1), "
        "i -> {x}[i]::DOUBLE * {y}[i]))"
    )
    ivf_vcos = (
        f"round({ivf_dot.format(x='a_emb', y='b_emb')}"
        " * a_inv * b_inv, 6)"
    )
    o["ann_ivf"] = f"""
        with embn as (
          select vec_id, embedding,
                 {ivf_inv.format(x="embedding")} as inv_norm
          from embeddings),
        cent as (
          select vec_id cid, embedding c_emb, inv_norm c_inv from embn
          order by md5(vec_id::VARCHAR), vec_id limit 23),
        scored as (
          select e.vec_id, c.cid,
                 round({ivf_dot.format(x="e.embedding", y="c.c_emb")}
                       * e.inv_norm * c.c_inv, 6) as ccos
          from embn e cross join cent c),
        cells as (
          select vec_id, cid from
            (select vec_id, cid, row_number() over
               (partition by vec_id order by ccos desc, cid asc) rn
             from scored)
          where rn <= 2),
        c as (select distinct a.vec_id a_id, b.vec_id b_id
              from cells a join cells b on a.cid = b.cid
                                        and a.vec_id < b.vec_id),
        j as (select c.a_id, c.b_id,
                     ea.embedding a_emb, ea.inv_norm a_inv,
                     eb.embedding b_emb, eb.inv_norm b_inv
              from c join embn ea on c.a_id = ea.vec_id
                     join embn eb on c.b_id = eb.vec_id)
        select a_id, b_id, {ivf_vcos} as cosine from j
        where {ivf_vcos} >= 0.30
    """
    # planted_clusters / planted_verified_pairs / planted_containment:
    # intentionally no oracle (iterative CC + Arrow murmur kernels are not
    # SQL-expressible) -> driver records rows-only checks.
    return o
