"""Candidate verification (G2/G3/G4): Jaccard estimate, SimHash distance,
exact-substring containment.

Two equivalent Jaccard-verification implementations:

- :func:`verified_pairs_sql` — built-in array SQL (array_union/sort/
  intersect). Oracle-friendly, but Catalyst's array set-ops build hash
  sets per row: ~ms per 1000-element pair.
- :func:`verified_pairs` (default) — Arrow-batched numpy sorted-merge:
  the reference's two-pointer kernel (src/sketchy.rs:419-459) done with
  np.intersect1d/np.union1d on the already-sorted sigs, ~30us per pair.
  Same estimator, ~100x less CPU; this is the honest re-expression of
  the reference's "assumes hashes are sorted" fast path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from sketchy_spark.config import SketchConfig


def _with_sides(
    pairs: DataFrame, signatures: DataFrame, cols: list[str],
    broadcast_pairs: bool | None = None,
) -> DataFrame:
    """Attach both sides' signature columns to each pair.

    Plain path: two shuffle joins — but each shuffles the FULL signatures
    table (wide: sig arrays), which dwarfs the pair set. Broadcast path
    (default when the pair count is modest): broadcast the pair ids into
    two scan-side hash joins of signatures (no signature shuffle), then
    join the two halves on the pair key — shuffles only O(|pairs|) rows.
    At 100 TB the pair table after LSH is orders of magnitude smaller
    than the signatures table, so this is the scale-correct default;
    pass broadcast_pairs=False when candidate volume explodes.
    """
    if broadcast_pairs is None:
        broadcast_pairs = True
    a = signatures.select(
        F.col("file_id").alias("a_id"),
        *[F.col(c).alias(f"a_{c}") for c in cols],
    )
    b = signatures.select(
        F.col("file_id").alias("b_id"),
        *[F.col(c).alias(f"b_{c}") for c in cols],
    )
    if not broadcast_pairs:
        return pairs.join(a, "a_id").join(b, "b_id")
    left = F.broadcast(pairs).join(a, "a_id")
    right = F.broadcast(pairs).join(b, "b_id")
    return left.join(right, ["a_id", "b_id"])


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def verified_pairs(
    pairs: DataFrame, signatures: DataFrame, cfg: SketchConfig,
    broadcast_pairs: bool | None = None,
) -> DataFrame:
    """Arrow-kernel Jaccard verification (default path; see module doc).

    Estimator identical to :func:`verified_pairs_sql`: with
    U = bottom_s(A ∪ B), j ≈ |U ∩ A ∩ B| / |U|. Sorted-merge per pair —
    the reference's two-pointer kernel — plus vectorized simhash hamming.
    """
    df = _with_sides(pairs, signatures, ["sig", "simhash"], broadcast_pairs)
    s = cfg.s
    tau = cfg.jaccard_threshold

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            jac = np.empty(n, dtype=np.float64)
            a_sigs = pdf["a_sig"].to_numpy()
            b_sigs = pdf["b_sig"].to_numpy()
            for i in range(n):
                a = np.asarray(a_sigs[i], dtype=np.int64)
                b = np.asarray(b_sigs[i], dtype=np.int64)
                union = np.union1d(a, b)
                k = min(union.size, s)
                if k == 0:
                    jac[i] = 0.0
                    continue
                ab = np.intersect1d(a, b, assume_unique=True)
                # U = union[:k]; x in U iff x <= union[k-1] (sorted distinct)
                inter3 = np.searchsorted(ab, union[k - 1], side="right")
                jac[i] = inter3 / k
            x = (
                pdf["a_simhash"].to_numpy(dtype=np.int64)
                ^ pdf["b_simhash"].to_numpy(dtype=np.int64)
            )
            ham = _POPCNT8[x.view(np.uint8).reshape(n, 8)].sum(axis=1)
            out = pd.DataFrame(
                {
                    "a_id": pdf["a_id"],
                    "b_id": pdf["b_id"],
                    "jaccard": jac,
                    "hamming": ham,
                }
            )
            yield out[out["jaccard"] >= tau]

    return df.select("a_id", "b_id", "a_sig", "b_sig", "a_simhash", "b_simhash").mapInPandas(
        fn, schema="a_id string, b_id string, jaccard double, hamming long"
    )


def verified_pairs_cascade(
    pairs: DataFrame, signatures: DataFrame, cfg: SketchConfig,
    margin: float = 0.15, files: DataFrame | None = None,
    n_files: int | None = None,
) -> DataFrame:
    """Two-stage verification cascade (SURVEY G4: full estimator only for
    borderline pairs).

    Stage 1 transfers only the 128-slot OPH signature (+simhash) per pair
    and computes est = matching_slots / num_perm. Pairs with
    est >= tau + margin are accepted, est < tau - margin rejected
    (binomial error at 4-sigma ~ 1e-5 — negligible vs the 0.99 recall
    budget). Stage 2 runs the bottom-s estimator only on the borderline
    band. Cuts Arrow transfer ~7x (sig_perm is 1KB vs sig's 8KB).

    Small-document guard: OPH rotation densification is biased for docs
    with fewer shingles than signature slots (A={x}, B={x,y} estimates
    0.99 vs true 0.5), so any pair where either side has
    n_shingles < num_perm bypasses BOTH the accept and the reject branch
    and goes straight to stage-2 exact verification (for such docs the
    bottom-s sketch is the full set, so stage 2 is exact).

    ``n_files``: pass the already-known signature count (e.g. from the
    pipeline's eager-cache count) to avoid a second full-table count —
    each driver barrier is serial time that caps scaling efficiency.
    """
    tau = cfg.jaccard_threshold
    num_perm = cfg.num_perm
    min_sh = num_perm  # densification-bias bound (see docstring)
    spark = signatures.sparkSession

    # Resident-collection strategy (the reference keeps every reference
    # sketch in memory and scans it per query, src/sketchy.rs:81): when
    # the slim signature map fits an executor, ship (file_id -> sig_perm,
    # simhash) as a broadcast variable and evaluate pairs map-side — no
    # attach joins at all. Falls back to scan-side joins beyond the cap.
    if n_files is None:
        n_files = signatures.count()
    resident_ok = n_files * (cfg.num_perm * 8 + 24) < 1_500_000_000

    if resident_ok:
        # Arrow-native collect: flatten the fixed-width sig_perm lists
        # into an (n, num_perm) int64 matrix zero-copy — no pandas object
        # column, no per-row vstack (both are serial driver time).
        tbl = (
            signatures.select("file_id", "sig_perm", "simhash", "n_shingles")
            .toArrow()
            .combine_chunks()
        )
        ids = tbl["file_id"].to_pylist()
        flat = tbl["sig_perm"].chunk(0).flatten() if tbl["sig_perm"].num_chunks else None
        if flat is not None and len(ids):
            sig_mat = np.asarray(flat).reshape(len(ids), num_perm)
        else:
            sig_mat = np.zeros((0, num_perm), dtype=np.int64)
        sim_vec = tbl["simhash"].to_numpy(zero_copy_only=False).astype(np.int64)
        nsh_vec = tbl["n_shingles"].to_numpy(zero_copy_only=False).astype(np.int64)
        index = {f: i for i, f in enumerate(ids)}
        bc = spark.sparkContext.broadcast((index, sig_mat, sim_vec, nsh_vec))

        def stage1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            idx, mat, sim, nsh = bc.value
            for pdf in batches:
                n = len(pdf)
                if n == 0:
                    continue
                ai = np.array([idx[x] for x in pdf["a_id"]], dtype=np.int64)
                bi = np.array([idx[x] for x in pdf["b_id"]], dtype=np.int64)
                est = (mat[ai] == mat[bi]).sum(axis=1) / num_perm
                x = sim[ai] ^ sim[bi]
                ham = _POPCNT8[x.view(np.uint8).reshape(n, 8)].sum(axis=1)
                small = (nsh[ai] < min_sh) | (nsh[bi] < min_sh)
                out = pd.DataFrame(
                    {
                        "a_id": pdf["a_id"],
                        "b_id": pdf["b_id"],
                        "jaccard": est,
                        "hamming": ham,
                        "needs_exact": small,
                    }
                )
                yield out[small | (est >= tau - margin)]

        src = pairs
    else:
        def stage1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                n = len(pdf)
                if n == 0:
                    continue
                a = np.vstack(pdf["a_sig_perm"].to_numpy())
                b = np.vstack(pdf["b_sig_perm"].to_numpy())
                est = (a == b).sum(axis=1) / num_perm
                x = (
                    pdf["a_simhash"].to_numpy(dtype=np.int64)
                    ^ pdf["b_simhash"].to_numpy(dtype=np.int64)
                )
                ham = _POPCNT8[x.view(np.uint8).reshape(n, 8)].sum(axis=1)
                small = (
                    (pdf["a_n_shingles"].to_numpy(dtype=np.int64) < min_sh)
                    | (pdf["b_n_shingles"].to_numpy(dtype=np.int64) < min_sh)
                )
                out = pd.DataFrame(
                    {
                        "a_id": pdf["a_id"],
                        "b_id": pdf["b_id"],
                        "jaccard": est,
                        "hamming": ham,
                        "needs_exact": small,
                    }
                )
                yield out[small | (est >= tau - margin)]

        src = _with_sides(
            pairs, signatures, ["sig_perm", "simhash", "n_shingles"]
        ).select(
            "a_id", "b_id", "a_sig_perm", "b_sig_perm", "a_simhash",
            "b_simhash", "a_n_shingles", "b_n_shingles",
        )

    coarse = src.mapInPandas(
        stage1,
        schema=(
            "a_id string, b_id string, jaccard double, hamming long, "
            "needs_exact boolean"
        ),
    ).persist()
    # Eager: accepted and the borderline re-sketch broadcast are separate
    # query stages; AQE materializes them concurrently, and concurrent
    # consumers of a lazily-persisted frame each run their own evaluation.
    coarse.count()
    accepted = coarse.where(
        (~F.col("needs_exact")) & (F.col("jaccard") >= tau + margin)
    ).drop("needs_exact")
    borderline = coarse.where(
        F.col("needs_exact") | (F.col("jaccard") < tau + margin)
    ).select("a_id", "b_id")
    if "sig" in signatures.columns:
        sig_source = signatures
    else:
        # slim signatures (no bottom-s column): re-sketch only the
        # borderline files — O(|borderline|), not O(corpus)
        if files is None:
            raise ValueError(
                "signatures lack 'sig' and no files source given"
            )
        from sketchy_spark.operators.sketch import sketch_files

        ids = (
            borderline.select(F.col("a_id").alias("file_id"))
            .unionAll(borderline.select(F.col("b_id").alias("file_id")))
            .distinct()
        )
        wanted = files.join(
            F.broadcast(ids),
            F.concat_ws("/", "repo", "path") == F.col("file_id"),
            "left_semi",
        )
        sig_source = sketch_files(wanted, cfg, with_sig=True)
    refined = verified_pairs(borderline, sig_source, cfg)
    return accepted.unionByName(refined)


def verified_pairs_sql(
    pairs: DataFrame, signatures: DataFrame, cfg: SketchConfig,
    broadcast_pairs: bool | None = None,
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
    df = _with_sides(pairs, signatures, ["sig", "simhash"], broadcast_pairs)
    # materialize union_s as a column so the sort/union evaluates once per
    # row instead of once per referencing expression
    staged = df.select(
        "a_id",
        "b_id",
        "a_sig",
        "b_sig",
        F.slice(F.array_sort(F.array_union("a_sig", "b_sig")), 1, cfg.s).alias(
            "union_s"
        ),
        F.bit_count(
            F.col("a_simhash").bitwiseXOR(F.col("b_simhash"))
        ).alias("hamming"),
    )
    inter3 = F.array_intersect(
        F.array_intersect("union_s", "a_sig"), F.col("b_sig")
    )
    return (
        staged.select(
            "a_id",
            "b_id",
            "hamming",
            F.when(
                F.size("union_s") > 0,
                F.size(inter3) / F.size("union_s"),
            ).otherwise(F.lit(0.0)).alias("jaccard"),
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
        "file_id", F.explode("fingerprints").alias("fp")
    )
    # ONE groupBy over the exploded fingerprints (the plan-shape lesson
    # from the band join): collect member lists per fingerprint, emit
    # pairs via pipelined double-explode. Hot fingerprints (shared
    # license headers / generated code — quadratic, no pair signal) are
    # excluded by the same size cap inside the aggregate (SURVEY §4.1).
    groups = (
        fp.groupBy("fp")
        .agg(F.collect_list("file_id").alias("ids"))
        .where(F.size("ids") >= 2)  # singleton fps carry no pair signal
        .persist()
    )
    groups.count()  # eager: two consumers + AQE would double-evaluate
    pairs = (
        groups.where(F.size("ids") <= cfg.fp_skew_cap)
        .select(F.explode("ids").alias("a_id"), "ids")
        .select("a_id", F.explode("ids").alias("b_id"))
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("shared_fp"))
    )
    # retained-fingerprint count per file = total minus hot memberships
    hot = groups.where(F.size("ids") > cfg.fp_skew_cap).select("fp")
    n_hot = (
        fp.join(F.broadcast(hot), "fp")
        .groupBy("file_id")
        .agg(F.count("*").alias("n_hot"))
    )
    counts = (
        signatures.select("file_id", F.size("fingerprints").alias("n_all"))
        .join(n_hot, "file_id", "left")
        .select(
            "file_id",
            (F.col("n_all") - F.coalesce("n_hot", F.lit(0))).alias("n_fp"),
        )
    )
    a_cnt = counts.select(
        F.col("file_id").alias("a_id"), F.col("n_fp").alias("a_nfp")
    )
    b_cnt = counts.select(
        F.col("file_id").alias("b_id"), F.col("n_fp").alias("b_nfp")
    )
    return (
        pairs.join(a_cnt, "a_id")
        .join(b_cnt, "b_id")
        .withColumn(
            "containment",
            F.col("shared_fp") / F.greatest(F.least("a_nfp", "b_nfp"), F.lit(1)),
        )
        .where(F.col("containment") >= cfg.containment_threshold)
        .select("a_id", "b_id", "containment")
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
