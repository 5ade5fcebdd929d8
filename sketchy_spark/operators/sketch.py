"""Sketch stage: files -> signatures, one ``mapInPandas`` pass.

The engine's only UDF surface (SURVEY §2.6): everything downstream is
built-in Spark SQL. Per Arrow batch, one fused numpy pass computes
shingle -> murmur3 -> {bottom-s | scaled} sketch, OPH LSH signature
(one-permutation hashing + densification — O(d), not O(d*p)),
64-bit SimHash, and winnowing fingerprints — the Spark
re-expression of the reference's per-file sketch fold
(``/root/reference/src/sketchy.rs:465-494``, rayon par_iter ->
partition parallelism; ``:291-302`` single-pass fold -> fused numpy pass).

Column contract (the ``signatures`` table, SURVEY §1.2):

- ``file_id``      string  — name projection, repo/path (src/sketchy.rs:484)
- ``repo path commit lang`` — carried metadata ("genotype" analogue)
- ``sha256``       string  — per-row invariant (BASELINE.json input_hint)
- ``n_bytes``      long    — seq_length analogue (src/sketchy.rs:481)
- ``n_shingles``   long    — num_valid_kmers analogue
- ``sig``          array<long> — MinHash sketch, ascending unsigned order
  stored as shifted int64 (SURVEY §4.2); sorted invariant mirrors
  src/sketchy.rs:414-418
- ``sig_perm``     array<int> — fixed-width num_perm signature (LSH, G1);
  low 32 bits per OPH slot (equality-only consumers, SURVEY G1/G4)
- ``simhash``      long    — Charikar fingerprint (G2)
- ``fingerprints`` array<long> — winnowing minima (containment pass, G3)

Content is intentionally NOT in the output: downstream stages scan a
narrow table (column pruning at 100 TB scale); verification re-joins
content for candidate pairs only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from sketchy_spark.config import SketchConfig
from sketchy_spark.hashing import (
    bottom_s,
    fold_shingle_hashes,
    oph_minhash,
    scaled_filter,
    simhash64,
    u64_to_i64,
    winnow,
)

SIGNATURE_SCHEMA = (
    "file_id string, repo string, path string, commit string, lang string, "
    "sha256 string, n_bytes long, n_shingles long, sig array<long>, "
    "sig_perm array<int>, simhash long, fingerprints array<long>"
)

SLIM_SCHEMA = (
    "file_id string, repo string, path string, commit string, lang string, "
    "sha256 string, n_bytes long, n_shingles long, "
    "sig_perm array<int>, simhash long, fingerprints array<long>"
)

_CARRY = ["file_id", "repo", "path", "commit", "lang", "sha256", "n_bytes"]


def _sketch_batches(
    cfg: SketchConfig, with_sig: bool = True, with_fp: bool = True
):
    max_hash = cfg.max_hash_u64

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # content arrives as binary (cast JVM-side): Arrow hands the
            # utf-8 bytes straight through — no per-doc re-encode pass
            contents = list(pdf["content"])

            sigs, perms, fps, sims = [], [], [], []

            def fold(_i: int, seg: np.ndarray) -> None:
                # one doc's positional hashes, handed in while the fused
                # group buffer is cache-hot (hashing.fold_shingle_hashes,
                # r6 — the two-pass batch array was the DRAM-contended
                # traffic at 32 workers)
                distinct = np.unique(seg)  # sorted ascending (invariant)
                if with_sig:
                    if cfg.mode == "scaled":
                        sel = scaled_filter(distinct, max_hash)
                    else:
                        sel = bottom_s(distinct, cfg.s)
                    sigs.append(u64_to_i64(sel))
                # low 32 bits per OPH slot, stored as int32: every consumer
                # compares slots for EQUALITY only (band hashing, cascade
                # slot-match), so truncation costs a 2^-32 per-slot false
                # match and halves the signature cache + every sig_perm
                # shuffle/scan — the hottest bandwidth in the pipeline
                perms.append(
                    oph_minhash(distinct, cfg.num_perm)
                    .astype(np.uint32)
                    .view(np.int32)
                )
                if with_fp:
                    fps.append(u64_to_i64(winnow(seg, cfg.winnow_window)))
                sims.append(simhash64(distinct))

            counts = fold_shingle_hashes(contents, cfg.k, cfg.seed, fold)

            out = pdf[_CARRY].copy()
            out["n_shingles"] = counts
            if with_sig:
                out["sig"] = sigs
            out["sig_perm"] = perms
            out["simhash"] = u64_to_i64(np.array(sims, dtype=np.uint64))
            if with_fp:
                out["fingerprints"] = fps
            cols = _CARRY + ["n_shingles"]
            cols += ["sig"] if with_sig else []
            cols += ["sig_perm", "simhash"]
            cols += ["fingerprints"] if with_fp else []
            yield out[cols]

    return fn


def sketch_files(
    files: DataFrame, cfg: SketchConfig, with_sig: bool = True,
    with_fp: bool = True,
) -> DataFrame:
    """files(repo, path, commit, lang, content) -> signatures DataFrame.

    JVM-side column ops (sha256, lengths, name projection) stay in
    whole-stage codegen; only the hash kernels cross into the Arrow UDF.

    ``with_sig=False`` omits the bottom-s ``sig`` column (8 KB/row at
    s=1000 — the bulk of Arrow transfer and cache footprint). The
    pipeline's cascade re-sketches just the borderline files with
    ``with_sig=True``; the full table remains the checkpointed/parity
    form (SURVEY §1.2).
    """
    prepared = files.select(
        F.concat_ws("/", "repo", "path").alias("file_id"),
        "repo",
        "path",
        "commit",
        "lang",
        F.sha2(F.col("content"), 256).alias("sha256"),  # row invariant
        F.octet_length("content").cast("long").alias("n_bytes"),
        F.col("content").cast("binary").alias("content"),
    )
    schema = SIGNATURE_SCHEMA if with_sig else SLIM_SCHEMA
    if not with_fp:
        schema = schema.replace(", fingerprints array<long>", "")
    return prepared.mapInPandas(
        _sketch_batches(cfg, with_sig, with_fp), schema=schema
    )
