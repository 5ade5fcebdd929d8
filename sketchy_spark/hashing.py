"""Vectorized hashing kernels (pure numpy — no Spark, no per-row Python).

These run inside Arrow-batched pandas UDFs (``input_hint`` mandates
vectorized UDFs). The hash is MurmurHash3 x64_128 (low 64 bits), the hash the
reference uses via finch [finch, public knowledge — murmurhash3 in
``/root/reference/Cargo.lock:230``]; seed 0 default, 42 replicates Mash
(``/root/reference/src/cli.rs:46-48``). Shingles are byte k-grams of the raw
content (the code-domain analogue of k-mers; no reverse-complement
canonicalization — that is DNA-specific, SURVEY §1.3).

Unsigned order note (SURVEY §4.2): Rust compares u64; Spark LongType is
signed. All selection here happens in uint64 domain; :func:`u64_to_i64`
applies the order-preserving shift ``x - 2**63`` before values leave numpy,
so downstream Spark SQL comparisons/sorts preserve unsigned order.
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)
_F1 = np.uint64(0xFF51AFD7ED558CCD)
_F2 = np.uint64(0xC4CEB9FE1A85EC53)
_M5 = np.uint64(5)
_N1 = np.uint64(0x52DCE729)
_N2 = np.uint64(0x38495AB5)
_U64_SHIFT = np.uint64(1) << np.uint64(63)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    inv = np.uint64(64 - r)
    return (x << r_) | (x >> inv)


def _fmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * _F1
    k = k ^ (k >> np.uint64(33))
    k = k * _F2
    k = k ^ (k >> np.uint64(33))
    return k


def _le_u64(block: np.ndarray) -> np.ndarray:
    """Read a contiguous (n, 8) uint8 slice as little-endian uint64."""
    return np.ascontiguousarray(block).view("<u8").ravel()


def murmur3_x64_128_low(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    """MurmurHash3 x64_128, low 64 bits (h1), over n uniform-length keys.

    ``keys``: (n, L) uint8 matrix. Returns (n,) uint64. Public-domain
    algorithm (Appleby); implemented from the published spec.
    """
    if keys.ndim != 2 or keys.dtype != np.uint8:
        raise ValueError("keys must be a 2-D uint8 matrix")
    n, length = keys.shape
    with np.errstate(over="ignore"):
        h1 = np.full(n, np.uint64(seed & 0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
        h2 = h1.copy()
        nblocks = length // 16
        for i in range(nblocks):
            k1 = _le_u64(keys[:, i * 16 : i * 16 + 8])
            k2 = _le_u64(keys[:, i * 16 + 8 : i * 16 + 16])
            k1 = _rotl(k1 * _C1, 31) * _C2
            h1 = h1 ^ k1
            h1 = (_rotl(h1, 27) + h2) * _M5 + _N1
            k2 = _rotl(k2 * _C2, 33) * _C1
            h2 = h2 ^ k2
            h2 = (_rotl(h2, 31) + h1) * _M5 + _N2
        tail_len = length - nblocks * 16
        if tail_len > 0:
            pad = np.zeros((n, 16), dtype=np.uint8)
            pad[:, :tail_len] = keys[:, nblocks * 16 :]
            t1 = _le_u64(pad[:, :8])
            t2 = _le_u64(pad[:, 8:16])
            if tail_len > 8:
                h2 = h2 ^ (_rotl(t2 * _C2, 33) * _C1)
            h1 = h1 ^ (_rotl(t1 * _C1, 31) * _C2)
        ln = np.uint64(length)
        h1 = h1 ^ ln
        h2 = h2 ^ ln
        h1 = h1 + h2
        h2 = h2 + h1
        h1 = _fmix64(h1)
        h2 = _fmix64(h2)
        h1 = h1 + h2
    return h1


def hash_u64_of_int(value: int, seed: int = 0) -> int:
    """Deterministic u64 from an integer (for permutation constants)."""
    key = np.frombuffer(int(value).to_bytes(8, "little"), dtype=np.uint8)
    return int(murmur3_x64_128_low(key.reshape(1, 8), seed)[0])


def perm_constants(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) multiply-shift constants for k-permutation MinHash, derived
    from murmur so they are stable across numpy versions."""
    a = np.array(
        [hash_u64_of_int(j, seed) | 1 for j in range(num_perm)], dtype=np.uint64
    )
    b = np.array(
        [hash_u64_of_int(j, seed + 1) for j in range(num_perm)], dtype=np.uint64
    )
    return a, b


def shingle_windows(content: bytes, k: int) -> np.ndarray:
    """(m, k) uint8 matrix of byte k-grams in positional order.

    Content shorter than k yields one zero-padded whole-content shingle
    (deviation from the reference, which emits no k-mers for short
    sequences — we keep tiny files dedupable; documented in SURVEY §1.3).
    """
    buf = np.frombuffer(content, dtype=np.uint8)
    if buf.size == 0:
        return np.zeros((0, k), dtype=np.uint8)
    if buf.size < k:
        row = np.zeros((1, k), dtype=np.uint8)
        row[0, : buf.size] = buf
        return row
    return np.lib.stride_tricks.sliding_window_view(buf, k)


def batch_shingle_hashes(
    contents: list[bytes], k: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Hash every positional shingle of every content in ONE murmur call.

    Returns (hashes: uint64 concat of all docs' positional shingle hashes,
    counts: int64 per-doc shingle counts). Batching the murmur call across
    the whole Arrow batch is the main vectorization win.
    """
    mats = [shingle_windows(c, k) for c in contents]
    counts = np.array([m.shape[0] for m in mats], dtype=np.int64)
    if counts.sum() == 0:
        return np.zeros(0, dtype=np.uint64), counts
    stacked = np.vstack(mats)
    return murmur3_x64_128_low(stacked, seed), counts


def bottom_s(distinct_sorted: np.ndarray, s: int) -> np.ndarray:
    """Bottom-s MinHash: s numerically smallest distinct hashes, ascending
    (the reference's sorted-hashes invariant, src/sketchy.rs:414-418)."""
    return distinct_sorted[:s]


def scaled_filter(distinct_sorted: np.ndarray, max_hash: int) -> np.ndarray:
    """FracMinHash: keep hash < u64::MAX*scale (src/sketchy.rs:441-457)."""
    return distinct_sorted[distinct_sorted < np.uint64(max_hash)]


def perm_minhash(
    distinct: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Fixed-width signature sig[j] = min_x (a[j]*x + b[j] mod 2^64)."""
    if distinct.size == 0:
        return np.full(a.shape[0], np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return (distinct[:, None] * a[None, :] + b[None, :]).min(axis=0)


def simhash_batch(all_distinct: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """64-bit Charikar SimHash per doc over concatenated distinct-hash arrays.

    ``offsets``: start index of each doc in ``all_distinct`` (len = ndocs).
    Bit b of the result is 1 iff >= half the doc's shingle hashes have bit b
    set. Returns (ndocs,) uint64.
    """
    ndocs = offsets.shape[0]
    if all_distinct.size == 0:
        return np.zeros(ndocs, dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((all_distinct[:, None] >> shifts[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    sums = np.add.reduceat(bits, offsets, axis=0)  # (ndocs, 64)
    counts = np.diff(np.append(offsets, all_distinct.size)).reshape(-1, 1)
    majority = (2 * sums >= counts) & (counts > 0)
    out = (majority.astype(np.uint64) << shifts[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return out


def winnow(pos_hashes: np.ndarray, window: int) -> np.ndarray:
    """Winnowing fingerprints (Schleimer et al. 2003): distinct minima of a
    sliding window over positional shingle hashes. Position-robust document
    fingerprints — shared fingerprints signal exact-substring overlap
    (our suffix-array-containment stand-in's candidate generator, G3)."""
    if pos_hashes.size == 0:
        return pos_hashes
    if pos_hashes.size <= window:
        return np.unique(pos_hashes.min(keepdims=True))
    mins = np.lib.stride_tricks.sliding_window_view(pos_hashes, window).min(axis=1)
    return np.unique(mins)


def u64_to_i64(u: np.ndarray) -> np.ndarray:
    """Order-preserving uint64 -> int64 shift (x - 2^63); inverse of
    :func:`i64_to_u64`. Keeps unsigned comparison semantics in LongType."""
    return (u ^ _U64_SHIFT).view(np.int64)


def i64_to_u64(i: np.ndarray) -> np.ndarray:
    return (i.view(np.uint64) ^ _U64_SHIFT)
