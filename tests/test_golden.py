"""Golden kernel vectors (FIXTURES.md §4) — regression pins for the kernels."""

import json
import pathlib

import numpy as np

from sketchy_spark.hashing import batch_shingle_hashes, bottom_s, shingle_windows

GOLD = pathlib.Path(__file__).parent / "golden"


def test_shingles_k16():
    gold = json.loads((GOLD / "shingles_k16.json").read_text())
    for s, want in gold.items():
        w = shingle_windows(s.encode(), 16)
        got = ["".join(chr(c) for c in row) for row in w.tolist()]
        assert got == want, s


def test_murmur_seeds():
    for seed, fname in [(0, "murmur_seed0.json"), (42, "murmur_seed42.json")]:
        gold = json.loads((GOLD / fname).read_text())
        for s, want in gold.items():
            h, _ = batch_shingle_hashes([s.encode()], 16, seed)
            assert [int(x) for x in h.tolist()] == want, (seed, s)


def test_bottom_s_golden():
    gold = json.loads((GOLD / "bottoms_s1000.json").read_text())
    for inp, want in zip(gold["inputs"], gold["bottom_s1000"]):
        got = bottom_s(np.array(inp, dtype=np.uint64), 1000).tolist()
        assert [int(x) for x in got] == want


def test_shared_pairs_golden():
    # two-pointer merge semantics == set-intersection count on sorted arrays
    # (/root/reference/src/sketchy.rs:419-459), incl. scaled max-hash clamp
    gold = json.loads((GOLD / "shared_pairs.json").read_text())
    for case in gold:
        a = np.array(case["a"], dtype=np.uint64)
        b = np.array(case["b"], dtype=np.uint64)
        if case["max_hash"] is not None:
            a = a[a < case["max_hash"]]
            b = b[b < case["max_hash"]]
        assert len(np.intersect1d(a, b)) == case["shared"]
