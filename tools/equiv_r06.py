#!/usr/bin/env python
"""Bit-exact old-vs-new equivalence check for r6 query optimizations.

Loads the ROUND-START implementation of a module from git (HEAD at the
round-start commit, or any rev given in $EQUIV_BASE_REV) under an alias
module name, builds each declared query both ways on the real sf
fixtures, and compares the collected row sets EXACTLY (floats compared
by bit pattern via float.hex()). Any mismatch prints the differing rows
and exits nonzero.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

BASE_REV = os.environ.get("EQUIV_BASE_REV", "d7a55b6")


def load_old(relpath: str, alias: str):
    src = subprocess.run(
        ["git", "-C", str(ROOT), "show", f"{BASE_REV}:{relpath}"],
        check=True, capture_output=True, text=True,
    ).stdout
    tmp = Path(tempfile.mkdtemp()) / f"{alias}.py"
    tmp.write_text(src)
    spec = importlib.util.spec_from_file_location(alias, tmp)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[alias] = mod
    spec.loader.exec_module(mod)
    return mod


def canon(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append(("f", float(v).hex()))
            else:
                vals.append(("v", v))
        out.append(tuple(vals))
    return sorted(out)


def compare(name, old_df, new_df) -> bool:
    if old_df.schema != new_df.schema:
        print(f"FAIL {name}: schema {old_df.schema} != {new_df.schema}")
        return False
    o = canon(old_df.collect())
    n = canon(new_df.collect())
    if o != n:
        so, sn = set(o), set(n)
        print(f"FAIL {name}: {len(o)} vs {len(n)} rows")
        for r in list(so - sn)[:5]:
            print("  only-old:", r)
        for r in list(sn - so)[:5]:
            print("  only-new:", r)
        return False
    print(f"OK   {name}: {len(o)} rows identical")
    return True


def main() -> None:
    from sketchy_spark.functions import similarity as new_sim
    from sketchy_spark.session import get_spark

    old_sim = load_old(
        "sketchy_spark/functions/similarity.py", "similarity_old_r6"
    )
    spark = get_spark("equiv-r06", master="local[16]")
    ok = True
    for sf in ("0.01", "0.1"):
        emb = spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")
        cases = [
            ("cosine_topk", lambda m: m.cosine_topk_bruteforce(emb)),
            ("embedding_dup_pairs",
             lambda m: m.embedding_dup_pairs(emb, threshold=0.45)),
            ("ann_bucketed",
             lambda m: m.ann_bucketed(emb, threshold=0.30, bits=10)),
            ("ann_multiprobe",
             lambda m: m.ann_multiprobe(emb, threshold=0.45, bits=4,
                                        probes=12)),
            ("ann_multiprobe_scale",
             lambda m: m.ann_multiprobe(
                 emb, threshold=0.30,
                 bits=m.ann_params(0.9)[0], probes=m.ann_params(0.9)[1])),
            ("ann_ivf", lambda m: m.ann_ivf(emb, threshold=0.30)),
        ]
        for name, build in cases:
            ok &= compare(f"sf{sf}/{name}", build(old_sim), build(new_sim))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
