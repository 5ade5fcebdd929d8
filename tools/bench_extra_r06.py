#!/usr/bin/env python
"""Round-6 extra measurements (bench.py is frozen; guide §1.4 says put
side benchmarks in their own file): the 500k-vector ANN scaling row
(VERDICT r5 stretch #7) for the sparse derived config and for IVF.

The sparse config's density criterion promises constant bucket
occupancy as n grows — (bits, probes) widen with log2(n) so the
per-probe join fan-out stays flat. 5k/50k rows live in bench.py --sf1;
this adds 500k on the same deterministic synthetic embeddings, timing
with the noop sink so the computation is measured, not a collect.
At n=500k the derivation is ann_params(0.9, n, dim=64) -> (17, 32):
the r6 probe-diversity cap is satisfied (64/gcd(17,64) = 64 distinct
windows >= 32 probes), i.e. this also exercises the production
derivation path at its design scale.

Usage: python tools/bench_extra_r06.py [n_vec ...]   (default 500000)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import pyspark.sql.functions as F

    from sketchy_spark.functions.similarity import (
        ann_ivf,
        ann_multiprobe,
        ann_params,
    )
    from sketchy_spark.session import get_spark

    ns = [int(a) for a in sys.argv[1:]] or [500_000]
    spark = get_spark(
        "bench-extra-r06", master="local[32]", shuffle_partitions=64
    )

    def synth(n: int):
        # same deterministic synthetic table as bench.synth_embeddings
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(0, 63), d -> "
                "cast(pmod(xxhash64(id, d), 20000) as float) "
                "/ 10000.0 - 1.0)"
            ).alias("embedding"),
        )

    def timed_noop(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    # warmup: codegen + JIT on a small instance of both plans
    timed_noop(ann_multiprobe(synth(2000), threshold=0.9))
    timed_noop(ann_ivf(synth(2000), threshold=0.30))

    out = {}
    for n in ns:
        emb = synth(n)
        bits, probes = ann_params(0.9, n=n, dim=64)
        spark.sparkContext.setJobDescription(
            f"extra: ann_multiprobe n={n} derived ({bits},{probes})"
        )
        t_mp = timed_noop(
            ann_multiprobe(emb, threshold=0.9, bits=bits, probes=probes)
        )
        spark.sparkContext.setJobDescription(f"extra: ann_ivf n={n}")
        t_ivf = timed_noop(ann_ivf(emb, threshold=0.30, n=n))
        out[str(n)] = {
            "ann_params": [bits, probes],
            "multiprobe_s": t_mp,
            "ivf_s": t_ivf,
        }
        print(json.dumps({n: out[str(n)]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
