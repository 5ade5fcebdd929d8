"""Arrow and SQL verification paths must agree exactly."""

import pytest

from sketchy_spark.config import SketchConfig
from sketchy_spark.corpus import corpus_pandas
from sketchy_spark.operators.lsh import candidate_pairs
from sketchy_spark.operators.sketch import sketch_files
from sketchy_spark.operators.verify import verified_pairs, verified_pairs_sql

CFG = SketchConfig()


def test_arrow_and_sql_verify_agree(spark):
    sigs = sketch_files(
        spark.createDataFrame(corpus_pandas(400)), CFG
    ).cache()
    cand = candidate_pairs(sigs, CFG).cache()
    arrow = {
        (r["a_id"], r["b_id"]): (round(r["jaccard"], 9), r["hamming"])
        for r in verified_pairs(cand, sigs, CFG).collect()
    }
    sql = {
        (r["a_id"], r["b_id"]): (round(r["jaccard"], 9), r["hamming"])
        for r in verified_pairs_sql(cand, sigs, CFG).collect()
    }
    assert arrow == sql
    assert len(arrow) > 0


def test_overcap_neardup_group_salted_recall(spark):
    """A near-dup clique LARGER than band_skew_cap must still land in one
    cluster: over-cap band keys emit salted star edges (member -> salt-min
    -> hub) instead of being dropped, so recall cannot silently fall when
    a true duplicate group exceeds the cap (VERDICT r1 #3)."""
    import pandas as pd

    from sketchy_spark.operators.cluster import assign_clusters
    from sketchy_spark.operators.lsh import candidate_pairs_fid
    from sketchy_spark.operators.verify import verified_pairs_cascade

    base = "\n".join(
        f"def fn_{i}(x): return x + {i * 7}" for i in range(120)
    )
    rows = []
    for m in range(40):  # clique of 40 >> cap of 8
        # tiny unique suffix: near-dup (not sha-identical), so the exact
        # sha256 path cannot shortcut connectivity
        rows.append(
            ("org/clique", f"src/f{m}.py", f"c{m}", "py",
             base + f"\n# member {m}")
        )
    for m in range(30):  # unrelated singletons
        body = "\n".join(
            f"val v_{m}_{i} = compute_{m}({i * m + 3})" for i in range(80)
        )
        rows.append(("org/other", f"src/s{m}.rs", f"d{m}", "rs", body))
    files = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["repo", "path", "commit", "lang", "content"]
        )
    )
    cfg = SketchConfig(band_skew_cap=8)
    sigs = sketch_files(files, cfg).cache()
    n = sigs.count()
    cand = candidate_pairs_fid(sigs, cfg)
    verified = verified_pairs_cascade(cand, sigs, cfg, n_files=n)
    clusters = assign_clusters(
        sigs, verified.select("a_id", "b_id")
    ).toPandas()
    clique = clusters[clusters.file_id.str.startswith("org/clique")]
    assert clique.cluster_id.nunique() == 1, clique
    assert len(clique) == 40
    others = clusters[clusters.file_id.str.startswith("org/other")]
    assert others.cluster_id.nunique() == 30  # no false merges


def test_overcap_fallback_broadcast_hot_classification(spark, monkeypatch):
    """Degenerate hot-set fallback (VERDICT r2 #4): when the number of
    over-cap band keys exceeds HOT_LITERAL_MAX, the eager path must
    switch from literal create_map/isin inlining (plan-size bomb at
    ~10^5+ hot keys) to a broadcast-join hot classification — with the
    salted-star recall guarantee intact. Forced here by dropping the
    bound to 0 so every hot key takes the fallback path."""
    import pandas as pd

    from sketchy_spark.operators import lsh
    from sketchy_spark.operators.cluster import assign_clusters
    from sketchy_spark.operators.lsh import candidate_pairs_fid
    from sketchy_spark.operators.verify import verified_pairs_cascade
    from sketchy_spark.plans.explain import physical_plan

    monkeypatch.setattr(lsh, "HOT_LITERAL_MAX", 0)
    base = "\n".join(
        f"def fn_{i}(x): return x + {i * 7}" for i in range(120)
    )
    rows = [
        ("org/clique", f"src/f{m}.py", f"c{m}", "py",
         base + f"\n# member {m}")
        for m in range(40)
    ]
    files = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["repo", "path", "commit", "lang", "content"]
        )
    )
    cfg = SketchConfig(band_skew_cap=8)
    sigs = sketch_files(files, cfg).cache()
    n = sigs.count()
    internal = []
    cand = candidate_pairs_fid(sigs, cfg, persisted=internal)
    plan = physical_plan(cand)
    # sane plan: hot classification joins a broadcast table instead of
    # inlining a literal map (no create_map / giant isin in the plan)
    assert "create_map" not in plan and "BroadcastExchange" in plan, plan
    verified = verified_pairs_cascade(
        cand, sigs, cfg, n_files=n, persisted=internal
    )
    clusters = assign_clusters(
        sigs, verified.select("a_id", "b_id")
    ).toPandas()
    assert clusters.cluster_id.nunique() == 1
    assert len(clusters) == 40
    for df in internal:
        df.unpersist()


def test_partial_overlap_containment(spark):
    """G3 contract: a shared verbatim run >= L chars is detected even when
    NEITHER file embeds the other (VERDICT r1 #6). Fixture: two files
    sharing a ~50% middle block with different heads/tails."""
    import pandas as pd

    from sketchy_spark.operators.verify import (
        containment_candidates,
        containment_verified,
    )

    block = "\n".join(
        f"shared_line_{i} = compute({i}) + offset_{i * 13}" for i in range(60)
    )  # ~2.4 KB verbatim block
    head_a = "\n".join(f"a_only_{i} = {i}" for i in range(40))
    tail_a = "\n".join(f"a_tail_{i} = {i * 3}" for i in range(40))
    head_b = "\n".join(f"b_prefix_{i} = {i * 7}" for i in range(40))
    tail_b = "\n".join(f"b_suffix_{i} = {i * 11}" for i in range(40))
    doc_a = head_a + "\n" + block + "\n" + tail_a
    doc_b = head_b + "\n" + block + "\n" + tail_b
    assert block not in (head_a + tail_a) and doc_a not in doc_b

    rows = [
        ("org/x", "a.py", "c1", "py", doc_a),
        ("org/x", "b.py", "c2", "py", doc_b),
    ]
    # noise singletons so fingerprint groups are non-trivial
    for m in range(20):
        body = "\n".join(f"noise_{m}_{i} = f({i * m})" for i in range(60))
        rows.append(("org/n", f"n{m}.py", f"d{m}", "py", body))
    files = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["repo", "path", "commit", "lang", "content"]
        )
    )
    sigs = sketch_files(files, CFG).cache()
    cand = containment_candidates(sigs, CFG, min_containment=0.25)
    got = containment_verified(cand, files, CFG, min_overlap_chars=512)
    hits = {
        (r["small_id"], r["big_id"]): r["overlap_chars"]
        for r in got.collect()
    }
    key = ("org/x/a.py", "org/x/b.py")
    key_rev = ("org/x/b.py", "org/x/a.py")
    assert key in hits or key_rev in hits, hits
    run = hits.get(key, hits.get(key_rev))
    assert run >= len(block) - 2 * CFG.winnow_window, run


def test_partial_overlap_kernel_sketches_each_file_once(monkeypatch):
    """VERDICT r3 #5: a big file appearing in 50 pairs of one batch must
    be re-sketched ONCE, not once per pair — 51 sketch passes total for
    50 pairs + 1 shared big file, with unchanged output."""
    import pandas as pd

    import sketchy_spark.hashing as H
    from sketchy_spark.operators.verify import _overlap_rows

    import random

    rng = random.Random(3)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 _"
    block = "".join(rng.choice(alphabet) for _ in range(2000))
    big = (
        "".join(rng.choice(alphabet) for _ in range(400))
        + block
        + "".join(rng.choice(alphabet) for _ in range(400))
    )
    pairs = pd.DataFrame(
        {
            "small_id": [f"s{i:02d}" for i in range(50)],
            "big_id": ["big"] * 50,
            "small_c": [f"head{i}|" + block + f"|tail{i}" for i in range(50)],
            "big_c": [big] * 50,
        }
    )
    calls = {"n": 0}
    orig = H.batch_shingle_hashes

    def counted(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(H, "batch_shingle_hashes", counted)
    out = _overlap_rows(pairs, CFG, min_overlap_chars=512)
    assert calls["n"] == 51, calls
    assert len(out) == 50
    assert (out["overlap_chars"] >= len(block) - 2 * CFG.winnow_window).all()


def test_partial_overlap_cache_spans_arrow_batches(monkeypatch):
    """VERDICT r4 minor #4 done-criterion: the hub file's minima survive
    across Arrow batches — the 50 hub pairs split into 3 batches still
    cost exactly 51 sketch passes (50 smalls + 1 hub), because the cache
    now has partition lifetime (one _MinimaCache threaded through every
    batch, as _partial_overlap_kernel's fn does)."""
    import pandas as pd

    import sketchy_spark.hashing as H
    from sketchy_spark.operators.verify import _MinimaCache, _overlap_rows

    import random

    rng = random.Random(3)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 _"
    block = "".join(rng.choice(alphabet) for _ in range(2000))
    big = (
        "".join(rng.choice(alphabet) for _ in range(400))
        + block
        + "".join(rng.choice(alphabet) for _ in range(400))
    )
    pairs = pd.DataFrame(
        {
            "small_id": [f"s{i:02d}" for i in range(50)],
            "big_id": ["big"] * 50,
            "small_c": [f"head{i}|" + block + f"|tail{i}" for i in range(50)],
            "big_c": [big] * 50,
        }
    )
    calls = {"n": 0}
    orig = H.batch_shingle_hashes

    def counted(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(H, "batch_shingle_hashes", counted)
    cache = _MinimaCache()
    outs = [
        _overlap_rows(pairs.iloc[lo:hi], CFG, 512, cache)
        for lo, hi in ((0, 17), (17, 34), (34, 50))
    ]
    out = pd.concat(outs, ignore_index=True)
    assert calls["n"] == 51, calls
    assert len(out) == 50
    assert (out["overlap_chars"] >= len(block) - 2 * CFG.winnow_window).all()


def test_minima_cache_byte_bound_evicts():
    """The partition-lifetime cache is byte-bounded: filling it past
    max_bytes evicts the least-recently-used entry and keeps the
    accounting consistent (no unbounded executor memory growth when a
    partition holds many distinct large files)."""
    from sketchy_spark.operators.verify import _MinimaCache

    cache = _MinimaCache(max_bytes=1_000_000)  # ~2 entries' worth
    for i in range(10):
        cache.get(f"f{i}", "x" * 50_000, CFG)  # ~450 KB each with minima
    assert len(cache._d) < 10  # evictions happened
    assert 0 < cache._bytes <= cache.max_bytes
    # re-fetch of a live entry is a hit (no recompute -> same object)
    fid = next(reversed(cache._d))
    before = cache._d[fid]
    assert cache.get(fid, "ignored-on-hit", CFG) is before


def test_minima_cache_refuses_oversized_entry():
    """ADVICE r5: an entry whose cost alone exceeds max_bytes is computed
    and returned but NOT cached — a single file larger than the budget
    must not pin _bytes above the documented bound for the rest of the
    partition (and must not evict the whole working set either)."""
    from sketchy_spark.operators.verify import _MinimaCache

    cache = _MinimaCache(max_bytes=1_000_000)
    cache.get("small", "x" * 50_000, CFG)
    held = dict(cache._d)
    b, minima = cache.get("huge", "y" * 2_000_000, CFG)  # > max_bytes
    assert len(b) == 2_000_000 and minima.size > 0  # still computed
    assert "huge" not in cache._d  # not cached
    assert dict(cache._d) == held  # working set untouched
    assert cache._bytes <= cache.max_bytes


def test_release_cascade_caches_reclaims_storage(spark):
    """VERDICT r4 #8: ad-hoc cascades (no ``persisted`` list) park their
    required persists in _CASCADE_CACHES; release_cascade_caches() must
    actually unpersist them — the JVM's persistent-RDD registry shrinks
    back to its pre-call footprint, so repeated ad-hoc use in a
    long-lived session cannot accumulate executor storage."""
    import pandas as pd

    from sketchy_spark.operators import verify as V
    from sketchy_spark.operators.lsh import candidate_pairs_fid

    def n_persistent():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    V.release_cascade_caches()  # clean slate from earlier tests
    base_rdds = n_persistent()
    rows = [
        ("org/r", f"f{i}.py", f"c{i}", "py",
         "\n".join(f"def g_{i}_{j}(): return {i + j}" for j in range(60)))
        for i in range(30)
    ]
    files = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["repo", "path", "commit", "lang", "content"]
        )
    )
    sigs = sketch_files(files, CFG).cache()
    n = sigs.count()
    cand = candidate_pairs_fid(sigs, CFG)
    # ad-hoc call: no persisted list -> caches tracked module-side
    V.verified_pairs_cascade(cand, sigs, CFG, n_files=n).count()
    assert len(V._CASCADE_CACHES) > 0
    assert n_persistent() > base_rdds + 1  # sigs cache + cascade persists
    V.release_cascade_caches()
    assert len(V._CASCADE_CACHES) == 0
    sigs.unpersist(blocking=True)
    assert n_persistent() <= base_rdds


def test_candidate_sets_agree_across_eager_and_lazy_paths(spark):
    """r6: the eager path's band cache is now PARTITIONED by band_key
    (one shuffle feeds both the hot-count and the groups aggregation);
    the candidate SET must stay exactly the lazy broadcast path's,
    including salted star edges for over-cap keys."""
    from sketchy_spark.corpus import corpus_df
    from sketchy_spark.operators.lsh import candidate_pairs_fid, with_fid
    from sketchy_spark.operators.sketch import sketch_files

    cfg = SketchConfig(band_skew_cap=4)  # boilerplate rows go over cap
    sigs = with_fid(
        sketch_files(corpus_df(spark, 400), cfg, with_sig=False)
    ).cache()
    sigs.count()
    internal = []
    eager = {
        (r.a_fid, r.b_fid)
        for r in candidate_pairs_fid(sigs, cfg, persisted=internal).collect()
    }
    lazy = {
        (r.a_fid, r.b_fid)
        for r in candidate_pairs_fid(sigs, cfg).collect()
    }
    assert eager == lazy and len(eager) > 0
    for df in internal:
        df.unpersist()
    sigs.unpersist()
