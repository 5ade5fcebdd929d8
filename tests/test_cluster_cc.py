"""Connected-components strategies (G5): the distributed pointer-doubling
path must converge logarithmically in diameter and agree with the driver
union-find on arbitrary topologies."""

import pytest

from sketchy_spark.operators.cluster import (
    ConvergenceError,
    _distributed_components,
    _driver_union_find,
)


def _edge_df(spark, pairs, typ="long"):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], f"a_id {typ}, b_id {typ}"
    )


def test_distributed_path_graph_converges_logarithmically(spark):
    """VERDICT r3 #4 done-criterion: a 1000-vertex PATH component
    (diameter 999 — the containment-chain / vendored-file-lineage shape)
    must converge within 15 rounds; the r3 propagation-only loop needed
    O(diameter) ~ 999 rounds."""
    n = 1000
    edges = _edge_df(spark, [(i, i + 1) for i in range(n - 1)])
    out = _distributed_components(edges, max_iter=15, check_every=3).toPandas()
    assert len(out) == n
    assert set(out.cluster_id) == {0}


def test_distributed_matches_driver_union_find(spark):
    import random

    rng = random.Random(7)
    pairs = set()
    base = 0
    for _c in range(40):  # clusters of random size and topology
        size = rng.randrange(2, 12)
        ids = list(range(base, base + size))
        base += size
        extra = [(rng.choice(ids), rng.choice(ids)) for _ in range(size)]
        chain = list(zip(ids, ids[1:]))
        pairs |= {
            tuple(sorted(e)) for e in chain + extra if e[0] != e[1]
        }
    edges = _edge_df(spark, sorted(pairs))
    want = {
        r["file_id"]: r["cluster_id"]
        for r in _driver_union_find(edges).collect()
    }
    got = {
        r["file_id"]: r["cluster_id"]
        for r in _distributed_components(edges, max_iter=25).collect()
    }
    assert got == want


def test_distributed_string_labels(spark):
    edges = _edge_df(
        spark, [("b", "c"), ("a", "b"), ("x", "y")], typ="string"
    )
    out = {
        r["file_id"]: r["cluster_id"]
        for r in _distributed_components(edges, 10).collect()
    }
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_distributed_raises_without_fixpoint_budget(spark):
    edges = _edge_df(spark, [(i, i + 1) for i in range(200)])
    with pytest.raises(ConvergenceError):
        _distributed_components(edges, max_iter=2)


def test_check_every_clamped_against_plan_blowup(spark, monkeypatch):
    """ADVICE r5: the unmaterialized plan tree grows ~4x per unchecked
    round (neigh+prop and prop+jump each reference the previous labels
    plan), so a large check_every melts the planner, not the executors.
    The public knob is clamped to MAX_CHECK_EVERY: with check_every=50
    the first convergence check — and its lineage-truncating
    localCheckpoint — must still land on round MAX_CHECK_EVERY."""
    from pyspark.sql.classic.dataframe import DataFrame

    from sketchy_spark.operators.cluster import MAX_CHECK_EVERY

    calls = {"n": 0}
    orig = DataFrame.localCheckpoint

    def counted(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "localCheckpoint", counted)
    n = 40  # path graph: pointer doubling converges by round ~6
    edges = _edge_df(spark, [(i, i + 1) for i in range(n - 1)])
    out = _distributed_components(
        edges, max_iter=15, check_every=50
    ).toPandas()
    assert len(out) == n and set(out.cluster_id) == {0}
    # Unclamped, check_every=50 would check (and checkpoint) ONLY at
    # it == max_iter — 2 setup + 1 snapshot after a 15-round ~4^15-node
    # unmaterialized plan. Clamped to 4, checks land at rounds 4, 8
    # (converged but snapshot differs), 12 (fixpoint detected):
    # 2 setup + 3 check-round snapshots, every lineage <= 4 rounds deep.
    assert MAX_CHECK_EVERY == 4
    assert calls["n"] == 5, calls


def test_distributed_checkpoints_only_on_check_rounds(spark, monkeypatch):
    """VERDICT r4 minor #3: off-round localCheckpoints are skipped — the
    1000-vertex path converges with one label materialization per CHECK
    round only (check_every=3 -> checks at 3,6,9,12; fixpoint detected
    at the round-12 check): 4 label checkpoints + 2 setup (sym + initial
    labels) = 6, where the per-round variant paid 12 + 2. Labels
    unchanged."""
    # patch the concrete class: pyspark.sql.DataFrame is the classic/
    # connect dispatch facade in Spark 4; instances are classic.DataFrame
    from pyspark.sql.classic.dataframe import DataFrame

    calls = {"n": 0}
    orig = DataFrame.localCheckpoint

    def counted(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "localCheckpoint", counted)
    n = 1000
    edges = _edge_df(spark, [(i, i + 1) for i in range(n - 1)])
    out = _distributed_components(edges, max_iter=15, check_every=3).toPandas()
    assert len(out) == n and set(out.cluster_id) == {0}
    assert calls["n"] == 6, calls  # 2 setup + 4 check-round label snapshots
