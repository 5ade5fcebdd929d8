"""Driver-contract emulation: run every ``queries()`` entry in Spark and
its ``oracle_sql()`` in DuckDB on the same sf0.01 parquet; compare
row count, schema width, and exact values (columns sorted by name, rows
sorted) — the same comparison the driver's CORRECTNESS gate performs.
"""

import math
import pathlib
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()
SQL_CHECKED = sorted(set(QUERIES) & set(ORACLES))
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create view {t} as select * from '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(spark, duck, name):
    got = _normalize(QUERIES[name](spark, SF_DIR).toPandas())
    want = _normalize(duck.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: schema {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    if len(got):
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
        )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_sql_checked_queries_return_rows(spark, duck):
    """Every SQL-checked query should exercise real data at sf0.01 —
    a 0==0 match proves nothing. (Containment-style queries excluded
    by construction: all here return rows.)"""
    empty = []
    for name in SQL_CHECKED:
        if duck.sql(f"select count(*) from ({ORACLES[name]})").fetchall()[0][0] == 0:
            empty.append(name)
    assert not empty, f"queries with empty oracle results: {empty}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"file_id", "cluster_id", "n_members"}


def test_ann_multiprobe_recall(spark):
    """VERDICT r1 #10 done-criterion: multi-probe sign-LSH recall >= 0.9
    vs the exact embedding_dup_pairs truth at threshold 0.45 on sf0.01."""
    from sketchy_spark.functions import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    truth = {
        (r["a_id"], r["b_id"])
        for r in sim.embedding_dup_pairs(emb, threshold=0.45).collect()
    }
    got = {
        (r["a_id"], r["b_id"])
        for r in sim.ann_multiprobe(
            emb, threshold=0.45, bits=4, probes=12
        ).collect()
    }
    assert len(truth) > 0
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"recall {recall:.3f} ({len(got)}/{len(truth)})"
    assert got <= truth  # exact verify: no false positives
