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
