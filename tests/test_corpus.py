"""Corpus generator tests — deterministic planted truth (FIXTURES.md §1)."""

import numpy as np

from sketchy_spark.corpus import (
    corpus_pandas,
    render_rows,
    truth_containment_pairs,
    truth_dup_pairs,
    truth_pandas,
)


def test_deterministic_across_calls():
    a = corpus_pandas(400)
    b = corpus_pandas(400)
    assert a.equals(b)


def test_deterministic_across_chunking():
    whole = render_rows(np.arange(400))
    parts = render_rows(np.arange(123, 321))
    merged = whole.iloc[123:321].reset_index(drop=True)
    assert parts.reset_index(drop=True).equals(merged)


def test_kind_fractions():
    t = truth_pandas(2000)
    frac = t["kind"].value_counts(normalize=True)
    assert abs(frac["singleton"] - 0.60) < 0.01
    assert abs(frac["exact"] - 0.15) < 0.01
    assert abs(frac["near"] - 0.15) < 0.01
    assert abs(frac["boilerplate"] - 0.05) < 0.01


def test_exact_groups_identical_content():
    df = render_rows(np.arange(400))
    ex = df[df["kind"] == "exact"]
    for _, g in ex.groupby("cluster_id"):
        assert g["content"].nunique() == 1
        assert (g["repo"] + "/" + g["path"]).nunique() == len(g)


def test_near_groups_similar_not_identical():
    df = render_rows(np.arange(200))
    near = df[df["kind"] == "near"]
    for _, g in near.groupby("cluster_id"):
        contents = g["content"].tolist()
        assert len(set(contents)) > 1  # mutated
        # line-level overlap is high
        base = set(contents[0].splitlines())
        for c in contents[1:]:
            other = set(c.splitlines())
            j = len(base & other) / len(base | other)
            assert j > 0.6, j


def test_containment_embedded_verbatim():
    df = render_rows(np.arange(400))
    df["file_id"] = df["repo"] + "/" + df["path"]
    by_id = df.set_index("file_id")
    pairs = truth_containment_pairs(truth_pandas(400))
    assert len(pairs) == 10
    for small, big in pairs:
        assert by_id.loc[small, "content"] in by_id.loc[big, "content"]


def test_boilerplate_shares_header_but_not_dup():
    df = render_rows(np.arange(200))
    boil = df[df["kind"] == "boilerplate"]
    heads = {c[:1500] for c in boil["content"]}
    assert len(heads) == 1
    bodies = {c[1500:] for c in boil["content"]}
    assert len(bodies) == len(boil)


def test_truth_dup_pairs_count():
    # per 200-row block: 20 groups x 3 members -> 20 * 3 = 60 pairs
    pairs = truth_dup_pairs(truth_pandas(200))
    assert len(pairs) == 60


def test_content_lengths_in_spec_range():
    df = render_rows(np.arange(600))
    lens = df["content"].str.len()
    assert lens.min() >= 100
    assert lens.max() <= 9000
