"""Trial-pool semantics in bench.py.

The pool exists because this host's noise comes in multi-minute episodes
that can blanket an entire bench invocation: the honest best-of must span
invocations from different windows, but only at the SAME timed-code
fingerprint (timings from older pipeline code must never mix).
"""

import json

import bench


def test_merge_trials_accumulates_across_invocations(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "SCRATCH", tmp_path)
    first = bench._merge_trials({"headline_100000": [30.0, 25.0]})
    assert first["headline_100000"] == [30.0, 25.0]
    second = bench._merge_trials({"headline_100000": [27.0]})
    assert second["headline_100000"] == [30.0, 25.0, 27.0]


def test_merge_trials_namespaces_keys_independently(tmp_path, monkeypatch):
    # headline-only, scaling, and per-query invocations must not clobber
    # one another's accumulated trials
    monkeypatch.setattr(bench, "SCRATCH", tmp_path)
    bench._merge_trials({"1ex_800000": [700.0]})
    bench._merge_trials({"q_token_count_0.1": [0.3, 0.2]})
    pool = bench._merge_trials({"headline_100000": [25.0]})
    assert pool["1ex_800000"] == [700.0]
    assert pool["q_token_count_0.1"] == [0.3, 0.2]
    assert pool["headline_100000"] == [25.0]


def test_merge_trials_resets_on_fingerprint_change(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "SCRATCH", tmp_path)
    bench._merge_trials({"headline_100000": [25.0]})
    # simulate a pool written by older pipeline code
    path = tmp_path / "scaling_trials.json"
    stale = json.loads(path.read_text())
    stale["rev"] = "000000000000"
    path.write_text(json.dumps(stale))
    pool = bench._merge_trials({"headline_100000": [40.0]})
    assert pool["headline_100000"] == [40.0]


def test_merge_trials_survives_corrupt_pool_file(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "SCRATCH", tmp_path)
    (tmp_path / "scaling_trials.json").write_text("{not json")
    pool = bench._merge_trials({"headline_100000": [25.0]})
    assert pool["headline_100000"] == [25.0]


def test_merge_trials_rounds_to_millis(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "SCRATCH", tmp_path)
    pool = bench._merge_trials({"headline_100000": [25.123456]})
    assert pool["headline_100000"] == [25.123]
