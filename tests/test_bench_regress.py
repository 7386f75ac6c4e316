"""Unit tests for the per-query bench regression gate (no Spark)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from bench_regress import compare  # noqa: E402


def _bench(total, **qs):
    return {"metric": "m", "value": total, "unit": "sec", "sf": 0.1, "queries": qs}


def test_regression_needs_ratio_and_delta():
    rep = compare(_bench(1, a=1.0, b=0.05), _bench(2, a=1.6, b=0.2), 1.5, 0.25)
    assert [r["query"] for r in rep["regressed"]] == ["a"]
    # b quadrupled but only by 0.15s — noise, not a regression.
    assert all(r["query"] != "b" for r in rep["regressed"])


def test_added_removed_never_fail():
    rep = compare(_bench(1, a=1.0, gone=9.0), _bench(1, a=1.0, fresh=9.0), 1.5, 0.25)
    assert rep["added"] == ["fresh"]
    assert rep["removed"] == ["gone"]
    assert rep["regressed"] == []


def test_improvements_reported():
    rep = compare(_bench(3, a=3.0), _bench(1, a=1.0), 1.5, 0.25)
    assert [r["query"] for r in rep["improved"]] == ["a"]
    assert rep["regressed"] == []


def test_band_absorbs_in_band_drift_only():
    """With queries_band on the old side (r11), a slowdown landing at
    or under band-max x threshold is drift (in_band), while one beyond
    it still fails — and queries without a band row keep the old rule."""
    old = _bench(2, a=1.0, b=1.0, c=1.0)
    old["queries_band"] = {"a": [1.0, 1.3], "b": [1.0, 1.2]}
    new = _bench(3, a=1.8, b=2.5, c=1.8)
    rep = compare(old, new, 1.5, 0.25)
    # a: 1.8 <= 1.3 * 1.5 = 1.95 -> drift, reported not failed
    assert [r["query"] for r in rep["in_band"]] == ["a"]
    # b: 2.5 > 1.2 * 1.5 -> structural; c: no band -> plain ratio rule
    assert sorted(r["query"] for r in rep["regressed"]) == ["b", "c"]
