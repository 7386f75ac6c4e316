"""Standing-bench freshness gate (r5 verdict item 2).

BASELINE.md's standing table is the yardstick the driver's per-round
bench is judged against, so it must be regenerated AFTER the round's
last functional commit. Round 5 shipped a stale row: the standing
table was committed two minutes before a commit that doubled
``audio_mp3_probe``'s decode work, which then read as a spurious 2.04x
regression in the driver bench.

This test compares committed history only: the newest commit touching
perf-relevant code (``aiotcvectordb_spark/`` or ``bench.py``) must not
postdate the newest commit touching the standing artifacts
(BASELINE.md / BENCH_DETAIL.json, and EXPLAIN.md for the plan dumps).
A single commit touching both sides counts as fresh. Uncommitted
working-tree edits are ignored — the gate binds the close workflow
(regen + commit last), not mid-edit iteration.
"""

from __future__ import annotations

import os
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PERF_CODE = ["aiotcvectordb_spark", "bench.py"]
STANDING = ["BASELINE.md", "BENCH_DETAIL.json"]
EXPLAIN = ["EXPLAIN.md"]


def _last_commit_ts(paths: list[str]) -> int | None:
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", *paths],
            cwd=ROOT,
            capture_output=True,
            text=True,
            timeout=30,
            check=True,
        ).stdout.strip()
    except (subprocess.SubprocessError, FileNotFoundError):
        pytest.skip("git unavailable")
    return int(out) if out else None


def _last_commit_sha(paths: list[str]) -> str:
    out = subprocess.run(
        ["git", "log", "-1", "--format=%h %s", "--", *paths],
        cwd=ROOT,
        capture_output=True,
        text=True,
        timeout=30,
    ).stdout.strip()
    return out


def _stamp_ts(artifact: str) -> int | None:
    """Commit time of the 'source commit <sha>' stamp the regen tools
    embed — this sees a regen even when the regenerated content is
    byte-identical (EXPLAIN.md often is)."""
    import re

    path = os.path.join(ROOT, artifact)
    if not os.path.exists(path):
        return None
    m = re.search(r"source commit ([0-9a-f]{6,40})", open(path).read())
    if not m:
        return None
    try:
        out = subprocess.run(
            ["git", "show", "-s", "--format=%ct", m.group(1)],
            cwd=ROOT,
            capture_output=True,
            text=True,
            timeout=30,
            check=True,
        ).stdout.strip()
        return int(out)
    except (subprocess.SubprocessError, ValueError):
        return None


def _artifact_ts(artifact: str, committed_paths: list[str]) -> int | None:
    stamped = _stamp_ts(artifact)
    committed = _last_commit_ts(committed_paths)
    if stamped is None:
        return committed
    return max(stamped, committed or 0)


def test_standing_bench_not_stale():
    code_ts = _last_commit_ts(PERF_CODE)
    standing_ts = _artifact_ts("BASELINE.md", STANDING)
    assert standing_ts is not None, "BASELINE.md/BENCH_DETAIL.json never committed"
    assert code_ts is None or standing_ts >= code_ts, (
        "standing bench table predates the last functional commit — regenerate "
        "BENCH_DETAIL.json (python bench.py) + BASELINE.md "
        "(python tools/baseline_update.py) after "
        f"[{_last_commit_sha(PERF_CODE)}]"
    )


def test_explain_dump_not_stale():
    code_ts = _last_commit_ts(PERF_CODE)
    explain_ts = _artifact_ts("EXPLAIN.md", EXPLAIN)
    assert explain_ts is not None, "EXPLAIN.md never committed"
    assert code_ts is None or explain_ts >= code_ts, (
        "EXPLAIN.md predates the last functional commit — regenerate with "
        f"python tools/explain_dump.py > EXPLAIN.md after [{_last_commit_sha(PERF_CODE)}]"
    )


def test_standing_table_carries_drift_band():
    """r11: the regenerated standing table must carry the per-query
    drift band column (min–max of the same interleave) so single-run
    regressions are judged against the recorded same-session drift,
    not a point estimate. Binds once BENCH_DETAIL.json is band-bearing
    (i.e. written by the r11+ bench.py)."""
    import json

    detail_path = os.path.join(ROOT, "BENCH_DETAIL.json")
    if not os.path.exists(detail_path):
        pytest.skip("no BENCH_DETAIL.json")
    detail = json.load(open(detail_path))
    if "queries_band" not in detail:
        pytest.skip("pre-r11 BENCH_DETAIL (no band recorded yet)")
    band = detail["queries_band"]
    assert set(band) == set(detail["queries"])
    for name, (lo, hi) in band.items():
        assert lo == detail["queries"][name]  # min IS the gate value
        assert hi >= lo
    table = open(os.path.join(ROOT, "BASELINE.md")).read()
    assert "| query | sec | band |" in table, (
        "BENCH_DETAIL.json carries queries_band but BASELINE.md's "
        "standing table lacks the band column — re-run "
        "tools/baseline_update.py"
    )
