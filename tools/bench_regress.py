"""Per-query bench regression gate.

Compares a fresh ``bench.py`` JSON line against a prior round's record
(``BENCH_r{N-1}.json`` or any file holding the same one-line format) and
flags queries whose wall time regressed beyond a ratio threshold, so a
slow plan change is caught the round it lands instead of showing up as
an unexplained total in the judge's BENCH history.

Usage:
    python tools/bench_regress.py OLD.json NEW.json [--threshold 1.5]
    python tools/bench_regress.py OLD.json - --threshold 1.5 < new_line.json

Exit status: 0 = no regressions, 1 = at least one query regressed,
2 = usage/parse error. Queries absent from either side are reported as
added/removed but never fail the gate (coverage growth is expected).

Small absolute times are noise on a warm local JVM, so a query must
regress by BOTH the ratio threshold and ``--min-delta`` seconds
(default 0.25s) to fail.

Drift band (r11): pass BENCH_DETAIL.json as OLD to get band-aware
judging — its ``queries_band`` records each query's [min, max] across
the same interleaved best-of-3 run, and a slowdown landing at or under
band-max x threshold is reported under ``in_band`` (hypervisor drift)
instead of failing the gate. Same-code totals drift ±25% between
hypervisor epochs (BASELINE.md r10 triplet); only out-of-band moves
are structural.
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str) -> dict:
    raw = sys.stdin.read() if path == "-" else open(path).read()
    # Accept the driver's BENCH_r{N}.json wrapper ({"n", "rc", "tail":
    # "...stderr + json line..."}) by searching its tail text too.
    try:
        whole = json.loads(raw)
        if isinstance(whole, dict) and "queries" in whole:
            return whole
        if isinstance(whole, dict) and isinstance(whole.get("tail"), str):
            raw = whole["tail"]
    except json.JSONDecodeError:
        pass
    # The bench file may hold log noise; take the last JSON-looking line.
    for line in reversed([ln for ln in raw.splitlines() if ln.strip()]):
        try:
            obj = json.loads(line)
            if isinstance(obj, dict) and "queries" in obj:
                return obj
        except json.JSONDecodeError:
            continue
    raise ValueError(f"{path}: no bench JSON line with a 'queries' map found")


def compare(old: dict, new: dict, threshold: float, min_delta: float) -> dict:
    oq, nq = old["queries"], new["queries"]
    # r11 drift band: when the old side carries ``queries_band`` (the
    # interleave's per-query [min, max], written by bench.py to
    # BENCH_DETAIL.json), a slowdown that still lands AT OR UNDER the
    # recorded same-session max is hypervisor drift, not a structural
    # regression — the r10 drift triplet measured ±25% on identical
    # code. The ratio gate then binds relative to the band ceiling.
    band = old.get("queries_band", {})
    shared = sorted(set(oq) & set(nq))
    regressed = []
    improved = []
    in_band = []
    for name in shared:
        o, n = float(oq[name]), float(nq[name])
        ratio = n / o if o > 0 else float("inf")
        if ratio >= threshold and (n - o) >= min_delta:
            b = band.get(name)
            if b and n <= float(b[1]) * threshold:
                in_band.append({"query": name, "old_s": o, "new_s": n,
                                "band_max_s": float(b[1]),
                                "ratio": round(ratio, 2)})
                continue
            regressed.append({"query": name, "old_s": o, "new_s": n,
                              "ratio": round(ratio, 2)})
        elif o >= threshold * n and (o - n) >= min_delta:
            improved.append({"query": name, "old_s": o, "new_s": n,
                             "ratio": round(ratio, 2)})
    return {
        "old_total_s": old.get("value"),
        "new_total_s": new.get("value"),
        "n_shared": len(shared),
        "added": sorted(set(nq) - set(oq)),
        "removed": sorted(set(oq) - set(nq)),
        "regressed": sorted(regressed, key=lambda r: -r["ratio"]),
        "in_band": sorted(in_band, key=lambda r: -r["ratio"]),
        "improved": sorted(improved, key=lambda r: r["ratio"]),
    }


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("old")
    p.add_argument("new")
    p.add_argument("--threshold", type=float, default=1.5,
                   help="fail when new/old >= this ratio (default 1.5)")
    p.add_argument("--min-delta", type=float, default=0.25,
                   help="and the absolute slowdown >= this many seconds")
    args = p.parse_args(argv)
    try:
        old, new = _load(args.old), _load(args.new)
    except (OSError, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    report = compare(old, new, args.threshold, args.min_delta)
    print(json.dumps(report, indent=2))
    return 1 if report["regressed"] else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
