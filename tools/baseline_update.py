"""Regenerate BASELINE.md's standing per-query table from the latest
bench run — one tool, one table, no narrative drift.

Reads BENCH_DETAIL.json (written by ``python bench.py``) and any probe
JSONs under ``tools/probes/`` (written by ``tools/scale_probe.py``;
name them ``probe_x<K>.json``), and rewrites the marked blocks of
BASELINE.md in place:

    <!-- BEGIN GENERATED BENCH TABLE -->
    ...
    <!-- END GENERATED BENCH TABLE -->

    <!-- BEGIN GENERATED SCALE TABLE -->
    ...
    <!-- END GENERATED SCALE TABLE -->

Usage: python tools/baseline_update.py [path/to/BENCH_DETAIL.json]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BENCH_BEGIN = "<!-- BEGIN GENERATED BENCH TABLE -->"
BENCH_END = "<!-- END GENERATED BENCH TABLE -->"
SCALE_BEGIN = "<!-- BEGIN GENERATED SCALE TABLE -->"
SCALE_END = "<!-- END GENERATED SCALE TABLE -->"


def _head() -> str:
    """Short HEAD sha at regen time — tests/test_bench_freshness.py
    checks this stamp against the latest functional commit."""
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


# Every standing row whose noop/count ratio exceeds this carries a
# one-line mechanism note (r10, judge): the ratios are count-pruning
# artifacts — Catalyst elides work count() doesn't reference — and the
# table must say WHICH mechanism per row, or regeneration fails.
RATIO_NOTE_THRESHOLD = 2.5

# query -> mechanism note. Vocabulary: join-elim (count() drops a
# row-preserving left join and its whole input branch), window-prune
# (a row-preserving window column is unreferenced under count, the
# Window node is removed), projection-prune / agg-prune (unreferenced
# projection / aggregate expressions are pruned, count keeps keys
# only). Absolute scale is noted where both columns are sub-second.
RATIO_NOTES: dict[str, str] = {
    "gram_novelty": (
        "join-elim: count() drops the row-preserving spine left join "
        "and with it the ENTIRE gram pipeline; noop pays the real work"
    ),
    "incremental_gram_novelty": (
        "join-elim: spine left join dropped under count(); noop pays "
        "the batch-vs-standing-index gram work"
    ),
    "incremental_line_dedup": (
        "join-elim: spine left join + line-hash collision scoring "
        "pruned under count()"
    ),
    "incremental_dedup": (
        "join-elim: the decision-column left joins prune under "
        "count(); noop pays the batch-vs-index minhash work"
    ),
    "semantic_dedup": (
        "join-elim: the dominated-set left join prunes under count() "
        "- the count column times little beyond cell assignment"
    ),
    "incremental_semantic_dedup": (
        "join-elim: dominated-set left join pruned under count(), "
        "same as semantic_dedup"
    ),
    "ewma_smooth": (
        "window-prune: the row-preserving EWMA fold column is "
        "unreferenced under count(); sub-0.6 s absolute"
    ),
    "window_range_frame": (
        "window-prune: the range-frame aggregate column is "
        "unreferenced under count(); sub-0.35 s absolute"
    ),
    "asof_join": (
        "window-prune: the carry-forward last() payload is "
        "unreferenced under count(); the union+filter spine still runs"
    ),
    "doc_repetition": (
        "projection-prune: count() skips the n-gram string building "
        "of the repetition ratios"
    ),
    "text_quality": (
        "projection-prune: the quality-ratio columns are skipped "
        "under count(); sub-0.6 s absolute"
    ),
    "token_count": (
        "projection-prune: the token split is skipped under count(); "
        "sub-0.2 s absolute"
    ),
    "gopher_quality_filter": (
        "projection-prune: count() keeps only the rule flags' inputs; "
        "noop builds every staged single-eval column"
    ),
    "pricing_summary": (
        "agg-prune: count() drops the seven sum/avg expressions and "
        "keeps the two group keys (TPC-H Q1 shape)"
    ),
    "percentile_disc": (
        "agg-prune: count() drops the three percentile sorts, keeping "
        "group keys; sub-0.4 s absolute"
    ),
    "bigram_logprob": (
        "agg-prune/join-elim: the logprob sum over the vocab join "
        "prunes under count(); noop pays the c1/c2-pruned join"
    ),
    "incremental_decontaminate_fraction": (
        "join-elim: count() of the spine drops both decision-column "
        "left joins and the shingle pipeline behind them"
    ),
    "approx_sketches": (
        "agg-prune: count() drops the HLL/percentile sketch "
        "expressions, keeping group keys; sub-0.7 s absolute"
    ),
}


def bench_table(detail: dict) -> str:
    qs = detail["queries"]
    rows = detail.get("rows", {})
    noop = detail.get("queries_noop", {})
    lines = [
        BENCH_BEGIN,
        f"Standing bench (`python bench.py`, sf{detail['sf']}, "
        f"{detail['n_queries']} headline queries, interleaved best-of-3): "
        f"**total {detail['value']} s** (source commit {_head()}).",
        "",
        "The `sec` column (count-based execution) is the standing gate —",
        "method-consistent with every prior round on both sides of the",
        "2x comparison. The `noop sec` column (r9, interleaved best-of-2",
        "under a forced noop WRITE) is the materialization-honesty",
        "number: count() lets Catalyst prune unreferenced columns and",
        "whole map-only projections, so projection-shaped queries cost",
        "more than their count figure — a noop/count ratio near 2x on a",
        "map-only row means the count figure skipped roughly the string-",
        "building half of the projection, not that the query regressed.",
        f"Every row with n/c > {RATIO_NOTE_THRESHOLD} carries its",
        "count-pruning mechanism in the note column (r10; regeneration",
        "fails if one is missing).",
        "",
        "| query | sec | noop sec | n/c | rows | note |",
        "|---|---|---|---|---|---|",
    ]
    missing = []
    for name in sorted(qs, key=lambda n: -qs[n]):
        n_s = noop.get(name)
        flagged = bool(n_s) and qs[name] > 0 and (
            n_s / qs[name] > RATIO_NOTE_THRESHOLD
        )
        ratio = (
            f"{n_s / qs[name]:.2f}" if n_s and qs[name] > 0 else ""
        )
        n_cell = f"{n_s:.3f}" if n_s is not None else ""
        note = RATIO_NOTES.get(name, "") if flagged else ""
        if flagged and not note:
            missing.append(f"{name} (n/c {ratio})")
        lines.append(
            f"| {name} | {qs[name]:.3f} | {n_cell} | {ratio} | "
            f"{rows.get(name, '')} | {note} |"
        )
    if missing:
        raise SystemExit(
            f"rows above the {RATIO_NOTE_THRESHOLD}x noop/count "
            f"threshold lack a RATIO_NOTES mechanism entry: {missing}"
        )
    lines.append(BENCH_END)
    return "\n".join(lines)


def scale_table(probes: list[dict]) -> str:
    lines = [
        SCALE_BEGIN,
        "Scale probes (`tools/scale_probe.py K`): runtime ratio at K× the",
        "sf0.1 data (ids offset per replica; text/embeddings perturbed so",
        "near-dup ops see distinct rows). Ratio ≈ K = linear; ≪ K = fixed",
        "overhead still dominates; ≫ K = superlinear red flag.",
        "",
        "| query | k | 1x sec | kx sec | ratio |",
        "|---|---|---|---|---|",
    ]
    for probe in sorted(probes, key=lambda p: p["k"]):
        k = probe["k"]
        base = probe.get("base", "0.1")
        k_cell = f"{k}" if base == "0.1" else f"{k} (base sf{base})"
        for name, r in sorted(probe["queries"].items()):
            lines.append(
                f"| {name} | {k_cell} | {r['t1']:.2f} | {r['tk']:.2f} | {r['ratio']} |"
            )
    lines.append(SCALE_END)
    return "\n".join(lines)


def replace_block(text: str, begin: str, end: str, new: str) -> str:
    pat = re.compile(re.escape(begin) + r".*?" + re.escape(end), re.S)
    if not pat.search(text):
        raise SystemExit(f"BASELINE.md is missing the {begin} block")
    return pat.sub(new.replace("\\", "\\\\"), text)


def main() -> None:
    detail_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "BENCH_DETAIL.json"
    )
    with open(detail_path) as f:
        detail = json.load(f)
    probes = []
    for p in sorted(glob.glob(os.path.join(ROOT, "tools", "probes", "probe_x*.json"))):
        with open(p) as f:
            probes.append(json.load(f))
    path = os.path.join(ROOT, "BASELINE.md")
    with open(path) as f:
        text = f.read()
    text = replace_block(text, BENCH_BEGIN, BENCH_END, bench_table(detail))
    if probes:
        text = replace_block(text, SCALE_BEGIN, SCALE_END, scale_table(probes))
    with open(path, "w") as f:
        f.write(text)
    print(
        f"BASELINE.md updated: {detail['n_queries']} bench rows, "
        f"{sum(len(p['queries']) for p in probes)} probe rows"
    )


if __name__ == "__main__":
    main()
