"""Driver-row rotation enforcer.

The driver checks only the first ~50 oracled registry entries per round,
so correctness rows go stale unless the registry order rotates. This
check fails (exit 1) when rotation is broken:

1. an oracled query whose implementation was REWRITTEN after its latest
   green driver row is not scheduled in the next driver batch (its row
   would lag the rewrite by >1 round), or
2. an oracled query has NO driver row at all and is not scheduled, or
3. the oracled registry order is not priority-sorted: all rule-1/rule-2
   entries first, then ascending latest-row round (stalest first) — the
   order that provably minimizes the worst row age given the batch
   size, or
4. hard cap: a row that is already >=3 rounds old is not scheduled
   (rotation math keeps steady-state age <=2; 3 only ever appears
   transiently after a rewrite-heavy round).

"Scheduled" = within the first DRIVER_BATCH oracled entries of
``Q.QUERIES`` (the driver walks the registry in order).

Rewrite rounds are recorded manually in ``REWRITES`` below — update it
whenever a registry query's implementation (or its oracle) materially
changes. CORRECTNESS_r*.json files in the repo root are the row record.

Usage: python tools/check_driver_rows.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DRIVER_BATCH = 50

# query -> round in which its implementation/oracle last materially
# changed (update on every rewrite; additions are covered by the
# "no driver row" rule and need no entry here)
REWRITES: dict[str, int] = {
    "minhash_signatures": 4,  # r4 CJK tokenizer
    "minhash_lsh_candidates": 4,  # r4 CJK tokenizer
    "dedup_components": 4,  # r4 pre-contraction + frozen-star pruning
    "embedding_near_dup": 4,  # r4: oracled entry is exact-only; router split to _auto
    "fulltext_bm25": 4,  # r4 CJK bigram tokenizer in the BM25 path
    "sparse_encode": 4,  # r4 CJK bigram tokenizer
    "hybrid_weighted": 4,  # r4 CJK bigram tokenizer (sparse leg)
    "hybrid_rrf": 4,  # r4 CJK bigram tokenizer (sparse leg)
    "doc_fingerprint": 4,  # r4 CJK-aware token stream
    # r4 CJK tokenizer swap across the dedup/text family:
    "text_quality": 4,
    "doc_repetition": 4,
    "ngram_jaccard_pairs": 4,
    "simhash_fingerprint": 4,
    "simhash_near_dup": 4,
    "chunk_expand": 4,
    "benchmark_decontaminate": 4,
    "pack_sequences": 4,
    "curate_corpus": 4,
    "incremental_dedup": 4,
    "bigram_logprob": 5,  # r5 exact prefix (c1) pruning joins the r4 c2 pruning
    "jpeg_probe": 4,  # r4 chunked FDCT/IDCT, int32 store, vector scatter
    "multimodal_features": 5,  # r5 scalar (doc_id,bucket,ratio) projection
    "unigram_logprob": 5,  # r5 exact hapax pruning of the vocab join table
    "lang_top_terms": 5,  # r5 salted two-phase top-k (vocab-sized window)
    "equidepth_histogram": 3,
    "audio_probe": 3,
    "video_frames": 3,
}


def main() -> int:
    from aiotcvectordb_spark import queries as Q

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest_row: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if row.get("rows_match") and row.get("hash_match") is not False:
                latest_row[name] = max(latest_row.get(name, 0), rnd)
    if not rounds:
        print("no CORRECTNESS_r*.json found — nothing to enforce")
        return 0
    current_round = max(rounds) + 1  # the round being built now

    oracled = [n for n in Q.QUERIES if n in Q.ORACLES]
    scheduled = set(oracled[:DRIVER_BATCH])

    def priority(name: str) -> tuple[int, int]:
        row_rnd = latest_row.get(name)
        rewrite_rnd = REWRITES.get(name, 0)
        forced = row_rnd is None or rewrite_rnd > row_rnd
        # forced entries first (internal order irrelevant — rules 1/2
        # already require every one of them in the batch), then
        # stalest row first
        return (0, 0) if forced else (1, row_rnd or 0)

    failures: list[str] = []
    for name in oracled:
        row_rnd = latest_row.get(name)
        rewrite_rnd = REWRITES.get(name, 0)
        if row_rnd is None:
            if name not in scheduled:
                failures.append(f"{name}: no driver row and not in next batch")
        elif rewrite_rnd > row_rnd and name not in scheduled:
            failures.append(
                f"{name}: rewritten in r{rewrite_rnd}, latest row r{row_rnd}, "
                "not in next batch"
            )
        elif current_round - row_rnd >= 3 and name not in scheduled:
            failures.append(
                f"{name}: row r{row_rnd} already {current_round - row_rnd} "
                "rounds old, not in next batch (hard cap)"
            )
    # rule 3: the registry order must be priority-sorted so the batch
    # always takes the most urgent entries first
    keys = [priority(n) for n in oracled]
    if keys != sorted(keys):
        for i in range(len(keys) - 1):
            if keys[i] > keys[i + 1]:
                failures.append(
                    f"registry order not stalest-first: {oracled[i]} "
                    f"{keys[i]} precedes {oracled[i + 1]} {keys[i + 1]}"
                )
                break
    if failures:
        print(f"ROTATION BROKEN ({len(failures)}):")
        for f_ in failures:
            print("  " + f_)
        return 1
    n_stale = sum(
        1 for n in oracled if current_round - latest_row.get(n, current_round) >= 2
    )
    print(
        f"rotation ok: {len(oracled)} oracled queries, "
        f"{len(scheduled)} scheduled next, {n_stale} stale rows all scheduled"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
