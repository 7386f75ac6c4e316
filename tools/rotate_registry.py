"""Rewrite the QUERIES registry block in priority order.

Companion to check_driver_rows.py: computes the pre-driver priority
order (forced entries first — no driver row yet or rewritten after
their latest row — then ascending latest-green-row round, stalest
first), and rewrites the ``QUERIES`` dict literal in
``aiotcvectordb_spark/queries.py`` to that order in place. Non-oracled
entries keep their current relative order at the tail. Run at round
close, then ``python tools/check_driver_rows.py`` must print
"rotation ok [pre-driver ...]".

Usage: python tools/rotate_registry.py [--dry-run]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = """\
    # Ordering policy (the driver checks the first ~50 oracled entries
    # per round, in order): (1) queries rewritten since their last
    # driver row OR with no row yet come FIRST; (2) then ascending
    # latest-green-row round (stalest first). tools/check_driver_rows.py
    # enforces this ordering plus the post-driver age cap by simulating
    # the driver consuming the front batch; tools/rotate_registry.py
    # regenerates this block. Re-rotation is the round's CLOSING commit.
"""


def main() -> int:
    import check_driver_rows as cdr
    from aiotcvectordb_spark import queries as Q

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest_row, latest_round = cdr.load_rows(root)
    current_round = latest_round + 1

    path = os.path.join(root, "aiotcvectordb_spark", "queries.py")
    src = open(path).read()
    m = re.search(
        r"^QUERIES: dict\[str, Callable\[\[SparkSession, str\], DataFrame\]\] = \{\n(.*?)^\}\n",
        src,
        re.M | re.S,
    )
    if not m:
        print("QUERIES block not found", file=sys.stderr)
        return 2
    body = m.group(1)
    # collect entries: "name": callable,  # optional comment
    entry_re = re.compile(r'^\s*"(\w+)":\s*([\w.]+),\s*(?:#.*)?$')
    entries: dict[str, str] = {}
    for line in body.splitlines():
        em = entry_re.match(line)
        if em:
            entries[em.group(1)] = em.group(2)
    missing = set(Q.QUERIES) - set(entries)
    if missing:
        print(f"parse missed entries: {sorted(missing)}", file=sys.stderr)
        return 2

    oracled = [n for n in entries if n in Q.ORACLES]
    non_oracled = [n for n in entries if n not in Q.ORACLES]
    forced = [
        n
        for n in oracled
        if latest_row.get(n) is None or cdr.REWRITES.get(n, 0) > latest_row[n]
    ]
    rest = sorted(
        (n for n in oracled if n not in forced),
        key=lambda n: (latest_row[n], oracled.index(n)),
    )

    lines = [HEADER.rstrip("\n")]
    if forced:
        lines.append(
            f"    # --- forced for r{current_round}: rewritten since last row / no row yet ---"
        )
        for n in forced:
            why = (
                "new, no driver row yet"
                if latest_row.get(n) is None
                else f"rewritten r{cdr.REWRITES[n]}"
            )
            lines.append(f'    "{n}": {entries[n]},  # {why}')
    last_rnd = None
    for n in rest:
        rnd = latest_row[n]
        if rnd != last_rnd:
            age = current_round - rnd
            cap_note = " (must be in the next batch)" if age >= 3 else ""
            lines.append(f"    # --- r{rnd} rows (age {age}){cap_note} ---")
            last_rnd = rnd
        lines.append(f'    "{n}": {entries[n]},')
    lines.append("    # --- non-oracled entries (rows-only driver check; order free) ---")
    for n in non_oracled:
        lines.append(f'    "{n}": {entries[n]},')
    new_body = "\n".join(lines) + "\n"

    new_src = src[: m.start(1)] + new_body + src[m.end(1) :]
    if "--dry-run" in sys.argv:
        print(new_body)
        return 0
    with open(path, "w") as f:
        f.write(new_src)
    print(
        f"rotated: {len(forced)} forced, {len(rest)} by age, "
        f"{len(non_oracled)} non-oracled; batch head = {([*forced, *rest][:5])}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
