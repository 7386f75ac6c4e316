"""Physical-plan audit helpers: make scale properties testable.

A plan that "works" at sf0.01 can be catastrophically wrong at 100 TB —
a scan that reads all columns, a filter evaluated above the scan, a
sort-merge join where a broadcast was intended, a global single-partition
window. These helpers turn those properties into assertions so tests
lock them in (SURVEY §4.3: the pushdown/pruning work Catalyst does for
free is only free if the plan actually shows it).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same text as .explain("formatted")
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All parquet/file-scan pushed predicates in the plan."""
    plan = executed_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[", plan):
        # predicates nest brackets (e.g. In(label, [1,2])): walk to the
        # balanced closing bracket instead of the first ']'
        depth, i = 1, m.end()
        while i < len(plan) and depth:
            if plan[i] == "[":
                depth += 1
            elif plan[i] == "]":
                depth -= 1
            i += 1
        body = plan[m.end() : i - 1].strip()
        if body:
            out.extend(p.strip() for p in _split_top_level(body))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists, one per file scan (column-pruning check)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", executed_plan(df)):
        cols = [c.split(":")[0].strip() for c in _split_top_level(m.group(1)) if c]
        out.append(cols)
    return out


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    filters = pushed_filters(df)
    assert any(fragment in f for f in filters), (
        f"expected a pushed filter containing {fragment!r}; got {filters}"
    )

def assert_column_pruned(df: DataFrame, column: str) -> None:
    scans = scan_columns(df)
    assert scans, "no file scans in plan"
    offenders = [cols for cols in scans if column in cols]
    assert not offenders, (
        f"column {column!r} should be pruned from every scan; scans={scans}"
    )


def count_shuffles(df: DataFrame) -> int:
    """Shuffle exchanges only — broadcasts move a small relation, not
    the dataset, so BroadcastExchange does not count."""
    return len(re.findall(r"(?<!Broadcast)Exchange ", executed_plan(df)))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or (
        "BroadcastNestedLoopJoin" in executed_plan(df)
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, "plan contains a CartesianProduct"


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside (), <>, or []."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "(<[":
            depth += 1
        elif ch in ")>]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts
