"""Registry cross-references: every name used by the driver contract,
bench, and the scale probe must resolve to a real queries() entry.
Pure-Python lint — no Spark session."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from aiotcvectordb_spark import queries as Q


def test_every_oracle_has_a_query():
    missing = set(Q.ORACLES) - set(Q.QUERIES)
    assert not missing, f"oracles without queries: {missing}"


def test_bench_headline_resolves():
    import bench

    missing = set(bench.HEADLINE) - set(Q.QUERIES)
    assert not missing, f"bench headline without queries: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE)), "duplicate headline"


def test_scale_probe_resolves():
    import scale_probe

    missing = set(scale_probe.PROBE_QUERIES) - set(Q.QUERIES)
    assert not missing, f"probe names without queries: {missing}"


def test_oracle_sql_mentions_no_unregistered_tables():
    """Oracles may only reference the driver's pre-registered views."""
    import re

    allowed = {
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
        # DuckDB table functions
        "range", "unnest", "generate_series",
    }
    for name, sql in Q.ORACLES.items():
        tables = set(re.findall(r"(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)", sql))
        unknown = tables - allowed - {
            # CTE names and derived relations are fine; only flag names
            # that LOOK like base tables but aren't registered. CTEs are
            # declared in the same SQL text:
            *re.findall(
                r"([a-z_][a-z0-9_]*)\s*(?:\([a-z0-9_, ]*\))?\s+AS\s*(?:MATERIALIZED\s+)?\(",
                sql,
            ),
        }
        # subselects introduce parenthesized FROMs the regex skips; any
        # residual unknown name is a genuine missing view
        assert not unknown, f"{name}: unregistered tables {unknown}"


def test_driver_row_rotation_enforced():
    """No oracled query's driver row may lag a rewrite by >1 round or
    rot past the hard cap; registry order must be stalest-first
    (tools/check_driver_rows.py policy)."""
    import check_driver_rows

    assert check_driver_rows.main() == 0
