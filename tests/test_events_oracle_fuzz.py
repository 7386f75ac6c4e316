"""Adversarial-corpus oracle parity for the events family.

The driver corpus's event stream is uniformly random, so the
sessionize/window/as-of oracles never face the shapes production
streams have: exact-duplicate timestamps (ordering ties), gaps exactly
at the session threshold, events on window boundaries, single-event
users, degenerate all-equal-value groups, and odd JSON props. This
sweep runs every events-based oracled query on such a stream and
compares with the driver's (rowcount, columns, value-hash) rule.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aiotcvectordb_spark import queries as Q

QUERY_NAMES = [
    "sessionize",
    "sessionize_udtf",
    "event_window_agg",
    "sliding_window_agg",
    "rolling_active_users",
    "retention_cohorts",
    "funnel_steps",
    "attribution_last_touch",
    "time_gap_fill",
    "ewma_smooth",
    "zscore_outliers",
    "window_range_frame",
    "percentile_disc",
    "percentiles",
    "asof_join",
    "interval_join",
    "json_extract",
    "query_by_ids",
    "query_filter_sort_paginate",
    "delete_filter_limit",
    "ttl_filter",
]

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk_events():
    """Hostile but in-schema event stream."""
    rows = []
    eid = 0

    def add(ts, user, etype, value, props='{"k": 1}'):
        nonlocal eid
        rows.append((eid, ts, user, etype, value, props))
        eid += 1

    m = dt.timedelta(minutes=1)
    # user 1: exact-duplicate timestamps (ordering ties), then a gap
    # exactly at a plausible session threshold (30 min), then 1s past
    add(_T0, 1, "click", 1.0)
    add(_T0, 1, "view", 2.0)
    add(_T0, 1, "click", 3.0)
    add(_T0 + 30 * m, 1, "view", 4.0)
    add(_T0 + 60 * m + dt.timedelta(seconds=1), 1, "buy", 5.0)
    # user 2: single event at an exact hour boundary
    add(_T0 + dt.timedelta(hours=3), 2, "click", 0.0)
    # user 3: dense burst every second straddling a minute boundary
    for i in range(120):
        add(_T0 + dt.timedelta(seconds=30 + i), 3, "view", float(i % 7))
    # user 4: funnel exactly in order with duplicate steps
    for et in ("click", "click", "view", "buy", "buy"):
        add(_T0 + len(rows) * m, 4, et, 10.0)
    # user 5: funnel out of order
    for et in ("buy", "view", "click"):
        add(_T0 + len(rows) * m, 5, et, -1.5)
    # event_type 'flat': every value identical (sigma == 0 group)
    for i in range(8):
        add(_T0 + i * m, 6, "flat", 42.0)
    # extremes and negatives
    add(_T0 + 5 * m, 7, "error", -1e9)
    add(_T0 + 6 * m, 7, "error", 1e9)
    add(_T0 + 7 * m, 7, "error", 0.0)
    # JSON edge shapes (in-schema: always an object with int k when present)
    add(_T0 + 8 * m, 8, "click", 1.25, '{"k": 0}')
    add(_T0 + 9 * m, 8, "click", 1.25, '{"k": 999999}')
    add(_T0 + 10 * m, 8, "view", 1.25, '{"k": 7, "extra": "x"}')
    # many users with one event each (cohort/retention edges)
    for u in range(20, 60):
        add(_T0 + dt.timedelta(days=u % 14, minutes=u), u, "click", float(u) / 3)
    # a second wave for retention overlap
    for u in range(20, 40):
        add(_T0 + dt.timedelta(days=7 + u % 3, minutes=u), u, "view", 2.5)
    return rows


@pytest.fixture(scope="module")
def nasty_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("nasty_events_sf")
    rows = _mk_events()
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))
    # some events queries join dimension tables: give them the real
    # tiny sf0.001 copies so the adversarial part stays the stream
    import shutil

    for t in ("orders", "customer", "nation", "region", "supplier",
              "part", "lineitem", "documents", "embeddings"):
        src = f"/root/testdata/sf0.001/{t}.parquet"
        if os.path.exists(src):
            shutil.copyfile(src, str(d / f"{t}.parquet"))
    return str(d)


def _norm_hash(df) -> str:
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        if str(d[c].dtype) in ("float64", "float32"):
            d[c] = d[c].astype("float64").round(9)
    rows = sorted(
        tuple(str(v) for v in row)
        for row in d.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_events_query_matches_oracle_on_nasty_stream(spark, nasty_sf, name):
    sdf = Q.QUERIES[name](spark, nasty_sf).toPandas()

    con = duckdb.connect()
    for t in ("events", "orders", "customer", "nation", "region",
              "supplier", "part", "lineitem", "documents", "embeddings"):
        p = f"{nasty_sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    odf = con.sql(Q.ORACLES[name]).df()

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} != {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), (
        f"{name}: rows spark={len(sdf)} oracle={len(odf)}"
    )
    if _norm_hash(sdf) != _norm_hash(odf):
        s_rows = sorted(
            tuple(str(v) for v in r)
            for r in sdf[sorted(sdf.columns)].itertuples(index=False, name=None)
        )
        o_rows = sorted(
            tuple(str(v) for v in r)
            for r in odf[sorted(odf.columns)].itertuples(index=False, name=None)
        )
        diff = next(
            (i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b),
            min(len(s_rows), len(o_rows)) - 1,
        )
        pytest.fail(
            f"{name}: value hash mismatch; first differing sorted row "
            f"#{diff}:\n  spark : {s_rows[diff]}\n  oracle: {o_rows[diff]}"
        )
