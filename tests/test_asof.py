"""As-of join: backward-inclusive match, tie rule, tolerance, and
left-outer nulls — verified against an in-memory reference."""

from __future__ import annotations

from conftest import load_events

from aiotcvectordb_spark.operators.asof import asof_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_and_ties(spark):
    left = _mk(
        spark,
        [(1, 100, "p1"), (1, 200, "p2"), (1, 50, "p0"), (2, 100, "q1")],
        "user_id long, t long, name string",
    )
    right = _mk(
        spark,
        # user 1: clicks at 60, 100 (two rows tie at t=100 -> id 11 wins), 150
        [(1, 60, 9), (1, 100, 10), (1, 100, 11), (1, 150, 12), (3, 10, 13)],
        "user_id long, t long, rid long",
    )
    out = {
        r.name: r.rid
        for r in asof_join(
            left, right, on="t", by="user_id", tiebreak="rid"
        ).collect()
    }
    assert out["p0"] is None  # nothing at or before t=50
    assert out["p1"] == 11  # inclusive match at equal t; max-rid tie rule
    assert out["p2"] == 12  # most recent <= 200
    assert out["q1"] is None  # user 2 has no right rows


def test_asof_tolerance(spark):
    left = _mk(spark, [(1, 1000, "a"), (1, 2000, "b")], "user_id long, t long, name string")
    right = _mk(spark, [(1, 900, 1)], "user_id long, t long, rid long")
    out = {
        r.name: r.rid
        for r in asof_join(
            left, right, on="t", by="user_id", tiebreak="rid", tolerance=200
        ).collect()
    }
    assert out["a"] == 1  # within 200
    assert out["b"] is None  # 1100 back > tolerance


def test_asof_matches_pandas_merge_asof(spark, sf_dir):
    """Cross-check the distributed result against pandas merge_asof on
    the real events table."""
    import pandas as pd

    events = load_events(spark, sf_dir)
    left = events.filter("event_type = 'purchase'").select(
        "user_id", "event_id", "ts"
    )
    right = events.filter("event_type = 'click'").select(
        "user_id", "ts", "event_id"
    )
    got = {
        (r.user_id, r.event_id): r.click_id
        for r in asof_join(
            left,
            right.withColumnRenamed("event_id", "click_id"),
            on="ts",
            by="user_id",
            tiebreak="click_id",
            right_cols=["click_id"],
        ).collect()
    }

    lp = left.toPandas().sort_values("ts", kind="mergesort")
    rp = (
        right.toPandas()
        .rename(columns={"event_id": "click_id"})
        .sort_values(["ts", "click_id"], kind="mergesort")
        # pandas merge_asof keeps the LAST row among equal ts; pre-sorting
        # by (ts, click_id) makes that the max click_id = our tie rule
    )
    ref = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="backward", allow_exact_matches=True
    )
    want = {
        (r.user_id, r.event_id): (None if pd.isna(r.click_id) else int(r.click_id))
        for r in ref.itertuples()
    }
    assert got == want
