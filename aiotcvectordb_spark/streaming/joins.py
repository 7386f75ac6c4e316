"""Streaming joins — stream-static enrichment and the interval
(time-range) stream-stream join; each is one transformation that works
identically in batch and stream.

Batch mode: an equi-join on the group key plus a time-range predicate —
Catalyst runs a hash join on ``user_id`` and filters the range, which is
the right plan (the range never becomes a cartesian). Oracle-checkable
as plain SQL.

Streaming mode: the canonical stream-stream inner join. Both sides get
watermarks; the time-range condition bounds the join state, so Spark
evicts buffered rows once the watermark passes ``left.time - window``.
Without the range bound a stream-stream join would buffer forever —
the watermark+range pair IS the scale story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_events(events: DataFrame, dims: DataFrame) -> DataFrame:
    """Stream-static dimension enrichment: left-join each event to a
    small static dimension table keyed on ``event_type``.

    In streaming mode this is Spark's stream-static join — stateless,
    no watermark needed; the static side is broadcast to every task of
    every micro-batch, so it scales to any stream rate as long as the
    dimension fits in executor memory (the standard star-schema shape).
    The same call works on a batch DataFrame, so batch ≡ stream is
    testable directly.
    """
    return (
        events.join(F.broadcast(dims), "event_type", "left")
        .select("event_id", "user_id", "event_type", "value", *(
            c for c in dims.columns if c != "event_type"
        ))
    )


def purchases_with_recent_clicks(
    purchases: DataFrame,
    clicks: DataFrame,
    *,
    window_s: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """For every purchase, all clicks by the same user in the preceding
    ``window_s`` seconds (inclusive both ends). Output:
    (user_id, purchase_id, click_id, gap_s).

    Both inputs carry the events schema (``ts`` = epoch-nanosecond long).
    """
    p = purchases.select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.expr("ts div 1000000000").alias("p_sec"),
        F.expr("cast(ts div 1000000000 as timestamp)").alias("p_time"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.expr("ts div 1000000000").alias("c_sec"),
        F.expr("cast(ts div 1000000000 as timestamp)").alias("c_time"),
    )
    if p.isStreaming:
        p = p.withWatermark("p_time", watermark)
    if c.isStreaming:
        c = c.withWatermark("c_time", watermark)
    cond = (
        (p["user_id"] == c["c_user_id"])
        & (c["c_time"] >= p["p_time"] - F.expr(f"INTERVAL {window_s} SECONDS"))
        & (c["c_time"] <= p["p_time"])
    )
    return (
        p.join(c, cond, "inner")
        .select(
            "user_id",
            "purchase_id",
            "click_id",
            (F.col("p_sec") - F.col("c_sec")).alias("gap_s"),
        )
    )
