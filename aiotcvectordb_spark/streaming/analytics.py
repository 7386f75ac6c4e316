"""Streaming twins for the carry-forward / rolling event-analytics ops.

The registry's ``attribution_last_touch`` and ``rolling_active_users``
are batch shapes with natural streaming counterparts (the reference has
no streaming surface — it is an HTTP client, aiotcvectordb/client/
stub.py; these are north-star training-pipeline additions):

- **last-touch attribution** is a per-user carry-forward — the same
  one-value-of-state-per-key shape as the recursive EWMA
  (streaming/ewma.py), so the streaming plan is
  ``applyInPandasWithState`` carrying the last touch type per user
  across micro-batches. Under in-order replay the attributed purchase
  rows equal the batch window (``last_value IGNORE NULLS``) exactly.
- **7-day rolling distinct users** keeps the batch operator's
  scale-safe shape (dedupe to (day, user), explode each pair into the
  7 window-end days it supports, count distinct) but maintains it
  INCREMENTALLY with the repo's idempotent ``foreachBatch`` epoch-log
  pattern (streaming/neardup.py): each epoch appends only the
  never-seen (day, user) pairs to a log and recomputes only the
  win_days those fresh pairs support — per-epoch work is bounded by
  the batch size plus a 7-day slice of the log, never the full
  history.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from aiotcvectordb_spark.streaming.epochlog import epoch_ids

_NS_PER_DAY = 86400000000000

_ATTR_OUT_SCHEMA = "user_id long, event_id long, touch_type string, value double"
_TOUCH_TYPES = ("click", "view")


def _day_col(ts_col: str = "ts"):
    return F.expr(f"{ts_col} div {_NS_PER_DAY}")


# --------------------------------------------------------------------------
# Last-touch attribution
# --------------------------------------------------------------------------


def attribution_batch(events: DataFrame) -> DataFrame:
    """Per-purchase last-touch attribution rows
    (user_id, event_id, touch_type, value); touch_type is NULL when no
    click/view precedes the purchase. One key-partitioned window
    shuffle — the same plan as the registry aggregate's first stage."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    touch = F.last(
        F.when(F.col("event_type").isin(*_TOUCH_TYPES), F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        events.select("user_id", "event_id", "ts", "event_type", "value")
        .withColumn("touch_type", touch)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "touch_type", "value")
    )


def attribution_stream(events: DataFrame) -> DataFrame:
    """Streaming-stateful last-touch attribution: ONE string of state
    per user (the last touch type seen). Within a micro-batch rows fold
    in (ts, event_id) order; the carried touch seeds the next batch, so
    in-order replay equals ``attribution_batch`` exactly (asserted in
    tests/test_stream_analytics.py). State is O(1) per user."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    state_schema = "touch string"

    def fold(
        key: tuple, pdfs: Iterator[Any], state: GroupState
    ) -> Iterator[Any]:
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        carried = state.get[0] if state.exists else None
        out = []
        for ev_id, etype, value in zip(
            pdf["event_id"], pdf["event_type"], pdf["value"]
        ):
            if etype in _TOUCH_TYPES:
                carried = etype
            elif etype == "purchase":
                out.append((key[0], int(ev_id), carried, float(value)))
        state.update((carried,))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "touch_type", "value"]
            )

    src = events.select("user_id", "event_id", "ts", "event_type", "value")
    return src.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=_ATTR_OUT_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def attribution_rollup(attributed: DataFrame, round_digits: int = 6) -> DataFrame:
    """(touch_type, n_purchases, total_value) — the registry aggregate,
    shared by the batch and streaming paths so the equivalence test
    compares like with like."""
    return (
        attributed.groupBy(
            F.coalesce("touch_type", F.lit("none")).alias("touch_type")
        )
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("value"), round_digits).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# 7-day rolling distinct active users (streaming WAU)
# --------------------------------------------------------------------------


def _read_pair_log(spark, pairs_dir: str) -> DataFrame:
    """All (day, user) pairs committed so far. Empty frame ONLY when no
    epoch directory exists (checked explicitly via the Hadoop FS
    listing — a transient read failure re-raises so the micro-batch
    retries, instead of silently treating every batch pair as
    never-seen and undercounting nothing/overwriting the curve from a
    partial history; r8, was a bare-except→empty). Deliberately reads
    ALL epochs including a replaying epoch's own (the log commits LAST,
    so a committed epoch implies its results are already on disk and
    the replay's early-return is the idempotence mechanism)."""
    epochs = epoch_ids(spark, pairs_dir)
    if not epochs:
        return spark.createDataFrame([], "day long, user_id long")
    paths = [f"{pairs_dir}/epoch={e}" for e in epochs]
    return (
        spark.read.option("basePath", pairs_dir)
        .parquet(*paths)
        .select("day", "user_id")
    )


def stream_wau_sink(pairs_dir: str, results_dir: str, *, window_days: int = 7):
    """Returns a ``foreachBatch`` callable maintaining the rolling
    distinct-actives curve incrementally.

    Per epoch: dedupe the batch to (day, user), anti-join against the
    accumulated pair log (only NEVER-SEEN pairs do further work), append
    them under ``pairs_dir/epoch=N``, then recompute ONLY the win_days
    those fresh pairs support — reading just the ``window_days``-wide
    slice of the log they can see — and overwrite those win_day
    partitions under ``results_dir`` (dynamic partition overwrite, so
    replaying an epoch is idempotent). A win_day appears once its own
    day has events, matching the batch operator."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        du = (
            batch_df.select(_day_col().alias("day"), "user_id").distinct()
        )
        prior = _read_pair_log(spark, pairs_dir)
        fresh = du.join(prior, ["day", "user_id"], "left_anti").persist()
        try:
            if not fresh.head(1):
                return
            # win_days this batch can change: each fresh (day, user)
            # supports day..day+6 — a bounded, batch-driven set
            affected = (
                fresh.select(
                    F.explode(
                        F.expr(f"sequence(day, day + {window_days - 1})")
                    ).alias("win_day")
                ).distinct()
            )
            # recompute against prior-log ∪ fresh (NOT the on-disk log):
            # the pair-log epoch commits LAST, so a crash between the
            # results write and the log write replays as fresh-again and
            # recomputes — never a committed log with missing results
            log = prior.unionByName(fresh)
            active_days = log.select(F.col("day").alias("win_day")).distinct()
            recompute = (
                log.select(
                    F.explode(
                        F.expr(f"sequence(day, day + {window_days - 1})")
                    ).alias("win_day"),
                    "user_id",
                )
                .join(F.broadcast(affected.join(active_days, "win_day")), "win_day")
                .groupBy("win_day")
                .agg(F.countDistinct("user_id").alias("wau"))
            )
            (
                recompute.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("win_day")
                .parquet(results_dir)
            )
            # commit point: once the epoch appears in the pair log its
            # results are already on disk
            fresh.write.mode("overwrite").parquet(
                os.path.join(pairs_dir, f"epoch={epoch_id}")
            )
        finally:
            fresh.unpersist()

    return apply_batch


def read_wau(spark, results_dir: str) -> DataFrame:
    """The maintained curve: (win_day, wau) for every active win_day."""
    return (
        spark.read.option("basePath", results_dir)
        .parquet(os.path.join(results_dir, "win_day=*"))
        .select(F.col("win_day").cast("long").alias("win_day"), "wau")
    )
