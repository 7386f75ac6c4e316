"""Gap-based sessionization + custom stateful streaming operators.

The reference has no streaming surface (SURVEY §2.7); these are the
north-star training-pipeline additions. Sessionization is ONE logical
operation with two physical strategies:

- **batch** (``sessionize_batch``): lag + cumulative-sum over a
  per-user window — fully SQL-expressible, so the DuckDB oracle checks
  it exactly. One shuffle on ``user_id``; at 100 TB the window state per
  key is O(1) (running sum), no skew beyond the hottest user.
- **streaming** (``sessionize_stream``): Spark's native
  ``session_window`` with a watermark — the engine merges gap-joined
  windows incrementally; state is evicted by the watermark. The pytest
  suite proves batch == stream on the same input.

Session boundary rule (both paths): an event starts a NEW session when
``ts - prev_ts >= gap`` — identical to ``session_window`` semantics,
where a session's window is ``[first_event, last_event + gap)`` and
an event at exactly ``last + gap`` does not overlap it.

``stateful_dedup_first`` is the ``applyInPandasWithState`` shape: exact
streaming keep-first dedup whose state (keys seen) persists across
micro-batches — the custom-stateful-operator seam a real pipeline uses
for cross-batch dedup, rate limiting, or novelty detection.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP = "30 minutes"


def _gap_seconds(gap: str) -> int:
    qty, unit = gap.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600}[unit]
    return int(qty) * mult


def _with_event_seconds(events: DataFrame) -> DataFrame:
    # ts is epoch-nanosecond longs (parquet TIMESTAMP(NANOS) read with
    # nanosAsLong); both paths reduce to whole seconds so batch and
    # stream bucket identically.
    return events.withColumn("__ts_sec", F.expr("ts div 1000000000"))


def sessionize_batch(
    events: DataFrame, *, gap: str = DEFAULT_GAP
) -> DataFrame:
    """Per-user sessions in batch mode: lag + running sum of boundary
    flags. Output: (user_id, session_start, session_end, n_events,
    value_sum) — session_start/end in epoch seconds."""
    gap_s = _gap_seconds(gap)
    w = Window.partitionBy("user_id").orderBy("__ts_sec", "event_id")
    flagged = (
        _with_event_seconds(events)
        .withColumn("__prev", F.lag("__ts_sec").over(w))
        .withColumn(
            "__new_session",
            F.when(
                F.col("__prev").isNull()
                | (F.col("__ts_sec") - F.col("__prev") >= gap_s),
                1,
            ).otherwise(0),
        )
        .withColumn("__session_no", F.sum("__new_session").over(w))
    )
    return (
        flagged.groupBy("user_id", "__session_no")
        .agg(
            F.min("__ts_sec").alias("session_start"),
            F.max("__ts_sec").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,3)"))
            .cast("double")
            .alias("value_sum"),
        )
        .drop("__session_no")
        .select("user_id", "session_start", "session_end", "n_events", "value_sum")
    )


def sessionize_stream(
    events: DataFrame, *, gap: str = DEFAULT_GAP, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming sessionization via native ``session_window``; emits the
    same (user_id, session_start, session_end, n_events, value_sum) rows
    as the batch path (session_window.end is last_event + gap, so the
    true last-event time is tracked as max(__ts_sec))."""
    gap_s = _gap_seconds(gap)
    with_ts = _with_event_seconds(events).withColumn(
        "__event_time", F.expr("cast(__ts_sec as timestamp)")
    )
    if with_ts.isStreaming:
        with_ts = with_ts.withWatermark("__event_time", watermark)
    return (
        with_ts.groupBy(
            F.session_window("__event_time", f"{gap_s} seconds"), "user_id"
        )
        .agg(
            F.min("__ts_sec").alias("session_start"),
            F.max("__ts_sec").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,3)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "value_sum")
    )


def dedup_within_watermark(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    delay: str = "1 hour",
) -> DataFrame:
    """Built-in bounded-state streaming dedup:
    ``dropDuplicatesWithinWatermark`` keeps one row per key among rows
    whose event times fall within the watermark delay of each other,
    then EVICTS the key's state once the watermark passes — unlike
    plain ``dropDuplicates``, whose state grows without bound on a
    stream. Complements ``stateful_dedup_first`` (exact keep-first
    forever, custom state) when at-most-once-per-window is enough.
    Batch mode degrades to plain per-key dedup (no time bound), so
    batch ≡ stream only when all duplicates fall inside the delay —
    asserted in the test with a wide-enough delay.
    """
    src = _with_event_seconds(events).select(
        key_col,
        "event_id",
        F.expr("cast(__ts_sec as timestamp)").alias("event_time"),
    )
    if src.isStreaming:
        return src.withWatermark("event_time", delay).dropDuplicatesWithinWatermark(
            [key_col]
        )
    return src.dropDuplicates([key_col])


def stateful_dedup_first(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming exact keep-first dedup with cross-micro-batch state
    (``applyInPandasWithState``): the first row per ``key_col`` value is
    emitted; every later occurrence — in the same OR any later
    micro-batch — is dropped. State per group is one boolean.

    At scale: state is partitioned by the grouping key across executors
    and lives in the state store; only first-occurrence rows cross the
    output boundary.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} long, {id_col} long, first_ts_sec long"
    state_schema = "seen boolean"

    src = _with_event_seconds(events).select(key_col, id_col, "__ts_sec")

    def keep_first(
        key: tuple, pdfs: Iterator[Any], state: GroupState
    ) -> Iterator[Any]:
        import pandas as pd

        if state.exists and state.get[0]:
            # already emitted in an earlier micro-batch: consume + drop
            for _ in pdfs:
                pass
            return
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            row = pdf.sort_values(["__ts_sec", id_col]).iloc[0]
            if best is None or (row["__ts_sec"], row[id_col]) < best[:2]:
                best = (row["__ts_sec"], row[id_col])
        if best is not None:
            state.update((True,))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    id_col: [best[1]],
                    "first_ts_sec": [best[0]],
                }
            )

    return src.groupBy(key_col).applyInPandasWithState(
        keep_first,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
