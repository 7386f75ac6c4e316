"""Exact recursive EWMA — batch and streaming-stateful physical plans.

The registry's ``ewma_smooth`` is the FINITE-window formulation (scan
+ one window shuffle, SQL-oracled). This module is the exact
*recursive* EWMA ``y_t = (1-a)*y_{t-1} + a*x_t`` — inherently
sequential per key, which makes it the canonical custom-stateful
streaming operator:

- **batch** (``ewma_batch``): one shuffle on the key into
  ``applyInPandas``; pandas' C-implemented ``ewm(adjust=False)`` does
  the per-key O(n) recursion vectorized. Groups are independent → the
  sequential part never crosses a key boundary.
- **streaming** (``ewma_stream``): ``applyInPandasWithState`` carrying
  one double of state per key (the last smoothed value) across
  micro-batches. The recursion continues bit-exactly from the state:
  the state value is prepended as the seed observation, so a chunked
  replay in key-time order reproduces the batch output exactly
  (asserted in tests/test_stream_ewma.py).

The reference has no streaming surface (it is an HTTP client —
reference: aiotcvectordb/client/stub.py); this is a north-star
training-pipeline addition.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

DEFAULT_ALPHA = 0.3

_OUT_SCHEMA = "user_id long, event_id long, ewma double"


def _ordered(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(["ts", "event_id"])


def ewma_batch(
    events: DataFrame, *, alpha: float = DEFAULT_ALPHA
) -> DataFrame:
    """Exact recursive EWMA per user over (ts, event_id)-ordered
    events. Returns (user_id, event_id, ewma)."""
    a = float(alpha)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = _ordered(pdf)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "ewma": pdf["value"].ewm(alpha=a, adjust=False).mean(),
            }
        )

    src = events.select("user_id", "event_id", "ts", "value")
    return src.groupBy("user_id").applyInPandas(fold, schema=_OUT_SCHEMA)


def ewma_stream(
    events: DataFrame, *, alpha: float = DEFAULT_ALPHA
) -> DataFrame:
    """Streaming-stateful exact EWMA: one double of state per key.

    Within a micro-batch rows are folded in (ts, event_id) order; the
    final smoothed value is saved and seeds the next micro-batch, so an
    ordered replay equals ``ewma_batch`` on the union of the batches.
    State is one (double, long, long) per key in the state store —
    partitioned by the grouping key across executors, O(1) per key.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    a = float(alpha)
    state_schema = "last double, last_ts long, last_id long"

    def fold(
        key: tuple, pdfs: Iterator[Any], state: GroupState
    ) -> Iterator[Any]:
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = _ordered(pd.concat(chunks, ignore_index=True))
        vals = pdf["value"].to_numpy(dtype="float64")
        if state.exists:
            seed = state.get[0]
            # prepend the carried value: ewm(adjust=False)'s recursion
            # then continues it exactly (y_1 = (1-a)*seed + a*x_1)
            s = pd.Series([seed, *vals]).ewm(alpha=a, adjust=False).mean()
            out = s.to_numpy()[1:]
        else:
            out = pd.Series(vals).ewm(alpha=a, adjust=False).mean().to_numpy()
        last_row = pdf.iloc[-1]
        state.update((float(out[-1]), int(last_row["ts"]), int(last_row["event_id"])))
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "ewma": out,
            }
        )

    src = events.select("user_id", "event_id", "ts", "value")
    return src.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=_OUT_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
