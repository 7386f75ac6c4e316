"""Event-time normalization for the events source.

The driver's ``events.parquet`` has shipped with ``ts`` as parquet
TIMESTAMP(NANOS) — which Spark reads as BIGINT epoch-nanos under
``spark.sql.legacy.parquet.nanosAsLong`` — and as TIMESTAMP(MICROS),
which reads as TIMESTAMP_NTZ. The engine's canonical event-time
representation is BIGINT epoch-nanoseconds (integer arithmetic is
timezone-free and cross-engine exact), so every events reader funnels
through :func:`normalize_event_time`.

Under a UTC session timezone the NTZ->epoch conversion matches DuckDB's
``epoch_ns(ts)`` on the same naive parquet timestamps, which is what the
oracle SQL uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Coerce a timestamp-typed ``col`` to BIGINT epoch-nanos; BIGINT
    input (nanosAsLong read of TIMESTAMP(NANOS)) passes through."""
    if col in df.columns and isinstance(
        df.schema[col].dataType, (T.TimestampType, T.TimestampNTZType)
    ):
        df = df.withColumn(
            col, F.unix_micros(F.col(col).cast("timestamp")) * F.lit(1000)
        )
    return df
