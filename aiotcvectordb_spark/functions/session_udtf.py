"""Gap sessionization as a SQL *table function* (Spark 4 Python UDTF).

``streaming/session.py`` provides the programmatic batch/stream
sessionizers; this module is the SQL-ergonomics surface for the same
semantics (the analogue of ``topk_by_score`` for kNN): one statement
assigns gap-based session numbers to an event stream —

    SELECT user_id, ts_sec, session_no
    FROM sessionize_by_gap(
        TABLE(SELECT user_id, event_id, ts_sec, value FROM events)
        PARTITION BY user_id ORDER BY (ts_sec, event_id),
        1800)

Scale notes. ``PARTITION BY user_id ORDER BY (...)`` makes Spark hash-
shuffle once on the user key and sort within partitions — the same one
shuffle the window-function formulation pays — and the UDTF itself is
O(1) state per group (previous timestamp + counter), streaming rows
through the Arrow boundary without buffering a user's history. A new
session starts when the gap to the previous event is >= ``gap``
seconds, matching ``session.sessionize_batch`` and the DuckDB oracle
(``ORACLE_SESSIONIZE``) exactly, so the SQL surface is hash-verified
against the same ground truth as the programmatic one.
"""

from __future__ import annotations

from pyspark.sql.types import LongType, StructType


class SessionizeByGap:
    """UDTF: append a per-group ``session_no`` (1-based) to each input
    row. Requires a TABLE argument with a numeric ``ts_sec`` column,
    PARTITION BY the session key, ORDER BY the event time; the second
    argument is the inactivity gap in seconds."""

    def __init__(self):
        self._prev = None
        self._n = 0

    @staticmethod
    def analyze(row, gap):
        from pyspark.sql.udtf import AnalyzeResult

        names = [f.name for f in row.dataType.fields]
        if "ts_sec" not in names:
            raise ValueError(
                "sessionize_by_gap: the TABLE argument must have a "
                "'ts_sec' column (seconds since epoch)"
            )
        schema = StructType(list(row.dataType.fields)).add(
            "session_no", LongType()
        )
        return AnalyzeResult(schema=schema)

    def eval(self, row, gap: int):
        ts = row["ts_sec"]
        if ts is None:
            return  # unordered rows can't belong to a session
        if self._prev is None or ts - self._prev >= gap:
            self._n += 1
        self._prev = ts
        yield (*row, self._n)


def register_sessionize_udtf(spark) -> str:
    """Register :class:`SessionizeByGap` as the SQL table function
    ``sessionize_by_gap``. Returns the registered name."""
    from pyspark.sql.functions import udtf

    spark.udtf.register("sessionize_by_gap", udtf(SessionizeByGap))
    return "sessionize_by_gap"


def sessionize_sql(
    table: str,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts_sec",
    tiebreak_col: str = "event_id",
    gap_seconds: int = 1800,
) -> str:
    """Emit the sessionization as ONE SQL statement over ``table``
    (which must already expose ``ts_sec``; alias in the projection if
    the source stores raw timestamps)."""
    return f"""
SELECT * FROM sessionize_by_gap(
    TABLE(SELECT * FROM {table})
    PARTITION BY {key_col} ORDER BY ({ts_col}, {tiebreak_col}),
    {gap_seconds})
"""
