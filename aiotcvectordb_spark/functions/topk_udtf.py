"""Top-k as a SQL *table function* (Spark 4 Python UDTF).

The reference exposes search as a server-side call
(reference: aiotcvectordb/client/stub.py:583-640); the Spark-native
analogue of a "search endpoint reachable from SQL" is a table-valued
function. This module registers ``topk_by_score`` so that the whole
kNN surface — scoring *and* selection — can be written as one SQL
statement against any collection view:

    SELECT id, score
    FROM topk_by_score(
        TABLE(SELECT vec_id AS id,
                     cosine_sim(embedding, array(...)) AS score
              FROM embeddings)
        PARTITION BY pmod(hash(id), 32),
        10, true)

Scale notes. Scoring stays JVM-side (the ``cosine_sim`` SQL macro is a
Catalyst expression inside whole-stage codegen); only the narrow
``(id, score)`` pairs cross the Arrow boundary into the UDTF, and each
partition holds a bounded k-entry heap, so memory is O(k) per task and
the two-phase plan emitted by :func:`knn_topk_sql` shuffles at most
``parts * k`` rows. This is the SQL-ergonomics surface; the engine's
``operators/knn.py`` bounded-shuffle path remains the hot path for
programmatic calls (same algorithm, same plan shape).

Determinism: ties break by id ascending in both phases, matching
``operators/knn.local_topk`` and the DuckDB oracle's ORDER BY.
"""

from __future__ import annotations

import heapq

from pyspark.sql.types import DoubleType, StructType


class _RevId:
    """Reverses comparison order of an id so a min-heap evicts the
    LARGEST id among equal scores (ids may be strings — no negation)."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v


class TopKByScore:
    """UDTF: keep the k best (id, score) rows of each input partition.

    Args (per SQL call): a TABLE argument whose rows expose ``id`` and
    ``score`` columns, an INT ``k``, and a BOOLEAN ``descending``
    (true = higher score better, i.e. COSINE/IP; false = L2).
    """

    def __init__(self):
        self._heap: list = []
        self._k: int | None = None
        self._desc: bool = True

    @staticmethod
    def analyze(row, k, descending):
        # Propagate the input id column's type (BIGINT, STRING, ...)
        # into the output schema instead of hard-coding one.
        from pyspark.sql.udtf import AnalyzeResult

        id_fields = [f for f in row.dataType.fields if f.name == "id"]
        if not id_fields:
            raise ValueError(
                "topk_by_score: the TABLE argument must have an 'id' column"
            )
        schema = (
            StructType()
            .add("id", id_fields[0].dataType)
            .add("score", DoubleType())
        )
        return AnalyzeResult(schema=schema)

    def eval(self, row, k: int, descending: bool):
        self._k = k
        self._desc = bool(descending)
        if k <= 0:
            return
        score = row["score"]
        # NULL scores can't rank; NULL ids can't be returned meaningfully
        # (and would make the tie-break comparison raise in the worker).
        if score is None or row["id"] is None:
            return
        score = float(score)
        # Min-heap whose root is the WORST kept row: lowest score for
        # descending (ties: largest id), highest score for ascending.
        key = (score, _RevId(row["id"])) if self._desc else (
            -score,
            _RevId(row["id"]),
        )
        entry = (key, row["id"], score)
        if len(self._heap) < k:
            heapq.heappush(self._heap, entry)
        elif self._heap[0][0] < key:
            heapq.heapreplace(self._heap, entry)

    def terminate(self):
        rows = [(i, s) for _, i, s in self._heap]
        rows.sort(key=lambda t: t[0])  # id asc (stable tiebreak)
        rows.sort(key=lambda t: t[1], reverse=self._desc)
        for id_, score in rows:
            yield id_, score


def register_topk_udtf(spark) -> str:
    """Register :class:`TopKByScore` as the SQL table function
    ``topk_by_score``. Returns the registered name."""
    from pyspark.sql.functions import udtf

    spark.udtf.register("topk_by_score", udtf(TopKByScore))
    return "topk_by_score"


def knn_topk_sql(
    table: str,
    query_vec: list[float],
    *,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "COSINE",
    k: int = 10,
    parts: int = 32,
    where: str | None = None,
    round_digits: int | None = None,
) -> str:
    """Emit the two-phase bounded-shuffle top-k as ONE SQL statement.

    Phase 1 scores every row JVM-side and keeps k per hash partition
    (``PARTITION BY pmod(hash(id), parts)`` — no global sort); phase 2
    merges the ``parts * k`` survivors in a single partition. The same
    plan shape as ``operators/knn.local_topk``, but reachable from a
    plain ``spark.sql(...)`` / ``engine.sql(...)`` string.
    """
    from aiotcvectordb_spark.functions.vector import score_is_better_desc

    metric_fn = {
        "COSINE": "cosine_sim",
        "IP": "dot_product",
        "L2": "l2_distance",
    }[metric.upper()]
    desc = "true" if score_is_better_desc(metric) else "false"
    arr = "array(" + ", ".join(f"{v!r}D" for v in query_vec) + ")"
    where_sql = f"WHERE {where}" if where else ""
    score = f"{metric_fn}(cast({vector_col} AS ARRAY<DOUBLE>), {arr})"
    if round_digits is not None:
        # Round BEFORE selection so the rank order (score, id) is exact
        # across engines/partitionings — same convention as knn_search.
        score = f"round({score}, {round_digits})"
    return f"""
SELECT id, score FROM topk_by_score(
    TABLE(
        SELECT id, score FROM topk_by_score(
            TABLE(
                SELECT {id_col} AS id,
                       {score} AS score
                FROM {table} {where_sql}
            ) PARTITION BY (pmod(hash(id), {parts})),
            {k}, {desc})
    ) WITH SINGLE PARTITION,
    {k}, {desc})
"""
