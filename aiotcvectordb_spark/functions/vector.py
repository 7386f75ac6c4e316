"""Vector scoring expressions (JVM-side, codegen'd — no Python UDFs).

Implements the three metrics the reference exposes
(reference: aiotcvectordb/client/stub.py:618-621 —
IP: higher better, radius keeps score >= r;
COSINE: score in [-1,1], higher better, radius keeps score >= r;
L2: lower better, radius keeps score <= r).

All arithmetic is done in DOUBLE regardless of the stored element type
so results are reproducible against the DuckDB oracle. The expressions
stay inside whole-stage codegen (higher-order functions
``zip_with``/``aggregate``), i.e. the hot path never leaves the JVM.

For very wide vectors an Arrow-vectorized pandas_udf scorer exists in
``aiotcvectordb_spark.operators.knn`` as the scale path; these SQL
expressions are the reference implementation used for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

COSINE = "COSINE"
IP = "IP"
L2 = "L2"
METRICS = (COSINE, IP, L2)


def _dot_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0 as double), (acc, v) -> acc + v)"
    )


def dot_score(vec_col: str, query_col: str) -> Column:
    """Inner product of two array columns, computed in double."""
    return F.expr(_dot_expr(vec_col, query_col))


def vector_norm(vec_col: str) -> Column:
    """L2 norm of an array column."""
    return F.sqrt(F.expr(_dot_expr(vec_col, vec_col)))


def cosine_score(vec_col: str, query_col: str) -> Column:
    return dot_score(vec_col, query_col) / (vector_norm(vec_col) * vector_norm(query_col))


def l2_score(vec_col: str, query_col: str) -> Column:
    """Euclidean distance (lower is better)."""
    return F.sqrt(
        F.expr(
            f"aggregate(zip_with({vec_col}, {query_col}, "
            f"(x, y) -> (cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), "
            f"cast(0 as double), (acc, v) -> acc + v)"
        )
    )


def metric_score(metric: str, vec_col: str, query_col: str) -> Column:
    m = metric.upper()
    if m == COSINE:
        return cosine_score(vec_col, query_col)
    if m == IP:
        return dot_score(vec_col, query_col)
    if m == L2:
        return l2_score(vec_col, query_col)
    raise ValueError(f"unknown metric {metric!r}; expected one of {METRICS}")


def score_is_better_desc(metric: str) -> bool:
    """True if higher score is better (IP/COSINE); False for L2.

    Mirrors reference stub.py:618-621 radius semantics.
    """
    m = metric.upper()
    if m in (COSINE, IP):
        return True
    if m == L2:
        return False
    raise ValueError(f"unknown metric {metric!r}")
