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
HAMMING = "HAMMING"
METRICS = (COSINE, IP, L2, HAMMING)


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
    """Cosine similarity; a zero-norm vector scores 0.0 ("no
    similarity") instead of aborting the scan — under ANSI mode an
    unguarded norm division kills the whole job on the first
    zero embedding (failed upstream encodes are a fact of life in a
    100 TB embedding column). The SQL oracles apply the identical
    COALESCE/NULLIF so both engines agree."""
    return F.coalesce(
        dot_score(vec_col, query_col)
        / F.nullif(
            vector_norm(vec_col) * vector_norm(query_col), F.lit(0.0)
        ),
        F.lit(0.0),
    )


def l2_score(vec_col: str, query_col: str) -> Column:
    """Euclidean distance (lower is better)."""
    return F.sqrt(
        F.expr(
            f"aggregate(zip_with({vec_col}, {query_col}, "
            f"(x, y) -> (cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), "
            f"cast(0 as double), (acc, v) -> acc + v)"
        )
    )


def _dot_expr_unrolled(a: str, b: str, dim: int) -> str:
    """Dot product as a flat ``a[0]*b[0] + ... + a[d-1]*b[d-1]`` chain.

    Left-associated addition accumulates in exactly the same order as the
    sequential ``aggregate`` fold (and DuckDB's ``list_dot_product``), so
    results are bit-identical to :func:`dot_score` — but the expression
    stays inside whole-stage codegen instead of the interpreted
    higher-order-function path (~6x faster on dim-64 pair scoring).
    """
    return " + ".join(
        f"cast({a}[{i}] as double) * cast({b}[{i}] as double)" for i in range(dim)
    )


def dot_score_fixed(vec_col: str, query_col: str, dim: int) -> Column:
    return F.expr(_dot_expr_unrolled(vec_col, query_col, dim))


def vector_norm_fixed(vec_col: str, dim: int) -> Column:
    return F.sqrt(dot_score_fixed(vec_col, vec_col, dim))


def cosine_score_fixed(vec_col: str, query_col: str, dim: int) -> Column:
    # zero-norm guard: see cosine_score — 0.0, never DIVIDE_BY_ZERO
    return F.coalesce(
        dot_score_fixed(vec_col, query_col, dim)
        / F.nullif(
            vector_norm_fixed(vec_col, dim)
            * vector_norm_fixed(query_col, dim),
            F.lit(0.0),
        ),
        F.lit(0.0),
    )


def l2_score_fixed(vec_col: str, query_col: str, dim: int) -> Column:
    terms = " + ".join(
        f"(cast({vec_col}[{i}] as double) - cast({query_col}[{i}] as double))"
        f" * (cast({vec_col}[{i}] as double) - cast({query_col}[{i}] as double))"
        for i in range(dim)
    )
    return F.sqrt(F.expr(terms))


def hamming_score_fixed(vec_col: str, query_col: str, nbytes: int) -> Column:
    """Hamming distance over BYTE-PACKED binary vectors (array<int>, one
    0-255 value per element): popcount of the per-byte XOR, unrolled and
    codegen'd — the BIN_FLAT metric. Lower is better."""
    terms = " + ".join(
        f"bit_count(cast({vec_col}[{i}] as int) ^ cast({query_col}[{i}] as int))"
        for i in range(nbytes)
    )
    return F.expr(f"cast({terms} as double)")


def metric_score_fixed(metric: str, vec_col: str, query_col: str, dim: int) -> Column:
    m = metric.upper()
    if m == COSINE:
        return cosine_score_fixed(vec_col, query_col, dim)
    if m == IP:
        return dot_score_fixed(vec_col, query_col, dim)
    if m == L2:
        return l2_score_fixed(vec_col, query_col, dim)
    if m == HAMMING:
        return hamming_score_fixed(vec_col, query_col, dim)
    raise ValueError(f"unknown metric {metric!r}; expected one of {METRICS}")


def metric_score(metric: str, vec_col: str, query_col: str) -> Column:
    m = metric.upper()
    if m == COSINE:
        return cosine_score(vec_col, query_col)
    if m == IP:
        return dot_score(vec_col, query_col)
    if m == L2:
        return l2_score(vec_col, query_col)
    if m == HAMMING:
        return F.expr(
            f"cast(aggregate(zip_with({vec_col}, {query_col}, "
            "(x, y) -> bit_count(cast(x as int) ^ cast(y as int))), "
            "0, (acc, v) -> acc + v) as double)"
        )
    raise ValueError(f"unknown metric {metric!r}; expected one of {METRICS}")


def score_is_better_desc(metric: str) -> bool:
    """True if higher score is better (IP/COSINE); False for the
    distance metrics (L2/HAMMING).

    Mirrors reference stub.py:618-621 radius semantics.
    """
    m = metric.upper()
    if m in (COSINE, IP):
        return True
    if m in (L2, HAMMING):
        return False
    raise ValueError(f"unknown metric {metric!r}")


_SQL_FUNCTIONS = {
    "dot_product": """
CREATE OR REPLACE TEMPORARY FUNCTION dot_product(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
RETURNS DOUBLE
RETURN aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
""",
    "cosine_sim": """
CREATE OR REPLACE TEMPORARY FUNCTION cosine_sim(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
RETURNS DOUBLE
RETURN COALESCE(
  aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)
  / NULLIF(sqrt(aggregate(a, 0D, (acc, v) -> acc + v * v))
     * sqrt(aggregate(b, 0D, (acc, v) -> acc + v * v)), 0D), 0D)
""",
    "l2_distance": """
CREATE OR REPLACE TEMPORARY FUNCTION l2_distance(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
RETURNS DOUBLE
RETURN sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v))
""",
}


def register_sql_functions(spark) -> list[str]:
    """Register the vector metrics as Spark SQL scalar functions
    (SQL-macro UDFs — pure Catalyst expressions, whole-stage codegen,
    no Python in the loop), so the full search surface is reachable
    from `engine.sql`:

        SELECT id, cosine_sim(vector, array(...)) AS score
        FROM coll ORDER BY score DESC LIMIT 10

    ARRAY<FLOAT> columns implicitly cast to ARRAY<DOUBLE> at the call
    site. Returns the registered function names."""
    for ddl in _SQL_FUNCTIONS.values():
        spark.sql(ddl)
    return sorted(_SQL_FUNCTIONS)
