"""Exact (FLAT) batch kNN — the core search operator.

Semantics follow the reference ``search`` operator
(reference: aiotcvectordb/client/stub.py:589-636 and
aiotcvectordb/model/collection.py:161-208): per query vector, return the
top-``limit`` documents by metric score, after applying an optional scalar
``filter`` and an optional ``radius`` score threshold, with
``output_fields`` projection and ``retrieve_vector`` toggle.

Plan shape (declarative path)::

    scan(parquet, pruned columns, pushed filter)
      -> crossJoin(broadcast(queries))          # Q rows broadcast, no shuffle
      -> score expr (whole-stage codegen)
      -> [radius filter]
      -> Window.partitionBy(query_idx).orderBy(score, id)  # one shuffle on query_idx
      -> row_number() <= k

Scale path (``strategy="local_topk"``): a vectorized numpy scorer runs
per input partition via ``mapInPandas`` and emits only each partition's
local top-k per query, so the shuffle that feeds the final window carries
at most ``num_partitions * Q * k`` rows instead of ``N * Q`` — this is
what survives a 1000-executor / 100 TB scan. Results are identical to the
declarative path (same tiebreak), verified in tests.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Iterator, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aiotcvectordb_spark.functions.vector import (
    metric_score,
    metric_score_fixed,
    score_is_better_desc,
)
from aiotcvectordb_spark.partitioning import ensure_min_partitions

QUERY_IDX = "query_idx"
SCORE = "score"


def _queries_df(
    spark: SparkSession, vectors: Sequence[Sequence[float]]
) -> DataFrame:
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vectors)]
    schema = T.StructType(
        [
            T.StructField(QUERY_IDX, T.IntegerType(), False),
            T.StructField("__query_vec", T.ArrayType(T.DoubleType()), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _order_cols(metric: str, id_col: str, round_digits: int | None) -> list[Column]:
    score_col = F.col(SCORE) if round_digits is None else F.round(F.col(SCORE), round_digits)
    if score_is_better_desc(metric):
        return [score_col.desc(), F.col(id_col).asc()]
    return [score_col.asc(), F.col(id_col).asc()]


def knn_search(
    df: DataFrame,
    vectors: Sequence[Sequence[float]],
    *,
    vector_col: str = "vector",
    id_col: str = "id",
    metric: str = "COSINE",
    limit: int = 10,
    filter: str | None = None,
    radius: float | None = None,
    output_fields: Sequence[str] | None = None,
    retrieve_vector: bool = False,
    round_digits: int | None = None,
    strategy: str = "sql",
) -> DataFrame:
    """Batch exact kNN. Returns a DataFrame with columns
    ``(query_idx, <id>, score, rank, *output_fields[, vector])``.

    ``round_digits`` rounds the returned/ranked score — used by oracle
    tests to make cross-engine float comparison stable.
    ``strategy``: ``"sql"`` (declarative, Catalyst-planned) or
    ``"local_topk"`` (bounded-shuffle numpy scorer for huge scans).
    """
    if not vectors:
        raise ValueError("vectors must be non-empty")
    dim = len(vectors[0])
    for v in vectors:
        if len(v) != dim:
            raise ValueError("all query vectors must share one dimension")
    if limit < 1:
        raise ValueError("limit must be >= 1")

    if filter:
        df = df.filter(filter)
    df = ensure_min_partitions(df)

    if strategy == "local_topk":
        candidates = _local_topk_candidates(
            df, vectors, vector_col=vector_col, id_col=id_col, metric=metric, limit=limit
        )
    else:
        spark = df.sparkSession
        q = _queries_df(spark, vectors)
        candidates = (
            df.crossJoin(F.broadcast(q))
            .withColumn(SCORE, metric_score_fixed(metric, vector_col, "__query_vec", dim))
            .drop("__query_vec")
        )

    if radius is not None:
        if score_is_better_desc(metric):
            candidates = candidates.filter(F.col(SCORE) >= float(radius))
        else:
            candidates = candidates.filter(F.col(SCORE) <= float(radius))

    w = Window.partitionBy(QUERY_IDX).orderBy(*_order_cols(metric, id_col, round_digits))
    ranked = (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= limit)
    )
    if round_digits is not None:
        ranked = ranked.withColumn(SCORE, F.round(F.col(SCORE), round_digits))

    # Projection: id always present (reference collection.py:128 — the id
    # field is returned regardless of output_fields); vector only on request.
    if output_fields is not None:
        keep = [QUERY_IDX, id_col, SCORE, "rank"] + [
            c for c in output_fields if c not in (QUERY_IDX, id_col, SCORE, "rank")
        ]
        if retrieve_vector and vector_col not in keep:
            keep.append(vector_col)
        ranked = ranked.select(*keep)
    elif not retrieve_vector:
        ranked = ranked.drop(vector_col)
    return ranked


def grouped_knn_search(
    df: DataFrame,
    vectors: Sequence[Sequence[float]],
    *,
    vector_col: str = "vector",
    id_col: str = "id",
    group_col: str = "label",
    metric: str = "COSINE",
    groups: int = 5,
    filter: str | None = None,
    round_digits: int | None = None,
) -> DataFrame:
    """Grouped (diversify-by-field) batch kNN — the ``group_by`` search
    modern vector stores expose next to plain top-k: for each query,
    rank GROUPS by their best-matching vector and return that one
    representative per group, so results span ``groups`` distinct
    ``group_col`` values instead of k near-duplicates of one document.

    Returns ``(query_idx, <group_col>, <id>, score, group_rank)``.
    Deterministic ties: within a group (score best-first, id ASC);
    across groups (best score best-first, group ASC).

    Scale shape: the per-group representative is ONE lexicographic
    struct-min AGGREGATE — every scan task pre-reduces to at most
    Q x distinct-groups rows map-side before the keyed shuffle — never
    a corpus-wide row_number window; the group ranking window then
    sees only <= distinct-groups rows per query."""
    if not vectors:
        raise ValueError("vectors must be non-empty")
    dim = len(vectors[0])
    for v in vectors:
        if len(v) != dim:
            raise ValueError("all query vectors must share one dimension")
    if groups < 1:
        raise ValueError("groups must be >= 1")
    if filter:
        df = df.filter(filter)
    df = ensure_min_partitions(df)
    q = _queries_df(df.sparkSession, vectors)
    score = metric_score_fixed(metric, vector_col, "__query_vec", dim)
    if round_digits is not None:
        # round BEFORE the aggregate so representative/group ties are
        # decided on the same rounded scores the SQL oracle sorts by
        score = F.round(score, round_digits)
    scored = df.crossJoin(F.broadcast(q)).select(
        QUERY_IDX,
        F.col(group_col).alias("__grp"),
        F.col(id_col).alias("__id"),
        score.alias(SCORE),
    )
    # lexicographic struct-min == (score best-first, id ASC) argmin:
    # negate the score for higher-is-better metrics so min() ranks it
    skey = (-F.col(SCORE)) if score_is_better_desc(metric) else F.col(SCORE)
    best = scored.groupBy(QUERY_IDX, "__grp").agg(
        F.min(
            F.struct(
                skey.alias("k"),
                F.col("__id").alias("i"),
                F.col(SCORE).alias("s"),
            )
        ).alias("b")
    )
    w = Window.partitionBy(QUERY_IDX).orderBy(
        F.col("b.k").asc(), F.col("__grp").asc()
    )
    return (
        best.withColumn("group_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("group_rank") <= groups)
        .select(
            QUERY_IDX,
            F.col("__grp").alias(group_col),
            F.col("b.i").alias(id_col),
            F.col("b.s").alias(SCORE),
            "group_rank",
        )
    )


def _local_topk_candidates(
    df: DataFrame,
    vectors: Sequence[Sequence[float]],
    *,
    vector_col: str,
    id_col: str,
    metric: str,
    limit: int,
) -> DataFrame:
    """Per-partition numpy top-k: emits <= k rows per (partition, query).

    The output feeds the same final window as the SQL path, but the
    shuffle is bounded by partitions * Q * k rows — the 100 TB plan.
    """
    import numpy as np  # local import: executors re-import per worker

    desc = score_is_better_desc(metric)
    qmat = np.asarray(vectors, dtype=np.float64)  # (Q, dim) — closure-captured, small
    metric_u = metric.upper()
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(QUERY_IDX, T.IntegerType(), False),
            T.StructField(SCORE, T.DoubleType(), True),
        ]
    )
    in_cols = [f.name for f in df.schema.fields]
    k = limit

    def score_batches(batches: Iterable) -> Iterator:
        import pandas as pd

        qn = np.linalg.norm(qmat, axis=1)  # (Q,)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vector_col]]
            )  # (N, dim)
            if metric_u == "IP":
                scores = mat @ qmat.T  # (N, Q)
            elif metric_u == "COSINE":
                # zero-norm floor: a zero vector scores exactly 0.0
                # (its dot is 0), matching the JVM cosine's
                # COALESCE/NULLIF guard — never a NaN into top-k
                dn = np.maximum(np.linalg.norm(mat, axis=1), 1e-12)
                scores = (mat @ qmat.T) / np.outer(dn, qn)
            elif metric_u == "HAMMING":
                # byte-packed binary vectors: popcount of XOR via
                # unpackbits — (N, Q) distances in one vectorized pass
                mb = mat.astype(np.uint8)  # (N, B)
                qb = qmat.astype(np.uint8)  # (Q, B)
                bits_m = np.unpackbits(mb, axis=1).astype(np.int32)
                bits_q = np.unpackbits(qb, axis=1).astype(np.int32)
                # XOR popcount == bits differing == |a| + |q| - 2 a.q
                scores = (
                    bits_m.sum(1)[:, None]
                    + bits_q.sum(1)[None, :]
                    - 2 * (bits_m @ bits_q.T)
                ).astype(np.float64)
            else:  # L2
                n2 = (mat * mat).sum(axis=1)[:, None]
                q2 = (qmat * qmat).sum(axis=1)[None, :]
                scores = np.sqrt(np.maximum(n2 + q2 - 2.0 * (mat @ qmat.T), 0.0))
            n = scores.shape[0]
            kk = min(k, n)
            order = -scores if desc else scores
            top = np.argpartition(order, kk - 1, axis=0)[:kk]  # (kk, Q)
            frames = []
            for qi in range(qmat.shape[0]):
                idx = top[:, qi]
                sub = pdf.iloc[idx][in_cols].copy()
                sub[QUERY_IDX] = np.int32(qi)
                sub[SCORE] = scores[idx, qi]
                frames.append(sub)
            yield pd.concat(frames, ignore_index=True)

    return df.mapInPandas(score_batches, schema=out_schema)


def search_by_id(
    df: DataFrame,
    document_ids: Sequence,
    *,
    vector_col: str = "vector",
    id_col: str = "id",
    **kwargs,
) -> DataFrame:
    """kNN where query vectors are looked up from existing rows
    (reference stub.py:638-685). query_idx follows the order of
    ``document_ids``.
    """
    lookup = (
        df.filter(F.col(id_col).isin(list(document_ids)))
        .select(id_col, vector_col)
        .collect()
    )
    by_id = {r[id_col]: r[vector_col] for r in lookup}
    missing = [i for i in document_ids if i not in by_id]
    if missing:
        raise ValueError(f"document ids not found: {missing}")
    vectors = [by_id[i] for i in document_ids]
    return knn_search(df, vectors, vector_col=vector_col, id_col=id_col, **kwargs)


def knn_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_vec: str,
    right_vec: str,
    left_id: str,
    right_id: str,
    metric: str = "COSINE",
    k: int = 10,
    round_digits: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Similarity join: for every left row, its k nearest right rows.

    Declarative form — broadcast whichever side Catalyst finds small
    (the caller should pass the smaller probe set as ``left``; we
    broadcast it explicitly). Shuffle is on ``left_id`` for the window.
    """
    l = left.select(
        F.col(left_id).alias("__lid"), F.col(left_vec).alias("__lvec")
    )
    score = (
        metric_score_fixed(metric, right_vec, "__lvec", dim)
        if dim is not None
        else metric_score(metric, right_vec, "__lvec")
    )
    joined = ensure_min_partitions(right).crossJoin(F.broadcast(l)).withColumn(SCORE, score)
    score_col = F.col(SCORE) if round_digits is None else F.round(F.col(SCORE), round_digits)
    order = [score_col.desc() if score_is_better_desc(metric) else score_col.asc(),
             F.col(right_id).asc()]
    w = Window.partitionBy("__lid").orderBy(*order)
    out = (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("__lvec")
        .withColumnRenamed("__lid", "query_id")
    )
    if round_digits is not None:
        out = out.withColumn(SCORE, F.round(F.col(SCORE), round_digits))
    return out
