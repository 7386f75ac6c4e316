"""Partition-width guard for compute-heavy operators.

The driver's testdata parquet files are written as a single row group, so
``spark.read.parquet`` yields ONE input partition and every downstream
operator runs on one core regardless of ``local[32]``. On a real cluster
large tables split naturally (many files / row groups) and this helper is
a no-op; it only repartitions when the scan produced fewer partitions
than the session's default parallelism.

Call it AFTER pushdown-able filters so the parquet scan keeps its
``PushedFilters`` — ``df.filter(...)`` then ``ensure_min_partitions``
shuffles only the surviving rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    sc = df.sparkSession.sparkContext
    want = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= want:
        return df
    return df.repartition(want)


def salted_group_topk(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    k: int,
    *,
    salt: int = 16,
    rank_col: str = "rn",
) -> DataFrame:
    """Per-group top-k that survives skewed group keys.

    ``Window.partitionBy(keys)`` ships EVERY row of a group to one task —
    a hot key (one user with 10^9 events, one query matching half the
    corpus) turns into a straggler or an OOM. This two-phase form bounds
    per-task input: phase 1 ranks within (keys, salt) — the hot group is
    spread over ``salt`` tasks and each keeps only its local top-k — and
    phase 2 ranks the ≤ salt×k survivors per group. Identical output to
    the plain window (top-k of a union of per-slice top-k IS the global
    top-k, because any global-top-k row is also top-k of its slice).

    ``order`` must be a deterministic total order (include an id
    tiebreak) or ranks are nondeterministic either way. The salt is
    ``pmod(hash(all columns), salt)`` so re-runs are stable.
    """
    salted = df.withColumn("__salt", F.pmod(F.hash(*df.columns), F.lit(salt)))
    w1 = Window.partitionBy(*keys, "__salt").orderBy(*order)
    local = (
        salted.withColumn("__lrn", F.row_number().over(w1))
        .filter(F.col("__lrn") <= k)
        .drop("__lrn", "__salt")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        local.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )
