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

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    sc = df.sparkSession.sparkContext
    want = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= want:
        return df
    return df.repartition(want)
