"""Bucketed tables: co-located joins with no shuffle at read time.

At 100 TB the dominant cost of a fact-to-fact equi-join is the shuffle
of both sides. Spark's answer is bucketing: write each table hash-
partitioned into N buckets on the join key (`bucketBy` + `saveAsTable`);
a later join on that key reads bucket i of A against bucket i of B and
skips the exchange entirely — the shuffle is paid ONCE at write time
and amortized over every subsequent join/aggregation on the key.

`tests/test_bucketed.py` asserts the join plan contains zero Exchange
operators, which is the whole point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed managed table on ``key``.

    ``sort=True`` also sorts within buckets, enabling sort-merge joins
    without the per-task sort."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a dangling location (from a dropped-metastore session) blocks
    # managed-table creation; clear it through the Hadoop FileSystem
    # API so the same code path works on an object-store warehouse
    # (a local shutil.rmtree would silently no-op there)
    from ..streaming.epochlog import _fs

    wh = spark.conf.get("spark.sql.warehouse.dir")
    path_cls, fs = _fs(spark, wh)
    loc = path_cls(f"{wh}/{table}")
    if fs.exists(loc):
        fs.delete(loc, True)
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts the planner elides both exchanges."""
    return read_table(spark, left_table).join(
        read_table(spark, right_table), key
    )
