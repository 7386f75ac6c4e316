"""Skew-resistant grouped top-k must equal the plain-window result."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from aiotcvectordb_spark.partitioning import salted_group_topk


def test_salted_topk_equals_plain_window(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]

    plain = (
        orders.withColumn(
            "rn", F.row_number().over(Window.partitionBy("o_custkey").orderBy(*order))
        )
        .filter("rn <= 3")
        .select("o_custkey", "o_orderkey", "rn")
    )
    salted = salted_group_topk(
        orders, ["o_custkey"], order, 3, salt=8
    ).select("o_custkey", "o_orderkey", "rn")

    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


def test_salted_topk_handles_hot_key(spark):
    # one key owns 90% of rows; result must still be its true top-k
    rows = [(1, i, float(i % 997)) for i in range(9000)] + [
        (k, 10_000 + k * 10 + j, float(j)) for k in range(2, 12) for j in range(100)
    ]
    df = spark.createDataFrame(rows, "k long, id long, v double")
    order = [F.col("v").desc(), F.col("id").asc()]
    out = salted_group_topk(df, ["k"], order, 5, salt=16)
    got = [
        (r.v, r.id)
        for r in out.filter("k = 1").orderBy("rn").collect()
    ]
    want = sorted(((float(i % 997), i) for i in range(9000)), key=lambda t: (-t[0], t[1]))[:5]
    assert got == want
