"""Sketch aggregates: HLL distinct and approx percentiles must land
within tolerance of the exact answers, and HLL sketches must be
mergeable (the property that makes them the 100 TB path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiotcvectordb_spark.queries import q_approx_sketches


def test_sketch_accuracy_vs_exact(spark, sf_dir):
    approx = {r.event_type: r for r in q_approx_sketches(spark, sf_dir).collect()}
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert abs(a.approx_users - e.users) / e.users < 0.05
        spread = max(abs(e.p95), 1e-9)
        assert abs(a.approx_p50 - e.p50) <= 0.05 * spread
        assert abs(a.approx_p95 - e.p95) <= 0.05 * spread


def test_hll_sketches_merge(spark, sf_dir):
    """Per-group sketches union to the global estimate — re-aggregation
    without touching raw data (partial aggregation across 1000 executors
    is exactly this shape)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    merged = (
        events.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("s"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("s")).alias("global_users"))
        .first()
        .global_users
    )
    exact = events.select(F.countDistinct("user_id")).first()[0]
    assert abs(merged - exact) / exact < 0.05
