"""Sketch aggregates: HLL distinct and approx percentiles must land
within tolerance of the exact answers, and HLL sketches must be
mergeable (the property that makes them the 100 TB path)."""

from __future__ import annotations

from conftest import load_events

from pyspark.sql import functions as F

from aiotcvectordb_spark.queries import q_approx_sketches


def test_sketch_accuracy_vs_exact(spark, sf_dir):
    approx = {r.event_type: r for r in q_approx_sketches(spark, sf_dir).collect()}
    events = load_events(spark, sf_dir)
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
    events = load_events(spark, sf_dir)
    merged = (
        events.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("s"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("s")).alias("global_users"))
        .first()
        .global_users
    )
    exact = events.select(F.countDistinct("user_id")).first()[0]
    assert abs(merged - exact) / exact < 0.05


def test_heavy_hitters_counts_are_exact_here(spark, sf_dir):
    """At test vocabulary size the space-saving sketch tracks every
    token, so each reported count must equal the exact count, and the
    cutoff must dominate the exact 20th-highest count."""
    from pyspark.sql import functions as F

    from aiotcvectordb_spark import queries as Q
    from aiotcvectordb_spark.functions import sparse as sparse_fn

    hh = Q.q_heavy_hitters(spark, sf_dir).collect()
    assert len(hh) == 20
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        r.token: r.n
        for r in docs.select(F.explode(sparse_fn.tokens_col("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in hh:
        assert exact[r.token] == r.cnt, r.token
    cutoff = sorted(exact.values(), reverse=True)[19]
    assert min(r.cnt for r in hh) >= cutoff
