"""Streaming twins of attribution_last_touch / rolling_active_users:
stream == batch on in-order chunked replay, and epochs are idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiotcvectordb_spark.streaming.analytics import (
    attribution_batch,
    attribution_rollup,
    attribution_stream,
    read_wau,
    stream_wau_sink,
)
from tests.conftest import load_events


def _events(spark, sf_dir):
    return load_events(spark, sf_dir).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )


def _chunked_source(spark, ev, tmp_path, cols_schema):
    """Write 3 event-time-ordered chunks and open them as a 1-file-per-
    trigger stream (the in-order delivery contract)."""
    qs = ev.approxQuantile("ts", [0.33, 0.66], 0.0)
    src = tmp_path / "src"
    ev.filter(F.col("ts") <= qs[0]).coalesce(1).write.parquet(str(src / "f0"))
    ev.filter((F.col("ts") > qs[0]) & (F.col("ts") <= qs[1])).coalesce(
        1
    ).write.parquet(str(src / "f1"))
    ev.filter(F.col("ts") > qs[1]).coalesce(1).write.parquet(str(src / "f2"))
    return (
        spark.readStream.schema(cols_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "f*"))
    )


def test_attribution_stream_matches_batch(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    want = {
        r.event_id: (r.touch_type, r.value)
        for r in attribution_batch(ev).collect()
    }
    stream = _chunked_source(
        spark, ev, tmp_path,
        "user_id long, event_id long, ts long, event_type string, value double",
    )
    q = (
        attribution_stream(stream)
        .writeStream.format("memory")
        .queryName("attr_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r.event_id: (r.touch_type, r.value)
        for r in spark.sql("SELECT * FROM attr_out").collect()
    }
    assert got == want
    assert len(got) > 0

    # the rollup over the streamed rows equals the registry aggregate
    from aiotcvectordb_spark import queries as Q

    reg = {
        r.touch_type: (r.n_purchases, r.total_value)
        for r in Q.q_attribution_last_touch(spark, sf_dir).collect()
    }
    srl = {
        r.touch_type: (r.n_purchases, r.total_value)
        for r in attribution_rollup(
            spark.sql("SELECT * FROM attr_out")
        ).collect()
    }
    assert srl == reg


def test_wau_stream_matches_batch_and_is_idempotent(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    stream = _chunked_source(
        spark, ev, tmp_path,
        "user_id long, event_id long, ts long, event_type string, value double",
    )
    pairs_dir = str(tmp_path / "pairs")
    results_dir = str(tmp_path / "wau")
    sink = stream_wau_sink(pairs_dir, results_dir)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    du = ev.select(
        F.expr("ts div 86400000000000").alias("day"), "user_id"
    ).distinct()
    want = {
        (r.win_day, r.wau)
        for r in (
            du.select(
                F.explode(F.expr("sequence(day, day + 6)")).alias("win_day"),
                "user_id",
            )
            .groupBy("win_day")
            .agg(F.countDistinct("user_id").alias("wau"))
            .join(du.select(F.col("day").alias("win_day")).distinct(), "win_day")
            .collect()
        )
    }
    got = {(r.win_day, r.wau) for r in read_wau(spark, results_dir).collect()}
    assert got == want
    assert len(got) > 0

    # replaying the final batch through the sink again (same epoch id)
    # must not change the result — idempotent epochs
    last_chunk = spark.read.parquet(str(tmp_path / "src" / "f2"))
    sink(last_chunk, 2)
    again = {(r.win_day, r.wau) for r in read_wau(spark, results_dir).collect()}
    assert again == want
