"""The shared windowed aggregation must produce identical results in
batch mode and under Structured Streaming (watermark + availableNow)."""

from __future__ import annotations

from conftest import load_events, write_events_source

from pyspark.sql import functions as F

from aiotcvectordb_spark.streaming.sink import windowed_event_counts


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    events = load_events(spark, sf_dir)
    batch = {
        (r.win_start, r.event_type): (r.n_events, r.value_sum)
        for r in windowed_event_counts(events).collect()
    }
    assert batch

    src = tmp_path / "src"
    src.mkdir()
    import shutil

    write_events_source(spark, sf_dir, src)
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r.win_start, r.event_type): (r.n_events, r.value_sum)
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    assert streamed == batch


def test_sliding_window_4x_tumbling_mass(spark, sf_dir):
    """Every event lands in exactly 4 sliding windows, so total counted
    mass is 4x the tumbling total."""
    from aiotcvectordb_spark import queries as Q

    sliding = Q.q_sliding_window_agg(spark, sf_dir).agg(
        F.sum("n_events").alias("s")
    ).first().s
    n_events = load_events(spark, sf_dir).count()
    assert sliding == 4 * n_events
