"""The shared windowed aggregation must produce identical results in
batch mode and under Structured Streaming (watermark + availableNow)."""

from __future__ import annotations

from aiotcvectordb_spark.streaming.sink import windowed_event_counts


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = {
        (r.win_start, r.event_type): (r.n_events, r.value_sum)
        for r in windowed_event_counts(events).collect()
    }
    assert batch

    src = tmp_path / "src"
    src.mkdir()
    import shutil

    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
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
