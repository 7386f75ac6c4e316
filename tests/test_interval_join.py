"""Stream-stream interval join must equal its batch twin, and the
streaming plan must carry watermarks on both sides (bounded state)."""

from __future__ import annotations

from conftest import load_events, write_events_source

import shutil

from aiotcvectordb_spark.streaming.joins import purchases_with_recent_clicks


def _key(rows):
    return {(r.user_id, r.purchase_id, r.click_id, r.gap_s) for r in rows}


def test_stream_stream_join_equals_batch(spark, sf_dir, tmp_path):
    events = load_events(spark, sf_dir)
    batch = _key(
        purchases_with_recent_clicks(
            events.filter("event_type = 'purchase'"),
            events.filter("event_type = 'click'"),
        ).collect()
    )
    assert batch

    src = tmp_path / "src"
    src.mkdir()
    write_events_source(spark, sf_dir, src)
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    joined = purchases_with_recent_clicks(
        stream.filter("event_type = 'purchase'"),
        stream.filter("event_type = 'click'"),
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("ij")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = _key(spark.sql("SELECT * FROM ij").collect())
    assert streamed == batch


def test_all_pairs_within_window(spark, sf_dir):
    events = load_events(spark, sf_dir)
    out = purchases_with_recent_clicks(
        events.filter("event_type = 'purchase'"),
        events.filter("event_type = 'click'"),
        window_s=600,
    ).collect()
    assert out
    for r in out:
        assert 0 <= r.gap_s <= 600
