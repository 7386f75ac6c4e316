"""Stream-static dimension enrichment must equal its batch twin, and
the static side must be broadcast (no shuffle of the stream side)."""

from __future__ import annotations

from conftest import load_events, write_events_source

import shutil

from aiotcvectordb_spark.streaming.joins import enrich_events


def _dims(spark):
    return spark.createDataFrame(
        [("click", 0.0), ("view", 0.1), ("purchase", 1.0)],
        ["event_type", "weight"],
    )


def _key(rows):
    return {(r.event_id, r.event_type, r.weight) for r in rows}


def test_stream_static_join_equals_batch(spark, sf_dir, tmp_path):
    events = load_events(spark, sf_dir)
    dims = _dims(spark)
    batch = _key(enrich_events(events, dims).collect())
    assert batch

    src = tmp_path / "src"
    src.mkdir()
    write_events_source(spark, sf_dir, src)
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    out = enrich_events(stream, dims)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert _key(spark.sql("SELECT * FROM ssj").collect()) == batch


def test_left_join_keeps_unmatched(spark, sf_dir):
    events = load_events(spark, sf_dir)
    dims = _dims(spark).filter("event_type = 'click'")
    out = enrich_events(events, dims)
    assert out.count() == events.count()
    assert out.filter("weight IS NULL").count() == events.filter(
        "event_type <> 'click'"
    ).count()


def test_static_side_is_broadcast(spark, sf_dir):
    events = load_events(spark, sf_dir)
    plan = (
        enrich_events(events, _dims(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
