"""Exact recursive EWMA: streaming-stateful == batch on ordered replay."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aiotcvectordb_spark.streaming.ewma import ewma_batch, ewma_stream
from tests.conftest import load_events


def _events(spark, sf_dir):
    return load_events(spark, sf_dir).select(
        "user_id", "event_id", "ts", "value"
    )


def test_batch_matches_pandas_reference(spark, sf_dir):
    ev = _events(spark, sf_dir)
    uid = ev.groupBy("user_id").count().orderBy(F.desc("count")).first().user_id
    got = {
        r.event_id: r.ewma
        for r in ewma_batch(ev.filter(F.col("user_id") == uid)).collect()
    }
    rows = sorted(
        ev.filter(F.col("user_id") == uid).collect(),
        key=lambda r: (r.ts, r.event_id),
    )
    a, y = 0.3, None
    for r in rows:
        y = r.value if y is None else (1 - a) * y + a * r.value
        assert math.isclose(got[r.event_id], y, rel_tol=1e-9), r.event_id


def test_stream_matches_batch_on_ordered_replay(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    batch = {r.event_id: r.ewma for r in ewma_batch(ev).collect()}

    # split into 3 micro-batches by event-time order (the in-order
    # delivery contract under which stream == batch holds exactly)
    qs = ev.approxQuantile("ts", [0.33, 0.66], 0.0)
    src = tmp_path / "src"
    ev.filter(F.col("ts") <= qs[0]).coalesce(1).write.parquet(str(src / "f0"))
    ev.filter((F.col("ts") > qs[0]) & (F.col("ts") <= qs[1])).coalesce(1).write.parquet(str(src / "f1"))
    ev.filter(F.col("ts") > qs[1]).coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema("user_id long, event_id long, ts long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out_dir = str(tmp_path / "out")
    q = (
        ewma_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    streamed = {
        r.event_id: r.ewma for r in spark.read.parquet(out_dir).collect()
    }
    assert set(streamed) == set(batch)
    for eid, y in batch.items():
        assert math.isclose(streamed[eid], y, rel_tol=1e-9), eid


def test_stream_state_survives_restart(spark, sf_dir, tmp_path):
    """Two separate runs sharing one checkpoint: the second continues
    the EWMA recursion from the state store, equal to batch over all."""
    ev = _events(spark, sf_dir)
    batch = {r.event_id: r.ewma for r in ewma_batch(ev).collect()}

    mid = ev.approxQuantile("ts", [0.5], 0.0)[0]
    src = tmp_path / "src"
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ckpt")
    schema = "user_id long, event_id long, ts long, value double"

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            ewma_stream(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    ev.filter(F.col("ts") <= mid).coalesce(1).write.parquet(str(src / "f0"))
    run_once()  # first process: only the first half
    n_first = spark.read.parquet(out_dir).count()
    ev.filter(F.col("ts") > mid).coalesce(1).write.parquet(str(src / "f1"))
    run_once()  # fresh query object, same checkpoint: resumes state

    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == len(batch) and n_first < len(batch)
    for r in rows:
        assert math.isclose(r.ewma, batch[r.event_id], rel_tol=1e-9), r.event_id
