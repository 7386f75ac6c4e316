"""Streaming upsert sink (foreachBatch) + TTL vacuum."""

from __future__ import annotations

import time

from aiotcvectordb_spark.catalog import IndexField
from aiotcvectordb_spark.streaming.sink import stream_upsert_sink, ttl_vacuum


def test_stream_upsert_sink(engine, spark, tmp_path):
    db = "db_stream"
    engine.create_database(db)
    engine.create_collection(
        db, "s",
        indexes=[
            IndexField(name="id", kind="primary_key", field_type="string"),
            IndexField(
                name="vector", kind="vector", field_type="vector",
                metric_type="COSINE", index_type="FLAT", dimension=2,
            ),
        ],
    )
    engine.upsert(db, "s", [{"id": "a", "vector": [1.0, 0.0], "v": 1}])

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    batch = spark.createDataFrame(
        [("a", [0.5, 0.5], 2), ("b", [0.0, 1.0], 3)],
        "id string, vector array<double>, v long",
    )
    batch.write.mode("overwrite").parquet(str(src_dir))
    stream = (
        spark.readStream.schema(batch.schema).parquet(str(src_dir))
    )
    q = (
        stream.writeStream.foreachBatch(stream_upsert_sink(engine, db, "s"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["id"]: r for r in engine.query(db, "s")}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["v"] == 2  # replaced by the streamed batch


def test_ttl_vacuum(engine):
    db = "db_vac"
    engine.create_database(db)
    engine.create_collection(
        db, "c",
        indexes=[
            IndexField(name="id", kind="primary_key", field_type="string"),
            IndexField(
                name="vector", kind="vector", field_type="vector",
                metric_type="COSINE", index_type="FLAT", dimension=2,
            ),
            IndexField(name="expire_at", kind="filter", field_type="uint64"),
        ],
        ttl_config={"enable": True, "timeField": "expire_at"},
    )
    now = int(time.time())
    engine.upsert(
        db, "c",
        [
            {"id": "live", "vector": [1.0, 0.0], "expire_at": now + 10_000},
            {"id": "dead", "vector": [0.0, 1.0], "expire_at": now - 10_000},
        ],
    )
    assert ttl_vacuum(engine, db, "c") == 1
    raw = engine.store.read(engine.spark, db, "c")
    assert raw.count() == 1
