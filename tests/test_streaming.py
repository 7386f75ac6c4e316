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


def test_stream_upsert_maintains_pq_sidecar(engine, spark, sf_dir, tmp_path):
    """IVF_PQ collections: streamed micro-batches are encoded with the
    EXISTING codebooks and upserted into the sidecar codes table, so the
    compressed-domain search keeps finding new rows between rebuilds."""
    from aiotcvectordb_spark.catalog import IndexField
    from aiotcvectordb_spark.streaming.sink import stream_upsert_sink

    db = "db_spq"
    engine.create_database(db)
    engine.create_collection(
        db, "emb",
        indexes=[
            IndexField(name="vec_id", kind="primary_key", field_type="uint64"),
            IndexField(
                name="embedding", kind="vector", field_type="vector",
                metric_type="COSINE", index_type="IVF_PQ", dimension=64,
                params={"nlist": 4, "M": 8, "nbits": 4},
            ),
        ],
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    engine.store.write(emb.filter("vec_id < 100"), db, "emb")
    engine.rebuild_index(db, "emb")

    src = tmp_path / "src"
    src.mkdir()
    emb.filter("vec_id >= 100").write.parquet(str(src / "more"))
    stream = spark.readStream.schema(emb.schema).parquet(str(src / "*"))
    q = (
        stream.writeStream.foreachBatch(stream_upsert_sink(engine, db, "emb"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    codes = engine.store.read(spark, db, "emb__pqcodes")
    assert codes.count() == emb.count()  # sidecar covers streamed rows

    # a streamed-in vector is findable through the IVF_PQ (ADC) path
    probe = emb.filter("vec_id >= 100").first()
    hits = engine.search(
        db, "emb", [list(probe.embedding)], limit=3, params={"nprobe": 4}
    )
    assert hits[0][0]["vec_id"] == probe.vec_id
    assert hits[0][0]["score"] >= 0.999
    engine.drop_collection(db, "emb")


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


def test_stream_upsert_maintains_ivf_layout(engine, spark, sf_dir, tmp_path):
    """Micro-batches flowing through the sink get cluster-assigned from
    the EXISTING centroids (no refit) and remain nprobe-searchable;
    deferred mode (build_index=False) marks the index stale and searches
    fall back to the exact scan."""
    from aiotcvectordb_spark.catalog import IndexField
    from aiotcvectordb_spark.queries import qvec
    from aiotcvectordb_spark.streaming.sink import stream_upsert_sink

    db = "db_sivf"
    engine.create_database(db)
    engine.create_collection(
        db, "emb",
        indexes=[
            IndexField(name="vec_id", kind="primary_key", field_type="uint64"),
            IndexField(
                name="embedding", kind="vector", field_type="vector",
                metric_type="COSINE", index_type="IVF_FLAT", dimension=64,
                params={"nlist": 4},
            ),
        ],
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    engine.store.write(emb.filter("vec_id < 100"), db, "emb")
    engine.rebuild_index(db, "emb")

    # stream the remaining rows in as one availableNow batch
    src = tmp_path / "src"
    src.mkdir()
    emb.filter("vec_id >= 100").write.parquet(str(src / "more"))
    stream = spark.readStream.schema(emb.schema).parquet(str(src / "*"))
    q = (
        stream.writeStream.foreachBatch(stream_upsert_sink(engine, db, "emb"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    stored = engine.store.read(spark, db, "emb")
    assert stored.count() == emb.count()
    assert stored.filter("cluster_id IS NULL").count() == 0
    assert engine.catalog.get_collection(db, "emb").index_status == "ready"

    # a streamed-in vector is findable through the pruned IVF search
    probe = emb.filter("vec_id >= 100").first()
    hits = engine.search(db, "emb", [list(probe.embedding)], limit=3, nprobe=4)
    assert hits[0][0]["vec_id"] == probe.vec_id

    # deferred mode: stale flag set, search falls back to exact scan
    src2 = tmp_path / "src2"
    src2.mkdir()
    spark.createDataFrame(
        [(99999, [0.5] * 64)], "vec_id long, embedding array<float>"
    ).write.parquet(str(src2 / "x"))
    stream2 = spark.readStream.schema(emb.schema).parquet(str(src2 / "*"))
    q2 = (
        stream2.writeStream.foreachBatch(
            stream_upsert_sink(engine, db, "emb", build_index=False)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    assert engine.catalog.get_collection(db, "emb").index_status == "stale"
    hits = engine.search(db, "emb", [[0.5] * 64], limit=1)
    assert hits[0][0]["vec_id"] == 99999  # exact fallback sees the new row

    # rebuild refreshes: back to pruned searches
    engine.rebuild_index(db, "emb")
    assert engine.catalog.get_collection(db, "emb").index_status == "ready"
    hits = engine.search(db, "emb", [[0.5] * 64], limit=1, nprobe=4)
    assert hits[0][0]["vec_id"] == 99999


def test_stream_upsert_checkpoint_recovery(engine, spark, tmp_path):
    """Exactly-once across restarts: stop after the first micro-batch,
    restart from the checkpoint, and the second file is applied exactly
    once with nothing re-applied."""
    db = "db_ckpt"
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
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "id string, vector array<double>, v long"
    spark.createDataFrame([("a", [1.0, 0.0], 1)], schema).coalesce(1).write.parquet(
        str(src / "f0")
    )

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            stream.writeStream.foreachBatch(stream_upsert_sink(engine, db, "s"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert {r["id"] for r in engine.query(db, "s")} == {"a"}
    v0 = engine.store.current_version(db, "s")

    # second file arrives while the stream is DOWN; restart from ckpt
    spark.createDataFrame(
        [("a", [0.5, 0.5], 2), ("b", [0.0, 1.0], 1)], schema
    ).coalesce(1).write.parquet(str(src / "f1"))
    run_once()
    rows = {r["id"]: r for r in engine.query(db, "s")}
    assert set(rows) == {"a", "b"} and rows["a"]["v"] == 2
    # exactly one additional store version: f0 was NOT re-applied
    assert engine.store.current_version(db, "s") == v0 + 1
