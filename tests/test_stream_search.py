"""Continuous vector search: the streamed serving loop must return
exactly the batch kNN answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiotcvectordb_spark.streaming.search import (
    answer_query_batch,
    stream_search_sink,
)


def _collection(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _queries(spark, sf_dir, n=6):
    emb = _collection(spark, sf_dir)
    return (
        emb.orderBy("vec_id")
        .limit(n)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )


def _key(rows):
    return {(r.query_id, r.vec_id, r.score, r.rank) for r in rows}


def test_stream_search_equals_batch(spark, sf_dir, tmp_path):
    coll = _collection(spark, sf_dir)
    queries = _queries(spark, sf_dir)
    batch = _key(
        answer_query_batch(
            queries, coll, vector_col="embedding", id_col="vec_id", k=5
        ).collect()
    )
    assert batch and len({q for q, *_ in batch}) == 6

    src = tmp_path / "qsrc"
    src.mkdir()
    # two arrival waves -> at least two micro-batches with availableNow
    queries.filter("query_id % 2 = 0").write.parquet(f"{src}/w1.parquet")
    queries.filter("query_id % 2 = 1").write.parquet(f"{src}/w2.parquet")
    # glob: the waves are parquet DIRECTORIES; the file source doesn't
    # descend into them from the parent path alone
    stream = spark.readStream.schema(queries.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src) + "/*")
    out_dir = str(tmp_path / "hits")
    q = (
        stream.writeStream.foreachBatch(
            stream_search_sink(
                coll, out_dir, vector_col="embedding", id_col="vec_id", k=5
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = _key(spark.read.parquet(out_dir).collect())
    assert got == batch


def test_stream_search_self_match_rank1(spark, sf_dir):
    """Each query vector comes from the collection, so its own row must
    rank first with a perfect cosine score."""
    coll = _collection(spark, sf_dir)
    hits = answer_query_batch(
        _queries(spark, sf_dir, n=4), coll,
        vector_col="embedding", id_col="vec_id", k=3,
    ).collect()
    top = {r.query_id: (r.vec_id, r.score) for r in hits if r.rank == 1}
    for qid, (vid, score) in top.items():
        assert qid == vid
        assert abs(score - 1.0) < 1e-6


def test_engine_stream_search_sees_live_upserts(spark, engine, tmp_path):
    """The engine-level serving loop re-reads the collection snapshot
    per micro-batch (live upserts visible) and the checkpoint resumes
    at the first unanswered query batch across restarts."""
    from aiotcvectordb_spark.catalog import IndexField

    db, coll = "sdb", "scoll"
    engine.create_database(db)
    engine.create_collection(
        db, coll,
        indexes=[
            IndexField(name="id", kind="primary_key", field_type="string"),
            IndexField(name="vector", kind="vector", field_type="vector",
                       dimension=3, metric_type="COSINE"),
        ],
    )
    engine.upsert(db, coll, [
        {"id": "a", "vector": [1.0, 0.0, 0.0]},
        {"id": "b", "vector": [0.0, 1.0, 0.0]},
    ])

    src = tmp_path / "q"
    src.mkdir()
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "hits")
    schema = "query_id string, query_vec array<double>"
    sink = engine.stream_search_sink(db, coll, out, k=1)

    def run_wave():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(src) + "/*")
        q = (stream.writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    spark.createDataFrame(
        [("q1", [0.9, 0.1, 0.0])], schema
    ).write.parquet(f"{src}/w1.parquet")
    run_wave()
    hits1 = spark.read.parquet(out).collect()
    assert [(r.query_id, r.id) for r in hits1] == [("q1", "a")]

    # a better match lands between waves; the restarted stream must see
    # it and must NOT reprocess wave 1
    engine.upsert(db, coll, [{"id": "c", "vector": [0.9, 0.1, 0.0]}])
    spark.createDataFrame(
        [("q2", [0.9, 0.1, 0.0])], schema
    ).write.parquet(f"{src}/w2.parquet")
    run_wave()
    hits2 = {(r.query_id, r.id) for r in spark.read.parquet(out).collect()}
    assert hits2 == {("q1", "a"), ("q2", "c")}


def test_engine_stream_search_with_ivf_pruning(spark, engine, tmp_path):
    """With a built IVF index the serving loop scans only the probed
    cells; identical-vector queries still self-match at rank 1."""
    import random

    from aiotcvectordb_spark.catalog import IndexField
    from aiotcvectordb_spark.streaming.search import engine_stream_search_sink

    db, coll = "idb", "icoll"
    engine.create_database(db)
    engine.create_collection(
        db, coll,
        indexes=[
            IndexField(name="id", kind="primary_key", field_type="string"),
            IndexField(name="vector", kind="vector", field_type="vector",
                       dimension=4, metric_type="COSINE",
                       index_type="IVF_FLAT", params={"nlist": 4}),
        ],
    )
    rng = random.Random(7)
    docs = [
        {"id": f"d{i:03d}", "vector": [rng.uniform(-1, 1) for _ in range(4)]}
        for i in range(80)
    ]
    engine.upsert(db, coll, docs)
    engine.rebuild_index(db, coll)
    # the index must actually exist or the pruning branch silently
    # no-ops into a full scan and this test checks nothing (r11 fix:
    # without index_type="IVF_FLAT" rebuild_index skips build_ivf)
    meta = engine.catalog.get_collection(db, coll)
    assert meta.ann_state.get("ivf")
    assert "cluster_id" in engine.read(db, coll).columns

    src = tmp_path / "q"
    src.mkdir()
    out = str(tmp_path / "hits")
    schema = "query_id string, query_vec array<double>"
    probes = [(d["id"], [float(x) for x in d["vector"]]) for d in docs[:5]]
    spark.createDataFrame(probes, schema).write.parquet(f"{src}/w1.parquet")
    stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
    q = (stream.writeStream.foreachBatch(
            engine_stream_search_sink(engine, db, coll, out, k=1, nprobe=1))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    hits = spark.read.parquet(out).collect()
    assert len(hits) == 5
    for r in hits:
        assert r.query_id == r.id  # identical vector -> own cell probed
        assert abs(r.score - 1.0) < 1e-6


def test_engine_stream_search_query_batch_guard(spark, engine, tmp_path, monkeypatch):
    """Index-probe pruning collects the batch's query vectors on the
    driver, so an over-cap micro-batch must FAIL FAST with the
    remediation message (shrink the trigger / use_index=False), not
    materialize unbounded vectors (r10 advisor; the engine
    broadcast-guard pattern)."""
    import pytest

    from aiotcvectordb_spark.catalog import IndexField
    from aiotcvectordb_spark.streaming import search as S

    db, coll = "gdb", "gcoll"
    engine.create_database(db)
    engine.create_collection(
        db, coll,
        indexes=[
            IndexField(name="id", kind="primary_key", field_type="string"),
            IndexField(name="vector", kind="vector", field_type="vector",
                       dimension=4, metric_type="COSINE",
                       index_type="IVF_FLAT", params={"nlist": 2}),
        ],
    )
    docs = [
        {"id": f"d{i}", "vector": [float(i), 1.0, 0.0, 0.0]} for i in range(8)
    ]
    engine.upsert(db, coll, docs)
    engine.rebuild_index(db, coll)

    monkeypatch.setattr(S, "_QUERY_BATCH_MAX", 2)
    sink = S.engine_stream_search_sink(
        engine, db, coll, str(tmp_path / "hits"), k=1, nprobe=1
    )
    schema = "query_id string, query_vec array<double>"
    over_cap = spark.createDataFrame(
        [(f"q{i}", [1.0, 0.0, 0.0, 0.0]) for i in range(3)], schema
    )
    with pytest.raises(ValueError, match="use_index=False"):
        sink(over_cap, 0)
    # at or under the cap still answers
    under_cap = spark.createDataFrame(
        [(f"q{i}", [1.0, 0.0, 0.0, 0.0]) for i in range(2)], schema
    )
    sink(under_cap, 0)
    assert spark.read.parquet(str(tmp_path / "hits")).count() == 2
