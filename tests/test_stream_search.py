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
