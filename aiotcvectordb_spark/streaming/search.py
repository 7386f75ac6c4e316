"""Continuous vector search: a query STREAM served against a collection.

The reference serves searches request-by-request over HTTP
(reference: aiotcvectordb/client/stub.py:589-640); the Spark-native
analogue of that serving loop is Structured Streaming — queries arrive
on a stream, each micro-batch is answered with the same exact kNN the
batch path uses, and answers land in a results sink. Because the
per-batch transform IS `operators/knn.knn_join`, batch and stream
results are identical by construction (asserted in
tests/test_stream_search.py).

Scale shape: the arriving query micro-batch is broadcast (it is the
small side — requests per trigger), the collection scan streams
through the executors exactly like a batch search, and the per-query
top-k window shuffles only (query_id, candidate) pairs. Nothing is
collected on the driver; the sink append is distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from aiotcvectordb_spark.operators.knn import knn_join


def answer_query_batch(
    queries: DataFrame,
    collection: DataFrame,
    *,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    vector_col: str = "vector",
    id_col: str = "id",
    metric: str = "COSINE",
    k: int = 10,
    round_digits: int | None = 6,
) -> DataFrame:
    """Answer one batch of query rows — the shared batch/stream kernel.

    Returns (query_id, <id_col>, score, rank, ...collection fields).
    """
    out = knn_join(
        queries,
        collection,
        left_vec=query_vec,
        right_vec=vector_col,
        left_id=query_id,
        right_id=id_col,
        metric=metric,
        k=k,
        round_digits=round_digits,
    )
    return out.withColumnRenamed("query_id", query_id)


def stream_search_sink(
    collection: DataFrame,
    out_path: str,
    *,
    checkpoint: str | None = None,
    **kwargs,
):
    """ForeachBatch function: answer each arriving query micro-batch
    with :func:`answer_query_batch` and append the hits to ``out_path``
    (parquet). Attach with::

        (query_stream.writeStream.foreachBatch(
            stream_search_sink(collection_df, "/results",
                               query_vec="query_vec", k=5))
         .option("checkpointLocation", ckpt).start())

    foreachBatch + append + the streaming checkpoint gives exactly-once
    results for each query id (same recovery story as the upsert sink,
    proven in tests/test_streaming.py for that sink).
    """

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        answer_query_batch(batch_df, collection, **kwargs).write.mode(
            "append"
        ).parquet(out_path)

    return apply_batch


def engine_stream_search_sink(
    engine,
    database: str,
    collection: str,
    out_path: str,
    *,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    metric: str = "COSINE",
    k: int = 10,
    round_digits: int | None = 6,
    use_index: bool = True,
    nprobe: int | None = None,
):
    """Engine-level serving loop: like :func:`stream_search_sink`, but
    the collection snapshot is re-read from the engine's store at EVERY
    micro-batch — upserts and deletes that land between triggers are
    visible to the next batch of queries, exactly like the reference
    server answering against its live collection. The streaming
    checkpoint makes restarts resume at the first unanswered query
    batch (proven in tests/test_stream_search.py).

    With a built IVF index and ``use_index=True``, each micro-batch
    scans only the union of its queries' nprobe nearest cells — the
    ``cluster_id IN (...)`` predicate prunes the partitioned parquet
    layout, so per-trigger I/O scales with nprobe/nlist, not collection
    size. Collecting the batch's query vectors to the driver is fine by
    construction: a trigger's worth of requests is small (the reference
    server holds them in the request handler the same way)."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        meta = engine.catalog.get_collection(database, collection)
        snapshot = engine.read(database, collection)
        ivf = meta.ann_state.get("ivf") if use_index else None
        if ivf and "cluster_id" in snapshot.columns:
            import numpy as np
            from pyspark.sql import functions as F

            cents = np.asarray(ivf["centroids"], dtype=np.float64)
            probes = min(nprobe or max(1, ivf["nlist"] // 4), ivf["nlist"])
            cells: set[int] = set()
            for row in batch_df.select(query_vec).collect():
                q = np.asarray(row[0], dtype=np.float64)
                d = ((cents - q) ** 2).sum(axis=1)
                cells.update(int(i) for i in np.argsort(d)[:probes])
            snapshot = snapshot.filter(
                F.col("cluster_id").isin(sorted(cells))
            )
        answer_query_batch(
            batch_df,
            snapshot,
            query_id=query_id,
            query_vec=query_vec,
            vector_col=meta.vector_field,
            id_col=meta.primary_key,
            metric=metric,
            k=k,
            round_digits=round_digits,
        ).write.mode("append").parquet(out_path)

    return apply_batch
