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

# Fail-fast ceiling on queries per micro-batch when index-probe pruning
# collects their vectors on the driver (engine._BROADCAST_KEYS_MAX
# rationale, sized down for 64-float vectors: 64k x ~512 B ≈ 32 MB).
_QUERY_BATCH_MAX = 65_536


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
    **kwargs,
):
    """ForeachBatch function: answer each arriving query micro-batch
    with :func:`answer_query_batch` and write the hits under
    ``out_path`` (parquet). Attach with::

        (query_stream.writeStream.foreachBatch(
            stream_search_sink(collection_df, "/results",
                               query_vec="query_vec", k=5))
         .option("checkpointLocation", ckpt).start())

    Results are EXACTLY-ONCE: each epoch writes (mode=overwrite) its own
    ``epoch=<id>`` subdirectory, so a crash between the write and the
    checkpoint commit makes the replayed epoch overwrite itself instead
    of appending duplicates. Read results with
    ``spark.read.parquet(out_path)`` — partition discovery exposes the
    epoch as a column.
    """

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        answer_query_batch(batch_df, collection, **kwargs).write.mode(
            "overwrite"
        ).parquet(f"{out_path}/epoch={epoch_id}")

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
    batch, and epoch-keyed overwrite writes make replayed epochs
    idempotent (proven in tests/test_stream_search.py). Requests with a
    NULL query vector are dropped, not answered — one malformed row
    must not wedge the serving loop.

    With a built IVF index and ``use_index=True``, each micro-batch
    scans only the union of its queries' nprobe nearest cells (the
    shared `operators/ann.probe_cells` policy) — the ``cluster_id IN
    (...)`` predicate prunes the partitioned parquet layout, so
    per-trigger I/O scales with nprobe/nlist, not collection size.
    Collecting the batch's query vectors to the driver is fine by
    construction: a trigger's worth of requests is small (the reference
    server holds them in the request handler the same way)."""
    from pyspark.sql import functions as F

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.filter(F.col(query_vec).isNotNull())
        if batch_df.isEmpty():
            return
        meta = engine.catalog.get_collection(database, collection)
        snapshot = engine.read(database, collection)
        ivf = meta.ann_state.get("ivf") if use_index else None
        if ivf and "cluster_id" in snapshot.columns:
            from aiotcvectordb_spark.operators.ann import probe_cells

            # size-guard the driver collect (the engine.delete_rows
            # broadcast-guard pattern): a trigger's worth of requests is
            # small BY CONTRACT, but a misconfigured source (one giant
            # file per trigger) must fail fast with a fix, not OOM the
            # driver materializing an unbounded vector list
            # LIMIT-bounded probe (r12 advisor): a bare count() is a
            # full extra job re-reading the micro-batch source every
            # trigger; limit(MAX+1).count() short-circuits the scan as
            # soon as the cap is provably exceeded (or not)
            if batch_df.limit(_QUERY_BATCH_MAX + 1).count() > _QUERY_BATCH_MAX:
                raise ValueError(
                    f"query micro-batch exceeds {_QUERY_BATCH_MAX} rows"
                    ": index-probe pruning collects "
                    "the batch's query vectors on the driver. Shrink the "
                    "trigger (maxFilesPerTrigger / maxOffsetsPerTrigger) "
                    "or pass use_index=False for a full-scan answer."
                )
            vecs = [r[0] for r in batch_df.select(query_vec).collect()]
            cells = probe_cells(ivf["centroids"], vecs, nprobe)
            snapshot = snapshot.filter(F.col("cluster_id").isin(cells))
        answer_query_batch(
            batch_df,
            snapshot.drop("cluster_id"),
            query_id=query_id,
            query_vec=query_vec,
            vector_col=meta.vector_field,
            id_col=meta.primary_key,
            metric=metric,
            k=k,
            round_digits=round_digits,
        ).write.mode("overwrite").parquet(f"{out_path}/epoch={epoch_id}")

    return apply_batch
