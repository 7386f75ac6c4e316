"""Structured Streaming integration.

The reference has no streaming surface (SURVEY §2.7) — the nearest
analogs are TTL expiry and deferred index builds. We expose the additive
Spark-idiomatic pieces:

- ``stream_upsert_sink``: a ``foreachBatch`` sink that applies each
  micro-batch as an engine upsert (exactly-once per epoch via the
  store's atomic version flip — re-running an epoch overwrites the same
  logical state).
- ``ttl_vacuum``: the batch job that physically removes TTL-expired rows
  (the read path already filters them; vacuum reclaims storage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aiotcvectordb_spark.engine import VectorDBEngine, upsert_dataframes


def stream_upsert_sink(
    engine: VectorDBEngine, database: str, collection: str, *,
    build_index: bool = True,
):
    """Returns a foreachBatch function applying micro-batches as upserts.

    Index maintenance mirrors the reference's ``build_index`` deferral
    (stub.py:456-458): with a built IVF index and ``build_index=True``,
    incoming rows are assigned to the EXISTING centroids (no refit) and
    the partitioned-by-cluster layout is preserved, so nprobe pruning
    stays correct between full rebuilds. ``build_index=False`` skips the
    assignment and marks the index stale; the next ``rebuild_index``
    refreshes it.
    """

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from aiotcvectordb_spark.operators import ann

        meta = engine.catalog.get_collection(database, collection)
        pk = meta.primary_key
        ivf = meta.ann_state.get("ivf")
        vec = meta.vector_field
        partition_by = None
        if ivf and vec:
            if build_index:
                if "cluster_id" not in batch_df.columns:
                    batch_df = ann.assign_clusters(
                        batch_df, ivf["centroids"], vector_col=vec
                    )
                partition_by = ["cluster_id"]
            else:
                meta.index_status = "stale"
                engine.catalog.put_collection(meta, replace=True)
        try:
            old = engine.store.read(engine.spark, database, meta.name)
        except FileNotFoundError:
            old = None
        if old is not None:
            # Stream micro-batches are unbounded — no forced broadcast;
            # AQE sizes the anti-join per batch.
            merged = upsert_dataframes(old, batch_df, pk, known_small=False)
        else:
            merged = batch_df
        engine.store.write(
            merged, database, meta.name, shard=meta.shard,
            partition_by=partition_by,
        )
        # IVF_PQ: keep the sidecar codes table in lockstep — encode ONLY
        # the batch rows with the EXISTING codebooks (no retrain; same
        # incremental contract as the centroid assignment above) and
        # upsert them into the sidecar, so ADC search keeps seeing every
        # upserted row between full rebuilds at O(batch) encode cost.
        pq_state = meta.ann_state.get("pq")
        if pq_state and vec and build_index and ivf:
            from aiotcvectordb_spark.operators import ann as _ann
            from aiotcvectordb_spark.operators import pq as _pq

            model = _pq.PQModel.from_state(pq_state)
            sidecar = _ann._pq_sidecar_name(meta)
            batch_codes = _pq.encode_pq(
                batch_df, model, id_col=pk, vector_col=vec
            ).join(batch_df.select(pk, "cluster_id"), pk)
            try:
                old_codes = engine.store.read(engine.spark, database, sidecar)
            except FileNotFoundError:
                old_codes = None
            merged_codes = (
                upsert_dataframes(old_codes, batch_codes, pk, known_small=False)
                if old_codes is not None
                else batch_codes
            )
            engine.store.write(
                merged_codes, database, sidecar, partition_by=["cluster_id"]
            )

    return apply_batch


def windowed_event_counts(events: DataFrame, *, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts per event_type — ONE transformation that
    runs in batch (oracle-checkable) and in Structured Streaming
    (``readStream`` + watermark; the streaming test proves equivalence).

    ``ts`` arrives as epoch-nanosecond longs (parquet TIMESTAMP(NANOS)
    read with nanosAsLong); the cast to seconds-precision timestamp is
    shared by both modes.
    """
    with_ts = events.withColumn(
        "__event_time", F.expr("cast(ts div 1000000000 as timestamp)")
    )
    if with_ts.isStreaming:
        with_ts = with_ts.withWatermark("__event_time", "2 hours")
    return (
        with_ts.groupBy(F.window("__event_time", window), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,3)")).cast("double").alias("value_sum"),
        )
        .select(
            F.col("window.start").cast("long").alias("win_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def ttl_vacuum(engine: VectorDBEngine, database: str, collection: str) -> int:
    """Physically drop expired rows; returns the number removed."""
    meta = engine.catalog.get_collection(database, collection)
    if not (meta.ttl_config and meta.ttl_config.get("enable")):
        return 0
    tf = meta.ttl_config["timeField"]
    df = engine.store.read(engine.spark, database, meta.name)
    live = df.filter(F.col(tf) > F.unix_timestamp())
    removed = df.count() - live.count()
    if removed:
        engine.store.write(live, database, meta.name, shard=meta.shard)
    return removed
