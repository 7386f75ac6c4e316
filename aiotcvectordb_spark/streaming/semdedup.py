"""Streaming SemDeDup at ingest — the fourth ingest twin.

Batch ``semantic_dedup`` (queries.py) sees the whole corpus; a
continuous training-data INGEST pipeline must judge each arriving
document's embedding against everything already accepted. This sink
runs the SemDeDup cell/prune semantics inside ``foreachBatch`` with
first-arrival-wins causality, on the same epoch-log discipline as the
gram/bucket/LM/DSIR indexes:

- every micro-batch assigns embeddings to cells with
  ``operators.semdedup.assign_cells`` — the BATCH kernel (same
  centroids, same rounding), so stream == batch by construction;
- a document is flagged ``semantic_dup`` when any SAME-CELL member of
  an earlier epoch reaches cosine tau (earlier arrivals dominate —
  streaming causality), or when a batch-mate that PRECEDES it in the
  batch keep order (centroid-cosine ASC, id ASC) reaches tau — exactly
  the batch domination rule, so feeding the whole corpus as one batch
  reproduces the batch query's flags bit-for-bit (pinned in
  tests/test_stream_semdedup.py);
- the member index is an append-only hive-partitioned parquet log
  (``epoch=N`` directories of (cell, vec_id, ccos, embedding) rows).
  Membership is a SET (idempotent under union), so compaction uses the
  simple write-then-delete protocol of the gram index (descending
  negative generation ids, newest live epoch spared, Hadoop FS only —
  no watermark needed, unlike the summed LM/DSIR indexes).

Scale shape: per micro-batch, one small-matrix Arrow matmul for
assignment, one cell semi-join pulling ONLY the standing members of
cells the batch touches, and per-cell chunked-BLAS cosine blocks —
O(batch × touched-cell membership), never a corpus rescan, no
executor-memory state. Cells stay bounded when centroids come from the
calibrated trainer (nlist ∝ N, queries._sampled_spherical_kmeans).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aiotcvectordb_spark.operators.semdedup import assign_cells, flag_members
from aiotcvectordb_spark.streaming.epochlog import delete_epoch, epoch_ids

_INDEX_SCHEMA = "cell int, vec_id long, ccos double, embedding array<double>"


def _read_member_index(
    spark, index_dir: str, *, before_epoch: int | None = None
) -> DataFrame:
    """Distinct standing members across committed epochs; empty frame
    ONLY when no epoch directory exists (explicit Hadoop FS listing —
    a transient read failure re-raises so the micro-batch retries,
    instead of silently deduplicating against an empty index).
    ``before_epoch`` hides the replaying epoch's own members."""
    epochs = epoch_ids(spark, index_dir)
    if before_epoch is not None:
        epochs = [e for e in epochs if e < before_epoch]
    if not epochs:
        return spark.createDataFrame([], _INDEX_SCHEMA)
    paths = [f"{index_dir}/epoch={e}" for e in epochs]
    log = spark.read.option("basePath", index_dir).parquet(*paths)
    return log.select("cell", "vec_id", "ccos", "embedding").distinct()


def stream_semdedup_sink(
    index_dir: str,
    results_dir: str,
    *,
    centroids,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Returns a ``foreachBatch`` callable flagging each arriving
    embedding as ``semantic_dup`` iff an earlier-accepted same-cell
    member (or a keep-order-earlier batch-mate) reaches cosine ``tau``.
    ``centroids`` is the calibrated cell model (list of vectors —
    driver-fixed like the batch query's, or a trained matrix). Results
    land under ``results_dir/epoch=N`` as (vec_id, cell, ccos,
    semantic_dup); the member index accumulates under
    ``index_dir/epoch=N``. Both writes are per-epoch overwrites, so
    replays are idempotent."""
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        src = batch_df.select(
            F.col(id_col).cast("long").alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("embedding"),
        )
        assigned = assign_cells(src, C).persist()
        try:
            prior = _read_member_index(spark, index_dir, before_epoch=epoch_id)
            # only the standing members of cells this batch touches
            touched = assigned.select("cell").distinct()
            prior_touched = prior.join(touched, "cell", "left_semi")
            both = assigned.select(
                "cell", "vec_id", "ccos", "embedding",
                F.lit(False).alias("prior"),
            ).unionByName(
                prior_touched.select(
                    "cell", "vec_id", "ccos", "embedding",
                    F.lit(True).alias("prior"),
                )
            )
            out_schema = (
                "vec_id long, cell int, ccos double, semantic_dup boolean"
            )

            def prune(pdf: "pd.DataFrame") -> "pd.DataFrame":
                batch, dup = flag_members(pdf, tau)
                return pd.DataFrame(
                    {
                        "vec_id": batch["vec_id"],
                        "cell": batch["cell"].astype("int32"),
                        "ccos": batch["ccos"],
                        "semantic_dup": dup,
                    }
                )

            flags = both.groupBy("cell").applyInPandas(
                lambda _, pdf: prune(pdf), schema=out_schema
            )
            flags.write.mode("overwrite").parquet(
                os.path.join(results_dir, f"epoch={epoch_id}")
            )
            assigned.select("cell", "vec_id", "ccos", "embedding").write.mode(
                "overwrite"
            ).parquet(os.path.join(index_dir, f"epoch={epoch_id}"))
        finally:
            assigned.unpersist()

    return apply_batch


def read_semdedup_flags(spark, results_dir: str) -> DataFrame:
    """All flag decisions so far: (vec_id, cell, ccos, semantic_dup,
    epoch)."""
    return spark.read.option("basePath", results_dir).parquet(
        os.path.join(results_dir, "epoch=*")
    )


def compact_member_index(spark, index_dir: str) -> None:
    """Rewrite the member epoch log as ONE generation of distinct
    members — the gram-index protocol verbatim (membership union is
    idempotent, so write-then-delete is crash-safe at every point):
    fresh descending NEGATIVE generation id, newest live epoch spared
    (the only batch id foreachBatch can replay), Hadoop FS deletes, no
    rename."""
    epochs = epoch_ids(spark, index_dir)
    live = [e for e in epochs if e >= 0]
    merge = [e for e in epochs if not live or e != max(live)]
    if len(merge) <= 1:
        return  # nothing to merge
    target = min(epochs) - 1 if epochs[0] < 0 else -1
    _read_member_index(
        spark, index_dir, before_epoch=max(live) if live else None
    ).write.mode("overwrite").parquet(f"{index_dir}/epoch={target}")
    for e in merge:
        delete_epoch(spark, index_dir, e)
