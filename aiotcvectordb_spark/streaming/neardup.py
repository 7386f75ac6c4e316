"""Streaming near-duplicate detection at ingest.

Batch near-dedup (``pipelines.near_dedup_stage``) assumes it can see
the whole corpus at once; a training-data INGEST pipeline can't — new
documents arrive continuously and each must be judged against
everything already accepted. This operator runs MinHash-LSH
near-duplicate detection inside a ``foreachBatch`` sink with
first-arrival-wins semantics (the streaming analogue of bucket-min
domination):

- every micro-batch computes the same band hashes as the batch stage
  (``pipelines.minhash_band_hashes`` — shared kernel, identical
  family);
- a document is flagged ``near_dup`` when any of its buckets was
  already claimed by an earlier-epoch document, or by a smaller-id
  document within its own batch (so an id-ordered replay reproduces
  the batch result exactly — proven in pytest);
- the bucket index is an append-only hive-partitioned parquet log
  (``epoch=N`` directories of per-bucket minima). Re-processing an
  epoch overwrites its own directory — idempotent under Structured
  Streaming's at-least-once ``foreachBatch`` contract, the same
  epoch-idempotence argument as ``sink.stream_upsert_sink``.

Scale shape: per micro-batch cost is one band-hash pass over the batch
plus one equi-join against the bucket index on (band, h) — no
all-pairs work, no state in executor memory (the index lives in
storage, not in a streaming state store, so it survives restarts and
can be compacted offline). Reads of the index aggregate per-epoch
minima with a groupBy-min; compact periodically by rewriting the log
as a single epoch directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aiotcvectordb_spark.pipelines import minhash_band_hashes

_INDEX_SCHEMA = "band int, h bigint, min_id long"


def _read_bucket_index(spark, index_dir: str) -> DataFrame:
    """Per-bucket minimum doc id across all epochs written so far;
    empty frame when no epoch has committed yet."""
    try:
        log = spark.read.option("basePath", index_dir).parquet(
            os.path.join(index_dir, "epoch=*")
        )
    except Exception:
        return spark.createDataFrame([], _INDEX_SCHEMA)
    return log.groupBy("band", "h").agg(F.min("min_id").alias("min_id"))


def stream_neardup_sink(
    index_dir: str,
    results_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "clean_text",
    n_hashes: int = 4,
    shingle: int = 3,
):
    """Returns a ``foreachBatch`` callable flagging each arriving doc as
    ``near_dup`` iff an earlier-seen document shares an LSH bucket.

    Results land under ``results_dir/epoch=N`` as (id, near_dup) rows;
    the bucket index accumulates under ``index_dir/epoch=N``. Both
    writes are per-epoch overwrites, so replays are idempotent."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        bands = minhash_band_hashes(
            batch_df,
            id_col=id_col,
            text_col=text_col,
            n_hashes=n_hashes,
            shingle=shingle,
        ).persist()
        try:
            prior = _read_bucket_index(spark, index_dir)
            # claimed by an earlier epoch's bucket minimum...
            hit_prior = (
                bands.join(prior, ["band", "h"])
                .filter(F.col("min_id") < F.col(id_col))
                .select(id_col)
            )
            # ...or dominated by a smaller id within this batch
            in_batch_min = bands.groupBy("band", "h").agg(
                F.min(id_col).alias("batch_min")
            )
            hit_batch = (
                bands.join(in_batch_min, ["band", "h"])
                .filter(F.col("batch_min") < F.col(id_col))
                .select(id_col)
            )
            dup_ids = hit_prior.union(hit_batch).distinct()
            flagged = (
                batch_df.select(id_col)
                .distinct()
                .join(
                    dup_ids.withColumn("near_dup", F.lit(True)), id_col, "left"
                )
                .withColumn("near_dup", F.coalesce("near_dup", F.lit(False)))
            )
            flagged.write.mode("overwrite").parquet(
                os.path.join(results_dir, f"epoch={epoch_id}")
            )
            # append this batch's bucket minima to the index log
            in_batch_min.select(
                "band", "h", F.col("batch_min").alias("min_id")
            ).write.mode("overwrite").parquet(
                os.path.join(index_dir, f"epoch={epoch_id}")
            )
        finally:
            bands.unpersist()

    return apply_batch


def read_neardup_flags(spark, results_dir: str) -> DataFrame:
    """All flag decisions made so far: (id, near_dup, epoch)."""
    return spark.read.option("basePath", results_dir).parquet(
        os.path.join(results_dir, "epoch=*")
    )


def compact_bucket_index(spark, index_dir: str) -> None:
    """Rewrite the epoch log as a single epoch directory holding the
    global per-bucket minima (run offline between streaming runs; the
    read path is identical before and after)."""
    tmp = os.path.join(index_dir, "_compact_tmp")
    # the write is an action: the merged minima are fully materialized
    # in tmp before any source epoch directory is removed
    _read_bucket_index(spark, index_dir).write.mode("overwrite").parquet(tmp)
    import shutil

    for name in os.listdir(index_dir):
        if name.startswith("epoch="):
            shutil.rmtree(os.path.join(index_dir, name))
    os.rename(tmp, os.path.join(index_dir, "epoch=0"))
