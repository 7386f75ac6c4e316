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
compacts offline through ``compact_bucket_index`` — the gram-index
epoch discipline, r8). Reads of the index aggregate per-epoch minima
with a groupBy-min.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aiotcvectordb_spark.pipelines import minhash_band_hashes
from aiotcvectordb_spark.streaming.epochlog import delete_epoch, epoch_ids

_INDEX_SCHEMA = "band int, h bigint, min_id long"


def _read_bucket_index(
    spark, index_dir: str, *, before_epoch: int | None = None
) -> DataFrame:
    """Per-bucket minimum doc id across committed epochs; empty frame
    ONLY when no epoch directory exists (checked explicitly via the
    Hadoop FS listing — a transient read failure re-raises so the
    micro-batch retries, instead of silently deduplicating against an
    empty index; r8, was a bare-except→empty). ``before_epoch``
    restricts the read to strictly earlier epochs, so an at-least-once
    replay of epoch N never sees its own minima as 'prior corpus'
    (compacted generations use descending NEGATIVE ids and always pass
    the filter)."""
    epochs = epoch_ids(spark, index_dir)
    if before_epoch is not None:
        epochs = [e for e in epochs if e < before_epoch]
    if not epochs:
        return spark.createDataFrame([], _INDEX_SCHEMA)
    paths = [f"{index_dir}/epoch={e}" for e in epochs]
    log = spark.read.option("basePath", index_dir).parquet(*paths)
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
            prior = _read_bucket_index(spark, index_dir, before_epoch=epoch_id)
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
    """Rewrite the epoch log as ONE generation of global per-bucket
    minima (run offline; the read path is identical before and after).

    Identical discipline to ``substrdedup.compact_gram_index`` (r8 —
    replaces an ``os.listdir``/``shutil``/``os.rename`` pass that broke
    off local disk AND compacted into ``epoch=0``, a directory a fresh
    stream's batch 0 would overwrite, destroying the index): the merged
    minima are WRITTEN through Spark to a fresh NEGATIVE generation id
    (descending -1, -2, ... — never colliding with Structured
    Streaming's monotonically increasing batch ids, and always passing
    a replay's ``before_epoch`` filter), then the superseded epoch
    directories are deleted through the Hadoop FileSystem API. No
    rename; every crash window is safe because min is idempotent under
    union — ``old ∪ compacted`` folds to the same per-bucket minima.

    Replay safety: the NEWEST live epoch is never merged — it is the
    only batch id foreachBatch can replay after a crash, and its
    ``before_epoch`` read must not find its own minima inside the
    compacted generation."""
    epochs = epoch_ids(spark, index_dir)
    live = [e for e in epochs if e >= 0]
    merge = [e for e in epochs if not live or e != max(live)]
    if len(merge) <= 1:
        return  # nothing to merge
    target = min(epochs) - 1 if epochs[0] < 0 else -1
    _read_bucket_index(
        spark, index_dir, before_epoch=max(live) if live else None
    ).write.mode("overwrite").parquet(f"{index_dir}/epoch={target}")
    for e in merge:
        delete_epoch(spark, index_dir, e)
