"""Streaming CCNet line-level boilerplate removal at ingest.

Batch ``line_dedup`` (queries.py) finds boilerplate lines by counting
normalized lines corpus-wide; a continuous INGEST pipeline cannot
rescan the corpus per micro-batch, so this sink maintains the
(norm → count) totals as a stored SUMMED epoch index and cleans each
arriving batch against it — the 5th ingest twin on the shared epoch-log
discipline (substrdedup grams / neardup bucket minima / qualitygate LM
counts / dsir raw counts / line counts here).

Semantics per micro-batch (epoch N):
- a line is boilerplate iff standing count (epochs < N, watermark-read)
  PLUS this batch's own count reaches ``min_count`` — self-inclusive,
  exactly ``q_incremental_line_dedup``'s rule, which makes a replay of
  epoch N clean identically (its own deltas are hidden by
  ``before_epoch`` and re-added from the batch itself);
- every batch doc gets an EXPLICIT result row: a fully-boilerplate page
  surfaces as (text='', kept_lines=0) instead of vanishing (the r8
  qualitygate/dsir decision-log rule);
- the batch's count DELTAS land under ``index_dir/epoch=N`` and the
  cleaned pages under ``results_dir/epoch=N``; both are per-epoch
  overwrites, idempotent under foreachBatch's at-least-once contract.

Counts are SUMS — union with a compacted generation is NOT idempotent —
so the index uses the watermark commit protocol
(``epochlog.compact_summed_index`` / ``summed_epoch_paths``): a
generation is invisible until its ``_FOLDED_UP_TO`` marker lands, and
readers skip live epochs the active generation already folded.

Scale shape: per micro-batch, one line aggregate over the batch, one
standing-index scan folded by a (norm) sum (compaction keeps that one
generation), one count-join on the batch's distinct norms, one per-doc
reassembly agg — O(batch + distinct-norm collisions), never a corpus
rescan, no executor-memory state.

Equality of epoch-1 results with ``q_incremental_line_dedup`` (standing
corpus as epoch 0, batch as epoch 1) is pinned in
tests/test_stream_linededup.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aiotcvectordb_spark.streaming.epochlog import (
    compact_summed_index,
    summed_epoch_paths,
)


def _read_line_index(
    spark, index_dir: str, *, before_epoch: int | None = None
) -> DataFrame:
    """Standing (norm, c) line counts summed across committed epochs.
    ``before_epoch`` hides the replaying epoch's own deltas; an empty
    frame is returned ONLY when nothing is committed (a transient
    listing failure raises inside ``summed_epoch_paths`` so the
    micro-batch retries instead of silently under-deduplicating)."""
    paths = summed_epoch_paths(spark, index_dir, before_epoch=before_epoch)
    if not paths:
        return spark.createDataFrame([], "norm string, c bigint")
    log = spark.read.option("basePath", index_dir).parquet(*paths)
    return log.groupBy("norm").agg(F.sum("c").alias("c"))


def stream_line_dedup_sink(
    index_dir: str,
    results_dir: str,
    *,
    min_count: int,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Returns a ``foreachBatch`` callable that strips lines whose
    standing+batch occurrence count reaches ``min_count`` from each
    arriving page. Results land under ``results_dir/epoch=N`` as
    (doc_id, text, kept_lines); line-count deltas accumulate under
    ``index_dir/epoch=N``."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        pages = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ).filter(F.length("text") > 0)
        lines = pages.select(
            "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "line")
        ).withColumn("norm", F.lower(F.trim("line")))
        lines = lines.persist()
        try:
            delta = lines.groupBy("norm").agg(
                F.count("*").alias("c")
            )
            prior = _read_line_index(spark, index_dir, before_epoch=epoch_id)
            total = (
                prior.unionByName(delta)
                .groupBy("norm")
                .agg(F.sum("c").alias("c"))
            )
            boiler = total.filter(F.col("c") >= min_count).select("norm")
            kept = lines.join(boiler, "norm", "left_anti")
            agg = kept.groupBy("doc_id").agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "line"))),
                        lambda s: s["line"],
                    ),
                    "\n",
                ).alias("text"),
                F.count("*").alias("kept_lines"),
            )
            out = (
                pages.select("doc_id")
                .join(agg, "doc_id", "left")
                .select(
                    "doc_id",
                    F.coalesce("text", F.lit("")).alias("text"),
                    F.coalesce(
                        "kept_lines", F.lit(0).cast("long")
                    ).alias("kept_lines"),
                )
            )
            out.write.mode("overwrite").parquet(
                os.path.join(results_dir, f"epoch={epoch_id}")
            )
            delta.write.mode("overwrite").parquet(
                os.path.join(index_dir, f"epoch={epoch_id}")
            )
        finally:
            lines.unpersist()

    return apply_batch


def read_clean_results(spark, results_dir: str) -> DataFrame:
    """All cleaned pages so far: (doc_id, text, kept_lines, epoch)."""
    return spark.read.option("basePath", results_dir).parquet(
        os.path.join(results_dir, "epoch=*")
    )


def compact_line_index(spark, index_dir: str) -> None:
    """Fold the line-count epoch log into ONE summed generation via
    ``epochlog.compact_summed_index`` — the watermark commit protocol
    (``_FOLDED_UP_TO`` marker as the commit point, unmarked generations
    invisible + GC'd, newest live epoch spared for replay), crash-safe
    for non-idempotent summed counts at every point. SINGLE COMPACTOR
    REQUIRED — concurrent compactions GC each other's unmarked
    in-flight generation; run from the one path that owns the index
    (crash-then-retry is fine, overlap is not)."""
    compact_summed_index(spark, index_dir, _read_line_index)
