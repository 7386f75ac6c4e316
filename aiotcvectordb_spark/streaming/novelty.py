"""Streaming corpus-order gram novelty at ingest.

Batch ``gram_novelty`` (queries.py) scores every document's fraction of
first-seen distinct word n-grams over the WHOLE corpus; a continuous
crawl cannot rescan the corpus per micro-batch, so this sink maintains
the seen-gram totals as a stored SUMMED epoch index and scores each
arriving batch against it — the 6th ingest twin on the shared epoch-log
discipline (substrdedup grams / neardup bucket minima / qualitygate LM
counts / dsir raw counts / linededup line counts / seen-gram counts
here).

Semantics per micro-batch (epoch N):
- a batch doc's distinct gram is NOVEL iff it is absent from the
  standing index (epochs < N, watermark-read) AND the doc is the
  gram's first owner (min doc_id) WITHIN the batch — exactly
  ``q_incremental_gram_novelty``'s rule, which is the full-corpus
  first-owner rule whenever ingest order follows id order;
- every batch doc gets an EXPLICIT decision row: a sub-n-word doc
  surfaces as (n_grams=0, novelty NULL) instead of vanishing (the r8
  qualitygate/dsir decision-log rule);
- the batch's per-gram counts land under ``index_dir/epoch=N`` and the
  novelty rows under ``results_dir/epoch=N``; both are per-epoch
  overwrites, idempotent under foreachBatch's at-least-once contract
  (a replay of epoch N hides its own deltas via ``before_epoch`` and
  recomputes them from the batch itself).

Counts are SUMS — union with a compacted generation is NOT idempotent —
so the index uses the watermark commit protocol
(``epochlog.compact_summed_index`` / ``summed_epoch_paths``); novelty
only consumes membership (c >= 1), but keeping the counts makes the
index shareable with count-thresholded consumers and keeps all six
twins on one compaction discipline.

Scale shape: per micro-batch, one distinct-gram aggregate over the
batch, one gram-keyed min/count aggregate, one keyed left join against
the standing index, one doc-keyed count — O(batch + collisions), never
a corpus rescan, no executor-memory state.

Equality of epoch-1 results with ``q_incremental_gram_novelty``
(standing corpus as epoch 0, newest slice as epoch 1) is pinned in
tests/test_stream_novelty.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aiotcvectordb_spark.streaming.epochlog import (
    compact_summed_index,
    summed_epoch_paths,
)

_ROUND_DIGITS = 6


def _read_gram_index(
    spark, index_dir: str, *, before_epoch: int | None = None
) -> DataFrame:
    """Standing (gram, c) seen-gram counts summed across committed
    epochs. ``before_epoch`` hides the replaying epoch's own deltas; an
    empty frame is returned ONLY when nothing is committed (a transient
    listing failure raises inside ``summed_epoch_paths`` so the
    micro-batch retries instead of silently over-scoring novelty)."""
    paths = summed_epoch_paths(spark, index_dir, before_epoch=before_epoch)
    if not paths:
        return spark.createDataFrame([], "gram string, c bigint")
    log = spark.read.option("basePath", index_dir).parquet(*paths)
    return log.groupBy("gram").agg(F.sum("c").alias("c"))


def stream_gram_novelty_sink(
    index_dir: str,
    results_dir: str,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Returns a ``foreachBatch`` callable that scores each arriving
    document's first-seen-gram fraction against the standing index.
    Results land under ``results_dir/epoch=N`` as (doc_id, n_grams,
    n_novel, novelty); per-gram count deltas accumulate under
    ``index_dir/epoch=N``."""
    from aiotcvectordb_spark.pipelines import word_ngrams

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        docs = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
        bg = word_ngrams(docs, n).select("doc_id", "gram").distinct()
        bg = bg.persist()
        try:
            first_b = bg.groupBy("gram").agg(
                F.min("doc_id").alias("first_doc"),
                F.count("*").alias("c"),
            )
            standing = (
                _read_gram_index(spark, index_dir, before_epoch=epoch_id)
                .select("gram")
                .withColumn("seen", F.lit(True))
            )
            per_doc = (
                bg.join(first_b.select("gram", "first_doc"), "gram")
                .join(standing, "gram", "left")
                .groupBy("doc_id")
                .agg(
                    F.count("*").alias("n_grams"),
                    F.sum(
                        F.when(
                            F.col("seen").isNull()
                            & (F.col("first_doc") == F.col("doc_id")),
                            1,
                        ).otherwise(0)
                    ).alias("n_novel"),
                )
            )
            out = (
                docs.select("doc_id")
                .join(per_doc, "doc_id", "left")
                .select(
                    "doc_id",
                    F.coalesce("n_grams", F.lit(0))
                    .cast("long")
                    .alias("n_grams"),
                    F.coalesce("n_novel", F.lit(0))
                    .cast("long")
                    .alias("n_novel"),
                )
                .withColumn(
                    "novelty",
                    F.when(
                        F.col("n_grams") > 0,
                        F.round(
                            F.col("n_novel") / F.col("n_grams"),
                            _ROUND_DIGITS,
                        ),
                    ),
                )
            )
            out.write.mode("overwrite").parquet(
                os.path.join(results_dir, f"epoch={epoch_id}")
            )
            first_b.select("gram", "c").write.mode("overwrite").parquet(
                os.path.join(index_dir, f"epoch={epoch_id}")
            )
        finally:
            bg.unpersist()

    return apply_batch


def read_novelty_results(spark, results_dir: str) -> DataFrame:
    """All novelty rows so far: (doc_id, n_grams, n_novel, novelty,
    epoch)."""
    return spark.read.option("basePath", results_dir).parquet(
        os.path.join(results_dir, "epoch=*")
    )


def compact_gram_index(spark, index_dir: str) -> None:
    """Fold the seen-gram epoch log into ONE summed generation via
    ``epochlog.compact_summed_index`` — the watermark commit protocol
    (``_FOLDED_UP_TO`` marker as the commit point, unmarked generations
    invisible + GC'd, newest live epoch spared for replay), crash-safe
    for non-idempotent summed counts at every point. SINGLE COMPACTOR
    REQUIRED — concurrent compactions GC each other's unmarked
    in-flight generation; run from the one path that owns the index
    (crash-then-retry is fine, overlap is not)."""
    compact_summed_index(spark, index_dir, _read_gram_index)
