"""Streaming LM quality gate at ingest.

Batch ``perplexity_filter`` (queries.py) derives its per-language
unigram LM from the whole corpus and cuts at a percentile; a
continuous INGEST pipeline can do neither — each arriving document
must be scored against the language model of everything seen SO FAR,
and a percentile is not causal, so the stream gates on a FIXED
bits/token threshold (the production shape: thresholds come from a
prior batch calibration run, e.g. perplexity_filter's cut values).

Semantics per micro-batch (epoch N):
- the LM is the standing per-(lang, token) count index accumulated by
  epochs < N **plus this batch's own counts** (self-inclusive, like
  ``incremental_substring_dedup``'s within-batch repeats — and what
  makes a replay of epoch N score identically);
- scoring runs ``pipelines.doc_term_freqs`` + ``pipelines.lm_bits`` —
  the batch query's own kernels, so batch == stream by construction;
- the batch's count DELTAS land under ``lm_dir/epoch=N`` and the
  gating decisions under ``results_dir/epoch=N``; both are per-epoch
  overwrites, idempotent under foreachBatch's at-least-once contract.

Scale shape: per micro-batch, one token aggregate over the batch, one
standing-index scan folded by a (lang, token) sum (compaction below
keeps that one generation), one vocab equi-join, one per-doc agg —
O(batch + vocab), never a corpus rescan, no executor-memory state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aiotcvectordb_spark import pipelines
from aiotcvectordb_spark.streaming.epochlog import (
    compact_summed_index,
    summed_epoch_paths,
)

_ROUND_DIGITS = 6


def _read_lm_index(spark, lm_dir: str, *, before_epoch: int | None = None) -> DataFrame:
    """Standing (lang, token, tf) counts summed across committed
    epochs. ``before_epoch`` hides the replaying epoch's own deltas; an
    empty frame is returned ONLY when nothing is committed. Counts are
    SUMS, so this read follows the watermark protocol
    (``epochlog.summed_epoch_paths``): live epochs already folded into
    the active compacted generation are skipped — a compaction that
    crashed between the generation write and the source deletes (r8
    fix) can no longer double every merged (lang, token) count."""
    paths = summed_epoch_paths(spark, lm_dir, before_epoch=before_epoch)
    if not paths:
        return spark.createDataFrame(
            [], "lang string, token string, tf bigint"
        )
    log = spark.read.option("basePath", lm_dir).parquet(*paths)
    return log.groupBy("lang", "token").agg(F.sum("tf").alias("tf"))


def stream_quality_gate_sink(
    lm_dir: str,
    results_dir: str,
    *,
    threshold_bits: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
):
    """Returns a ``foreachBatch`` callable that scores each arriving
    document's bits/token under the standing+batch language model and
    admits those at or below ``threshold_bits``. Results land under
    ``results_dir/epoch=N`` as (doc_id, lang, ppl_bits, admitted);
    the LM count deltas accumulate under ``lm_dir/epoch=N``."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        df = batch_df.select(
            F.col(id_col).alias("doc_id"),
            F.col(lang_col).alias("lang"),
            F.col(text_col).alias("text"),
        ).filter(F.length("text") > 0)
        dtf = pipelines.doc_term_freqs(df).persist()
        lm = None
        try:
            delta = dtf.groupBy("lang", "token").agg(
                F.sum("dtf").alias("tf")
            )
            prior = _read_lm_index(spark, lm_dir, before_epoch=epoch_id)
            lm = (
                prior.unionByName(delta)
                .groupBy("lang", "token")
                .agg(F.sum("tf").alias("tf"))
            )
            # the folded standing model feeds BOTH the totals agg and
            # the scoring join — persist it so the epoch log is scanned
            # once per micro-batch, not twice (r8, advisor)
            lm = lm.persist()
            totals = lm.groupBy("lang").agg(F.sum("tf").alias("n"))
            scored = pipelines.lm_bits(dtf, lm, totals, _ROUND_DIGITS)
            # every batch doc gets an explicit decision row: docs with
            # no scorable tokens (empty/whitespace-only text) surface as
            # (ppl_bits NULL, admitted false) instead of silently
            # vanishing from the decision log (r8, advisor)
            spine = batch_df.select(
                F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")
            ).distinct()
            out = (
                spine.join(scored.drop("lang"), "doc_id", "left")
                .withColumn(
                    "admitted",
                    F.coalesce(
                        F.col("ppl_bits") <= F.lit(threshold_bits),
                        F.lit(False),
                    ),
                )
                .select("doc_id", "lang", "ppl_bits", "admitted")
            )
            out.write.mode("overwrite").parquet(
                os.path.join(results_dir, f"epoch={epoch_id}")
            )
            delta.write.mode("overwrite").parquet(
                os.path.join(lm_dir, f"epoch={epoch_id}")
            )
        finally:
            dtf.unpersist()
            if lm is not None:
                lm.unpersist()

    return apply_batch


def read_gate_decisions(spark, results_dir: str) -> DataFrame:
    """All gating decisions so far: (doc_id, lang, ppl_bits, admitted,
    epoch)."""
    return spark.read.option("basePath", results_dir).parquet(
        os.path.join(results_dir, "epoch=*")
    )


def compact_lm_index(spark, lm_dir: str) -> None:
    """Fold the epoch delta log into ONE summed generation via
    ``epochlog.compact_summed_index``. Unlike the distinct-gram index,
    ``old ∪ compacted`` is NOT idempotent for sums, so the compaction
    commits through a ``_FOLDED_UP_TO`` watermark marker: readers
    ignore an unmarked generation and skip live epochs the active
    generation already folded, making every crash window read to
    exactly the committed counts (r8, closes the mid-compaction
    count-doubling hole). The NEWEST live epoch is never merged — it is
    the only one foreachBatch can replay, and its deltas must stay
    invisible to its own replay's ``before_epoch`` read. SINGLE
    COMPACTOR REQUIRED — concurrent compactions GC each other's
    unmarked in-flight generation; run from the one path that owns the
    index (crash-then-retry is fine, overlap is not)."""
    compact_summed_index(spark, lm_dir, _read_lm_index)
