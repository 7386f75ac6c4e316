"""Streaming DSIR admission at ingest.

Batch ``dsir_weights`` (queries.py) scores the raw pool against a
curated target slice with both distributions computed over the whole
corpus; a continuous INGEST pipeline has a FIXED target model (the
curated slice is calibrated once, offline) while the raw distribution
is everything seen so far. This sink completes the scoring family's
ingest twins (substring dedup -> ``substrdedup.py``, LM quality gate
-> ``qualitygate.py``, importance weights -> here), all three on the
same epoch-log discipline:

- per micro-batch (epoch N): hashed-bigram bucket counts come from
  ``operators.classifier.hashed_bigram_buckets`` — the same kernel the
  batch scorers use; the raw model is the standing per-bucket count
  index of epochs < N PLUS this batch's own counts (self-inclusive,
  so a replay of epoch N scores identically);
- per-doc log importance weight = sum over the doc's bucket
  occurrences of log2(p_target) - log2(p_raw), add-one smoothed over
  ``n_buckets`` — the batch query's formula with the standing raw
  counts in place of the corpus counts;
- admission gates on a FIXED weight threshold (a global percentile is
  not causal; thresholds come from a batch calibration run);
- the batch's count deltas land under ``raw_dir/epoch=N`` and the
  decisions under ``results_dir/epoch=N`` — per-epoch overwrites,
  idempotent under foreachBatch's at-least-once contract; compaction
  folds committed epochs only (the newest live epoch is spared, same
  replay argument as the gram/LM indexes).

Scale shape: per micro-batch, one token aggregate over the batch, one
bucket-domain fold of the standing index (<= n_buckets rows per
epoch; compaction keeps it one generation), one broadcast join of the
log-ratio table, one per-doc agg — O(batch + n_buckets), never a
corpus rescan, no executor-memory state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aiotcvectordb_spark.operators.classifier import hashed_bigram_buckets
from aiotcvectordb_spark.streaming.epochlog import (
    compact_summed_index,
    summed_epoch_paths,
)

_ROUND_DIGITS = 6


def target_bucket_counts(
    docs: DataFrame,
    n_buckets: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(bucket, ct): the calibrated target model — hashed-bigram
    occurrence counts over the curated slice, computed ONCE offline
    and handed to the sink (collected to a plain list; the target
    model is bucket-domain sized by construction)."""
    return (
        hashed_bigram_buckets(
            docs, n_buckets, id_col=id_col, text_col=text_col
        )
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("ct"))
    )


def _read_raw_index(spark, raw_dir: str, *, before_epoch: int | None = None) -> DataFrame:
    """Standing (bucket, cr) counts summed across committed epochs;
    same replay discipline as the LM index. Counts are SUMS, so the
    read follows the watermark protocol (``epochlog.summed_epoch_paths``)
    — live epochs already folded into the active compacted generation
    are skipped, so a compaction that crashed between the generation
    write and the source deletes cannot double the merged bucket counts
    (r8 fix)."""
    paths = summed_epoch_paths(spark, raw_dir, before_epoch=before_epoch)
    if not paths:
        return spark.createDataFrame([], "bucket bigint, cr bigint")
    log = spark.read.option("basePath", raw_dir).parquet(*paths)
    return log.groupBy("bucket").agg(F.sum("cr").alias("cr"))


def stream_dsir_sink(
    raw_dir: str,
    results_dir: str,
    *,
    target_counts: list[tuple[int, int]],
    n_buckets: int,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Returns a ``foreachBatch`` callable scoring each arriving
    document's log importance weight under the fixed target model vs
    the standing+batch raw model, admitting docs with weight >=
    ``threshold``. ``target_counts`` is the collected output of
    :func:`target_bucket_counts` (list of (bucket, ct))."""
    t_total = sum(ct for _, ct in target_counts)

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        df = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ).filter(F.length("text") > 0)
        occ = hashed_bigram_buckets(df, n_buckets).persist()
        raw = None
        try:
            delta = occ.groupBy("bucket").agg(F.sum("cnt").alias("cr"))
            prior = _read_raw_index(spark, raw_dir, before_epoch=epoch_id)
            # persist the folded standing+batch model: the r_total
            # collect below materializes it, so the ratios plan reuses
            # the cached fold instead of re-scanning the epoch log a
            # second time per micro-batch (r8, advisor)
            raw = (
                prior.unionByName(delta)
                .groupBy("bucket")
                .agg(F.sum("cr").alias("cr"))
            ).persist()
            tdf = spark.createDataFrame(
                [(int(b), int(c)) for b, c in target_counts]
                or [(-1, 0)],  # empty-target sentinel (never joins)
                "bucket bigint, ct bigint",
            )
            r_total = raw.agg(F.sum("cr")).collect()[0][0] or 0
            ratios = (
                raw.join(F.broadcast(tdf), "bucket", "left")
                .withColumn("ct", F.coalesce("ct", F.lit(0)))
                .select(
                    "bucket",
                    (
                        F.log2(
                            (F.col("ct") + 1)
                            / F.lit(float(t_total + n_buckets))
                        )
                        - F.log2(
                            (F.col("cr") + 1)
                            / F.lit(float(r_total + n_buckets))
                        )
                    ).alias("lr"),
                )
            )
            scored = (
                occ.join(F.broadcast(ratios), "bucket")
                .groupBy("doc_id")
                .agg(
                    F.round(
                        F.sum(F.col("cnt") * F.col("lr")), _ROUND_DIGITS
                    ).alias("weight")
                )
            )
            # every batch doc gets an explicit decision row: featureless
            # docs (empty text / fewer than two tokens → no bucket
            # occurrences) surface as (weight NULL, admitted false)
            # instead of silently vanishing — consumers can distinguish
            # 'rejected' from 'never scored' (r8, advisor)
            spine = batch_df.select(F.col(id_col).alias("doc_id")).distinct()
            out = (
                spine.join(scored, "doc_id", "left")
                .withColumn(
                    "admitted",
                    F.coalesce(
                        F.col("weight") >= F.lit(threshold), F.lit(False)
                    ),
                )
                .select("doc_id", "weight", "admitted")
            )
            out.write.mode("overwrite").parquet(
                os.path.join(results_dir, f"epoch={epoch_id}")
            )
            delta.write.mode("overwrite").parquet(
                os.path.join(raw_dir, f"epoch={epoch_id}")
            )
        finally:
            occ.unpersist()
            if raw is not None:
                raw.unpersist()

    return apply_batch


def read_dsir_decisions(spark, results_dir: str) -> DataFrame:
    """All admission decisions so far: (doc_id, weight, admitted,
    epoch)."""
    return spark.read.option("basePath", results_dir).parquet(
        os.path.join(results_dir, "epoch=*")
    )


def compact_raw_index(spark, raw_dir: str) -> None:
    """Fold the raw-count epoch log into ONE summed generation —
    identical discipline to ``qualitygate.compact_lm_index``: the
    watermark commit protocol of ``epochlog.compact_summed_index``
    (negative generation ids, ``_FOLDED_UP_TO`` marker as the commit
    point, newest live epoch spared, Hadoop FS deletes), crash-safe for
    non-idempotent summed counts at every point (r8). SINGLE COMPACTOR
    REQUIRED — concurrent compactions GC each other's unmarked
    in-flight generation; run from the one path that owns the index
    (crash-then-retry is fine, overlap is not)."""
    compact_summed_index(spark, raw_dir, _read_raw_index)
