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
from aiotcvectordb_spark.streaming.substrdedup import _epoch_ids

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
    same replay discipline as the gram/LM indexes."""
    epochs = _epoch_ids(spark, raw_dir)
    if before_epoch is not None:
        epochs = [e for e in epochs if e < before_epoch]
    if not epochs:
        return spark.createDataFrame([], "bucket bigint, cr bigint")
    paths = [f"{raw_dir}/epoch={e}" for e in epochs]
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
        try:
            delta = occ.groupBy("bucket").agg(F.sum("cnt").alias("cr"))
            prior = _read_raw_index(spark, raw_dir, before_epoch=epoch_id)
            raw = (
                prior.unionByName(delta)
                .groupBy("bucket")
                .agg(F.sum("cr").alias("cr"))
            )
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
                .withColumn(
                    "admitted", F.col("weight") >= F.lit(threshold)
                )
            )
            scored.write.mode("overwrite").parquet(
                os.path.join(results_dir, f"epoch={epoch_id}")
            )
            delta.write.mode("overwrite").parquet(
                os.path.join(raw_dir, f"epoch={epoch_id}")
            )
        finally:
            occ.unpersist()

    return apply_batch


def read_dsir_decisions(spark, results_dir: str) -> DataFrame:
    """All admission decisions so far: (doc_id, weight, admitted,
    epoch)."""
    return spark.read.option("basePath", results_dir).parquet(
        os.path.join(results_dir, "epoch=*")
    )


def compact_raw_index(spark, raw_dir: str) -> None:
    """Fold the raw-count epoch log into ONE summed generation —
    identical discipline to ``qualitygate.compact_lm_index`` (negative
    generation ids, newest live epoch spared, Hadoop FS deletes)."""
    epochs = _epoch_ids(spark, raw_dir)
    live = [e for e in epochs if e >= 0]
    merge = [e for e in epochs if not live or e != max(live)]
    if len(merge) <= 1:
        return
    target = min(epochs) - 1 if epochs[0] < 0 else -1
    _read_raw_index(
        spark, raw_dir, before_epoch=max(live) if live else None
    ).write.mode("overwrite").parquet(f"{raw_dir}/epoch={target}")
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(raw_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    for e in merge:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{raw_dir}/epoch={e}"), True)
