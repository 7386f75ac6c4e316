"""Streaming benchmark decontamination at ingest — the 7th twin.

Batch ``decontaminate_fraction`` (queries.py) shingles the whole corpus
per run to grade train docs against the eval suite (the PaLM >= 70%
8-gram overlap rule); a continuous crawl cannot rescan the corpus per
micro-batch, so this sink maintains the eval-suite shingle set as a
stored MEMBERSHIP epoch index and grades each arriving batch's train
docs against it. Unlike the six summed-count twins this index holds
pure membership (DISTINCT shingles), so union is idempotent and the
simple write-then-delete compaction of ``substrdedup`` suffices — no
watermark protocol needed.

Semantics per micro-batch (epoch N):
- arriving docs route by the benchmark rule (default doc_id % 5 == 0,
  matching the batch query's deterministic held-out slice): BENCH docs
  extend the eval index, TRAIN docs get graded;
- a train doc is graded against the standing index (epochs < N,
  replay-safe via ``before_epoch``) PLUS the batch's own bench
  shingles — the eval suite is global, so benchmark docs arriving in
  the same crawl slice count, exactly
  ``q_incremental_decontaminate_fraction``'s full-corpus bench rule;
- every train doc gets an EXPLICIT decision row: a sub-8-token doc
  surfaces as (n_shingles=0, overlap_fraction NULL, contaminated
  false) instead of vanishing (the r8 qualitygate decision-log rule);
- bench shingles land under ``index_dir/epoch=N`` and decision rows
  under ``results_dir/epoch=N``; both are per-epoch overwrites,
  idempotent under foreachBatch's at-least-once contract.

Scale shape: per micro-batch, one shingle pass over the batch, one
distinct on the batch's bench side, one shingle-keyed equi-join
against the standing index, two per-doc distinct aggregates —
O(batch + eval-suite collisions), never a corpus rescan, no
executor-memory state. The standing index is the eval SUITE's
shingles (bounded by the benchmark, not the corpus), so the join's
build side stays small even at 100 TB ingest.

Equality of epoch-1 results with
``q_incremental_decontaminate_fraction`` (standing corpus as epoch 0,
newest slice as epoch 1) is pinned in tests/test_stream_decontam.py.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aiotcvectordb_spark.pipelines import (
    DECONTAM_FRACTION_CUT,
    DECONTAM_SHINGLE_N,
)
from aiotcvectordb_spark.streaming.epochlog import delete_epoch, epoch_ids

_ROUND_DIGITS = 6
# shingle width and contamination cut are IMPORTED from pipelines (r10
# review), not re-declared: the pinned epoch-1 == batch-query equality
# must survive any future knob tuning by construction
_DEFAULT_N = DECONTAM_SHINGLE_N
_DEFAULT_CUT = DECONTAM_FRACTION_CUT


def _default_bench_pred() -> Column:
    """The batch query's deterministic held-out slice: doc_id % 5 == 0."""
    return F.col("doc_id") % 5 == 0


def _read_shingle_index(
    spark, index_dir: str, *, before_epoch: int | None = None,
    dedup: bool = True
) -> DataFrame:
    """Distinct eval-suite shingles across committed epochs
    (membership-only — union is idempotent). Empty frame ONLY when no
    epoch directory exists; ``before_epoch`` hides the replaying
    epoch's own deltas so a replay grades against exactly the state
    the original attempt saw. ``dedup=False`` returns the raw log for
    callers that fold their own distinct on top (the sink unions the
    batch's bench shingles first and distincts ONCE — stacking a
    second full-shuffle distinct on the largest frame in the hot
    per-batch path would be pure waste)."""
    epochs = epoch_ids(spark, index_dir)
    if before_epoch is not None:
        epochs = [e for e in epochs if e < before_epoch]
    if not epochs:
        return spark.createDataFrame([], "shingle string")
    paths = [f"{index_dir}/epoch={e}" for e in epochs]
    log = spark.read.option("basePath", index_dir).parquet(*paths)
    sh = log.select("shingle")
    return sh.distinct() if dedup else sh


def stream_decontaminate_sink(
    index_dir: str,
    results_dir: str,
    *,
    n: int = _DEFAULT_N,
    cut: float = _DEFAULT_CUT,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_pred: Column | None = None,
):
    """Returns a ``foreachBatch`` callable that grades each arriving
    train document's eval-suite shingle overlap. Decision rows land
    under ``results_dir/epoch=N`` as (doc_id, n_shingles, n_shared,
    overlap_fraction, contaminated); the batch's bench shingles
    accumulate under ``index_dir/epoch=N``. ``bench_pred`` may
    reference ANY column of the incoming batch frame (e.g.
    ``F.col("source") == "benchmark"``) — routing happens on the full
    frame before the shingle projection narrows it."""
    from aiotcvectordb_spark.pipelines import token_shingles

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # route on the FULL batch frame (r10 review): bench_pred may
        # reference any batch column (e.g. source == 'bench'), so it
        # must be applied BEFORE the shingle projection narrows the
        # frame to (doc_id, shingle)
        pred = _default_bench_pred() if bench_pred is None else bench_pred
        # NULL-safe routing (r10 advisor): a NULL predicate (null doc_id
        # under the default, or a custom pred over a nullable column)
        # would be dropped by BOTH filters below, silently violating
        # the "every train doc gets an explicit decision row" contract.
        # NULL routes to the train side so the doc still gets a row.
        pred = F.coalesce(pred, F.lit(False))
        routed = batch_df.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("text"),
            pred.alias("__bench"),
        )
        bench_docs = routed.filter("__bench").select("doc_id", "text")
        train_docs = routed.filter("NOT __bench").select("doc_id", "text")
        bench_sh = token_shingles(bench_docs, n).select("shingle").distinct()
        train_sh = token_shingles(train_docs, n).persist()
        try:
            standing = _read_shingle_index(
                spark, index_dir, before_epoch=epoch_id, dedup=False
            )
            # the eval suite is global: batch bench docs count for the
            # batch's own train docs too; ONE distinct over the union
            ref = standing.unionByName(bench_sh).distinct()
            totals = train_sh.groupBy("doc_id").agg(
                F.countDistinct("shingle").alias("n_shingles")
            )
            shared = (
                train_sh.join(ref, "shingle")
                .groupBy("doc_id")
                .agg(F.countDistinct("shingle").alias("n_shared"))
            )
            spine = train_docs.select("doc_id")

            # null-safe grading joins (<=>): a NULL-id train doc (routed
            # here by the coalesced predicate) must still pick up its
            # aggregated counts — groupBy keeps NULL as a group but a
            # plain equi-join key would drop it, mis-grading the doc as
            # (0, 0). <=> is still an equi-key, so this stays a hash
            # join, not a cartesian.
            def _nullsafe_left(left: DataFrame, right: DataFrame) -> DataFrame:
                r = right.withColumnRenamed("doc_id", "__rid")
                return left.join(
                    r, left["doc_id"].eqNullSafe(r["__rid"]), "left"
                ).drop("__rid")

            base = (
                _nullsafe_left(_nullsafe_left(spine, totals), shared)
                .select(
                    "doc_id",
                    F.coalesce("n_shingles", F.lit(0))
                    .cast("long")
                    .alias("n_shingles"),
                    F.coalesce("n_shared", F.lit(0))
                    .cast("long")
                    .alias("n_shared"),
                )
            )
            frac = F.when(
                F.col("n_shingles") > 0,
                F.round(
                    F.col("n_shared") / F.col("n_shingles"), _ROUND_DIGITS
                ),
            )
            out = base.select(
                "doc_id",
                "n_shingles",
                "n_shared",
                frac.alias("overlap_fraction"),
                F.coalesce(frac >= F.lit(cut), F.lit(False)).alias(
                    "contaminated"
                ),
            )
            out.write.mode("overwrite").parquet(
                os.path.join(results_dir, f"epoch={epoch_id}")
            )
            bench_sh.write.mode("overwrite").parquet(
                os.path.join(index_dir, f"epoch={epoch_id}")
            )
        finally:
            train_sh.unpersist()

    return apply_batch


def read_decontam_results(spark, results_dir: str) -> DataFrame:
    """All decontamination decisions so far: (doc_id, n_shingles,
    n_shared, overlap_fraction, contaminated, epoch)."""
    return spark.read.option("basePath", results_dir).parquet(
        os.path.join(results_dir, "epoch=*")
    )


def compact_shingle_index(spark, index_dir: str) -> None:
    """Rewrite the eval-suite shingle log as ONE epoch directory of
    global distinct shingles — the IDEMPOTENT-index compaction
    (substrdedup.compact_gram_index's protocol verbatim): write the
    distinct union to a fresh negative ``epoch=<id>`` generation
    through Spark, then delete the superseded sources via the Hadoop
    FileSystem API. Membership union is idempotent, so every crash
    window (old ∪ compacted readable together) reads to the same set;
    the NEWEST live epoch is never merged so an at-least-once replay's
    ``before_epoch`` filter cannot find its own shingles inside a
    generation."""
    epochs = epoch_ids(spark, index_dir)
    live = [e for e in epochs if e >= 0]
    merge = [e for e in epochs if not live or e != max(live)]
    if len(merge) <= 1:
        return  # nothing to merge
    target = min(epochs) - 1 if epochs[0] < 0 else -1
    _read_shingle_index(
        spark, index_dir, before_epoch=max(live) if live else None
    ).write.mode("overwrite").parquet(f"{index_dir}/epoch={target}")
    for e in merge:
        delete_epoch(spark, index_dir, e)
