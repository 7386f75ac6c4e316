"""Streaming exact repeated-substring removal at ingest.

Batch ``substring_dedup`` (queries.py) sees the whole corpus at once;
a continuous training-data INGEST pipeline cannot — each arriving
document must be cleaned against everything already accepted. This
operator runs the Lee-et-al-style pass inside a ``foreachBatch`` sink
with causal semantics:

- every micro-batch builds the same N-grams as the batch stage
  (``pipelines.word_ngrams`` / ``pipelines.char_ngrams`` — shared
  kernels, identical positions); ``tokenizer="auto"`` (r7)
  lang-routes CJK-heavy documents to the char-gram lane exactly like
  the batch ``substring_dedup_cjk`` query;
- a batch token position is covered (cut) when its N-gram exists in
  the standing GRAM INDEX built by earlier epochs, or repeats within
  its own micro-batch — exactly the ``incremental_substring_dedup``
  query's semantics, so stream == batch is provable, not hoped
  (pinned in tests/test_stream_substrdedup.py);
- the gram index is an append-only hive-partitioned parquet log
  (``epoch=N`` directories of the batch's distinct grams). Each epoch
  overwrites its own directory — idempotent under Structured
  Streaming's at-least-once ``foreachBatch`` contract, the same
  epoch-idempotence argument as ``sink.stream_upsert_sink`` and
  ``neardup.stream_neardup_sink``.

Scale shape: per micro-batch cost is one gram pass over the batch,
one equi-join against the index on the gram, a bounded xN coverage
explode, and one anti-join — O(batch + index collisions), never a
corpus rescan. No executor-memory state: the index lives in storage,
survives restarts, and compacts offline (``compact_gram_index``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aiotcvectordb_spark.pipelines import (
    CJK_ROUTE_THRESHOLD,
    char_ngrams,
    cjk_ratio_col,
    lane_cut,
    word_ngrams,
)
from aiotcvectordb_spark.streaming.epochlog import delete_epoch, epoch_ids

_DEFAULT_N = 8
_DEFAULT_CHAR_N = 12  # char-lane gram width, = queries._SUBSTR_CJK_CHAR_N


# shared with the other standing indexes (r8): the listing/marker
# primitives live in streaming.epochlog; this alias keeps the
# historical import path used across the ingest twins and tests
_epoch_ids = epoch_ids


def _read_gram_index(spark, index_dir: str, *, before_epoch: int | None = None) -> DataFrame:
    """Distinct grams across committed epochs; empty frame ONLY when
    no epoch directory exists (checked explicitly — a transient read
    failure re-raises so the micro-batch retries, instead of silently
    cleaning against an empty index and breaking replay==original).
    ``before_epoch`` restricts the read to strictly earlier epochs —
    an at-least-once REPLAY of epoch N must not see epoch N's own
    grams as 'prior corpus' (compacted generations use descending
    NEGATIVE ids, so they are always 'earlier' than any live epoch)."""
    epochs = _epoch_ids(spark, index_dir)
    if before_epoch is not None:
        epochs = [e for e in epochs if e < before_epoch]
    if not epochs:
        return spark.createDataFrame([], "lane string, gram string")
    paths = [f"{index_dir}/epoch={e}" for e in epochs]
    log = spark.read.option("basePath", index_dir).parquet(*paths)
    return log.select("lane", "gram").distinct()


# the per-lane cleaning kernel lives in pipelines.lane_cut (r7) so the
# batch queries, the incremental queries, and this sink share one
# implementation — batch == stream by construction


def stream_substring_dedup_sink(
    index_dir: str,
    results_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = _DEFAULT_N,
    char_n: int = _DEFAULT_CHAR_N,
    tokenizer: str = "word",
):
    """Returns a ``foreachBatch`` callable that cleans each arriving
    document of spans covered by already-seen (or batch-repeated)
    N-grams. Results land under ``results_dir/epoch=N`` as
    (doc_id, clean_text, kept_tokens, lane) rows; the gram index
    accumulates under ``index_dir/epoch=N`` as (lane, gram). Both
    writes are per-epoch overwrites, so replays are idempotent.

    ``tokenizer="auto"`` (r7) lang-routes each document exactly like
    the batch ``substring_dedup_cjk`` query: CJK-heavy documents
    (``pipelines.cjk_ratio_col`` >= threshold) run a CHARACTER-n-gram
    lane, the rest the word lane — closing the gap where a
    whitespace-free document was ONE token and the word pass silently
    no-oped. Lanes are keyed separately in the index so a word gram
    never collides with a char gram."""
    if tokenizer not in ("word", "auto"):
        raise ValueError(f"unknown tokenizer {tokenizer!r}")

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        df = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ).filter(F.length("text") > 0)
        if tokenizer == "word":
            lanes = [("word", df, n, " ")]
        else:
            routed = df.withColumn("__r", cjk_ratio_col("text"))
            is_cjk = F.col("__r") >= CJK_ROUTE_THRESHOLD
            lanes = [
                ("word", routed.filter(~is_cjk).select("doc_id", "text"), n, " "),
                ("char", routed.filter(is_cjk).select("doc_id", "text"),
                 char_n, ""),
            ]
        prior = _read_gram_index(spark, index_dir, before_epoch=epoch_id)
        outs, indexed = [], []
        cached = []
        try:
            for lane_name, lane_df, lane_n, joiner in lanes:
                grams = (
                    word_ngrams(lane_df, lane_n)
                    if joiner == " "
                    else char_ngrams(lane_df, lane_n)
                ).persist()
                cached.append(grams)
                prior_lane = prior.filter(
                    F.col("lane") == lane_name
                ).select("gram")
                # r11: xxhash64-pair keys like the batch/incremental
                # queries — lane_cut hashes the prior index internally,
                # so the stored verbatim-gram epoch log format (and its
                # compaction) is hash-scheme-agnostic
                out, lane_grams = lane_cut(
                    lane_df, grams, prior_lane, lane_n, joiner,
                    gram_keys="xxhash64",
                )
                outs.append(out.withColumn("lane", F.lit(lane_name)))
                indexed.append(
                    lane_grams.select(F.lit(lane_name).alias("lane"), "gram")
                )
            result = outs[0]
            for o in outs[1:]:
                result = result.unionByName(o)
            result.write.mode("overwrite").parquet(
                os.path.join(results_dir, f"epoch={epoch_id}")
            )
            index = indexed[0]
            for g in indexed[1:]:
                index = index.unionByName(g)
            index.write.mode("overwrite").parquet(
                os.path.join(index_dir, f"epoch={epoch_id}")
            )
        finally:
            for c in cached:
                c.unpersist()

    return apply_batch


def read_clean_docs(spark, results_dir: str) -> DataFrame:
    """All cleaning decisions so far: (doc_id, clean_text, kept_tokens,
    epoch)."""
    return spark.read.option("basePath", results_dir).parquet(
        os.path.join(results_dir, "epoch=*")
    )


def compact_gram_index(spark, index_dir: str) -> None:
    """Rewrite the epoch log as ONE epoch directory of global distinct
    grams (run offline between streaming runs; the read path is
    identical before and after).

    Object-store-safe by construction (r7): the compacted generation
    is WRITTEN through Spark to a fresh ``epoch=<negative id>``
    directory (ids descend -1, -2, ... across compactions — never
    colliding with Structured Streaming's monotonically increasing
    batch ids, and always passing any replay's ``before_epoch``
    filter), then the superseded epoch directories are deleted through
    the Hadoop FileSystem API. No rename anywhere, and every crash
    window is safe: old ∪ compacted is the same distinct-gram set, so
    a half-finished compaction changes nothing the readers see.

    Replay safety (r7): the NEWEST live epoch is never merged.
    foreachBatch is at-least-once — after a crash the last uncommitted
    batch id replays, and its ``before_epoch`` filter would otherwise
    find the batch's OWN grams inside the compacted generation
    (written by the crashed first attempt), making the replay clean
    against itself and diverge from a clean run. Every strictly older
    epoch is checkpoint-committed and can never replay, so compacting
    those is always safe — no coordination with the stream needed."""
    epochs = _epoch_ids(spark, index_dir)
    live = [e for e in epochs if e >= 0]
    merge = [e for e in epochs if not live or e != max(live)]
    if len(merge) <= 1:
        return  # nothing to merge
    target = min(epochs) - 1 if epochs[0] < 0 else -1
    _read_gram_index(
        spark, index_dir, before_epoch=max(live) if live else None
    ).write.mode("overwrite").parquet(f"{index_dir}/epoch={target}")
    for e in merge:
        delete_epoch(spark, index_dir, e)
