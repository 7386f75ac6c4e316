"""Streaming exact repeated-substring removal at ingest.

Batch ``substring_dedup`` (queries.py) sees the whole corpus at once;
a continuous training-data INGEST pipeline cannot — each arriving
document must be cleaned against everything already accepted. This
operator runs the Lee-et-al-style pass inside a ``foreachBatch`` sink
with causal semantics:

- every micro-batch builds the same word N-grams as the batch stage
  (``pipelines.word_ngrams`` — shared kernel, identical positions);
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

from aiotcvectordb_spark.pipelines import word_ngrams

_DEFAULT_N = 8


def _read_gram_index(spark, index_dir: str, *, before_epoch: int | None = None) -> DataFrame:
    """Distinct grams across committed epochs; empty frame when no
    epoch has committed yet. ``before_epoch`` restricts the read to
    strictly earlier epochs — an at-least-once REPLAY of epoch N must
    not see epoch N's own grams as 'prior corpus' (partition pruning
    on the epoch directory makes the filter free)."""
    try:
        log = spark.read.option("basePath", index_dir).parquet(
            os.path.join(index_dir, "epoch=*")
        )
    except Exception:
        return spark.createDataFrame([], "gram string")
    if before_epoch is not None:
        log = log.filter(F.col("epoch") < before_epoch)
    return log.select("gram").distinct()


def stream_substring_dedup_sink(
    index_dir: str,
    results_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = _DEFAULT_N,
):
    """Returns a ``foreachBatch`` callable that cleans each arriving
    document of spans covered by already-seen (or batch-repeated)
    N-grams. Results land under ``results_dir/epoch=N`` as
    (doc_id, clean_text, kept_tokens) rows; the gram index accumulates
    under ``index_dir/epoch=N``. Both writes are per-epoch overwrites,
    so replays are idempotent."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        df = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ).filter(F.length("text") > 0)
        bg = word_ngrams(df, n).persist()
        try:
            prior = _read_gram_index(spark, index_dir, before_epoch=epoch_id)
            batch_dup = (
                bg.groupBy("gram")
                .agg(F.count("*").alias("c"))
                .filter(F.col("c") >= 2)
                .select("gram")
            )
            hot = prior.union(batch_dup).distinct()
            covered = (
                bg.join(hot, "gram")
                .select(
                    "doc_id",
                    F.explode(
                        F.sequence(F.col("i"), F.col("i") + n - 1)
                    ).alias("pos"),
                )
                .distinct()
            )
            tokens = df.select(
                "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
            )
            kept = tokens.join(covered, ["doc_id", "pos"], "left_anti")
            out = kept.groupBy("doc_id").agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                        lambda s: s["tok"],
                    ),
                    " ",
                ).alias("clean_text"),
                F.count("*").alias("kept_tokens"),
            )
            out.write.mode("overwrite").parquet(
                os.path.join(results_dir, f"epoch={epoch_id}")
            )
            bg.select("gram").distinct().write.mode("overwrite").parquet(
                os.path.join(index_dir, f"epoch={epoch_id}")
            )
        finally:
            bg.unpersist()

    return apply_batch


def read_clean_docs(spark, results_dir: str) -> DataFrame:
    """All cleaning decisions so far: (doc_id, clean_text, kept_tokens,
    epoch)."""
    return spark.read.option("basePath", results_dir).parquet(
        os.path.join(results_dir, "epoch=*")
    )


def compact_gram_index(spark, index_dir: str) -> None:
    """Rewrite the epoch log as one epoch directory of global distinct
    grams (run offline between streaming runs; the read path is
    identical before and after)."""
    tmp = os.path.join(index_dir, "_compact_tmp")
    _read_gram_index(spark, index_dir).write.mode("overwrite").parquet(tmp)
    import shutil

    for name in os.listdir(index_dir):
        if name.startswith("epoch="):
            shutil.rmtree(os.path.join(index_dir, name))
    os.rename(tmp, os.path.join(index_dir, "epoch=0"))
