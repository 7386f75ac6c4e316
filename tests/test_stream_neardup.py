"""Streaming near-dup ingest: id-ordered replay == batch bucket-min
domination; index survives restarts; compaction is read-invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiotcvectordb_spark import pipelines as P
from aiotcvectordb_spark.streaming.neardup import (
    compact_bucket_index,
    read_neardup_flags,
    stream_neardup_sink,
)


def _cleaned_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return P.clean_stage(docs).select("doc_id", "clean_text")


def _run_stream(spark, src, tmp_path, suffix=""):
    index_dir = str(tmp_path / f"index{suffix}")
    results_dir = str(tmp_path / f"results{suffix}")
    stream = (
        spark.readStream.schema("doc_id long, clean_text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(
            stream_neardup_sink(index_dir, results_dir)
        )
        .option("checkpointLocation", str(tmp_path / f"ckpt{suffix}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return index_dir, results_dir


def test_stream_matches_batch_when_id_ordered(spark, sf_dir, tmp_path):
    """Feeding the corpus in doc_id order, first-arrival-wins equals the
    batch stage's bucket-min domination (uncapped) exactly."""
    docs = _cleaned_docs(spark, sf_dir)
    batch = {
        r.doc_id: r.near_dup
        for r in P.near_dedup_stage(docs, max_bucket_size=None)
        .select("doc_id", "near_dup")
        .collect()
    }

    mid = sorted(batch)[len(batch) // 2]
    src = tmp_path / "src"
    docs.filter(F.col("doc_id") <= mid).coalesce(1).write.parquet(
        str(src / "f0")
    )
    docs.filter(F.col("doc_id") > mid).coalesce(1).write.parquet(
        str(src / "f1")
    )
    _, results_dir = _run_stream(spark, src, tmp_path)

    flags = read_neardup_flags(spark, results_dir)
    streamed = {r.doc_id: r.near_dup for r in flags.collect()}
    # every doc judged exactly once, same verdicts as batch (docs with
    # < shingle tokens never enter the band index in either path; the
    # batch stage reports them near_dup=False and so does the stream)
    assert streamed == batch
    assert flags.count() == flags.select("doc_id").distinct().count()


def test_cross_batch_duplicate_flagged(spark, tmp_path):
    """A near-duplicate arriving in a LATER micro-batch is flagged
    against the index built by an earlier one."""
    a = [(1, "the quick brown fox jumps over the lazy dog today")]
    b = [(2, "the quick brown fox jumps over the lazy dog today"),
         (3, "completely different content about spark and parquet files")]
    src = tmp_path / "src"
    spark.createDataFrame(a, "doc_id long, clean_text string").coalesce(
        1
    ).write.parquet(str(src / "f0"))
    spark.createDataFrame(b, "doc_id long, clean_text string").coalesce(
        1
    ).write.parquet(str(src / "f1"))
    _, results_dir = _run_stream(spark, src, tmp_path)
    got = {
        r.doc_id: r.near_dup
        for r in read_neardup_flags(spark, results_dir).collect()
    }
    assert got == {1: False, 2: True, 3: False}


def test_compaction_preserves_index(spark, sf_dir, tmp_path):
    """Compacting the epoch log must not change subsequent verdicts:
    a duplicate of an already-indexed doc is still caught after
    compaction."""
    from aiotcvectordb_spark.streaming.neardup import _read_bucket_index

    docs = _cleaned_docs(spark, sf_dir).limit(50)
    src = tmp_path / "src"
    docs.coalesce(1).write.parquet(str(src / "f0"))
    index_dir, _ = _run_stream(spark, src, tmp_path)

    before = {
        (r.band, r.h): r.min_id
        for r in _read_bucket_index(spark, index_dir).collect()
    }
    compact_bucket_index(spark, index_dir)
    after = {
        (r.band, r.h): r.min_id
        for r in _read_bucket_index(spark, index_dir).collect()
    }
    assert after == before and before
