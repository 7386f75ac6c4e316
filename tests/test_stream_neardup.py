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


def test_compaction_layout_negative_gen_spares_newest_and_replay_view(
    spark, tmp_path
):
    """r8 hardening: the compacted generation is a fresh NEGATIVE epoch
    id written through the Hadoop FS path (no ``epoch=0`` collision a
    fresh stream's batch 0 would overwrite — the r7-flagged index
    destroyer), the newest live epoch is never merged, and a replay's
    ``before_epoch`` view never contains its own epoch's minima."""
    from aiotcvectordb_spark.streaming.epochlog import epoch_ids
    from aiotcvectordb_spark.streaming.neardup import _read_bucket_index

    texts = {
        1: "the quick brown fox jumps over the lazy dog today",
        2: "completely different content about spark and parquet files",
        3: "yet another unrelated document describing engines and scale",
        4: "a fourth unique document about streaming state and epochs",
    }
    index_dir = str(tmp_path / "index")
    results_dir = str(tmp_path / "results")
    sink = stream_neardup_sink(index_dir, results_dir)

    def batch(*ids):
        return spark.createDataFrame(
            [(i, texts[i]) for i in ids], "doc_id long, clean_text string"
        )

    sink(batch(1), 0)
    sink(batch(2), 1)
    sink(batch(3), 2)
    all_minima = {
        (r.band, r.h): r.min_id
        for r in _read_bucket_index(spark, index_dir).collect()
    }
    pre_2 = {
        (r.band, r.h): r.min_id
        for r in _read_bucket_index(spark, index_dir, before_epoch=2).collect()
    }
    compact_bucket_index(spark, index_dir)
    # epochs 0 and 1 merged into generation -1; live epoch 2 spared
    assert epoch_ids(spark, index_dir) == [-1, 2]
    assert {
        (r.band, r.h): r.min_id
        for r in _read_bucket_index(spark, index_dir).collect()
    } == all_minima
    # an at-least-once replay of epoch 2 sees exactly the pre-epoch-2
    # index — not its own minima via the compacted generation
    assert {
        (r.band, r.h): r.min_id
        for r in _read_bucket_index(spark, index_dir, before_epoch=2).collect()
    } == pre_2
    # a second compaction descends to -2 (never rewrites the directory
    # it is reading) and stays read-invariant
    sink(batch(4), 3)
    full = {
        (r.band, r.h): r.min_id
        for r in _read_bucket_index(spark, index_dir).collect()
    }
    compact_bucket_index(spark, index_dir)
    assert epoch_ids(spark, index_dir) == [-2, 3]
    assert {
        (r.band, r.h): r.min_id
        for r in _read_bucket_index(spark, index_dir).collect()
    } == full


def test_read_bucket_index_empty_only_when_no_epochs(spark, tmp_path):
    """r8: empty-index reads are explicit (Hadoop FS listing), not a
    bare except — a missing directory yields an empty frame, and the
    frame has the index schema."""
    from aiotcvectordb_spark.streaming.neardup import _read_bucket_index

    df = _read_bucket_index(spark, str(tmp_path / "nonexistent"))
    assert df.count() == 0
    assert df.columns == ["band", "h", "min_id"]
