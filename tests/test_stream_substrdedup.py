"""Streaming exact-substring dedup ingest: epoch-1 output equals the
batch incremental_substring_dedup query bit-for-bit; cross-batch spans
are cut against the earlier-epoch index; replays are idempotent; index
compaction is read-invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiotcvectordb_spark import queries as Q
from aiotcvectordb_spark.streaming.substrdedup import (
    compact_gram_index,
    read_clean_docs,
    stream_substring_dedup_sink,
)


def _run_stream(spark, src, tmp_path, suffix=""):
    index_dir = str(tmp_path / f"index{suffix}")
    results_dir = str(tmp_path / f"results{suffix}")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(
            stream_substring_dedup_sink(index_dir, results_dir)
        )
        .option("checkpointLocation", str(tmp_path / f"ckpt{suffix}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return index_dir, results_dir


def test_stream_epoch_matches_incremental_batch_query(spark, sf_dir, tmp_path):
    """Corpus as epoch 0, the doc_id%10==0 batch as epoch 1: epoch-1
    results must equal q_incremental_substring_dedup exactly (same
    kernel, same split — equality by construction, proven here)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.length("text") > 0
    )
    src = tmp_path / "src"
    docs.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id", "text"
    ).coalesce(1).write.parquet(str(src / "f0"))
    docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", "text"
    ).coalesce(1).write.parquet(str(src / "f1"))
    _, results_dir = _run_stream(spark, src, tmp_path)

    flags = read_clean_docs(spark, results_dir).filter(F.col("epoch") == 1)
    streamed = {
        r.doc_id: (r.clean_text, r.kept_tokens) for r in flags.collect()
    }
    batch = {
        r.doc_id: (r.clean_text, r.kept_tokens)
        for r in Q.QUERIES["incremental_substring_dedup"](
            spark, sf_dir
        ).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_cross_batch_span_cut_and_unique_kept(spark, tmp_path):
    a = [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")]
    # doc 2 repeats doc 1's first 8 words then adds unique tail words
    b = [
        (
            2,
            "alpha beta gamma delta epsilon zeta eta theta "
            "unique tail words here",
        ),
        (3, "wholly distinct content with eight different words inside"),
    ]
    src = tmp_path / "src"
    spark.createDataFrame(a, "doc_id long, text string").coalesce(1).write.parquet(
        str(src / "f0")
    )
    spark.createDataFrame(b, "doc_id long, text string").coalesce(1).write.parquet(
        str(src / "f1")
    )
    _, results_dir = _run_stream(spark, src, tmp_path)
    rows = {
        r.doc_id: r.clean_text for r in read_clean_docs(spark, results_dir).collect()
    }
    # epoch 0: doc 1 has no prior index and no in-batch repeats -> intact
    assert rows[1].startswith("alpha beta gamma")
    # epoch 1: doc 2's copied 8-gram span is cut, unique tail survives
    assert "alpha" not in rows[2] and rows[2].endswith("unique tail words here")
    assert rows[3] == "wholly distinct content with eight different words inside"


def test_replay_is_idempotent_and_compaction_read_invariant(
    spark, tmp_path
):
    docs = [(i, f"prefix{i} " + "shared body of exactly eight words here now", )
            for i in range(1, 5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    index_dir = str(tmp_path / "index")
    results_dir = str(tmp_path / "results")
    sink = stream_substring_dedup_sink(index_dir, results_dir)
    sink(df.filter("doc_id <= 2"), 0)
    sink(df.filter("doc_id > 2"), 1)
    before = {
        (r.doc_id, r.clean_text, r.kept_tokens)
        for r in read_clean_docs(spark, results_dir).collect()
    }
    # at-least-once replay of epoch 1 overwrites identically
    sink(df.filter("doc_id > 2"), 1)
    after = {
        (r.doc_id, r.clean_text, r.kept_tokens)
        for r in read_clean_docs(spark, results_dir).collect()
    }
    assert after == before
    # compaction changes the layout, not the reads
    from aiotcvectordb_spark.streaming.substrdedup import _read_gram_index

    grams_before = {r.gram for r in _read_gram_index(spark, index_dir).collect()}
    compact_gram_index(spark, index_dir)
    grams_after = {r.gram for r in _read_gram_index(spark, index_dir).collect()}
    assert grams_after == grams_before
    # object-store-safe layout (r7): the compacted generation is a
    # fresh NEGATIVE epoch id (no rename, no collision with future
    # stream batch ids) and any replay's before_epoch still sees it
    from aiotcvectordb_spark.streaming.substrdedup import _epoch_ids

    assert _epoch_ids(spark, index_dir) == [-1]
    replay_view = {
        r.gram
        for r in _read_gram_index(spark, index_dir, before_epoch=2).collect()
    }
    assert replay_view == grams_before
    # a second compaction descends to -2 (never overwrites the
    # directory it is reading) and preserves the distinct-gram set
    sink(df.filter("doc_id <= 2"), 2)
    compact_gram_index(spark, index_dir)
    assert _epoch_ids(spark, index_dir) == [-2]
    assert {
        r.gram for r in _read_gram_index(spark, index_dir).collect()
    } == grams_before
