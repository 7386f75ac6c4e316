"""Streaming gram-novelty ingest: epoch-1 rows equal the batch
incremental query; novelty collapses once grams enter the standing
index; short docs keep explicit NULL rows; replays are idempotent;
compaction follows the summed-index watermark protocol."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiotcvectordb_spark import queries as Q
from aiotcvectordb_spark.streaming.epochlog import epoch_ids
from aiotcvectordb_spark.streaming.novelty import (
    _read_gram_index,
    compact_gram_index,
    read_novelty_results,
    stream_gram_novelty_sink,
)


def _mk_sink(tmp_path, suffix=""):
    index_dir = str(tmp_path / f"index{suffix}")
    results_dir = str(tmp_path / f"results{suffix}")
    sink = stream_gram_novelty_sink(index_dir, results_dir)
    return index_dir, results_dir, sink


def _result_map(df):
    return {
        r.doc_id: (r.n_grams, r.n_novel, r.novelty) for r in df.collect()
    }


def _body(prefix, n=12):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_incremental_batch_query_equals_stream_epoch1(
    spark, sf_dir, tmp_path
):
    """Standing corpus as epoch 0 (doc_id < cutoff), newest slice as
    epoch 1: the sink's epoch-1 rows must be BIT-IDENTICAL to
    q_incremental_gram_novelty — stream and oracled batch twin share
    one semantics (standing membership + batch first-owner)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mx = docs.agg(F.max("doc_id")).first()[0]
    cutoff = int(mx) * 9 // 10
    index_dir, results_dir, sink = _mk_sink(tmp_path)
    sink(docs.filter(F.col("doc_id") < cutoff), 0)
    sink(docs.filter(F.col("doc_id") >= cutoff), 1)
    streamed = _result_map(
        read_novelty_results(spark, results_dir)
        .filter("epoch = 1")
        .drop("epoch")
    )
    batch = _result_map(
        Q.QUERIES["incremental_gram_novelty"](spark, sf_dir)
    )
    assert streamed == batch and len(streamed) > 0


def test_novelty_collapses_once_grams_are_standing(spark, tmp_path):
    """A doc whose grams all arrived in an earlier epoch scores 0.0;
    the same doc on a FRESH index (no standing grams) scores 1.0."""
    rows0 = [(0, _body("w"))]
    rows1 = [(100, _body("w"))]
    index_dir, results_dir, sink = _mk_sink(tmp_path)
    sink(spark.createDataFrame(rows0, "doc_id long, text string"), 0)
    sink(spark.createDataFrame(rows1, "doc_id long, text string"), 1)
    got = _result_map(
        read_novelty_results(spark, results_dir)
        .filter("epoch = 1")
        .drop("epoch")
    )
    assert got[100] == (5, 0, 0.0)
    index_dir2, results_dir2, sink2 = _mk_sink(tmp_path, "2")
    sink2(spark.createDataFrame(rows1, "doc_id long, text string"), 0)
    got2 = _result_map(read_novelty_results(spark, results_dir2).drop("epoch"))
    assert got2[100] == (5, 5, 1.0)


def test_batch_first_owner_rule_within_epoch(spark, tmp_path):
    """Two same-epoch copies: the lower id owns every gram (novelty
    1.0), the higher id scores 0.0 — the corpus-order rule applies
    INSIDE a micro-batch too."""
    rows = [(1, _body("x")), (2, _body("x"))]
    index_dir, results_dir, sink = _mk_sink(tmp_path)
    sink(spark.createDataFrame(rows, "doc_id long, text string"), 0)
    got = _result_map(read_novelty_results(spark, results_dir).drop("epoch"))
    assert got[1] == (5, 5, 1.0) and got[2] == (5, 0, 0.0)


def test_short_doc_gets_explicit_null_row(spark, tmp_path):
    """A sub-8-word doc must surface as (n_grams=0, novelty NULL),
    not vanish from the decision log."""
    rows = [(7, "too short to gram")]
    index_dir, results_dir, sink = _mk_sink(tmp_path)
    sink(spark.createDataFrame(rows, "doc_id long, text string"), 0)
    got = _result_map(read_novelty_results(spark, results_dir).drop("epoch"))
    assert got == {7: (0, 0, None)}


def test_replay_idempotent(spark, tmp_path):
    """Replaying epoch 1 (foreachBatch at-least-once) must reproduce
    identical rows: before_epoch hides the crashed write's own deltas
    and the batch re-derives them from itself."""
    rows0 = [(0, _body("w"))]
    rows1 = [(100, _body("w") + " " + _body("z"))]
    index_dir, results_dir, sink = _mk_sink(tmp_path)
    sink(spark.createDataFrame(rows0, "doc_id long, text string"), 0)
    sink(spark.createDataFrame(rows1, "doc_id long, text string"), 1)
    first = _result_map(
        read_novelty_results(spark, results_dir)
        .filter("epoch = 1")
        .drop("epoch")
    )
    sink(spark.createDataFrame(rows1, "doc_id long, text string"), 1)
    second = _result_map(
        read_novelty_results(spark, results_dir)
        .filter("epoch = 1")
        .drop("epoch")
    )
    assert first == second and len(first) == 1


def test_compaction_read_invariant_and_watermark(spark, tmp_path):
    """Compacting the summed index must not change what later epochs
    read: folded generation + watermark-skipped live epochs == the
    plain epoch union; the newest live epoch is never folded."""
    batches = [
        [(i, _body("a%d_" % i)) for i in range(2)],
        [(10 + i, _body("b%d_" % i)) for i in range(2)],
        [(20, _body("c"))],
    ]
    index_dir, results_dir, sink = _mk_sink(tmp_path)
    twin_dir, twin_results, twin = _mk_sink(tmp_path, "_twin")
    for e, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        sink(df, e)
        twin(df, e)
    compact_gram_index(spark, index_dir)
    ids = epoch_ids(spark, index_dir)
    assert min(ids) < 0 and max(ids) == 2  # generation + spared newest
    folded = {
        r.gram: r.c for r in _read_gram_index(spark, index_dir).collect()
    }
    plain = {
        r.gram: r.c for r in _read_gram_index(spark, twin_dir).collect()
    }
    assert folded == plain and len(folded) > 0
    # the next epoch scores identically against folded vs plain logs
    nxt = spark.createDataFrame([(30, _body("a0_"))], "doc_id long, text string")
    sink(nxt, 3)
    twin(nxt, 3)
    got = _result_map(
        read_novelty_results(spark, results_dir).filter("epoch = 3").drop("epoch")
    )
    want = _result_map(
        read_novelty_results(spark, twin_results).filter("epoch = 3").drop("epoch")
    )
    assert got == want == {30: (5, 0, 0.0)}
