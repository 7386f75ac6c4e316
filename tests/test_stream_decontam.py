"""Streaming decontamination ingest (7th twin): epoch-1 rows equal the
batch incremental query; the eval-suite membership index accumulates
across epochs; short train docs keep explicit NULL rows; replays are
idempotent; compaction preserves the membership set."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiotcvectordb_spark import queries as Q
from aiotcvectordb_spark.streaming.decontam import (
    _read_shingle_index,
    compact_shingle_index,
    read_decontam_results,
    stream_decontaminate_sink,
)
from aiotcvectordb_spark.streaming.epochlog import epoch_ids


def _mk_sink(tmp_path, suffix=""):
    index_dir = str(tmp_path / f"index{suffix}")
    results_dir = str(tmp_path / f"results{suffix}")
    sink = stream_decontaminate_sink(index_dir, results_dir)
    return index_dir, results_dir, sink


def _result_map(df):
    return {
        r.doc_id: (r.n_shingles, r.n_shared, r.overlap_fraction, r.contaminated)
        for r in df.collect()
    }


def _body(prefix, n=12):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_incremental_batch_query_equals_stream_epoch1(spark, sf_dir, tmp_path):
    """Standing corpus as epoch 0 (doc_id < cutoff), newest slice as
    epoch 1: the sink's epoch-1 rows must be BIT-IDENTICAL to
    q_incremental_decontaminate_fraction — stream and oracled batch
    twin share one semantics (global eval suite + per-doc overlap)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mx = docs.agg(F.max("doc_id")).first()[0]
    cutoff = int(mx) * 9 // 10
    index_dir, results_dir, sink = _mk_sink(tmp_path)
    sink(docs.filter(F.col("doc_id") < cutoff), 0)
    sink(docs.filter(F.col("doc_id") >= cutoff), 1)
    streamed = _result_map(
        read_decontam_results(spark, results_dir)
        .filter("epoch = 1")
        .drop("epoch")
    )
    batch = _result_map(
        Q.QUERIES["incremental_decontaminate_fraction"](spark, sf_dir)
    )
    assert streamed == batch and len(streamed) > 0


def test_incremental_equals_full_batch_restricted(spark, sf_dir):
    """The per-doc rule has no train-train interaction, so the
    incremental query restricted to its shingled support must equal
    decontaminate_fraction restricted to the batch slice."""
    full = {
        r.doc_id: (r.n_shingles, r.n_shared, r.overlap_fraction, r.contaminated)
        for r in Q.QUERIES["decontaminate_fraction"](spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mx = docs.agg(F.max("doc_id")).first()[0]
    cutoff = int(mx) * 9 // 10
    inc = {
        r.doc_id: (r.n_shingles, r.n_shared, r.overlap_fraction, r.contaminated)
        for r in Q.QUERIES["incremental_decontaminate_fraction"](
            spark, sf_dir
        ).collect()
        if r.n_shingles > 0
    }
    expected = {k: v for k, v in full.items() if k >= cutoff}
    assert inc == expected and len(inc) > 0


def test_copied_bench_doc_is_contaminated(spark, tmp_path):
    """A train doc that copies an eval doc's text overlaps 100% and is
    flagged; an unrelated train doc scores 0.0 and is not."""
    bench_text = _body("e")
    rows0 = [(0, bench_text)]  # doc 0: bench (0 % 5 == 0)
    rows1 = [(101, bench_text), (102, _body("z"))]  # train
    index_dir, results_dir, sink = _mk_sink(tmp_path)
    sink(spark.createDataFrame(rows0, "doc_id long, text string"), 0)
    sink(spark.createDataFrame(rows1, "doc_id long, text string"), 1)
    got = _result_map(
        read_decontam_results(spark, results_dir).filter("epoch = 1").drop("epoch")
    )
    assert got[101] == (5, 5, 1.0, True)
    assert got[102] == (5, 0, 0.0, False)


def test_same_epoch_bench_doc_counts(spark, tmp_path):
    """The eval suite is global: a bench doc arriving in the SAME
    micro-batch as a copying train doc still contaminates it."""
    text = _body("s")
    rows = [(5, text), (6, text)]  # 5 is bench, 6 is train
    index_dir, results_dir, sink = _mk_sink(tmp_path)
    sink(spark.createDataFrame(rows, "doc_id long, text string"), 0)
    got = _result_map(read_decontam_results(spark, results_dir).drop("epoch"))
    assert got == {6: (5, 5, 1.0, True)}


def test_short_train_doc_gets_explicit_null_row(spark, tmp_path):
    """A sub-8-token train doc must surface as (0, 0, NULL, False),
    not vanish from the decision log."""
    rows = [(7, "too short to shingle")]
    index_dir, results_dir, sink = _mk_sink(tmp_path)
    sink(spark.createDataFrame(rows, "doc_id long, text string"), 0)
    got = _result_map(read_decontam_results(spark, results_dir).drop("epoch"))
    assert got == {7: (0, 0, None, False)}


def test_null_predicate_doc_routes_to_train_side(spark, tmp_path):
    """A row whose bench predicate evaluates to NULL (null doc_id under
    the default doc_id % 5 == 0) must route to the TRAIN side and get
    an explicit decision row — not be silently dropped by both filters
    (r10 advisor)."""
    text = _body("n")
    rows = [(5, text), (None, text)]  # 5 is bench; NULL id → NULL pred
    index_dir, results_dir, sink = _mk_sink(tmp_path)
    sink(spark.createDataFrame(rows, "doc_id long, text string"), 0)
    got = _result_map(read_decontam_results(spark, results_dir).drop("epoch"))
    # the NULL-id doc is graded as a train doc against the bench doc
    assert got == {None: (5, 5, 1.0, True)}


def test_null_custom_predicate_routes_to_train_side(spark, tmp_path):
    """Same NULL-safety for a custom bench_pred over a nullable column."""
    rows = [(1, _body("c"), "benchmark"), (2, _body("x"), None)]
    index_dir = str(tmp_path / "idx_custom")
    results_dir = str(tmp_path / "res_custom")
    sink = stream_decontaminate_sink(
        index_dir, results_dir, bench_pred=F.col("source") == "benchmark"
    )
    sink(
        spark.createDataFrame(rows, "doc_id long, text string, source string"),
        0,
    )
    got = _result_map(read_decontam_results(spark, results_dir).drop("epoch"))
    assert 2 in got and got[2][3] is False  # explicit row, not dropped


def test_replay_is_idempotent(spark, tmp_path):
    """Re-running an epoch (foreachBatch at-least-once) must reproduce
    the identical decision rows and index state: before_epoch hides the
    replay's own first-attempt deltas."""
    bench = [(0, _body("e"))]
    train = [(11, _body("e")), (12, _body("q"))]
    index_dir, results_dir, sink = _mk_sink(tmp_path)
    sink(spark.createDataFrame(bench, "doc_id long, text string"), 0)
    df1 = spark.createDataFrame(train, "doc_id long, text string")
    sink(df1, 1)
    first = _result_map(read_decontam_results(spark, results_dir).drop("epoch"))
    sink(df1, 1)  # replay
    second = _result_map(read_decontam_results(spark, results_dir).drop("epoch"))
    assert first == second
    idx = {r.shingle for r in _read_shingle_index(spark, index_dir).collect()}
    assert len(idx) == 5  # bench doc's shingles only (train never indexes)


def test_compaction_preserves_membership_and_grading(spark, tmp_path):
    """compact_shingle_index folds every non-newest epoch into one
    negative generation; the membership set and subsequent grading are
    unchanged."""
    index_dir, results_dir, sink = _mk_sink(tmp_path)
    sink(spark.createDataFrame([(0, _body("a"))], "doc_id long, text string"), 0)
    sink(spark.createDataFrame([(10, _body("b"))], "doc_id long, text string"), 1)
    sink(spark.createDataFrame([(15, _body("c"))], "doc_id long, text string"), 2)
    before = {r.shingle for r in _read_shingle_index(spark, index_dir).collect()}
    compact_shingle_index(spark, index_dir)
    after = {r.shingle for r in _read_shingle_index(spark, index_dir).collect()}
    assert after == before and len(after) == 15
    assert [e for e in epoch_ids(spark, index_dir) if e < 0] == [-1]
    # grading against the compacted index still works
    sink(
        spark.createDataFrame([(21, _body("a"))], "doc_id long, text string"),
        3,
    )
    got = _result_map(
        read_decontam_results(spark, results_dir).filter("epoch = 3").drop("epoch")
    )
    assert got == {21: (5, 5, 1.0, True)}
