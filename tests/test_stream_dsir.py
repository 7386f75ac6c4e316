"""Streaming DSIR admission: stream == direct computation with the
shared featurizer, standing raw counts accumulate, replay idempotence,
compaction invariance."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aiotcvectordb_spark.operators.classifier import hashed_bigram_buckets
from aiotcvectordb_spark.streaming.dsir import (
    _read_raw_index,
    compact_raw_index,
    read_dsir_decisions,
    stream_dsir_sink,
    target_bucket_counts,
)

_N_BUCKETS = 256

_TARGET = [
    (900, "clean formal prose with grammar and structure"),
    (901, "clean formal prose with clarity and structure"),
]
_B1 = [
    (1, "clean formal prose with grammar and care"),
    (2, "buy now click here free spam offer zzz"),
]
_B2 = [
    (3, "clean formal prose with structure again"),
    (4, "qqq xxx random noise tokens arrive"),
]


def _target_counts(spark):
    tdf = spark.createDataFrame(_TARGET, "doc_id long, text string")
    return [
        (r.bucket, r.ct)
        for r in target_bucket_counts(tdf, _N_BUCKETS).collect()
    ]


def _reference(spark, rows, prior_rows, tcounts):
    """Expected weights for `rows` under target model `tcounts` and
    raw model = counts(prior_rows + rows), computed directly with the
    shared featurizer."""
    df = spark.createDataFrame(rows, "doc_id long, text string")
    both = spark.createDataFrame(
        list(prior_rows) + list(rows), "doc_id long, text string"
    )
    occ = {
        (r.doc_id, r.bucket): r.cnt
        for r in hashed_bigram_buckets(df, _N_BUCKETS).collect()
    }
    raw = {}
    for r in hashed_bigram_buckets(both, _N_BUCKETS).collect():
        raw[r.bucket] = raw.get(r.bucket, 0) + r.cnt
    ct = dict(tcounts)
    tt, rt = sum(ct.values()), sum(raw.values())
    out = {}
    for (doc, bucket), cnt in occ.items():
        lr = math.log2((ct.get(bucket, 0) + 1) / (tt + _N_BUCKETS)) - math.log2(
            (raw[bucket] + 1) / (rt + _N_BUCKETS)
        )
        out[doc] = out.get(doc, 0.0) + cnt * lr
    return {d: round(w, 6) for d, w in out.items()}


def _run(spark, tmp_path, *batches, threshold=0.0):
    tcounts = _target_counts(spark)
    raw_dir = str(tmp_path / "raw")
    results_dir = str(tmp_path / "res")
    sink = stream_dsir_sink(
        raw_dir, results_dir,
        target_counts=tcounts, n_buckets=_N_BUCKETS, threshold=threshold,
    )
    for i, rows in enumerate(batches):
        sink(spark.createDataFrame(rows, "doc_id long, text string"), i)
    return raw_dir, results_dir, sink, tcounts


def test_epoch_scores_match_direct_computation(spark, tmp_path):
    _, results_dir, _, tcounts = _run(spark, tmp_path, _B1, _B2)
    dec = read_dsir_decisions(spark, results_dir)
    got1 = {r.doc_id: r.weight for r in dec.filter("epoch = 0").collect()}
    assert got1 == _reference(spark, _B1, [], tcounts)
    got2 = {r.doc_id: r.weight for r in dec.filter("epoch = 1").collect()}
    assert got2 == _reference(spark, _B2, _B1, tcounts)
    # target-like docs outweigh spam on the shared raw model
    w = {r.doc_id: r.weight for r in dec.collect()}
    assert w[1] > w[2] and w[3] > w[4]
    flags = {r.doc_id: r.admitted for r in dec.collect()}
    assert all(flags[d] == (w[d] >= 0.0) for d in w)


def test_replay_and_compaction(spark, tmp_path):
    from aiotcvectordb_spark.streaming.substrdedup import _epoch_ids

    raw_dir, results_dir, sink, _ = _run(spark, tmp_path, _B1, _B2)
    before = {
        (r.doc_id, r.weight, r.admitted, r.epoch)
        for r in read_dsir_decisions(spark, results_dir).collect()
    }
    sink(spark.createDataFrame(_B2, "doc_id long, text string"), 1)
    after = {
        (r.doc_id, r.weight, r.admitted, r.epoch)
        for r in read_dsir_decisions(spark, results_dir).collect()
    }
    assert after == before
    # compaction folds only committed epochs; read-invariant counts
    sink(spark.createDataFrame(
        [(5, "a third arriving batch of words")], "doc_id long, text string"
    ), 2)
    counts = {
        r.bucket: r.cr for r in _read_raw_index(spark, raw_dir).collect()
    }
    compact_raw_index(spark, raw_dir)
    assert _epoch_ids(spark, raw_dir) == [-1, 2]
    assert {
        r.bucket: r.cr for r in _read_raw_index(spark, raw_dir).collect()
    } == counts
    # a replay of epoch 2 sees exactly the pre-epoch-2 raw counts
    pre2 = {
        r.bucket: r.cr
        for r in _read_raw_index(spark, raw_dir, before_epoch=2).collect()
    }
    ref = {}
    for r in hashed_bigram_buckets(
        spark.createDataFrame(_B1 + _B2, "doc_id long, text string"),
        _N_BUCKETS,
    ).collect():
        ref[r.bucket] = ref.get(r.bucket, 0) + r.cnt
    assert pre2 == ref


def test_real_stream_drives_the_sink(spark, tmp_path):
    tcounts = _target_counts(spark)
    src = tmp_path / "src"
    spark.createDataFrame(
        _B1 + _B2, "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "a"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(src / "*"))
    )
    results_dir = str(tmp_path / "sres")
    q = (
        stream.writeStream.foreachBatch(
            stream_dsir_sink(
                str(tmp_path / "sraw"), results_dir,
                target_counts=tcounts, n_buckets=_N_BUCKETS, threshold=0.0,
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.doc_id: r.weight
        for r in read_dsir_decisions(spark, results_dir).collect()
    }
    assert got == _reference(spark, _B1 + _B2, [], tcounts)
