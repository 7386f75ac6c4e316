"""Streaming LM quality gate: stream == batch kernels, standing-LM
accumulation across epochs, replay idempotence, compaction invariance."""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aiotcvectordb_spark import pipelines
from aiotcvectordb_spark.streaming.qualitygate import (
    _read_lm_index,
    compact_lm_index,
    read_gate_decisions,
    stream_quality_gate_sink,
)

_B1 = [
    (1, "en", "the cat sat on the mat"),
    (2, "en", "the dog sat on the log"),
    (3, "en", "zq xv unusual rare tokens only"),
]
_B2 = [
    (4, "en", "the cat sat on the log"),
    (5, "en", "completely novel vocabulary arrives here"),
    (6, "zh", "spaced zh tokens the cat"),
]


def _batch_reference(spark, rows, prior_rows):
    """Expected scores for `rows` under LM(prior_rows + rows) — the
    sink's documented causal semantics, computed directly with the
    shared kernels (what the sink must reproduce through its index)."""
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    both = spark.createDataFrame(
        list(prior_rows) + list(rows), "doc_id long, lang string, text string"
    )
    dtf = pipelines.doc_term_freqs(df)
    lm = (
        pipelines.doc_term_freqs(both)
        .groupBy("lang", "token")
        .agg(F.sum("dtf").alias("tf"))
    )
    totals = lm.groupBy("lang").agg(F.sum("tf").alias("n"))
    out = pipelines.lm_bits(dtf, lm, totals, 6)
    return {
        (r.doc_id, r.lang): r.ppl_bits for r in out.collect()
    }


def _run_epochs(spark, tmp_path, *batches, threshold=8.0, suffix=""):
    lm_dir = str(tmp_path / f"lm{suffix}")
    results_dir = str(tmp_path / f"res{suffix}")
    sink = stream_quality_gate_sink(
        lm_dir, results_dir, threshold_bits=threshold
    )
    for i, rows in enumerate(batches):
        sink(
            spark.createDataFrame(
                rows, "doc_id long, lang string, text string"
            ),
            i,
        )
    return lm_dir, results_dir, sink


def test_single_epoch_matches_batch_kernels(spark, tmp_path):
    _, results_dir, _ = _run_epochs(spark, tmp_path, _B1)
    got = {
        (r.doc_id, r.lang): r.ppl_bits
        for r in read_gate_decisions(spark, results_dir).collect()
    }
    assert got == _batch_reference(spark, _B1, [])


def test_standing_lm_accumulates_and_threshold_gates(spark, tmp_path):
    lm_dir, results_dir, _ = _run_epochs(spark, tmp_path, _B1, _B2)
    dec = read_gate_decisions(spark, results_dir)
    got2 = {
        (r.doc_id, r.lang): r.ppl_bits
        for r in dec.filter("epoch = 1").collect()
    }
    # epoch 1 scores under LM(B1 + B2) — the standing index plus batch
    assert got2 == _batch_reference(spark, _B2, _B1)
    # the gate applies the fixed threshold to the computed bits, and
    # novel vocabulary scores strictly worse than standing vocabulary
    bits = {r.doc_id: r.ppl_bits for r in dec.collect()}
    flags = {r.doc_id: r.admitted for r in dec.collect()}
    assert all(flags[d] == (bits[d] <= 8.0) for d in bits)
    assert bits[5] > bits[4]
    # all-hapax docs score exactly -log2(1/n_lang) per token
    for r in dec.filter("doc_id = 5").collect():
        n = (
            _read_lm_index(spark, lm_dir)
            .filter("lang = 'en'")
            .agg(F.sum("tf"))
            .collect()[0][0]
        )
        assert r.ppl_bits == round(math.log2(n), 6)


def test_replay_is_idempotent(spark, tmp_path):
    lm_dir, results_dir, sink = _run_epochs(spark, tmp_path, _B1, _B2)
    before = {
        (r.doc_id, r.ppl_bits, r.admitted, r.epoch)
        for r in read_gate_decisions(spark, results_dir).collect()
    }
    # at-least-once replay of the newest epoch
    sink(
        spark.createDataFrame(_B2, "doc_id long, lang string, text string"),
        1,
    )
    after = {
        (r.doc_id, r.ppl_bits, r.admitted, r.epoch)
        for r in read_gate_decisions(spark, results_dir).collect()
    }
    assert after == before


def test_compaction_is_read_invariant_and_spares_newest(spark, tmp_path):
    from aiotcvectordb_spark.streaming.substrdedup import _epoch_ids

    b3 = [(7, "en", "a third epoch arrives with the cat")]
    lm_dir, _, sink = _run_epochs(spark, tmp_path, _B1, _B2, b3)
    counts = {
        (r.lang, r.token): r.tf
        for r in _read_lm_index(spark, lm_dir).collect()
    }
    # with only two epochs nothing is mergeable (the newest live epoch
    # is spared — it is the only one foreachBatch can replay)
    compact_lm_index(spark, lm_dir)
    assert _epoch_ids(spark, lm_dir) == [-1, 2]
    assert {
        (r.lang, r.token): r.tf
        for r in _read_lm_index(spark, lm_dir).collect()
    } == counts
    # a replay of epoch 2 still sees exactly the pre-epoch-2 counts
    b12_counts = {
        (r.lang, r.token): r.tf
        for r in _read_lm_index(spark, lm_dir, before_epoch=2).collect()
    }
    ref = {
        (r.lang, r.token): r.tf
        for r in pipelines.doc_term_freqs(
            spark.createDataFrame(
                _B1 + _B2, "doc_id long, lang string, text string"
            )
        )
        .groupBy("lang", "token")
        .agg(F.sum("dtf").alias("tf"))
        .collect()
    }
    assert b12_counts == ref


def test_real_stream_drives_the_sink(spark, tmp_path):
    src = tmp_path / "src"
    spark.createDataFrame(
        _B1 + _B2, "doc_id long, lang string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "a"))
    stream = (
        spark.readStream.schema("doc_id long, lang string, text string")
        .parquet(str(src / "*"))
    )
    results_dir = str(tmp_path / "sres")
    q = (
        stream.writeStream.foreachBatch(
            stream_quality_gate_sink(
                str(tmp_path / "slm"), results_dir, threshold_bits=8.0
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.doc_id, r.lang): r.ppl_bits
        for r in read_gate_decisions(spark, results_dir).collect()
    }
    assert got == _batch_reference(spark, _B1 + _B2, [])


def test_hostile_corpus_epoch_does_not_poison_the_gate(spark, tmp_path):
    # the hostile shapes from the batch sweeps, pushed through the sink
    hostile = [
        (101, "en", "trailing newline\n"),
        (102, "en", "\n\n"),
        (103, "en", "   "),
        (104, "zh", "东风夜放花千树更吹落星如雨"),
        (105, "en", "emoji 😀 doc \U0001f680"),
        (106, "en", "x"),
        (107, "en", "carriage\r\nreturn doc"),
    ]
    lm_dir, results_dir, sink = _run_epochs(spark, tmp_path, _B1, hostile)
    dec = read_gate_decisions(spark, results_dir)
    # r8: EVERY batch doc gets an explicit decision row — zero-token
    # docs (102 newline-only, 103 whitespace-only) surface as
    # (ppl_bits NULL, admitted false) instead of silently vanishing
    rows = {r.doc_id: r for r in dec.filter("epoch = 1").collect()}
    assert set(rows) == {101, 102, 103, 104, 105, 106, 107}
    for d in (102, 103):
        assert rows[d].ppl_bits is None and rows[d].admitted is False
    assert {
        (r.doc_id, r.lang): r.ppl_bits
        for r in dec.filter("epoch = 1").collect()
        if r.ppl_bits is not None
    } == _batch_reference(spark, hostile, _B1)
