"""Watermark commit protocol for SUMMED standing indexes (r8): a
compaction crash between the generation write and the source deletes
must not double any merged count, an unmarked generation is invisible
and garbage-collected, and featureless docs get explicit decisions."""

from __future__ import annotations

from aiotcvectordb_spark.streaming import epochlog
from aiotcvectordb_spark.streaming.dsir import (
    _read_raw_index,
    compact_raw_index,
    read_dsir_decisions,
    stream_dsir_sink,
    target_bucket_counts,
)
from aiotcvectordb_spark.streaming.qualitygate import (
    _read_lm_index,
    compact_lm_index,
    stream_quality_gate_sink,
)

_BATCHES = [
    [(1, "en", "alpha beta gamma alpha"), (2, "en", "beta beta delta")],
    [(3, "en", "alpha delta delta"), (4, "zh", "东风 夜放 花千树 东风")],
    [(5, "en", "gamma gamma alpha beta"), (6, "en", "epsilon zeta")],
    [(7, "en", "zeta zeta beta"), (8, "zh", "花千树 夜放")],
]


def _lm_counts(spark, lm_dir, **kw):
    return {
        (r.lang, r.token): r.tf
        for r in _read_lm_index(spark, lm_dir, **kw).collect()
    }


def _build_lm(spark, tmp_path, n_epochs):
    lm_dir = str(tmp_path / "lm")
    results_dir = str(tmp_path / "res")
    sink = stream_quality_gate_sink(lm_dir, results_dir, threshold_bits=10.0)
    for i in range(n_epochs):
        sink(
            spark.createDataFrame(
                _BATCHES[i], "doc_id long, lang string, text string"
            ),
            i,
        )
    return lm_dir, sink


def test_crash_between_gen_write_and_deletes_does_not_double_counts(
    spark, tmp_path, monkeypatch
):
    """The r7-advisor scenario: the merged generation lands (and is
    marked) but the source epoch deletes never run. With count-delta
    union this used to DOUBLE every merged (lang, token) count — the
    watermark read must keep the sums exact, and the next compaction
    must fold to the same sums while cleaning up."""
    lm_dir, sink = _build_lm(spark, tmp_path, 3)
    truth = _lm_counts(spark, lm_dir)
    pre2 = _lm_counts(spark, lm_dir, before_epoch=2)
    assert pre2 and pre2 != truth

    monkeypatch.setattr(epochlog, "delete_epoch", lambda *a, **k: None)
    compact_lm_index(spark, lm_dir)
    monkeypatch.undo()
    # generation -1 AND its sources 0, 1 are all still on disk...
    assert epochlog.epoch_ids(spark, lm_dir) == [-1, 0, 1, 2]
    assert epochlog.generation_watermark(spark, lm_dir, -1) == 1
    # ...but reads skip the folded live epochs: sums are NOT doubled
    assert _lm_counts(spark, lm_dir) == truth
    # a replay of epoch 2 still sees exactly the pre-epoch-2 counts
    assert _lm_counts(spark, lm_dir, before_epoch=2) == pre2
    # the next (healthy) compaction completes the crashed one: folds to
    # the same sums, descends the generation id, removes the leftovers
    sink(
        spark.createDataFrame(
            _BATCHES[3], "doc_id long, lang string, text string"
        ),
        3,
    )
    truth4 = _lm_counts(spark, lm_dir)
    compact_lm_index(spark, lm_dir)
    assert epochlog.epoch_ids(spark, lm_dir) == [-2, 3]
    assert _lm_counts(spark, lm_dir) == truth4


def test_unmarked_generation_is_invisible_and_gced(
    spark, tmp_path, monkeypatch
):
    """Crash BEFORE the marker lands: the half-written generation must
    be ignored by every read and garbage-collected by the next
    compaction (which then commits normally)."""
    lm_dir, sink = _build_lm(spark, tmp_path, 3)
    truth = _lm_counts(spark, lm_dir)

    monkeypatch.setattr(epochlog, "mark_generation", lambda *a, **k: None)
    monkeypatch.setattr(epochlog, "delete_epoch", lambda *a, **k: None)
    compact_lm_index(spark, lm_dir)
    monkeypatch.undo()
    assert epochlog.epoch_ids(spark, lm_dir) == [-1, 0, 1, 2]
    assert epochlog.generation_watermark(spark, lm_dir, -1) is None
    # the orphan contributes nothing to any read
    assert _lm_counts(spark, lm_dir) == truth
    # the next compaction GCs the orphan, then commits at a FRESH id
    # (never reuses the possibly-corrupt directory id)
    compact_lm_index(spark, lm_dir)
    assert epochlog.epoch_ids(spark, lm_dir) == [-2, 2]
    assert epochlog.generation_watermark(spark, lm_dir, -2) == 1
    assert _lm_counts(spark, lm_dir) == truth


def test_dsir_raw_index_same_protocol(spark, tmp_path, monkeypatch):
    """The DSIR raw-count index rides the same watermark protocol."""
    raw_dir = str(tmp_path / "raw")
    results_dir = str(tmp_path / "res")
    tdf = spark.createDataFrame(
        [(900, "clean formal prose with structure")], "doc_id long, text string"
    )
    tcounts = [
        (r.bucket, r.ct) for r in target_bucket_counts(tdf, 64).collect()
    ]
    sink = stream_dsir_sink(
        raw_dir, results_dir, target_counts=tcounts, n_buckets=64,
        threshold=0.0,
    )
    for i, rows in enumerate(
        [[(1, "clean formal prose here")], [(2, "spam spam zzz offer")],
         [(3, "formal structure with prose")]]
    ):
        sink(spark.createDataFrame(rows, "doc_id long, text string"), i)
    truth = {
        r.bucket: r.cr for r in _read_raw_index(spark, raw_dir).collect()
    }
    monkeypatch.setattr(epochlog, "delete_epoch", lambda *a, **k: None)
    compact_raw_index(spark, raw_dir)
    monkeypatch.undo()
    assert epochlog.epoch_ids(spark, raw_dir) == [-1, 0, 1, 2]
    assert {
        r.bucket: r.cr for r in _read_raw_index(spark, raw_dir).collect()
    } == truth


def test_dsir_featureless_docs_get_explicit_decisions(spark, tmp_path):
    """r8 advisor fix: empty-text / single-token docs produce no bucket
    occurrences but still surface an explicit (weight NULL,
    admitted false) decision row — 'rejected' is distinguishable from
    'never scored'."""
    raw_dir = str(tmp_path / "raw")
    results_dir = str(tmp_path / "res")
    tdf = spark.createDataFrame(
        [(900, "clean formal prose with structure")], "doc_id long, text string"
    )
    tcounts = [
        (r.bucket, r.ct) for r in target_bucket_counts(tdf, 64).collect()
    ]
    sink = stream_dsir_sink(
        raw_dir, results_dir, target_counts=tcounts, n_buckets=64,
        threshold=-100.0,
    )
    rows = [
        (1, "clean formal prose with structure intact"),
        (2, ""),          # empty text
        (3, "single"),    # one token -> zero bigrams
    ]
    sink(spark.createDataFrame(rows, "doc_id long, text string"), 0)
    dec = {r.doc_id: r for r in read_dsir_decisions(spark, results_dir).collect()}
    assert set(dec) == {1, 2, 3}
    assert dec[1].weight is not None and dec[1].admitted is True
    for d in (2, 3):
        assert dec[d].weight is None and dec[d].admitted is False
