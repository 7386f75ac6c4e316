"""Quality classifier: separation, determinism, bounded training."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aiotcvectordb_spark.operators.classifier import (
    hashed_bigram_buckets,
    score_quality,
    train_quality_classifier,
)


def _corpus(spark, n=400, seed_words=("clean", "prose", "formal")):
    rows = []
    for i in range(n):
        if i % 2 == 0:  # curated style
            rows.append(
                (i, "src0",
                 f"{seed_words[i % 3]} well formed sentence number {i % 7} "
                 "with grammar and structure and clarity")
            )
        else:  # raw style
            rows.append(
                (i, f"src{1 + i % 3}",
                 f"buy now click here {i % 11} free spam offer "
                 "zzz qqq xxx random noise tokens")
            )
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_classifier_separates_target_from_raw(spark):
    docs = _corpus(spark)
    train = docs.filter("doc_id < 300")
    model = train_quality_classifier(
        train, target_pred=F.col("source") == "src0"
    )
    held = docs.filter("doc_id >= 300")
    scored = {r.doc_id: r.quality for r in score_quality(spark, held, model).collect()}
    tgt = [scored[i] for i in range(300, 400, 2)]
    raw = [scored[i] for i in range(301, 400, 2)]
    # every held-out curated doc must outscore every held-out raw doc
    assert min(tgt) > max(raw)


def test_scoring_is_deterministic_across_partitionings(spark):
    docs = _corpus(spark, n=120)
    model = train_quality_classifier(
        docs, target_pred=F.col("source") == "src0"
    )
    a = sorted(
        (r.doc_id, r.quality)
        for r in score_quality(spark, docs, model).collect()
    )
    b = sorted(
        (r.doc_id, r.quality)
        for r in score_quality(spark, docs.repartition(13), model).collect()
    )
    assert a == b
    # training itself is seeded + md5-ordered: bit-identical weights
    m2 = train_quality_classifier(
        docs.repartition(7), target_pred=F.col("source") == "src0"
    )
    assert (m2.weights == model.weights).all() and m2.intercept == model.intercept


def test_short_docs_score_intercept_and_everything_scores(spark):
    docs = spark.createDataFrame(
        [(1, "src0", "x"), (2, "src1", "two words"), (3, "src1", "")],
        "doc_id long, source string, text string",
    )
    model = train_quality_classifier(
        _corpus(spark, n=60), target_pred=F.col("source") == "src0"
    )
    out = {r.doc_id: r.quality for r in score_quality(spark, docs, model).collect()}
    assert set(out) == {1, 2, 3}  # nothing dropped, single-token included
    import math

    expected = round(1.0 / (1.0 + math.exp(-model.intercept)), 6)
    assert out[1] == expected and out[3] == expected


def test_featurizer_buckets_are_in_range(spark):
    docs = _corpus(spark, n=30)
    occ = hashed_bigram_buckets(docs, 64)
    stats = occ.agg(
        F.min("bucket"), F.max("bucket"), F.sum("cnt")
    ).collect()[0]
    assert stats[0] >= 0 and stats[1] < 64 and stats[2] > 0


def test_frozen_weights_reproduce_training(spark):
    """The classifier_frozen literals must be EXACTLY one deterministic
    training run (sf0.01 fixture, source == 'src0', n_buckets=256,
    train_sample=2048, seed 42) — re-deriving them bit-for-bit proves
    the frozen lane is the trained lane with the randomness pinned,
    not a hand-tuned divergence (the BPE frozen-merge-table rule)."""
    import os

    import numpy as np
    import pytest

    if not os.path.isdir("/root/testdata/sf0.01"):
        pytest.skip("sf0.01 testdata not present")
    from aiotcvectordb_spark import queries as Q
    from aiotcvectordb_spark.operators.classifier import (
        train_quality_classifier,
    )
    from aiotcvectordb_spark.operators.classifier_frozen import (
        FROZEN_INTERCEPT,
        FROZEN_N_BUCKETS,
        FROZEN_WEIGHTS,
    )

    docs = Q.load(spark, "/root/testdata/sf0.01", "documents")
    model = train_quality_classifier(
        docs,
        target_pred=F.col("source") == "src0",
        n_buckets=FROZEN_N_BUCKETS,
        train_sample=2048,
    )
    assert model.intercept == FROZEN_INTERCEPT
    # r12: bit-for-bit equality held on the box that froze the weights,
    # but the trainer's X @ w / X.T @ g run through BLAS, whose kernel
    # dispatch (CPU features, thread count, library build) legally
    # re-associates the reductions — a different sandbox reproduced
    # every weight to within 2.1e-17 (132 of 256 off by the last bit,
    # intercept exact, run-to-run deterministic). Pin the derivation to
    # that measured envelope: identical math, last-bit BLAS drift only.
    # The frozen SCORING lane is unaffected (it uses the literals).
    assert np.allclose(
        model.weights,
        np.array(FROZEN_WEIGHTS, dtype=np.float64),
        rtol=0.0,
        atol=1e-15,
    )


def test_frozen_scoring_bounds_and_spine(spark, sf_dir):
    """Every document gets exactly one explicit score row in (0, 1) —
    featureless (sub-2-token) docs score sigmoid(intercept)."""
    from aiotcvectordb_spark import queries as Q

    out = Q.QUERIES["quality_classifier_frozen"](spark, sf_dir)
    n_docs = Q.load(spark, sf_dir, "documents").count()
    rows = out.collect()
    assert len(rows) == n_docs
    assert all(0.0 < r.quality < 1.0 for r in rows)
