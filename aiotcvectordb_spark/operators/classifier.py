"""Hashed-feature document quality classifier (target-vs-raw).

The third member of the curation-scoring family: `perplexity_filter`
is an LM threshold, `dsir_weights` an importance ratio, and this the
TRAINED quality classifier the GPT-3/LLaMA-style pipelines use — fit
a logistic regression on "curated slice vs raw pool" labels over
hashed n-gram features, then score every document with the learned
weights.

Scale shape mirrors ``operators/pq.py``: training runs driver-side on
a BOUNDED, deterministically-sampled slice (seeded full-batch
gradient descent — reproducible bit-for-bit, no MLlib randomness),
while featurization and scoring stay fully distributed and JVM-side:
hashed-bigram buckets are built in the scan projection (the
``dsir_weights`` idiom), scoring is one broadcast join of the learned
(bucket, weight) table onto the (doc, bucket, cnt) occurrences plus a
per-doc aggregate — the same bounded-join shape at any corpus size.
Rows-only by the documented BASELINE.md policy for model operators
(like BPE/PCA/MMR): training has no SQL oracle; separation,
determinism, and scoring-parity properties are pinned in
tests/test_classifier.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH60 = "cast(conv(substring(md5({s}), 1, 15), 16, 10) as bigint)"


def hashed_bigram_buckets(
    docs: DataFrame,
    n_buckets: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, [extra...], bucket, cnt): token-bigram occurrences
    hashed into ``n_buckets`` with the portable 60-bit md5 hash —
    built entirely in the scan projection (no UDF)."""
    from aiotcvectordb_spark.functions import sparse as sparse_fn

    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in extra_cols],
        sparse_fn.bm25_tokens_col(text_col).alias("__toks"),
    ).filter(F.expr("size(__toks) >= 2"))
    bigrams = (
        "transform(sequence(1, size(__toks) - 1), "
        "i -> concat_ws(' ', slice(__toks, i, 2)))"
    )
    return (
        toked.select(
            "doc_id",
            *extra_cols,
            F.explode(F.expr(bigrams)).alias("__bg"),
        )
        .select(
            "doc_id",
            *extra_cols,
            F.expr(
                f"pmod({_HASH60.format(s='__bg')}, {n_buckets})"
            ).alias("bucket"),
        )
        .groupBy("doc_id", *extra_cols, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


@dataclass
class QualityModel:
    weights: np.ndarray  # (n_buckets,) float64
    intercept: float
    n_buckets: int


def train_quality_classifier(
    docs: DataFrame,
    *,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 2048,
    train_sample: int = 4096,
    iters: int = 200,
    lr: float = 0.5,
    l2: float = 1e-3,
    seed: int = 42,
) -> QualityModel:
    """Fit logistic weights on a bounded, deterministic sample.

    ``target_pred`` is a Column marking the curated/target slice
    (label 1); everything else is raw (label 0). The sample is chosen
    by md5-of-id order — stable across partitionings and engines. The
    optimizer is seeded full-batch gradient descent with L2: given the
    same sample it is bit-reproducible, unlike distributed LBFGS whose
    tree-aggregation order varies with partitioning."""
    labeled = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        target_pred.cast("int").alias("label_y"),
    )
    sample = (
        labeled.orderBy(F.md5(F.col("doc_id").cast("string")))
        .limit(train_sample)
    )
    occ = hashed_bigram_buckets(
        sample, n_buckets, text_col="text", extra_cols=("label_y",)
    )
    # r12 (guide §6 Arrow-for-driver-transfers): the bounded sample's
    # ~100k (doc, bucket, cnt) rows cross as Arrow columns instead of
    # pickled Rows, and X assembles vectorized instead of a Python
    # row loop. X/y are EXACTLY the frame the loop built (same sorted
    # doc order, same integer counts scattered with np.add.at — the
    # ufunc form of the loop's +=), so the fitted weights are
    # bit-identical given the same BLAS (asserted vs the frozen
    # literals in tests/test_classifier.py).
    pdf = occ.toPandas()
    if pdf.empty:
        return QualityModel(np.zeros(n_buckets), 0.0, n_buckets)
    ids = sorted(set(zip(pdf["doc_id"].tolist(), pdf["label_y"].tolist())))
    idx = {d: i for i, (d, _) in enumerate(ids)}
    X = np.zeros((len(ids), n_buckets), dtype=np.float64)
    np.add.at(
        X,
        (
            pdf["doc_id"].map(idx).to_numpy(),
            pdf["bucket"].to_numpy(),
        ),
        pdf["cnt"].to_numpy().astype(np.float64),
    )
    # l1-normalize counts per doc so long docs don't dominate
    X /= np.maximum(X.sum(axis=1, keepdims=True), 1.0)
    y = np.array([lab for _, lab in ids], dtype=np.float64)
    rng = np.random.default_rng(seed)
    w = rng.normal(0.0, 0.01, n_buckets)
    b = 0.0
    n = len(y)
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * ((X.T @ g) / n + l2 * w)
        b -= lr * float(g.mean())
    return QualityModel(w, b, n_buckets)


def score_quality(
    spark,
    docs: DataFrame,
    model: QualityModel,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """(doc_id, quality): sigmoid score of every document under the
    learned weights — one broadcast join of the (bucket, weight) table
    onto the hashed occurrences, one per-doc aggregate, a map-side
    sigmoid. Distributed end to end; the model never leaves the
    closure-free broadcast table. Documents with fewer than two
    tokens score sigmoid(intercept) (no features)."""
    occ = hashed_bigram_buckets(
        docs, model.n_buckets, id_col=id_col, text_col=text_col
    )
    wdf = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(model.weights) if v != 0.0],
        "bucket bigint, w double",
    )
    scored = (
        occ.join(F.broadcast(wdf), "bucket", "left")
        .withColumn("w", F.coalesce("w", F.lit(0.0)))
        # the same per-doc l1 normalization used in training.
        # ULP caveat (r12 advisor, the mmr_rerank precedent): the
        # grouped float SUMs accumulate in partition order in Spark
        # and arbitrary order in DuckDB, so unlike the left-assoc-fold
        # twins a doc whose z sits within 1 ULP of a 1e-6 rounding
        # boundary could hash-differently cross-engine. Accepted: the
        # fixture corpus has no boundary-adjacent z (driver-hash green
        # r11), and per-doc bucket counts are small integers scaled by
        # frozen weights — re-association error is ~1e-16 vs the 1e-6
        # grid. If it ever flips, fold array_sort'ed (bucket, cnt*w)
        # structs deterministically on both sides.
        .groupBy("doc_id")
        .agg(
            (F.sum(F.col("cnt") * F.col("w")) / F.sum("cnt")).alias("__z")
        )
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(scored, "doc_id", "left")
        .withColumn("__z", F.coalesce("__z", F.lit(0.0)))
        .select(
            "doc_id",
            F.round(
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(F.col("__z") + model.intercept))),
                round_digits,
            ).alias("quality"),
        )
    )
