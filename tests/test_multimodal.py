"""Multimodal binary-column plumbing: schema, determinism, batch shape,
frame sampling, and the real-codec seam raising cleanly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aiotcvectordb_spark.operators import multimodal


def _media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return multimodal.with_binary_payload(docs, text_col="text")


def test_payload_schema(spark, sf_dir):
    media = _media(spark, sf_dir)
    types = dict(media.dtypes)
    assert types["payload"] == "binary"
    assert types["media_type"] == "string"
    assert types["media_meta"] == "map<string,string>"
    row = media.select("payload", "text", "media_meta").first()
    assert bytes(row.payload) == row.text.encode("utf-8")
    assert row.media_meta["codec"] == "fake-v1"


def test_decode_features_deterministic(spark, sf_dir):
    media = _media(spark, sf_dir)
    a = {r.doc_id: (r.n_bytes, tuple(r.features)) for r in
         multimodal.decode_features(media).collect()}
    b = {r.doc_id: (r.n_bytes, tuple(r.features)) for r in
         multimodal.decode_features(media.repartition(7)).collect()}
    assert a == b  # partitioning must not change per-row features
    assert len(a) == media.count()
    for n_bytes, feats in a.values():
        assert len(feats) == multimodal.FEATURE_BUCKETS
        assert abs(sum(feats) - 1.0) < 1e-9 or n_bytes == 0


def test_decode_real_mode_raises(spark, sf_dir):
    media = _media(spark, sf_dir)
    with pytest.raises(NotImplementedError):
        multimodal.decode_features(media, mode="real")
    with pytest.raises(NotImplementedError):
        multimodal.frame_sample(media, mode="real")


def test_frame_sample_shape(spark, sf_dir):
    media = _media(spark, sf_dir).limit(20)
    frames = multimodal.frame_sample(
        media, frame_bytes=16, stride=32
    )
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"doc_id", "frame_no", "frame_off", "frame"}
    joined = pdf.merge(
        media.select("doc_id", F.length("payload").alias("n")).toPandas(),
        on="doc_id",
    )
    for _, r in joined.iterrows():
        assert r.frame_off == r.frame_no * 32
        assert len(r.frame) <= 16
        assert r.frame_off < r.n


def test_features_join_back_to_ann(spark, sf_dir):
    """Features are ANN-ready: array<double> joinable to the kNN op."""
    from aiotcvectordb_spark.operators import knn

    media = _media(spark, sf_dir)
    feats = multimodal.decode_features(media).filter("n_bytes > 0")
    q = feats.first().features
    out = knn.knn_search(
        feats, [list(q)], vector_col="features", id_col="doc_id",
        metric="COSINE", limit=3, round_digits=6,
    )
    top = out.filter("rank = 1").first()
    assert top.score == 1.0


def test_resize_images_fixed_shape(spark, sf_dir):
    from aiotcvectordb_spark.operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    media = multimodal.with_binary_payload(docs)
    out = multimodal.resize_images(media, width=8, height=4).collect()
    assert len(out) == 10
    for r in out:
        assert r.width == 8 and r.height == 4
        assert len(r.pixels) == 8 * 4  # fixed batch shape
    # deterministic: same input -> same bytes
    out2 = multimodal.resize_images(media, width=8, height=4).collect()
    assert {(r.doc_id, bytes(r.pixels)) for r in out} == {
        (r.doc_id, bytes(r.pixels)) for r in out2
    }


def test_resize_real_mode_is_stubbed(spark, sf_dir):
    import pytest as _pytest

    from aiotcvectordb_spark.operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1)
    media = multimodal.with_binary_payload(docs)
    with _pytest.raises(NotImplementedError):
        multimodal.resize_images(media, mode="real")
