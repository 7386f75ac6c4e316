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


def test_video_real_mode_rejects_non_gif(spark, sf_dir):
    """r6: GIF decodes for real (tests/test_gifcodec.py); any OTHER
    entropy-coded payload still raises at execution — the plan builds
    (the check is per-payload inside the kernel) but collecting
    non-GIF bytes must fail loudly, not emit garbage frames."""
    media = _media(spark, sf_dir).limit(2)
    with pytest.raises(Exception, match="NotImplementedError|entropy-coded"):
        multimodal.frame_sample(media, mode="real").collect()


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


# ---------------------------------------------------------------------------
# Real codec path: stdlib PNG encode/decode + header probing
# ---------------------------------------------------------------------------


def _png_media(spark):
    """Deterministic PNG fixtures built with the repo's own encoder:
    a gray gradient, an RGB color wheel slice, and one non-image blob."""
    import numpy as np

    from aiotcvectordb_spark.operators import imagecodec

    gray = np.arange(16 * 8, dtype=np.uint8).reshape(16, 8)
    rgb = np.zeros((5, 7, 3), dtype=np.uint8)
    rgb[:, :, 0] = np.arange(7)[None, :] * 30
    rgb[:, :, 1] = np.arange(5)[:, None] * 40
    rgb[:, :, 2] = 200
    rows = [
        (1, bytearray(imagecodec.encode_png(gray))),
        (2, bytearray(imagecodec.encode_png(rgb))),
        (3, bytearray(b"not an image at all")),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_png_roundtrip_exact():
    import numpy as np

    from aiotcvectordb_spark.operators import imagecodec

    rng = np.random.default_rng(7)
    for shape in [(4, 4), (9, 3, 1), (6, 5, 3), (2, 8, 4)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = imagecodec.decode_png(imagecodec.encode_png(img))
        want = img[:, :, None] if img.ndim == 2 else img
        assert (got == want).all(), f"roundtrip mismatch at {shape}"


def test_png_all_filters_decode():
    """Decode PNGs using every scanline filter type (1-4), not just the
    filter-0 rows our encoder emits."""
    import struct
    import zlib

    import numpy as np

    from aiotcvectordb_spark.operators import imagecodec

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)

    def refilter(arr, ftypes):
        h, w, c = arr.shape
        stride = w * c
        flat = arr.reshape(h, stride).astype(np.int16)
        out = b""
        for y, ft in enumerate(ftypes):
            row = flat[y]
            prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int16)
            enc = np.zeros(stride, dtype=np.int16)
            for x in range(stride):
                left = row[x - c] if x >= c else 0
                up = prev[x]
                ul = prev[x - c] if x >= c else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = left
                elif ft == 2:
                    pred = up
                elif ft == 3:
                    pred = (left + up) >> 1
                else:
                    pred = imagecodec._paeth(int(left), int(up), int(ul))
                enc[x] = (row[x] - pred) & 0xFF
            out += bytes([ft]) + enc.astype(np.uint8).tobytes()
        return out

    raw = refilter(img, [1, 2, 3, 4, 1])
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)

    def chunk(tag, data):
        crc = zlib.crc32(tag + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", crc)

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert (imagecodec.decode_png(png) == img).all()


def test_decode_features_real_png(spark):
    media = _png_media(spark)
    got = {
        r.doc_id: r
        for r in multimodal.decode_features(media, mode="real").collect()
    }
    assert len(got) == 3
    # real luminance histogram on decodable PNGs, normalized
    for did in (1, 2):
        feats = got[did].features
        assert len(feats) == multimodal.FEATURE_BUCKETS
        assert abs(sum(feats) - 1.0) < 1e-9
    # gradient 0..127 luminance fills only the low half of the buckets
    assert sum(got[1].features[: multimodal.FEATURE_BUCKETS // 2]) > 0.99
    # undecodable payload flags as NULL, row preserved
    assert got[3].features is None
    assert got[3].n_bytes == len(b"not an image at all")


def test_resize_images_real_png(spark):
    import numpy as np

    from aiotcvectordb_spark.operators import imagecodec

    media = _png_media(spark)
    got = {
        r.doc_id: r
        for r in multimodal.resize_images(
            media, width=4, height=4, mode="real"
        ).collect()
    }
    # true pixel-grid resample: compare against numpy reference
    gray = np.arange(16 * 8, dtype=np.uint8).reshape(16, 8, 1)
    want = imagecodec.resize_nearest(gray, 4, 4).tobytes()
    assert bytes(got[1].pixels) == want
    assert len(got[2].pixels) == 4 * 4 * 3  # RGB keeps channels
    assert got[3].pixels is None


def test_probe_media_formats(spark):
    """Header probing is real for PNG/JPEG/GIF/BMP — dimensions and the
    JPEG EXIF orientation come from actual byte parsing."""
    import struct

    from aiotcvectordb_spark.operators import imagecodec

    exif = (
        b"Exif\x00\x00"
        + b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
        + struct.pack("<H", 1)
        + struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<HH", 6, 0)
        + struct.pack("<I", 0)
    )
    sof = struct.pack(">BHHB", 8, 7, 5, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe1" + struct.pack(">H", len(exif) + 2) + exif
        + b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
        + b"\xff\xd9"
    )
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 4
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 40, -50) + b"\x00" * 4
    png = imagecodec.encode_png(
        __import__("numpy").zeros((3, 9), dtype="uint8")
    )
    rows = [
        (1, bytearray(png)),
        (2, bytearray(jpeg)),
        (3, bytearray(gif)),
        (4, bytearray(bmp)),
        (5, bytearray(b"\x00\x01garbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in multimodal.probe_media(df).collect()}
    assert (got[1].format, got[1].width, got[1].height, got[1].channels) == (
        "png", 9, 3, 1,
    )
    assert (got[2].format, got[2].width, got[2].height) == ("jpeg", 5, 7)
    assert got[2].exif_orientation == 6
    assert (got[3].format, got[3].width, got[3].height) == ("gif", 12, 34)
    assert (got[4].format, got[4].width, got[4].height) == ("bmp", 40, 50)
    assert got[5].format is None and got[5].width is None


def test_audio_video_oracle_parity_unicode_and_empty(spark, tmp_path):
    """The audio/video probe oracles are BYTE-based (UTF-8 expansion in
    SQL), so Spark/DuckDB parity must hold beyond the all-ASCII
    fixture: multibyte code points (2-, 3-, 4-byte UTF-8), an empty
    text (the codec emits one zero sample), and a short-ASCII control
    row must all hash-match."""
    import duckdb
    import pandas as pd

    from aiotcvectordb_spark import queries as Q

    docs = [
        (1, "plain ascii text"),
        (2, "héllo wörld"),          # 2-byte sequences
        (3, "日本語テス"),  # 3-byte sequences
        (4, "emoji \U0001f600\U0001f680 mix"),  # 4-byte sequences
        (5, ""),                                # empty -> 1 zero sample
        (6, "x"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.parquet(
        f"{sf}/documents.parquet"
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    for name in ("audio_probe", "video_frames", "jpeg_probe"):
        got = Q.QUERIES[name](spark, sf).toPandas()
        want = con.execute(Q.ORACLES[name]).df()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns), name
        g = got[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True)
        for c in cols:
            pd.testing.assert_series_equal(
                g[c].astype("float64"), w[c].astype("float64"),
                check_names=False, rtol=0, atol=1e-9,
            ), (name, c)


def test_resize_media_real_decodes_jpeg_payloads(spark):
    """resize_images mode='real' must handle baseline JPEG payloads via
    the numpy codec (round-3: only entropy-coded VIDEO remains out of
    scope)."""
    import numpy as np

    from aiotcvectordb_spark.operators import jpegcodec, multimodal

    img = np.repeat(
        np.repeat(2 * np.arange(24, dtype=np.uint8).reshape(4, 6) % 128, 8, 0),
        8, 1,
    ).astype(np.uint8)
    rows = [(1, bytearray(jpegcodec.encode_jpeg_gray(img))),
            (2, bytearray(b"not an image"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: r
        for r in multimodal.resize_images(
            df, width=8, height=8, mode="real"
        ).collect()
    }
    assert got[1].pixels is not None and len(bytes(got[1].pixels)) == 64
    assert got[2].pixels is None


def test_png_decoder_rejects_fuzzed_bytes_cleanly():
    """Same contract as the JPEG decoder: truncations and bit flips of
    a valid PNG must raise ValueError only (zlib/struct errors are
    normalized), so one bad payload can never fail an Arrow batch."""
    import numpy as np

    from aiotcvectordb_spark.operators.imagecodec import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(4)
    good = encode_png(rng.integers(0, 256, size=(9, 7)).astype(np.uint8))
    cases = [good[:10], good[:30], good[: len(good) // 2]]
    for _ in range(80):
        b = bytearray(good)
        for _ in range(3):
            b[rng.integers(8, len(b))] ^= 1 << rng.integers(0, 8)
        cases.append(bytes(b))
    for c in cases:
        try:
            out = decode_png(c)
            assert out.dtype == np.uint8
        except ValueError:
            pass  # the ONLY allowed failure mode


def test_resize_and_features_decode_bmp_and_gif(spark):
    """r6: the real-mode image dispatch covers BMP and GIF payloads
    alongside PNG/JPEG."""
    import numpy as np

    from aiotcvectordb_spark.operators.gifcodec import build_gif
    from aiotcvectordb_spark.operators.imagecodec import encode_bmp

    rng = np.random.RandomState(4)
    bmp = encode_bmp(rng.randint(0, 256, (10, 12, 3)).astype(np.uint8))
    pal = np.stack([np.arange(16, dtype=np.uint8) * 17] * 3, axis=1)
    gif = build_gif([rng.randint(0, 16, (9, 7)).astype(np.uint8)], pal)
    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(gif)), (3, bytearray(b"garbage"))],
        "doc_id long, payload binary",
    )
    resized = {r.doc_id: r.pixels for r in
               multimodal.resize_images(df, mode="real", width=4, height=4).collect()}
    assert resized[1] is not None and len(resized[1]) == 4 * 4 * 3
    assert resized[2] is not None and len(resized[2]) == 4 * 4 * 3
    assert resized[3] is None  # undecodable flagged, not failed
    feats = {r.doc_id: r for r in
             multimodal.decode_features(df, mode="real").collect()}
    assert feats[1].features is not None and feats[2].features is not None
    assert feats[3].features is None


def test_probe_media_reads_progressive_sof2_dimensions(spark):
    """The jpeg_meta route parses dimensions from REAL SOF2 progressive
    streams (our encoder's output), matching the encoder's block
    geometry without any entropy decode."""
    from aiotcvectordb_spark.operators import multimodal

    docs = spark.createDataFrame(
        [(1, "x" * 5), (2, "y" * 130), (3, "")], "doc_id long, text string"
    )
    media = multimodal.with_jpeg_payload(docs, progressive=True)
    got = {r.doc_id: r for r in multimodal.probe_media(media).collect()}
    # 4 blocks (32 px) wide; one 8-px block row per 4 text bytes
    assert (got[1].format, got[1].width, got[1].height) == ("jpeg", 32, 16)
    assert (got[2].width, got[2].height) == (32, 8 * -(-130 // 4))
    assert (got[3].width, got[3].height) == (32, 8)  # empty -> one block


def test_jpeg_vary_width_rotates_sof_dimensions(spark):
    """vary_width must give each doc its own block-grid width
    (2 + id % 7 blocks) with height following from the byte count, so
    the jpeg_meta oracle recomputes SOF dimensions per row (r12)."""
    from aiotcvectordb_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(i, "px 宽 " * (i + 1)) for i in range(8)] + [(8, "")],
        "doc_id long, text string",
    )
    media = MM.with_jpeg_payload(docs, progressive=True, vary_width=True)
    meta = {r.doc_id: r for r in MM.probe_media(media).collect()}
    for i in range(9):
        wide = 2 + i % 7
        nb = max(len(("px 宽 " * (i + 1)).encode()), 1) if i < 8 else 1
        assert meta[i].format == "jpeg"
        assert meta[i].width == wide * 8, i
        assert meta[i].height == 8 * (-(-nb // wide)), i
