"""MJPEG-in-AVI codec: container round trip, frame walk, full decode,
malformed-payload contracts (r12 — the video member of the codec
metadata-route family)."""

import struct

import numpy as np
import pytest

from aiotcvectordb_spark.operators import avicodec as A
from aiotcvectordb_spark.operators import jpegcodec as J
from aiotcvectordb_spark.operators.multimodal import text_block_image_bytes


def _fixture_avi(text: str, doc_id: int, fps: int = 10) -> bytes:
    wide = 2 + doc_id % 5
    nf = 1 + doc_id % 6
    raw = text.encode("utf-8")
    frames = []
    for f in range(nf):
        rolled = (
            bytes(np.roll(np.frombuffer(raw, np.uint8), f)) if raw else b""
        )
        frames.append(J.encode_jpeg_gray(text_block_image_bytes(rolled, wide)))
    nb = max(len(raw), 1)
    return A.build_avi_mjpeg(
        frames, width=wide * 8, height=8 * (-(-nb // wide)), fps=fps
    )


def test_roundtrip_geometry_and_clock():
    for doc_id, text in [(0, ""), (3, "abc"), (7, "mjpeg 视频 测试 " * 9)]:
        wide, nf = 2 + doc_id % 5, 1 + doc_id % 6
        nb = max(len(text.encode("utf-8")), 1)
        m = A.parse_avi_mjpeg(_fixture_avi(text, doc_id))
        assert m["n_frames"] == m["total_frames"] == nf
        assert m["frames_probed"] == nf  # every frame's SOF parsed
        assert m["width"] == wide * 8
        assert m["height"] == 8 * (-(-nb // wide))
        assert m["us_per_frame"] == 100_000
        assert m["duration_ms"] == nf * 100
        assert m["n_index"] == nf


def test_pixel_sum_closed_form_across_frames():
    """Rolling the byte sequence preserves the multiset, so every
    frame's decoded integer pixel sum equals the closed form the SQL
    oracle computes."""
    text = "px exact 混合 content!"
    raw = text.encode("utf-8")
    doc_id = 9
    wide = 2 + doc_id % 5
    nb = len(raw)
    rows = -(-nb // wide)
    expected = 64 * (
        sum(2 * (b % 128) for b in raw) + 128 * (rows * wide - nb)
    )
    avi = _fixture_avi(text, doc_id)
    # walk movi and fully decode each frame
    pos = 12
    movi = None
    while pos + 8 <= len(avi):
        cid = avi[pos:pos + 4]
        clen = int.from_bytes(avi[pos + 4:pos + 8], "little")
        if cid == b"LIST" and avi[pos + 8:pos + 12] == b"movi":
            movi = avi[pos + 12:pos + 8 + clen]
            break
        pos += 8 + clen + (clen & 1)
    assert movi is not None
    n_seen = 0
    pos = 0
    while pos + 8 <= len(movi):
        clen = int.from_bytes(movi[pos + 4:pos + 8], "little")
        if movi[pos + 2:pos + 4] == b"dc":
            px = J.decode_jpeg(movi[pos + 8:pos + 8 + clen])
            assert int(px.astype("int64").sum()) == expected
            n_seen += 1
        pos += 8 + clen + (clen & 1)
    assert n_seen == 1 + doc_id % 6


def test_malformed_contracts():
    good = _fixture_avi("contract", 5)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        A.parse_avi_mjpeg(b"not an avi at all")
    with pytest.raises(ValueError, match="RIFF/AVI"):
        A.parse_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    # strip the movi LIST -> missing-chunk error
    no_movi = good[: good.find(b"LIST", 12)]
    no_movi = no_movi[:4] + struct.pack("<I", len(no_movi) - 8) + no_movi[8:]
    with pytest.raises(ValueError, match="hdrl/movi"):
        A.parse_avi_mjpeg(no_movi)
    with pytest.raises(ValueError, match="at least one frame"):
        A.build_avi_mjpeg([], 8, 8)


def test_mixed_geometry_mid_stream_raises():
    f1 = J.encode_jpeg_gray(text_block_image_bytes(b"aaaa", 2))
    f2 = J.encode_jpeg_gray(text_block_image_bytes(b"bbbbbb", 3))
    avi = A.build_avi_mjpeg([f1, f2], width=16, height=16)
    with pytest.raises(ValueError, match="geometry varies"):
        A.parse_avi_mjpeg(avi)


def test_spark_meta_and_frames_flow(spark):
    from aiotcvectordb_spark.operators import avicodec

    docs = spark.createDataFrame(
        [(i, f"spark avi {i} 帧 " * (i + 1)) for i in range(6)] + [(6, "")],
        "doc_id long, text string",
    )
    avi = avicodec.with_mjpeg_payload(docs)
    meta = {r.doc_id: r for r in avicodec.mjpeg_meta(avi).collect()}
    for i in range(7):
        nb = (
            max(len((f"spark avi {i} 帧 " * (i + 1)).encode()), 1)
            if i < 6
            else 1
        )
        wide = 2 + i % 5
        assert meta[i].n_frames == meta[i].frames_probed == 1 + i % 6
        assert meta[i].width == wide * 8
        assert meta[i].height == 8 * (-(-nb // wide))
        assert meta[i].duration_ms == (1 + i % 6) * 100
    frames = avicodec.mjpeg_frames(avi).collect()
    assert len(frames) == sum(1 + i % 6 for i in range(7))
    for r in frames:
        assert r.px_mean == pytest.approx(r.px_sum / (r.f_width * r.f_height))
    # malformed payload flags a NULL meta row, never a dead batch
    bad = spark.createDataFrame(
        [(99, bytearray(b"RIFFjunk"))], "doc_id long, payload binary"
    )
    (row,) = avicodec.mjpeg_meta(bad).collect()
    assert row.doc_id == 99 and row.n_frames is None
