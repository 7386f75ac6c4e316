"""Real GIF decode (operators/gifcodec): exact LZW + frame round trips
through the module's own writer, interlace, transparency/disposal
compositing, the frame_sample real-mode Spark stage, and fuzz."""

from __future__ import annotations

import numpy as np
import pytest

from aiotcvectordb_spark.operators.gifcodec import (
    _lzw_gif_decode,
    _lzw_gif_encode,
    build_gif,
    decode_gif,
)

_PAL = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 255]],
    dtype=np.uint8,
)


def test_lzw_round_trips_all_code_sizes():
    import random

    rng = random.Random(3)
    for mcs in (2, 3, 4, 8):
        alphabet = 1 << mcs
        for n in (0, 1, 257, 5000, 20000):
            data = bytes(rng.randrange(alphabet) for _ in range(n))
            assert _lzw_gif_decode(_lzw_gif_encode(data, mcs), mcs, n) == data


def test_animated_round_trip_exact_pixels():
    rng = np.random.RandomState(7)
    frames = [rng.randint(0, 5, (17, 23)).astype(np.uint8) for _ in range(3)]
    gif = build_gif(frames, _PAL, delays=[10, 20, 30])
    w, h, rgb, delays = decode_gif(gif)
    assert (w, h) == (23, 17) and delays == [10, 20, 30]
    for idx, out in zip(frames, rgb):
        assert np.array_equal(out, _PAL[idx])


def test_interlaced_frame_decodes_identically():
    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 5, (16, 9)).astype(np.uint8)]
    plain = decode_gif(build_gif(frames, _PAL))[2][0]
    inter = decode_gif(build_gif(frames, _PAL, interlace_first=True))[2][0]
    assert np.array_equal(plain, inter)


def test_transparency_and_disposal_composite():
    import struct

    # hand-build: frame 1 full red; frame 2 a 1x1 transparent pixel
    # with disposal 1 -> second composed frame must still show red
    base = build_gif([np.ones((4, 4), dtype=np.uint8)], _PAL)
    body = bytearray(base[:-1])  # drop trailer
    # GCE with transparency on index 0
    body += bytes([0x21, 0xF9, 4, 0x05]) + struct.pack("<H", 0) + bytes([0, 0])
    lzw = _lzw_gif_encode(bytes([0]), 2)
    body += bytes([0x2C]) + struct.pack("<HHHH", 1, 1, 1, 1) + bytes([0x00, 2])
    body += bytes([len(lzw)]) + lzw + b"\x00\x3B"
    w, h, frames, _ = decode_gif(bytes(body))
    assert len(frames) == 2
    assert np.array_equal(frames[1], frames[0])  # transparent px changed nothing


def test_disposal_restore_to_previous():
    import struct

    # frame 1 full index-1; frame 2 draws index 2 at (0,0) with
    # disposal 3 (restore-to-previous); frame 3 draws index 3 at (1,1).
    # After frame 2 is composited the canvas must revert, so frame 3
    # shows index 1 at (0,0) again — not frame 2's leftover pixel.
    base = build_gif([np.ones((4, 4), dtype=np.uint8)], _PAL)
    body = bytearray(base[:-1])  # drop trailer
    body += bytes([0x21, 0xF9, 4, 3 << 2]) + struct.pack("<H", 0) + bytes([0, 0])
    lzw2 = _lzw_gif_encode(bytes([2]), 2)
    body += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, 1, 1) + bytes([0x00, 2])
    body += bytes([len(lzw2)]) + lzw2 + b"\x00"
    lzw3 = _lzw_gif_encode(bytes([3]), 2)
    body += bytes([0x2C]) + struct.pack("<HHHH", 1, 1, 1, 1) + bytes([0x00, 2])
    body += bytes([len(lzw3)]) + lzw3 + b"\x00\x3B"
    _, _, frames, _ = decode_gif(bytes(body))
    assert len(frames) == 3
    assert np.array_equal(frames[1][0, 0], _PAL[2])
    assert np.array_equal(frames[2][0, 0], _PAL[1])  # restored
    assert np.array_equal(frames[2][1, 1], _PAL[3])


def test_rejections():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG not gif")
    with pytest.raises(ValueError, match="no image frames"):
        decode_gif(b"GIF89a" + b"\x04\x00\x04\x00\x00\x00\x00" + b"\x3B")


def test_fuzz_no_hangs_no_foreign_exceptions():
    import random

    rng = random.Random(5)
    frames = [np.tile(np.arange(5, dtype=np.uint8), (10, 4))[:, :17]]
    gif = build_gif(frames, _PAL)
    for _ in range(200):
        b = bytearray(gif)
        for _ in range(rng.randrange(1, 6)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        if rng.random() < 0.3:
            b = b[: rng.randrange(len(b))]
        try:
            decode_gif(bytes(b))
        except ValueError:
            pass


def test_frame_sample_real_mode_spark(spark):
    from aiotcvectordb_spark.operators.multimodal import frame_sample

    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 5, (8, 8)).astype(np.uint8) for _ in range(5)]
    gif = build_gif(frames, _PAL)
    df = spark.createDataFrame(
        [(1, bytearray(gif))], "doc_id long, payload binary"
    )
    rows = frame_sample(df, mode="real", stride=2).collect()
    assert [(r.frame_no, r.frame_off) for r in rows] == [(0, 0), (1, 2), (2, 4)]
    got = np.frombuffer(rows[1].frame, dtype=np.uint8).reshape(8, 8, 3)
    assert np.array_equal(got, _PAL[frames[2]])
    # non-GIF entropy video still honestly rejected
    mp4ish = spark.createDataFrame(
        [(2, bytearray(b"\x00\x00\x00 ftypmp42 fake"))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception, match="NotImplementedError|entropy-coded"):
        frame_sample(mp4ish, mode="real").collect()
