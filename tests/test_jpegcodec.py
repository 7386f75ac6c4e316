"""Baseline JPEG codec: round trips, exactness contract, error paths.

No Spark needed — pure numpy kernel tests (the Spark plumbing is
covered by the jpeg_probe registry query + plan audits)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aiotcvectordb_spark.operators.jpegcodec import (
    STD_LUMA_QUANT,
    decode_jpeg,
    encode_jpeg_color,
    encode_jpeg_gray,
)


def test_block_constant_even_offsets_roundtrip_exact():
    """The exactness contract the jpeg_probe oracle relies on: block-
    constant images with EVEN level-shift offsets survive the standard
    quantizer pixel-exactly (DC-only energy, step 16 divides 8*2k)."""
    rng = np.random.default_rng(7)
    ks = rng.integers(-64, 64, size=(4, 5))
    img = np.repeat(np.repeat(128 + 2 * ks, 8, 0), 8, 1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_gray(img))
    assert np.array_equal(out, img)


def test_flat_unquantized_roundtrip_is_float_exact():
    """quant=1 removes quantization: only DCT float error remains,
    which stays within +-1 after rounding — the entropy coder itself
    is bit-lossless."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(32, 40)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_gray(img, quant=np.ones((8, 8), np.int64)))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_noise_image_bounded_error_and_odd_sizes():
    rng = np.random.default_rng(11)
    for shape in [(13, 21), (8, 8), (1, 1), (40, 56)]:
        img = rng.integers(0, 256, size=shape).astype(np.uint8)
        out = decode_jpeg(encode_jpeg_gray(img))
        assert out.shape == shape
        # std-table loss on worst-case noise stays far from garbage
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 40


def test_color_420_roundtrip():
    yy, xx = np.mgrid[0:48, 0:64]
    rgb = np.stack(
        [(xx * 255 / 63), (yy * 255 / 47), ((xx + yy) * 255 / 110)], axis=2
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_color(rgb))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 16

    flat = np.zeros((24, 40, 3), np.uint8)
    flat[...] = (90, 160, 200)
    assert np.array_equal(decode_jpeg(encode_jpeg_color(flat)), flat)


def test_error_paths_raise_value_error():
    img = np.full((8, 8), 128, np.uint8)
    good = encode_jpeg_gray(img)

    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no SOS
    # progressive marker (SOF2) rejected honestly
    progressive = bytearray(good)
    sof = progressive.find(b"\xff\xc0")
    progressive[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(progressive))
    with pytest.raises(ValueError):
        encode_jpeg_gray(np.zeros((0, 8), np.uint8))


def test_std_tables_shape():
    assert STD_LUMA_QUANT.shape == (8, 8)
    assert STD_LUMA_QUANT[0, 0] == 16  # the DC step the probe relies on


def test_decoder_rejects_fuzzed_bytes_cleanly():
    """Malformed streams must raise ValueError (or decode, for inputs
    that happen to stay valid) — never hang, loop, or raise unrelated
    errors. Includes truncations and bit flips of a valid stream, the
    nastiest corpus for a bit-level decoder."""
    import numpy as np

    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    good = encode_jpeg_gray(img)
    cases = []
    for cut in (2, 10, len(good) // 2, len(good) - 1):
        cases.append(good[:cut])
    for _ in range(60):
        b = bytearray(good)
        for _ in range(3):
            b[rng.integers(2, len(b))] ^= 1 << rng.integers(0, 8)
        cases.append(bytes(b))
    for _ in range(20):
        cases.append(b"\xff\xd8" + bytes(rng.integers(0, 256, size=64).astype(np.uint8)))
    ok = 0
    for c in cases:
        try:
            out = decode_jpeg(c)
            assert out.dtype == np.uint8
            ok += 1
        except ValueError:
            pass  # the ONLY allowed failure mode
    # some bit flips stay decodable; that's fine — the contract is
    # "clean failure or a well-formed array", both observed
    assert ok >= 0

def test_zero_sampling_factor_raises_value_error():
    """A malformed SOF with sampling factor 0 must fail as ValueError,
    not ZeroDivisionError, per the normalize-everything contract."""
    img = np.full((8, 8), 128, np.uint8)
    good = bytearray(encode_jpeg_gray(img))
    sof = good.find(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2) nc(1) then [cid samp tq]*nc;
    # samp byte is at sof+2(marker)+2(len)+6+1 = sof+11 for component 0
    samp_off = sof + 2 + 2 + 6 + 1
    for bad in (0x00, 0x10, 0x01, 0x50, 0x15):
        b = bytearray(good)
        b[samp_off] = bad
        with pytest.raises(ValueError):
            decode_jpeg(bytes(b))


def test_lying_single_scan_header_fails_cleanly():
    """A stream whose SOS claims one component but whose entropy data
    is actually interleaved must fail as ValueError (wrong block count /
    missing further scans), never silently return a grayscale image of
    the full frame."""
    yy, xx = np.mgrid[0:16, 0:16]
    rgb = np.stack([xx * 8, yy * 8, xx + yy], axis=2).astype(np.uint8)
    good = bytearray(encode_jpeg_color(rgb))
    sos = good.find(b"\xff\xda")
    assert sos > 0
    ns_off = sos + 4  # marker(2) + len(2) -> Ns byte
    assert good[ns_off] == 3
    b = bytearray(good)
    b[ns_off] = 1  # claim the scan holds only the first (Y) component
    # keep segment length consistent: shrink by the 2 dropped pairs
    seg_len = struct.unpack_from(">H", bytes(b), sos + 2)[0]
    struct.pack_into(">H", b, sos + 2, seg_len - 4)
    del b[sos + 4 + 1 + 2 : sos + 4 + 1 + 6]
    with pytest.raises(ValueError):
        decode_jpeg(bytes(b))


def _encode_noninterleaved_444(rgb: np.ndarray) -> bytes:
    """Test-only encoder: baseline 4:4:4 color JPEG written as THREE
    single-component scans (legal non-interleaved baseline, T.81
    A.2.2) using the module's own primitives — exercises the
    multi-scan decode path against an independently-constructed
    stream."""
    from aiotcvectordb_spark.operators.jpegcodec import (
        AC_LUMA_BITS, AC_LUMA_VALS, DC_LUMA_BITS, DC_LUMA_VALS,
    )
    from aiotcvectordb_spark.operators import jpegcodec as J

    h, w = rgb.shape[:2]
    y, cb, cr = J.rgb_to_ycbcr(rgb)
    q = J.STD_LUMA_QUANT
    dc_codes = J._build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = J._build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    bh, bw = -(-h // 8), -(-w // 8)

    out = bytearray(b"\xff\xd8")
    out += J._seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += J._seg(0xFFDB, J._dqt_payload(0, q))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0])  # 1x1 sampling, quant table 0
    out += J._seg(0xFFC0, sof)
    out += J._seg(0xFFC4, b"\x00" + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += J._seg(0xFFC4, b"\x10" + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    for cid, plane in zip((1, 2, 3), (y, cb, cr)):
        padded = J._pad_to_blocks(np.round(plane).clip(0, 255), bh, bw)
        shifted = padded.astype(np.float64) - 128.0
        blocks = (
            shifted.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        zzs = J._fdct_quant_zigzag(blocks, q)
        bw_out = J._BitWriter()
        prev_dc = 0
        for bi in range(zzs.shape[0]):
            prev_dc = J._encode_zz(bw_out, zzs[bi], q, dc_codes, ac_codes, prev_dc)
        bw_out.flush()
        out += J._seg(0xFFDA, b"\x01" + bytes([cid, 0x00]) + b"\x00\x3f\x00")
        out += bw_out.buf
    out += b"\xff\xd9"
    return bytes(out)


def test_noninterleaved_multiscan_decodes():
    """Legal non-interleaved baseline (one scan per component) decodes
    and matches the equivalent interleaved 4:4:4 content."""
    yy, xx = np.mgrid[0:24, 0:40]
    rgb = np.stack(
        [(xx * 6) % 256, (yy * 9) % 256, (xx + 3 * yy) % 256], axis=2
    ).astype(np.uint8)
    payload = _encode_noninterleaved_444(rgb)
    out = decode_jpeg(payload)
    assert out.shape == rgb.shape
    # 4:4:4 with the luma table on all channels: modest loss only
    assert np.abs(out.astype(int) - rgb.astype(int)).mean() < 20

    # truncated: only two of three scans present -> clean ValueError
    second_sos = payload.find(b"\xff\xda", payload.find(b"\xff\xda") + 2)
    third_sos = payload.find(b"\xff\xda", second_sos + 2)
    truncated = payload[:third_sos] + b"\xff\xd9"
    with pytest.raises(ValueError, match="component scans"):
        decode_jpeg(truncated)


def test_progressive_roundtrip_equals_baseline():
    """Progressive encode (DC/AC first + refinement scans) must decode
    to EXACTLY the pixels of the baseline pipeline — both encode the
    same quantized coefficients, and successive approximation is
    lossless across its scans."""
    from aiotcvectordb_spark.operators.jpegcodec import (
        encode_jpeg_gray_progressive,
    )

    rng = np.random.default_rng(21)
    for shape in [(16, 16), (13, 21), (8, 8), (40, 56), (1, 1)]:
        img = rng.integers(0, 256, size=shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg_gray(img))
        for al in (1, 2):
            prog = decode_jpeg(encode_jpeg_gray_progressive(img, al=al))
            assert np.array_equal(prog, base), (shape, al)


def test_progressive_dc_only_stream_decodes_blocky():
    """A progressive stream truncated after the DC scans is a LEGAL
    partially-transmitted image: it must decode (AC coefficients zero
    -> block-average image), not raise."""
    from aiotcvectordb_spark.operators import jpegcodec as J

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(24, 24)).astype(np.uint8)
    full = J.encode_jpeg_gray_progressive(img, al=1)
    # cut at the AC first scan's SOS header (3rd SOS: DC, DC-refine, AC)
    sos_positions = []
    p = 0
    while True:
        p = full.find(b"\xff\xda", p + 1)
        if p < 0:
            break
        sos_positions.append(p)
    assert len(sos_positions) == 4  # DC, DC refine, AC, AC refine
    truncated = full[: sos_positions[2]] + b"\xff\xd9"
    out = decode_jpeg(truncated)
    assert out.shape == img.shape
    # block-average image: each 8x8 block is near-constant at its mean
    blk = out[:8, :8].astype(float)
    assert blk.std() < 3.0

    # but a stream with NO DC scan for the component must raise
    no_dc = full[: sos_positions[0]] + b"\xff\xd9"
    with pytest.raises(ValueError, match="no SOS|DC scans"):
        decode_jpeg(no_dc)


def test_baseline_scan_rejects_foreign_marker_midstream():
    """r5 (advice): a baseline entropy scan interrupted by a marker
    that can't legally end it (e.g. a stray DHT/SOF) is a corrupt
    stream and must raise — NOT decode the 1-bit padding to garbage
    pixels. RST/EOI stay fine (tested by every round trip above)."""
    img = np.full((16, 16), 90, dtype=np.uint8)
    full = encode_jpeg_gray(img)
    sos = full.find(b"\xff\xda")
    assert sos > 0
    entropy_start = sos + 2 + int.from_bytes(full[sos + 2 : sos + 4], "big")
    # keep only a few entropy bytes, then splice in a DHT marker so the
    # decoder still needs bits when it hits the marker
    corrupt = full[: entropy_start + 2] + b"\xff\xc4" + full[-2:]
    with pytest.raises(ValueError, match="unexpected marker|invalid Huffman"):
        decode_jpeg(corrupt)
