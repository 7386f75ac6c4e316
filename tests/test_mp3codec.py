"""MP3 codec (operators/mp3codec): transform-stage exactness, full
encode→decode round trips with signal-level properties, container
parsing against a real-world file when present, and the
honest-rejection contract for everything outside the implemented
subset (see the module docstring for what that subset is)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from aiotcvectordb_spark.operators import mp3codec as M

_REAL_MP3 = (
    "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"
)


# ---------------------------------------------------------------------------
# transform stages


def test_mdct_overlap_add_is_perfect_reconstruction():
    rng = np.random.default_rng(0)
    x = np.concatenate([np.zeros(18), rng.standard_normal(18 * 40), np.zeros(18)])
    coef = [
        M._MDCT36 @ (x[f * 18 : f * 18 + 36] * M._WIN36)
        for f in range((len(x) - 18) // 18)
    ]
    rec = np.zeros(len(x))
    for f, c in enumerate(coef):
        rec[f * 18 : f * 18 + 36] += (M._IMDCT36 @ c) * M._WIN36
    err = rec[36:-36] - x[36:-36]
    snr = 10 * np.log10(np.sum(x[36:-36] ** 2) / max(np.sum(err**2), 1e-300))
    assert snr > 200, f"MDCT TDAC SNR {snr}"


def test_alias_reduction_butterflies_invert_exactly():
    rng = np.random.default_rng(1)
    xr = rng.standard_normal(576)
    back = M._alias_reduce(M._alias_reduce(xr, inverse=True))
    assert np.allclose(back, xr, atol=1e-12)


def test_polyphase_filterbank_near_pr():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(32 * 300)
    y = M._synthesis_filterbank(M._analysis_filterbank(x))
    d = M._FB_DELAY
    xa, ya = x[: len(x) - d], y[d:]
    g = np.dot(ya, xa) / np.dot(xa, xa)
    assert 0.98 < g < 1.02  # unit gain cascade
    err = ya / g - xa
    core = slice(1024, len(xa) - 1024)
    snr = 10 * np.log10(np.sum(xa[core] ** 2) / np.sum(err[core] ** 2))
    assert snr > 40, f"filterbank SNR {snr} dB"


# ---------------------------------------------------------------------------
# encode → decode round trips


@pytest.mark.parametrize("freq", [440.0, 1000.0, 3000.0])
@pytest.mark.parametrize("fs", [44100, 48000])
def test_round_trip_sine_frequency_and_energy(freq, fs):
    t = np.arange(int(0.3 * fs)) / fs
    x = 0.5 * np.sin(2 * np.pi * freq * t)
    pcm, sr = M.decode_mp3(M.encode_mp3(x, fs, 128))
    assert sr == fs
    # duration: padded to whole frames
    assert len(pcm) >= len(x) and len(pcm) % 1152 == 0
    seg = pcm[4000:16000]
    S = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    f0 = np.argmax(S) * fs / len(seg)
    assert abs(f0 - freq) < 20, f"peak {f0} vs {freq}"
    rms_in = np.sqrt(np.mean(x**2))
    rms_out = np.sqrt(np.mean(pcm[2000 : len(x) - 2000] ** 2))
    assert abs(rms_out - rms_in) / rms_in < 0.25, (rms_in, rms_out)


def test_round_trip_silence():
    pcm, sr = M.decode_mp3(M.encode_mp3(np.zeros(1152 * 3), 44100, 128))
    assert sr == 44100
    assert np.abs(pcm).max() < 1e-6


def test_probe_of_own_stream():
    x = 0.3 * np.sin(2 * np.pi * 700 * np.arange(22050) / 44100)
    mp3 = M.encode_mp3(x, 44100, 160)
    info = M.probe_mp3(mp3)
    assert info["layer"] == 3 and info["sample_rate"] == 44100
    assert info["bitrate_kbps"] == 160 and info["channels"] == 1
    assert not info["vbr"]
    # 22050 samples pad to 20 frames of 1152
    assert info["n_frames"] == 20
    assert abs(info["duration_ms"] - 20 * 1152 * 1000 / 44100) <= 1


# ---------------------------------------------------------------------------
# real-world container parsing


@pytest.mark.skipif(not os.path.exists(_REAL_MP3), reason="no fixture on host")
def test_probe_real_world_file():
    """A real MP3 from the host filesystem (ID3v2 tag + MPEG-2 Layer
    III frames): the container parser must walk every frame and the
    numbers must be self-consistent (frames x samples/frame == duration
    at the parsed sample rate)."""
    data = open(_REAL_MP3, "rb").read()
    info = M.probe_mp3(data)
    assert info["layer"] == 3
    assert info["n_frames"] > 10
    assert info["sample_rate"] in (44100, 48000, 32000, 22050, 24000, 16000)
    expect_ms = info["n_frames"] * 576 * 1000.0 / info["sample_rate"]
    assert abs(info["duration_ms"] - expect_ms) <= 2
    # and the decoder rejects what it cannot faithfully decode
    with pytest.raises(ValueError):
        M.decode_mp3(data)


# ---------------------------------------------------------------------------
# honest rejection


def test_rejects_non_mp3():
    with pytest.raises(ValueError, match="no MPEG audio frame"):
        M.probe_mp3(b"RIFF....WAVEnot an mp3 at all" * 4)


def test_rejects_free_format():
    # craft a single free-format header (bitrate index 0)
    hdr = bytes([0xFF, 0xFB, 0x00 | (0 << 2), 0xC0]) + b"\x00" * 64
    with pytest.raises(ValueError, match="free-format"):
        M.probe_mp3(hdr)


def test_rejects_foreign_huffman_codebook():
    x = 0.4 * np.sin(2 * np.pi * 500 * np.arange(4608) / 44100)
    mp3 = bytearray(M.encode_mp3(x, 44100, 128))
    # side info starts at byte 4; table_select for granule 0 sits at
    # bit offset 9+5+4 + 12+9+8+4+1 = 52 within the side info. Flip the
    # 5-bit field from 1 to 7 (an unimplemented codebook).
    side_bit = 52
    for rel, bit in enumerate([0, 0, 1, 1, 1]):  # value 7
        pos = side_bit + rel
        byte_i = 4 + pos // 8
        mask = 0x80 >> (pos % 8)
        if bit:
            mp3[byte_i] |= mask
        else:
            mp3[byte_i] &= ~mask
    with pytest.raises(ValueError, match="codebook 7 not implemented"):
        M.decode_mp3(bytes(mp3))


def test_rejects_unsupported_bitrate_and_rate():
    with pytest.raises(ValueError, match="sample rate"):
        M.encode_mp3(np.zeros(1152), 22050, 128)
    with pytest.raises(ValueError, match="bitrate"):
        M.encode_mp3(np.zeros(1152), 44100, 123)


def test_round_trip_stereo_independent_channels():
    """Stereo (mode 0, independent channels): each channel must come
    back with ITS OWN frequency and amplitude — cross-talk or channel
    ordering bugs would swap/blend the peaks."""
    fs = 44100
    t = np.arange(int(0.3 * fs)) / fs
    L = 0.5 * np.sin(2 * np.pi * 440 * t)
    R = 0.4 * np.sin(2 * np.pi * 1200 * t)
    pcm, sr = M.decode_mp3(M.encode_mp3(np.stack([L, R], axis=1), fs, 192))
    assert sr == fs and pcm.ndim == 2 and pcm.shape[1] == 2
    for ch, (sig, f_exp) in enumerate([(L, 440.0), (R, 1200.0)]):
        seg = pcm[4000:12000, ch]
        S = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        f0 = np.argmax(S) * fs / len(seg)
        assert abs(f0 - f_exp) < 20
        rms_i = np.sqrt(np.mean(sig**2))
        rms_o = np.sqrt(np.mean(pcm[2000 : len(sig) - 2000, ch] ** 2))
        assert abs(rms_o - rms_i) / rms_i < 0.25


def test_count1_region_round_trips_and_rejects_table_a():
    """r5: trailing quad-aligned nonzero lines are coded as count1
    codebook-B quadruples (the structurally fixed 4-bit complement
    codes). Flipping count1table_select to codebook A must raise — this
    both pins the honest rejection AND proves count1 bits are actually
    present and consumed in our own streams."""
    fs = 44100
    x = 0.5 * np.sin(2 * np.pi * 1000 * np.arange(int(0.2 * fs)) / fs)
    mp3 = M.encode_mp3(x, fs, 128)
    pcm, _ = M.decode_mp3(mp3)
    rms_i = np.sqrt(np.mean(x**2))
    rms_o = np.sqrt(np.mean(pcm[2000 : len(x) - 2000] ** 2))
    assert abs(rms_o - rms_i) / rms_i < 0.25
    b = bytearray(mp3)
    pos = 18 + 58  # granule-0 count1table_select bit (mono side info)
    b[4 + pos // 8] &= ~(0x80 >> (pos % 8))
    with pytest.raises(ValueError, match="count1 codebook A"):
        M.decode_mp3(bytes(b))


def test_scalefactors_preserve_per_band_levels():
    """r5: REAL transmitted scalefactors (slen 4,3) carry per-band
    levels, so a two-tone signal with a 12 dB level difference keeps
    its spectral balance — without them both tones decoded to the same
    magnitude. Also exercises the decoder's nonzero-slen path."""
    fs = 44100
    t = np.arange(int(0.3 * fs)) / fs
    x = 0.5 * np.sin(2 * np.pi * 400 * t) + 0.125 * np.sin(2 * np.pi * 5000 * t)
    pcm, _ = M.decode_mp3(M.encode_mp3(x, fs, 128))
    seg = pcm[4000:20000]
    S = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    f = np.arange(len(S)) * fs / len(seg)
    a_low = S[(f > 350) & (f < 450)].max()
    a_high = S[(f > 4900) & (f < 5100)].max()
    assert 2.5 < a_low / a_high < 6.5, a_low / a_high  # true ratio 4


def test_round_trip_ms_joint_stereo():
    """MS joint stereo (mode 1, mode_extension 2): channels mix to
    M/S spectra on encode and must separate cleanly on decode — each
    channel keeps its own frequency and level. Intensity stereo stays
    honestly rejected (flip the mode_extension intensity bit)."""
    fs = 44100
    t = np.arange(int(0.3 * fs)) / fs
    L = 0.5 * np.sin(2 * np.pi * 440 * t)
    R = 0.4 * np.sin(2 * np.pi * 1200 * t)
    mp3 = M.encode_mp3(np.stack([L, R], axis=1), fs, 192, joint_stereo=True)
    pcm, sr = M.decode_mp3(mp3)
    assert sr == fs and pcm.shape[1] == 2
    for ch, (sig, f_exp) in enumerate([(L, 440.0), (R, 1200.0)]):
        seg = pcm[4000:12000, ch]
        S = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        f0 = np.argmax(S) * fs / len(seg)
        assert abs(f0 - f_exp) < 20
        rms_i = np.sqrt(np.mean(sig**2))
        rms_o = np.sqrt(np.mean(pcm[2000 : len(sig) - 2000, ch] ** 2))
        assert abs(rms_o - rms_i) / rms_i < 0.25
    bad = bytearray(mp3)
    bad[3] |= 1 << 4  # set the intensity bit
    with pytest.raises(ValueError, match="intensity"):
        M.decode_mp3(bytes(bad))


def test_layer1_full_round_trip_high_fidelity():
    """r5: MPEG-1 Layer I decodes FULLY (explicit allocation + the
    closed-form Table B.1 scalefactor table — no Huffman codebook
    dependency). With the fixed 8-bit allocation the round trip is
    transparent down to the filterbank floor (>35 dB SNR)."""
    fs = 44100
    t = np.arange(int(0.3 * fs)) / fs
    x = 0.5 * np.sin(2 * np.pi * 1000 * t) + 0.125 * np.sin(2 * np.pi * 5000 * t)
    mp1 = M.encode_mp1(x, fs, 448)
    info = M.probe_mp3(mp1)
    assert info["layer"] == 1 and info["sample_rate"] == fs
    pcm, sr = M.decode_mpeg_audio(mp1)
    assert sr == fs
    d = M._FB_DELAY
    xa, ya = x[: len(x) - d], pcm[d:]
    g = np.dot(ya[: len(xa)], xa) / np.dot(xa, xa)
    assert 0.98 < g < 1.02
    err = ya[: len(xa)] / g - xa
    core = slice(2000, len(xa) - 2000)
    snr = 10 * np.log10(np.sum(xa[core] ** 2) / np.sum(err[core] ** 2))
    assert snr > 35, f"Layer I SNR {snr} dB"


def test_layer1_rejects_forbidden_codes():
    mp1 = bytearray(M.encode_mp1(np.zeros(384), 44100, 448))
    mp1[4] |= 0xF0  # first allocation nibble -> forbidden code 15
    with pytest.raises(ValueError, match="allocation code 15"):
        M.decode_mpeg_audio(bytes(mp1))


def test_layer2_honestly_rejected():
    # craft a Layer II header (layer bits 10)
    hdr = bytes([0xFF, 0xE0 | (3 << 3) | (2 << 1) | 1, (2 << 4) | (0 << 2), 0xC0])
    frame = hdr + b"\x00" * 412
    with pytest.raises(ValueError, match="Layer II"):
        M.decode_mpeg_audio(frame)


# ---------------------------------------------------------------------------
# r6: Xing/Info/VBRI VBR headers


def _mk_frame(payload: bytes = b"") -> bytes:
    """Valid MPEG-1 Layer III stereo frame, 128 kbps @ 44100 (417
    bytes), zero-filled beyond the given payload."""
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])  # v1 L3 128k 44100 stereo
    body = payload + b"\x00" * (417 - 4 - len(payload))
    return hdr + body[: 417 - 4]


def test_xing_header_parsed():
    import struct as _s

    from aiotcvectordb_spark.operators.mp3codec import probe_mp3

    # stereo MPEG-1 Layer III: Xing sits 32 bytes of side info past the
    # 4-byte header (no CRC)
    xing = b"\x00" * 32 + b"Xing" + _s.pack(">I", 0x3) + _s.pack(">II", 250, 104250)
    data = _mk_frame(xing) + _mk_frame() * 3
    info = probe_mp3(data)
    assert info["vbr"] is True  # Xing (not Info) declares VBR
    assert info["vbr_header"]["kind"] == "Xing"
    assert info["vbr_header"]["frames"] == 250
    assert info["vbr_header"]["bytes"] == 104250
    # 250 frames * 1152 samples / 44100 Hz = 6531 ms
    assert info["declared_duration_ms"] == 6531
    assert info["n_frames"] == 4  # the walked count is unchanged


def test_info_header_is_cbr():
    import struct as _s

    from aiotcvectordb_spark.operators.mp3codec import probe_mp3

    tag = b"\x00" * 32 + b"Info" + _s.pack(">I", 0x1) + _s.pack(">I", 100)
    info = probe_mp3(_mk_frame(tag) + _mk_frame())
    assert info["vbr"] is False  # Info = CBR encode with a LAME tag
    assert info["vbr_header"]["kind"] == "Info"
    assert info["declared_duration_ms"] is not None


def test_vbri_header_parsed():
    import struct as _s

    from aiotcvectordb_spark.operators.mp3codec import probe_mp3

    # VBRI: fixed 32 bytes after the header
    vbri = (
        b"\x00" * 32
        + b"VBRI"
        + _s.pack(">H", 1)      # version
        + _s.pack(">H", 0)      # delay
        + _s.pack(">H", 80)     # quality
        + _s.pack(">I", 204800) # bytes
        + _s.pack(">I", 512)    # frames
        + _s.pack(">H", 0)      # toc entries
        + _s.pack(">H", 1) + _s.pack(">H", 2) + _s.pack(">H", 4)
    )
    info = probe_mp3(_mk_frame(vbri) + _mk_frame())
    assert info["vbr"] is True
    assert info["vbr_header"]["kind"] == "VBRI"
    assert info["vbr_header"]["frames"] == 512
    assert info["vbr_header"]["bytes"] == 204800
    assert info["declared_duration_ms"] == int(round(512 * 1152 * 1000 / 44100))


def test_no_vbr_header_is_none():
    from aiotcvectordb_spark.operators.mp3codec import probe_mp3

    info = probe_mp3(_mk_frame() * 3)
    assert info["vbr_header"] is None
    assert info["declared_duration_ms"] is None
    assert info["vbr"] is False


# ---------------------------------------------------------------------------
# r6: ID3 tag metadata


def _id3v2(frames: dict[bytes, bytes], ver: int = 3) -> bytes:
    body = b""
    for fid, payload in frames.items():
        if ver >= 4:
            sz = bytes(
                [(len(payload) >> s) & 0x7F for s in (21, 14, 7, 0)]
            )
        else:
            sz = len(payload).to_bytes(4, "big")
        body += fid + sz + b"\x00\x00" + payload
    size = len(body)
    ss = bytes([(size >> s) & 0x7F for s in (21, 14, 7, 0)])
    return b"ID3" + bytes([ver, 0, 0]) + ss + body


def test_id3v2_text_frames():
    from aiotcvectordb_spark.operators.mp3codec import mp3_tags, probe_mp3

    tag = _id3v2({
        b"TIT2": b"\x00My Song",
        b"TPE1": b"\x01" + "Artist 名".encode("utf-16"),  # BOM-led
        b"TALB": b"\x03" + "Album ütf8".encode("utf-8"),
    })
    data = tag + _mk_frame() * 2
    tags = mp3_tags(data)
    assert tags == {"title": "My Song", "artist": "Artist 名", "album": "Album ütf8"}
    probe_mp3(data)  # tag skip still works for the frame walk


def test_id3v24_syncsafe_sizes():
    from aiotcvectordb_spark.operators.mp3codec import mp3_tags

    tag = _id3v2({b"TIT2": b"\x00" + b"x" * 200}, ver=4)
    assert mp3_tags(tag + _mk_frame())["title"] == "x" * 200


def test_id3v1_fallback():
    from aiotcvectordb_spark.operators.mp3codec import mp3_tags

    v1 = b"TAG" + b"Old Title".ljust(30, b"\x00") + b"Old Artist".ljust(30, b"\x00") \
        + b"Old Album".ljust(30, b"\x00") + b"\x00" * 35
    data = _mk_frame() * 2 + v1
    assert mp3_tags(data) == {
        "title": "Old Title", "artist": "Old Artist", "album": "Old Album",
    }
    assert mp3_tags(_mk_frame()) == {"title": None, "artist": None, "album": None}


def test_mp3_meta_matches_full_probe_and_flags_malformed(spark):
    """The header-only metadata route must agree with the full
    decode's container fields on real mixed Layer I/III streams, and
    flag (not fail) malformed payloads with a NULL row."""
    from aiotcvectordb_spark.operators import mp3codec as M3

    docs = spark.createDataFrame(
        [(i, f"meta doc {i} " * (i + 1)) for i in range(6)],
        "doc_id long, text string",
    )
    mp3 = M3.with_mp3_payload(docs, mix_layer1=True)
    meta = {r.doc_id: r for r in M3.mp3_meta(mp3).collect()}
    full = {r.doc_id: r for r in M3.mp3_features(mp3).collect()}
    assert set(meta) == set(full) == set(range(6))
    for i in range(6):
        assert meta[i].layer == (1 if i % 2 else 3)
        for f in ("n_frames", "sample_rate", "bitrate_kbps", "duration_ms"):
            assert getattr(meta[i], f) == getattr(full[i], f), (i, f)

    bad = spark.createDataFrame(
        [(99, bytearray(b"not an mpeg stream"))], "doc_id long, payload binary"
    )
    (row,) = M3.mp3_meta(bad).collect()
    assert row.doc_id == 99 and row.layer is None and row.n_frames is None


def test_vary_geometry_rotates_frame_counts(spark):
    """vary_geometry must give each doc its own frame count —
    1 + id % 5 Layer III frames on even ids, 2 + id % 9 Layer I frames
    on odd — so metadata oracles recompute geometry instead of
    selecting fixture-wide constants (r12 witness upgrade)."""
    from aiotcvectordb_spark.operators import mp3codec as M3

    docs = spark.createDataFrame(
        [(i, f"geom {i} " * (i + 2)) for i in range(10)],
        "doc_id long, text string",
    )
    mp3 = M3.with_mp3_payload(docs, mix_layer1=True, vary_geometry=True)
    meta = {r.doc_id: r for r in M3.mp3_meta(mp3).collect()}
    for i in range(10):
        if i % 2:
            assert meta[i].layer == 1
            assert meta[i].n_frames == 2 + i % 9
            exp = round(384 * (2 + i % 9) * 1000.0 / 44100)
        else:
            assert meta[i].layer == 3
            assert meta[i].n_frames == 1 + i % 5
            exp = round(1152 * (1 + i % 5) * 1000.0 / 44100)
        assert meta[i].duration_ms == exp, i
