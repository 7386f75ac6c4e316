"""MPEG-1 Audio Layer III (MP3) codec — honest subset (r5).

Reference parity target: the upstream system treats audio as opaque
binary payloads with typed metadata (reference model/document.py binary
fields; upload path collection_view.py:342-423); this engine decodes
them engine-side like the WAV/ADPCM and JPEG/PNG codecs. Public spec:
ISO/IEC 11172-3.

What is REAL and spec-faithful here:

- **Container/frame parsing for arbitrary MP3 files**: ID3v2 skip,
  frame sync, MPEG-1/2/2.5 + Layer I/II/III header fields, bitrate /
  sample-rate / mode tables, frame length arithmetic, CRC flag,
  duration accounting. ``probe_mp3`` returns (n_frames, sample_rate,
  bitrate_kbps, channels, duration_ms, layer, vbr) for ANY real MP3 —
  validated in tests against a real-world file when one is present.
- **Layer III side information**: main_data_begin / scfsi /
  part2_3_length / big_values / global_gain / scalefac_compress /
  window switching / table_select / region counts / preflag /
  scalefac_scale / count1table_select — full MPEG-1 mono+stereo parse.
- **Bit reservoir** assembly (main_data_begin back-pointer).
- **Scalefactor decode** (slen1/slen2 per Table B.8, scfsi groups).
- **Requantization** (global_gain, scalefac_scale, pretab,
  |ix|^(4/3)), **alias reduction** (Table B.9 eight butterflies),
  **IMDCT-36 with sine window + overlap-add + frequency inversion**,
  and the **32-band polyphase synthesis** structure.

The honest limits (each raises ValueError, never silent garbage):

- **Huffman codebooks**: ISO Table B.7 defines 32 big-value codebooks
  plus two count1 codebooks — hundreds of individual (code, length)
  pairs. Only codebooks 0 and 1 (and the count1 pattern used by this
  module's encoder) are implemented; frames selecting any other
  codebook are rejected. This is the gap between "decodes this
  module's streams bit-exactly" and "decodes every MP3 on disk".
- **Synthesis prototype**: the 512-tap window of Table B.3 is a
  numeric table with no closed form; a Kaiser-windowed near-PR PQMF
  prototype is used instead. The filterbank *structure* is the spec's;
  reconstruction is near-perfect for this codec pair (asserted ~40 dB
  SNR in tests) but not bit-identical to reference decoders.
- Free-format bitrate (index 0) and ABR/VBR streams are parse-only
  (``probe_mp3`` flags vbr); ``decode_mp3`` rejects free-format.

The encoder (``encode_mp3``) produces VALID Layer III streams within
the implemented subset: long blocks, codebook 1 (quantized lines in
{-1, 0, +1} with amplitude carried by global_gain — a real MDCT
analysis, not a fake), empty count1 region, no bit reservoir. The
encode→decode round trip exercises every decode stage above.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "probe_mp3", "decode_mp3", "encode_mp3", "encode_mp1",
    "decode_mpeg_audio",
]

# ---------------------------------------------------------------------------
# header tables (ISO 11172-3 §2.4.2.3)

_BITRATE_KBPS = {
    # (version_key, layer) -> 15-entry table, index 0 = free format
    ("1", 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("1", 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("1", 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("2", 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    ("2", 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLE_RATE = {
    "1": [44100, 48000, 32000],
    "2": [22050, 24000, 16000],
    "2.5": [11025, 12000, 8000],
}
# samples per frame per (version, layer)
_SPF = {("1", 1): 384, ("1", 2): 1152, ("1", 3): 1152,
        ("2", 1): 384, ("2", 2): 1152, ("2", 3): 576}

# scalefactor band boundaries, long blocks, MPEG-1 (Table B.8)
_SFB_LONG = {
    44100: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576],
    48000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576],
    32000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576],
}
_PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0]
_SLEN = [(0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
         (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3)]

# alias-reduction coefficients (Table B.9)
_ALIAS_C = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041,
                     -0.0142, -0.0037])
_ALIAS_CS = 1.0 / np.sqrt(1.0 + _ALIAS_C**2)
_ALIAS_CA = _ALIAS_C / np.sqrt(1.0 + _ALIAS_C**2)

# Huffman codebook 1 (Table B.7): (x, y) -> code bits. The only
# big-value codebook implemented (see module docstring).
_HUFF1_ENC = {(0, 0): "1", (0, 1): "001", (1, 0): "01", (1, 1): "000"}
_HUFF1_DEC = {v: k for k, v in _HUFF1_ENC.items()}


# ---------------------------------------------------------------------------
# bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_str(self, s: str) -> None:
        self.bits.extend(1 if c == "1" else 0 for c in s)

    def tell(self) -> int:
        return len(self.bits)

    def to_bytes(self) -> bytes:
        # r13: np.packbits is the same MSB-first zero-padded packing
        # the per-byte loop spelled
        if not self.bits:
            return b""
        return np.packbits(
            np.asarray(self.bits, dtype=np.uint8)
        ).tobytes()


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        # r12: bulk MSB-first extraction — one int.from_bytes over the
        # covered byte span instead of n per-bit Python iterations.
        # Same values, same truncation trigger: the per-bit loop raised
        # iff some needed bit's byte index reached len(data), i.e. iff
        # pos + n > 8 * len(data).
        if n <= 0:
            return 0
        pos = self.pos
        end = pos + n
        data = self.data
        if end > len(data) * 8:
            raise ValueError(
                "truncated MP3 frame: bit reader ran off the payload"
            )
        lo = pos >> 3
        hi = (end + 7) >> 3
        v = int.from_bytes(data[lo:hi], "big") >> (hi * 8 - end)
        self.pos = end
        return v & ((1 << n) - 1)

    def read_bit(self) -> int:
        return self.read(1)


# ---------------------------------------------------------------------------
# frame/container parsing (works on arbitrary real MP3s)


def _skip_id3(data: bytes) -> int:
    if data[:3] == b"ID3" and len(data) >= 10:
        size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | \
               ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        return 10 + size
    return 0


_ID3V2_TEXT = {b"TIT2": "title", b"TPE1": "artist", b"TALB": "album"}


def _id3_text(enc: int, raw: bytes) -> str:
    if enc == 0:
        s = raw.decode("latin-1", "replace")
    elif enc == 1:
        s = raw.decode("utf-16", "replace")  # BOM-led
    elif enc == 2:
        s = raw.decode("utf-16-be", "replace")
    else:
        s = raw.decode("utf-8", "replace")
    return s.split("\x00")[0].strip()


def mp3_tags(data: bytes) -> dict:
    """Title/artist/album metadata from ID3v2.3/2.4 text frames
    (TIT2/TPE1/TALB; latin-1 / UTF-16(+BOM) / UTF-16BE / UTF-8
    encodings) with ID3v1 (the trailing 128-byte TAG block) as the
    fallback — the same stored-metadata story as the Office OLEPS
    titles (r6). Absent fields are None; no tag at all returns all
    None."""
    out: dict[str, str | None] = {"title": None, "artist": None, "album": None}
    if data[:3] == b"ID3" and len(data) >= 10:
        ver = data[3]
        size = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | \
               ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        i, end = 10, min(10 + size, len(data))
        while i + 10 <= end:
            fid = data[i : i + 4]
            if not fid.strip(b"\x00"):
                break  # padding
            if ver >= 4:  # v2.4: syncsafe frame sizes
                fsz = ((data[i + 4] & 0x7F) << 21) | ((data[i + 5] & 0x7F) << 14) \
                    | ((data[i + 6] & 0x7F) << 7) | (data[i + 7] & 0x7F)
            else:
                fsz = int.from_bytes(data[i + 4 : i + 8], "big")
            body = data[i + 10 : i + 10 + fsz]
            i += 10 + fsz
            key = _ID3V2_TEXT.get(fid)
            if key and body:
                out[key] = _id3_text(body[0], body[1:]) or None
    if all(v is None for v in out.values()) and len(data) >= 128:
        tail = data[-128:]
        if tail[:3] == b"TAG":
            for key, lo in (("title", 3), ("artist", 33), ("album", 63)):
                s = tail[lo : lo + 30].split(b"\x00")[0].decode(
                    "latin-1", "replace"
                ).strip()
                out[key] = s or None
    return out


def _parse_header(data: bytes, i: int) -> dict | None:
    if i + 4 > len(data):
        return None
    b0, b1, b2, b3 = data[i : i + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    ver_bits = (b1 >> 3) & 0x3
    version = {0: "2.5", 2: "2", 3: "1"}.get(ver_bits)
    layer = {1: 3, 2: 2, 3: 1}.get((b1 >> 1) & 0x3)
    if version is None or layer is None:
        return None
    crc = not (b1 & 0x1)
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    if br_idx == 15 or sr_idx == 3:
        return None
    vkey = "2" if version == "2.5" else version
    bitrate = _BITRATE_KBPS[(vkey, layer)][br_idx]
    sample_rate = _SAMPLE_RATE[version][sr_idx]
    padding = (b2 >> 1) & 0x1
    mode = (b3 >> 6) & 0x3  # 0 stereo, 1 joint, 2 dual, 3 mono
    mode_ext = (b3 >> 4) & 0x3  # joint: bit1 = MS stereo, bit0 = intensity
    if bitrate == 0:
        frame_len = None  # free format: undeterminable from the header
    elif layer == 1:
        frame_len = (12 * bitrate * 1000 // sample_rate + padding) * 4
    else:
        per = 144 if _SPF[(vkey, layer)] == 1152 else 72
        frame_len = per * bitrate * 1000 // sample_rate + padding
    return {
        "version": version, "layer": layer, "crc": crc,
        "bitrate_kbps": bitrate, "sample_rate": sample_rate,
        "padding": padding, "mode": mode, "mode_ext": mode_ext,
        "channels": 1 if mode == 3 else 2,
        "frame_len": frame_len,
        "samples": _SPF[(vkey, layer)],
    }


def _parse_vbr_header(data: bytes, at: int, h: dict) -> dict | None:
    """Xing/Info/VBRI VBR header in the FIRST frame (r6, public LAME /
    Fraunhofer layouts): declared frame/byte counts give an accurate
    duration for VBR files without walking the whole payload (and for
    truncated streams where the walk under-counts). Returns
    {kind, frames, bytes, quality, toc_present} or None."""
    # Xing/Info: right after the (CRC +) Layer III side info
    if h["layer"] == 3:
        side = (
            (17 if h["channels"] == 1 else 32)
            if h["version"] == "1"
            else (9 if h["channels"] == 1 else 17)
        )
        off = at + 4 + (2 if h["crc"] else 0) + side
        magic = data[off : off + 4]
        if magic in (b"Xing", b"Info"):
            flags = int.from_bytes(data[off + 4 : off + 8], "big")
            p = off + 8
            out = {
                "kind": magic.decode("ascii"),
                "frames": None,
                "bytes": None,
                "quality": None,
                "toc_present": bool(flags & 0x4),
            }
            if flags & 0x1:
                out["frames"] = int.from_bytes(data[p : p + 4], "big")
                p += 4
            if flags & 0x2:
                out["bytes"] = int.from_bytes(data[p : p + 4], "big")
                p += 4
            if flags & 0x4:
                p += 100  # TOC
            if flags & 0x8:
                out["quality"] = int.from_bytes(data[p : p + 4], "big")
            return out
    # VBRI (Fraunhofer): fixed 32 bytes after the 4-byte frame header
    off = at + 36
    if data[off : off + 4] == b"VBRI":
        return {
            "kind": "VBRI",
            "frames": int.from_bytes(data[off + 14 : off + 18], "big"),
            "bytes": int.from_bytes(data[off + 10 : off + 14], "big"),
            "quality": int.from_bytes(data[off + 8 : off + 10], "big"),
            "toc_present": int.from_bytes(data[off + 18 : off + 20], "big") > 0,
        }
    return None


def probe_mp3(data: bytes) -> dict:
    """Parse every frame header of an MP3 payload (any layer/version).
    Returns n_frames, sample_rate, bitrate_kbps (of the first frame),
    channels, duration_ms, layer, vbr (True if bitrate varies), plus
    r6 VBR-header fields: ``vbr_header`` (parsed Xing/Info/VBRI dict
    or None) and ``declared_duration_ms`` (from the header's declared
    frame count — the accurate duration for VBR/truncated payloads;
    None without a header). The walked fields are unchanged."""
    i = _skip_id3(data)
    first = None
    vbr_header = None
    n = 0
    bitrates = set()
    total_samples = 0
    while i + 4 <= len(data):
        h = _parse_header(data, i)
        if h is None:
            if first is None:
                i += 1  # resync until the first valid header
                continue
            break
        if h["frame_len"] is None:
            raise ValueError(
                "free-format MP3 (bitrate index 0): frame length is not "
                "derivable from headers alone — not supported"
            )
        if first is None:
            first = h
            vbr_header = _parse_vbr_header(data, i, h)
        n += 1
        bitrates.add(h["bitrate_kbps"])
        total_samples += h["samples"]
        i += h["frame_len"]
    if first is None:
        raise ValueError("no MPEG audio frame found (not an MP3 payload?)")
    declared_ms = None
    if vbr_header is not None and vbr_header["frames"]:
        # the Xing/VBRI frame itself carries no audio — by convention
        # its declared count covers the audio frames that follow
        declared_ms = int(
            round(
                vbr_header["frames"] * first["samples"] * 1000.0
                / first["sample_rate"]
            )
        )
    return {
        "n_frames": n,
        "sample_rate": first["sample_rate"],
        "bitrate_kbps": first["bitrate_kbps"],
        "channels": first["channels"],
        "duration_ms": int(round(total_samples * 1000.0 / first["sample_rate"])),
        "layer": first["layer"],
        "vbr": len(bitrates) > 1 or (
            vbr_header is not None and vbr_header["kind"] in ("Xing", "VBRI")
        ),
        "vbr_header": vbr_header,
        "declared_duration_ms": declared_ms,
    }


# ---------------------------------------------------------------------------
# Layer III side info (MPEG-1)


def _parse_side_info(br: _BitReader, nch: int) -> dict:
    si: dict = {"main_data_begin": br.read(9)}
    br.read(5 if nch == 1 else 3)  # private bits
    si["scfsi"] = [[br.read_bit() for _ in range(4)] for _ in range(nch)]
    si["gr"] = []
    for _gr in range(2):
        chs = []
        for _ch in range(nch):
            g = {
                "part2_3_length": br.read(12),
                "big_values": br.read(9),
                "global_gain": br.read(8),
                "scalefac_compress": br.read(4),
                "window_switching": br.read_bit(),
            }
            if g["window_switching"]:
                g["block_type"] = br.read(2)
                g["mixed_block"] = br.read_bit()
                g["table_select"] = [br.read(5) for _ in range(2)]
                g["subblock_gain"] = [br.read(3) for _ in range(3)]
                g["region0_count"] = 7 if g["block_type"] != 2 else 8
                g["region1_count"] = 36
            else:
                g["block_type"] = 0
                g["mixed_block"] = 0
                g["table_select"] = [br.read(5) for _ in range(3)]
                g["region0_count"] = br.read(4)
                g["region1_count"] = br.read(3)
            g["preflag"] = br.read_bit()
            g["scalefac_scale"] = br.read_bit()
            g["count1table_select"] = br.read_bit()
            chs.append(g)
        si["gr"].append(chs)
    return si


# ---------------------------------------------------------------------------
# transforms (shared by encoder and decoder — each stage is the exact
# inverse of its counterpart, so the round trip isolates bitstream bugs)

_IMDCT36 = np.array(
    [[np.cos(np.pi / 72.0 * (2 * n + 1 + 18) * (2 * k + 1)) for k in range(18)]
     for n in range(36)]
)
_WIN36 = np.sin(np.pi / 36.0 * (np.arange(36) + 0.5))
# forward MDCT matrix (18 coefficients from 36 windowed samples);
# 4/N scaling makes the sine-windowed OLA pair perfectly reconstructing
# (verified to ~285 dB SNR in tests)
_MDCT36 = _IMDCT36.T * (4.0 / 36.0)

_NBANDS = 32
_PROTO_LEN = 512
_FB_DELAY = 480  # analysis+synthesis cascade delay in samples


def _pqmf_prototype() -> np.ndarray:
    """Near-PR 512-tap PQMF prototype standing in for the Table B.3
    window (see module docstring): square-root-raised-cosine power
    response about the π/64 band edge (so adjacent-band crossovers are
    power-complementary — |H(ω)|² + |H(π/32 − ω)|² = 1), realized by
    frequency sampling + linear-phase truncation. Cascade measured at
    ~42 dB reconstruction SNR on broadband noise in tests."""
    nfft = 8192
    w = np.arange(nfft // 2 + 1) * (2.0 * np.pi / nfft)
    we = np.pi / (2.0 * _NBANDS)
    lo, hi = 0.0, 2.0 * we  # full-rolloff raised cosine (beta = 1)
    P = np.zeros_like(w)
    P[w <= lo] = 1.0
    t = (w > lo) & (w < hi)
    P[t] = 0.5 * (1.0 + np.cos(np.pi * (w[t] - lo) / (hi - lo)))
    A = np.sqrt(P)
    spec = np.concatenate([A, A[-2:0:-1]])
    h = np.roll(np.fft.ifft(spec).real, _PROTO_LEN // 2)[:_PROTO_LEN]
    return h


_PROTO = _pqmf_prototype()


def _fb_matrices() -> tuple[np.ndarray, np.ndarray]:
    """Cosine-modulated PQMF analysis/synthesis filter matrices with
    the classic ±π/4 alternating phase (alias cancellation between
    adjacent bands). The analysis matrix is time-reversed so it applies
    directly to a newest-last FIFO; synthesis carries the ×128 gain so
    the cascade is unit-gain."""
    n = np.arange(_PROTO_LEN)
    k = np.arange(_NBANDS)[:, None]
    phase = (np.pi / _NBANDS) * (k + 0.5) * (n[None, :] - (_PROTO_LEN - 1) / 2.0)
    quad = ((-1.0) ** k) * (np.pi / 4.0)
    F = (_PROTO[None, :] * np.cos(phase + quad))[:, ::-1]
    G = (_PROTO[None, :] * np.cos(phase - quad)) * 128.0
    return F, G


_ANA_F, _SYN_G = _fb_matrices()


def _analysis_filterbank(x: np.ndarray) -> np.ndarray:
    """32-band critically-sampled analysis. Input length must be a
    multiple of 32; returns (n//32, 32) subband slots. Vectorized: all
    sliding 512-windows in ONE strided matmul instead of a per-slot
    Python loop (the slot s window is the 512 samples ending at
    (s+1)*32, zero-history at the start)."""
    nslots = len(x) // _NBANDS
    xp = np.concatenate([np.zeros(_PROTO_LEN - _NBANDS), x])
    W = np.lib.stride_tricks.sliding_window_view(xp, _PROTO_LEN)[::_NBANDS]
    return W[:nslots] @ _ANA_F.T


def _ola(contrib: np.ndarray) -> np.ndarray:
    """Overlap-add (nslots, 512) slot responses at 32-sample hops into
    a (nslots*32 + 512,) signal — 16 vectorized block adds."""
    nslots = contrib.shape[0]
    out = np.zeros((nslots + 16, _NBANDS))
    blocks = contrib.reshape(nslots, 16, _NBANDS)
    for j in range(16):
        out[j : j + nslots] += blocks[:, j, :]
    return out.reshape(-1)


def _synthesis_filterbank(sb: np.ndarray) -> np.ndarray:
    """32-band synthesis by overlap-add of per-slot filter responses
    (one (nslots,32)@(32,512) matmul + vectorized OLA)."""
    nslots = sb.shape[0]
    return _ola(sb @ _SYN_G)[: nslots * _NBANDS]


def _alias_reduce(xr: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Eight butterflies across each of the 31 subband boundaries
    (decoder direction); ``inverse=True`` applies the transpose
    rotation (encoder direction) — the butterflies are orthonormal."""
    x = xr.reshape(32, 18).copy()
    cs, ca = _ALIAS_CS, (-_ALIAS_CA if inverse else _ALIAS_CA)
    # r13: all 31 boundaries at once — butterfly sb writes row sb-1's
    # tail and row sb's head, disjoint from every other boundary's
    # writes, and each read is of pre-loop values (the sequential loop
    # never read a slot an earlier iteration wrote), so the batched
    # form is the same elementwise multiply-adds bit-for-bit.
    lo = x[:-1, 18 - 8 :][:, ::-1].copy()  # (31, 8) tails, mirrored
    hi = x[1:, :8].copy()
    x[:-1, 18 - 8 :] = (cs * lo - ca * hi)[:, ::-1]
    x[1:, :8] = ca * lo + cs * hi
    return x.reshape(576)


# ---------------------------------------------------------------------------
# decoder


def _decode_big_values(br: _BitReader, g: dict, end_bit: int) -> np.ndarray:
    ix = np.zeros(576)
    tables = g["table_select"]
    used = tables[: 2 if g["window_switching"] else 3]
    for t in used:
        if t not in (0, 1):
            raise ValueError(
                f"Huffman codebook {t} not implemented: only ISO Table "
                "B.7 codebooks 0 and 1 are available in this environment "
                "(see mp3codec module docstring)"
            )
    if g["big_values"] and 0 in used and 1 in used:
        # regions mixing codebook 0 (zero-bit, zero-pair) and codebook 1
        # would need the Table B.8 region boundaries to decode correctly;
        # decoding everything with table 1 would silently misalign the
        # spectrum — reject instead (r5 advice, 'never silent garbage')
        raise ValueError(
            "big_values regions mix codebooks 0 and 1: region-boundary "
            "decode needs the ISO scalefactor-band tables, which are not "
            "reproduced in this environment"
        )
    n_lines = min(2 * g["big_values"], 576)
    i = 0
    # r13 (guide §4.2, the r12 bulk-read treatment continued): serve
    # the whole part2_3 region from ONE int.from_bytes window instead
    # of a _BitReader call per bit. Same bits in the same order; the
    # truncation trigger is preserved exactly — a read raises iff it
    # would cross 8*len(data), just like _BitReader.read.
    data = br.data
    total = len(data) * 8
    pos = br.pos
    _lo = pos >> 3
    _hi = min((max(end_bit, pos) + 7) >> 3, len(data))
    win = int.from_bytes(data[_lo:_hi], "big")
    wend = _hi * 8  # absolute bit index one past the window
    trunc_msg = "truncated MP3 frame: bit reader ran off the payload"
    while i < n_lines:
        # all regions use codebook 0/1 here; codebook 0 emits no bits
        # and decodes to zero pairs — treat any region table 0 as zeros
        # only when no bits remain, else decode with table 1
        if pos >= end_bit:
            break
        # codebook 1's four codes hardcoded as a 3-deep bit walk
        # ("1"->(0,0), "01"->(1,0), "001"->(0,1), "000"->(1,1), the
        # _HUFF1_ENC table): same bit consumption and the same error
        # sites as the generic walk (every 3-bit suffix is a valid
        # code, so its len>3 branch was unreachable)
        if pos >= total:
            raise ValueError(trunc_msg)
        if (win >> (wend - pos - 1)) & 1:
            pos += 1
            x, y = 0, 0
        else:
            pos += 1
            if pos >= end_bit:
                raise ValueError("invalid Huffman code in big_values region")
            if pos >= total:
                raise ValueError(trunc_msg)
            if (win >> (wend - pos - 1)) & 1:
                pos += 1
                x, y = 1, 0
            else:
                pos += 1
                if pos >= end_bit:
                    raise ValueError(
                        "invalid Huffman code in big_values region"
                    )
                if pos >= total:
                    raise ValueError(trunc_msg)
                if (win >> (wend - pos - 1)) & 1:
                    pos += 1
                    x, y = 0, 1
                else:
                    pos += 1
                    x, y = 1, 1
        if x and pos < end_bit:
            if pos >= total:
                raise ValueError(trunc_msg)
            if (win >> (wend - pos - 1)) & 1:
                x = -x
            pos += 1
        if y and pos < end_bit:
            if pos >= total:
                raise ValueError(trunc_msg)
            if (win >> (wend - pos - 1)) & 1:
                y = -y
            pos += 1
        ix[i], ix[i + 1] = x, y
        i += 2
    # count1 region (r5): quadruples of {0, ±1} lines after big_values
    # until part2_3_length is exhausted. Table B is the structurally
    # fixed codebook (4-bit one's complement of the magnitude quad);
    # table A's variable-length codes are spec numerics we do not
    # reproduce — honest rejection when bits remain under select=0.
    if pos + 4 <= end_bit and g["count1table_select"] == 0:
        raise ValueError(
            "count1 codebook A not implemented: only the fixed 4-bit "
            "codebook B is available in this environment"
        )
    while pos + 4 <= end_bit and i + 4 <= 576:
        if pos + 4 > total:
            raise ValueError(trunc_msg)
        quad = (~(win >> (wend - pos - 4))) & 0xF
        pos += 4
        for k in range(4):
            v = (quad >> (3 - k)) & 1
            if v and pos < end_bit:
                if pos >= total:
                    raise ValueError(trunc_msg)
                if (win >> (wend - pos - 1)) & 1:
                    v = -v
                pos += 1
            ix[i + k] = v
        i += 4
    br.pos = pos
    return ix


def _decode_scalefactors(br: _BitReader, g: dict) -> np.ndarray:
    s1, s2 = _SLEN[g["scalefac_compress"]]
    sf = np.zeros(22)
    if g["window_switching"] and g["block_type"] == 2:
        raise ValueError(
            "short-block scalefactor decode not implemented (encoder "
            "emits long blocks only)"
        )
    for sfb in range(11):
        sf[sfb] = br.read(s1) if s1 else 0
    for sfb in range(11, 21):
        sf[sfb] = br.read(s2) if s2 else 0
    return sf


def decode_mp3(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a Layer III stream within the implemented subset.
    Returns (float64 PCM in [-1, 1], sample_rate). Raises ValueError
    on: non-Layer-III frames, MPEG-2/2.5, free format, unimplemented
    Huffman codebooks, short/mixed blocks — the honest-rejection
    contract shared by every codec in this package."""
    i = _skip_id3(data)
    pcm_parts: list[np.ndarray] = []
    sample_rate = None
    overlap: dict = {}
    v_state: dict = {}
    while i + 4 <= len(data):
        h = _parse_header(data, i)
        if h is None:
            if sample_rate is None:
                i += 1
                continue
            break
        if h["layer"] != 3 or h["version"] != "1":
            raise ValueError(
                f"only MPEG-1 Layer III decode is implemented "
                f"(got MPEG-{h['version']} Layer {h['layer']})"
            )
        if h["frame_len"] is None:
            raise ValueError("free-format MP3 not supported")
        if h["mode"] == 1 and h["mode_ext"] & 1:
            raise ValueError(
                "intensity-stereo decode not implemented (MS joint "
                "stereo, plain stereo, dual and mono are)"
            )
        ms_stereo = h["mode"] == 1 and bool(h["mode_ext"] & 2)
        nch = h["channels"]
        sample_rate = h["sample_rate"]
        frame = data[i : i + h["frame_len"]]
        body = frame[4 + (2 if h["crc"] else 0) :]
        br = _BitReader(body)
        si = _parse_side_info(br, nch)
        if si["main_data_begin"] != 0:
            raise ValueError(
                "bit-reservoir streams (main_data_begin > 0) not "
                "supported by this decoder subset"
            )
        main = _BitReader(body[(br.pos + 7) // 8 :])
        for gr in range(2):
            # pass 1: entropy-decode + requantize every channel's
            # spectrum (MS stereo mixes channels, so both must exist
            # before any transform)
            xrs = []
            for ch in range(nch):
                g = si["gr"][gr][ch]
                start = main.pos
                end_bit = start + g["part2_3_length"]
                sf = _decode_scalefactors(main, g)
                ix = _decode_big_values(main, g, end_bit)
                main.pos = end_bit  # skip any stuffing to the boundary
                # requantize (long blocks, Table B.8 bands)
                gain = 2.0 ** ((g["global_gain"] - 210.0) / 4.0)
                mult = 0.5 * (1 + g["scalefac_scale"])
                bands = _SFB_LONG[sample_rate]
                scale = np.ones(576)
                for sfb in range(22):
                    s = sf[sfb] if sfb < 21 else 0
                    if g["preflag"]:
                        s += _PRETAB[sfb]
                    scale[bands[sfb] : bands[sfb + 1]] = 2.0 ** (-mult * s)
                xrs.append(
                    np.sign(ix) * np.abs(ix) ** (4.0 / 3.0) * gain * scale
                )
            if ms_stereo and nch == 2:
                m, s_ = xrs
                xrs = [(m + s_) / np.sqrt(2.0), (m - s_) / np.sqrt(2.0)]
            # pass 2: alias reduction + IMDCT + synthesis per channel
            chans = []
            for ch in range(nch):
                xr = _alias_reduce(xrs[ch])
                if ch not in overlap:
                    overlap[ch] = np.zeros((32, 18))
                grid = xr.reshape(32, 18)
                T = (grid @ _IMDCT36.T) * _WIN36[None, :]  # all 32 bands at once
                sb = (T[:, :18] + overlap[ch]).T  # (18 slots, 32 bands)
                overlap[ch] = T[:, 18:]
                sb[1::2, 1::2] *= -1.0  # frequency inversion
                chans.append(_synth_stateful(sb, v_state, f"v{ch}"))
            pcm_parts.append(np.stack(chans, axis=-1) if nch == 2 else chans[0])
        i += h["frame_len"]
    if sample_rate is None:
        raise ValueError("no MPEG audio frame found (not an MP3 payload?)")
    pcm = np.concatenate(pcm_parts) if pcm_parts else np.zeros(0)
    return pcm, sample_rate


def _synth_stateful(sb: np.ndarray, state: dict, key: str) -> np.ndarray:
    """Synthesis filterbank with the overlap-add tail carried across
    granules so frame boundaries are seamless."""
    nslots = sb.shape[0]
    out = _ola(sb @ _SYN_G)
    tail = state.get(key)
    if tail is not None:
        out[: _PROTO_LEN] += tail
    state[key] = out[nslots * _NBANDS :].copy()
    return out[: nslots * _NBANDS]


# ---------------------------------------------------------------------------
# encoder (mono, 44.1/48/32 kHz, long blocks, codebook 1)


_ENC_SCF_COMPRESS = 15  # slen (4, 3): sfb 0-10 get 4-bit, 11-20 3-bit


def _encode_granule(
    xr: np.ndarray, max_gr_bits: int, bands: list[int]
) -> tuple[_BitWriter, dict]:
    """Quantize one granule's 576 spectral lines to {-1, 0, +1} per
    scalefactor band (global amplitude in global_gain, per-band level
    in REAL transmitted scalefactors — r5: without them every band
    decoded to the same magnitude and multi-tone signals lost their
    relative levels) and Huffman-code: codebook 1 for the big_values
    region, the trailing quad-aligned nonzero chunk (up to 6 quads) as
    count1 codebook-B quadruples. Trims highest-frequency-first to the
    bit budget."""
    amp = np.abs(xr).max()
    sf = np.zeros(21, dtype=np.int64)
    if amp <= 1e-12:
        gg = 0
        ix = np.zeros(576, dtype=np.int64)
    else:
        gg = int(np.clip(round(210 + 4 * np.log2(amp)), 0, 255))
        gain = 2.0 ** ((gg - 210.0) / 4.0)
        # per-band level: decode multiplies by 2^(-0.5*sf), so boost
        # the quantization threshold down to the band's own peak
        thr = np.full(576, gain / 2.0)
        for sfb in range(21):
            lo, hi = bands[sfb], bands[sfb + 1]
            p = np.abs(xr[lo:hi]).max() if hi > lo else 0.0
            if p > 1e-12:
                limit = 15 if sfb < 11 else 7
                sf[sfb] = int(np.clip(round(-2.0 * np.log2(p / amp)), 0, limit))
                thr[lo:hi] = gain * 2.0 ** (-0.5 * sf[sfb]) / 2.0
        ix = np.where(np.abs(xr) >= thr, np.sign(xr), 0.0).astype(np.int64)
    bw = _BitWriter()
    for sfb in range(11):
        bw.write(int(sf[sfb]), 4)
    for sfb in range(11, 21):
        bw.write(int(sf[sfb]), 3)
    nz = np.nonzero(ix)[0]
    if len(nz):
        lz = int(nz[-1])
        nq = min(6, lz // 4 + 1)
        c1_start = 4 * (lz // 4 - nq + 1)
        big_values = c1_start // 2
    else:
        nq = 0
        c1_start = 0
        big_values = 0
    overflow = False
    for p in range(big_values):
        a, b_ = int(ix[2 * p]), int(ix[2 * p + 1])
        code = _HUFF1_ENC[(abs(a), abs(b_))]
        need = len(code) + (1 if a else 0) + (1 if b_ else 0)
        if bw.tell() + need > max_gr_bits:
            big_values = p
            overflow = True
            break
        bw.write_str(code)
        if a:
            bw.write(1 if a < 0 else 0, 1)
        if b_:
            bw.write(1 if b_ < 0 else 0, 1)
    if not overflow:
        for q in range(nq):
            lines = ix[c1_start + 4 * q : c1_start + 4 * q + 4]
            mag = 0
            for v in lines:
                mag = (mag << 1) | (1 if v else 0)
            need = 4 + int(np.count_nonzero(lines))
            if bw.tell() + need > max_gr_bits:
                break
            bw.write((~mag) & 0xF, 4)
            for v in lines:
                if v:
                    bw.write(1 if v < 0 else 0, 1)
    return bw, {"part2_3_length": bw.tell(), "big_values": big_values,
                "global_gain": gg}


def encode_mp3(
    samples: np.ndarray,
    sample_rate: int = 44100,
    bitrate_kbps: int = 128,
    *,
    joint_stereo: bool = False,
) -> bytes:
    """Encode PCM (float in [-1, 1]; shape (n,) mono or (n, 2) stereo)
    as a valid MPEG-1 Layer III stream within the module's subset: real
    polyphase analysis + MDCT, lines quantized to {-1, 0, +1} with
    per-granule amplitude in global_gain, Huffman codebook 1, no
    reservoir. Stereo defaults to independent channels (mode 0);
    ``joint_stereo=True`` encodes MS (mode 1, mode_extension 2:
    M=(L+R)/√2, S=(L−R)/√2 on the spectra — correlated channels
    concentrate into M; intensity stereo is not implemented either
    direction). Frames whose Huffman payload would
    overflow the frame budget drop lines highest-frequency-first
    (documented lossy behavior, like any encoder at a fixed bitrate)."""
    if sample_rate not in _SFB_LONG:
        raise ValueError(f"unsupported sample rate {sample_rate}")
    try:
        br_idx = _BITRATE_KBPS[("1", 3)].index(bitrate_kbps)
    except ValueError:
        raise ValueError(f"unsupported Layer III bitrate {bitrate_kbps} kbps")
    sr_idx = _SAMPLE_RATE["1"].index(sample_rate)
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2 or x.shape[1] not in (1, 2):
        raise ValueError("samples must be (n,) mono or (n, 2) stereo")
    nch = x.shape[1]
    if x.shape[0] == 0:
        x = np.zeros((1152, nch))
    pad = (-x.shape[0]) % 1152
    x = np.concatenate([x, np.zeros((pad, nch))])
    n_frames = x.shape[0] // 1152

    # analysis per channel (+ one lookahead granule of silence so the
    # final MDCT window has its second half)
    sbs = [
        _analysis_filterbank(np.concatenate([x[:, ch], np.zeros(576)]))
        for ch in range(nch)
    ]
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    side_bytes = 17 if nch == 1 else 32
    budget_bits = (frame_len - 4 - side_bytes) * 8
    max_gr_bits = budget_bits // (2 * nch) - 8

    ms = joint_stereo and nch == 2
    out = bytearray()
    for f in range(n_frames):
        payloads = []
        sides = []
        for gr in range(2):
            xrs = []
            for ch in range(nch):
                slot0 = f * 36 + gr * 18
                seg = sbs[ch][slot0 : slot0 + 36, :]
                if seg.shape[0] < 36:
                    seg = np.vstack([seg, np.zeros((36 - seg.shape[0], 32))])
                segT = seg.T.copy()  # (32 bands, 36 slots)
                segT[1::2, 1::2] *= -1.0  # matches decoder's inversion
                grid = (segT * _WIN36[None, :]) @ _MDCT36.T  # (32, 18)
                xrs.append(_alias_reduce(grid.reshape(576), inverse=True))
            if ms:
                left, right = xrs
                xrs = [
                    (left + right) / np.sqrt(2.0),
                    (left - right) / np.sqrt(2.0),
                ]
            for xr in xrs:
                bw, g = _encode_granule(
                    xr, max_gr_bits, _SFB_LONG[sample_rate]
                )
                payloads.append(bw)
                sides.append(g)

        hdr = bytearray(4)
        hdr[0] = 0xFF
        hdr[1] = 0xE0 | (3 << 3) | (1 << 1) | 1  # MPEG-1, Layer III, no CRC
        hdr[2] = (br_idx << 4) | (sr_idx << 2)
        if nch == 1:
            hdr[3] = 3 << 6  # mono
        elif ms:
            hdr[3] = (1 << 6) | (2 << 4)  # joint stereo, MS on
        else:
            hdr[3] = 0  # plain stereo
        sw = _BitWriter()
        sw.write(0, 9)                  # main_data_begin
        sw.write(0, 5 if nch == 1 else 3)  # private
        sw.write(0, 4 * nch)            # scfsi
        for g in sides:
            sw.write(g["part2_3_length"], 12)
            sw.write(g["big_values"], 9)
            sw.write(g["global_gain"], 8)
            sw.write(_ENC_SCF_COMPRESS, 4)  # slen (4,3): real scalefactors
            sw.write(0, 1)   # window_switching (long blocks)
            for _ in range(3):
                sw.write(1, 5)  # table_select = codebook 1
            sw.write(7, 4)   # region0_count
            sw.write(7, 3)   # region1_count
            sw.write(0, 1)   # preflag
            sw.write(0, 1)   # scalefac_scale
            sw.write(1, 1)   # count1table_select (region is empty)
        side = sw.to_bytes()
        assert len(side) == side_bytes
        mw = _BitWriter()
        for bw in payloads:
            mw.bits.extend(bw.bits)
        body = bytes(hdr) + side + mw.to_bytes()
        body += b"\x00" * (frame_len - len(body))
        out += body[:frame_len]
    return bytes(out)


# ---------------------------------------------------------------------------
# MPEG-1 Layer I (r5): FULL decode — unlike Layer III there are no
# Huffman codebooks; bit allocation is explicit (4 bits/subband) and
# the scalefactor table is the closed-form geometric sequence
# sf[i] = 2 * 2^(-i/3) (ISO 11172-3 Table B.1), so arbitrary real
# Layer I files decode completely (synthesis window caveat as above).

_L1_SF = 2.0 * 2.0 ** (-np.arange(63) / 3.0)


def _decode_layer1(data: bytes) -> tuple[np.ndarray, int]:
    i = _skip_id3(data)
    pcm_parts: list[np.ndarray] = []
    sample_rate = None
    v_state: dict = {}
    while i + 4 <= len(data):
        h = _parse_header(data, i)
        if h is None:
            if sample_rate is None:
                i += 1
                continue
            break
        if h["layer"] != 1 or h["version"] != "1":
            raise ValueError(
                f"_decode_layer1 got MPEG-{h['version']} Layer {h['layer']}"
            )
        if h["frame_len"] is None:
            raise ValueError("free-format MPEG audio not supported")
        if h["mode"] == 1:
            raise ValueError(
                "Layer I intensity (joint) stereo not implemented"
            )
        nch = h["channels"]
        sample_rate = h["sample_rate"]
        body = data[i + 4 + (2 if h["crc"] else 0) : i + h["frame_len"]]
        # r13 (guide §4.2): the frame body is fixed-width fields, so
        # serve every read from ONE int.from_bytes window (shift/mask
        # per field instead of a _BitReader call), and requantize all
        # 12x32 samples with elementwise numpy — the same ops in the
        # same per-element order as the scalar loop, so bit-identical.
        # Truncation semantics preserved: a field crossing the body
        # end raises the same ValueError _BitReader.read raised.
        total = len(body) * 8
        big = int.from_bytes(body, "big")
        pos = 0

        def rd(n: int) -> int:
            nonlocal pos
            end = pos + n
            if end > total:
                raise ValueError(
                    "truncated MP3 frame: bit reader ran off the payload"
                )
            v = (big >> (total - end)) & ((1 << n) - 1)
            pos = end
            return v

        alloc = [[0] * 32 for _ in range(nch)]
        for sb in range(32):
            for ch in range(nch):
                a = rd(4)
                if a == 15:
                    raise ValueError(
                        "forbidden Layer I allocation code 15"
                    )
                alloc[ch][sb] = 0 if a == 0 else a + 1
        scf = [[0.0] * 32 for _ in range(nch)]
        for sb in range(32):
            for ch in range(nch):
                if alloc[ch][sb]:
                    idx = rd(6)
                    if idx > 62:
                        raise ValueError("forbidden Layer I scalefactor 63")
                    scf[ch][sb] = float(_L1_SF[idx])
        # the (sb, ch) fields with a nonzero allocation, in stream order
        fields = [
            (sb, ch)
            for sb in range(32)
            for ch in range(nch)
            if alloc[ch][sb]
        ]
        nf = len(fields)
        widths = [alloc[ch][sb] for sb, ch in fields]
        W = sum(widths)
        if pos + 12 * W > total:
            # the first crossing field read would have raised this
            raise ValueError(
                "truncated MP3 frame: bit reader ran off the payload"
            )
        codes = np.zeros((12, nf))
        if nf:
            # all 12*nf sample fields as one unpackbits gather — the
            # same MSB-first fields the per-read loop extracted
            bits = np.unpackbits(
                np.frombuffer(body, dtype=np.uint8)
            )[pos : pos + 12 * W].reshape(12, W).astype(np.int64)
            off = 0
            for j, w in enumerate(widths):
                weights = 1 << np.arange(w - 1, -1, -1)
                codes[:, j] = bits[:, off : off + w] @ weights
                off += w
            pos += 12 * W
        sb_samples = np.zeros((12, 32, nch))
        if nf:
            nb_arr = np.array(
                [float(alloc[ch][sb]) for sb, ch in fields]
            )
            k = 2.0 ** (1.0 - nb_arr)  # code scale / midtread offset
            m = 2.0**nb_arr / (2.0**nb_arr - 1.0)
            sfv = np.array([scf[ch][sb] for sb, ch in fields])
            frac = codes * k - 1.0  # s'''
            vals = (m * (frac + k)) * sfv  # s'' * scalefactor
            sb_idx = np.array([sb for sb, _ in fields])
            ch_idx = np.array([ch for _, ch in fields])
            sb_samples[:, sb_idx, ch_idx] = vals
        chans = [
            _synth_stateful(sb_samples[:, :, ch], v_state, f"l1v{ch}")
            for ch in range(nch)
        ]
        pcm_parts.append(
            np.stack(chans, axis=-1) if nch == 2 else chans[0]
        )
        i += h["frame_len"]
    if sample_rate is None:
        raise ValueError("no MPEG audio frame found (not an MPEG payload?)")
    return (
        np.concatenate(pcm_parts) if pcm_parts else np.zeros(0),
        sample_rate,
    )


def encode_mp1(
    samples: np.ndarray, sample_rate: int = 44100, bitrate_kbps: int = 448
) -> bytes:
    """Encode mono PCM as MPEG-1 Layer I: real polyphase analysis, one
    6-bit Table B.1 scalefactor per subband, uniform midtread
    requantization (8 bits/sample everywhere — a fixed allocation that
    fits the 448/384 kbps frames). The decode side handles ANY
    allocation a real encoder might emit."""
    if sample_rate not in _SAMPLE_RATE["1"]:
        raise ValueError(f"unsupported sample rate {sample_rate}")
    try:
        br_idx = _BITRATE_KBPS[("1", 1)].index(bitrate_kbps)
    except ValueError:
        raise ValueError(f"unsupported Layer I bitrate {bitrate_kbps} kbps")
    sr_idx = _SAMPLE_RATE["1"].index(sample_rate)
    x = np.asarray(samples, dtype=np.float64).reshape(-1)
    if x.size == 0:
        x = np.zeros(384)
    pad = (-len(x)) % 384
    x = np.concatenate([x, np.zeros(pad)])
    n_frames = len(x) // 384
    frame_len = (12 * bitrate_kbps * 1000 // sample_rate) * 4
    nb = 8  # fixed allocation; 32*12*8 + 32*4 + 32*6 bits < 448k frame
    need_bits = 4 + 32 * 4 + 32 * 6 + 32 * 12 * nb
    if need_bits // 8 + 4 > frame_len:
        raise ValueError(
            f"Layer I bitrate {bitrate_kbps} kbps cannot fit the fixed "
            "8-bit allocation; use >= 384 kbps"
        )
    sb = _analysis_filterbank(x)
    out = bytearray()
    # r13 (guide §4.2): whole-frame numpy quantization — the same
    # elementwise ops in the same order as the scalar loop (div by sf,
    # *(2^nb-1), /2^nb, -2^(1-nb), +1, *2^(nb-1), half-even round,
    # clip), so the emitted codes and therefore the payload BYTES are
    # identical (asserted old-vs-new in tests). With the fixed 8-bit
    # allocation the sample section is byte-aligned after the 128+192
    # bit alloc/scf preamble, so packing is two bigint folds + tobytes.
    hdr = bytearray(4)
    hdr[0] = 0xFF
    hdr[1] = 0xE0 | (3 << 3) | (3 << 1) | 1  # MPEG-1, Layer I, no CRC
    hdr[2] = (br_idx << 4) | (sr_idx << 2)
    hdr[3] = 3 << 6  # mono
    alloc_bytes = bytes([((nb - 1) << 4) | (nb - 1)] * 16)
    for f in range(n_frames):
        block = sb[f * 12 : (f + 1) * 12]  # (12, 32)
        peak = np.abs(block).max(axis=0)
        safe = np.where(peak > 1e-9, peak, 1.0)  # mask silent bands
        idx = np.where(
            peak > 1e-9,
            np.clip(
                np.floor(-3.0 * np.log2(safe / 2.0)), 0, 62
            ),
            62.0,
        ).astype(np.int64)
        sf = _L1_SF[idx]
        val = block / sf  # s'' in (-1, 1)
        frac = val * (2.0**nb - 1.0) / 2.0**nb - 2.0 ** (1 - nb)
        codes = np.clip(
            np.rint((frac + 1.0) * 2.0 ** (nb - 1)), 0, 2**nb - 1
        ).astype(np.uint8)
        scf_int = 0
        for v in idx:
            scf_int = (scf_int << 6) | int(v)
        body = (
            bytes(hdr)
            + alloc_bytes
            + scf_int.to_bytes(24, "big")
            + codes.tobytes()
        )
        body += b"\x00" * (frame_len - len(body))
        out += body[:frame_len]
    return bytes(out)


def decode_mpeg_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Layer-dispatching decode: Layer I decodes FULLY (no codebook
    dependency), Layer III within the documented subset, Layer II is
    honestly rejected (its Table B.2 allocation tables are spec
    numerics not reproduced here)."""
    info = probe_mp3(data)
    if info["layer"] == 1:
        return _decode_layer1(data)
    if info["layer"] == 3:
        return decode_mp3(data)
    raise ValueError(
        "Layer II decode not implemented (Table B.2 allocation tables "
        "not reproducible in this environment)"
    )


# ---------------------------------------------------------------------------
# Spark kernels (Arrow-batched, shuffle-free — same shape as the
# PNG/JPEG/WAV codec stages)


def with_mp3_payload(df, *, id_col: str = "doc_id", text_col: str = "text",
                     n_samples: int = 2304, bitrate_kbps: int = 128,
                     mix_layer1: bool = False, vary_geometry: bool = False):
    """Attach a REAL MPEG audio ``payload``: the deterministic
    text-derived waveform (``audiocodec.text_to_samples``) encoded by
    ``encode_mp3``. With ``mix_layer1`` odd ids get a Layer I stream
    instead (448 kbps fixed allocation) so the layer-dispatching decode
    path runs distributed, not just in unit tests. The MP3 twin of
    ``with_wav_payload``.

    ``vary_geometry`` (r12) rotates the waveform length PER DOCUMENT —
    ``1152 * (1 + id % 5)`` samples on the Layer III lane, ``384 *
    (2 + id % 9)`` on the Layer I lane — so frame counts and durations
    differ row to row and a metadata oracle must RECOMPUTE them from
    doc_id arithmetic instead of selecting fixture-wide constants
    (known-answer → recomputed-geometry witness upgrade)."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, payload binary"

    def encode(batches):
        import pandas as pd

        from aiotcvectordb_spark.operators import audiocodec

        for pdf in batches:
            payloads = []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                n = n_samples
                if vary_geometry:
                    n = (
                        384 * (2 + int(i) % 9)
                        if mix_layer1 and int(i) % 2 == 1
                        else 1152 * (1 + int(i) % 5)
                    )
                s = audiocodec.text_to_samples(text or "", n)
                pcm = s.astype(np.float64) / 32768.0
                if mix_layer1 and int(i) % 2 == 1:
                    payloads.append(encode_mp1(pcm, 44100, 448))
                else:
                    payloads.append(encode_mp3(pcm, 44100, bitrate_kbps))
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(encode, schema=schema)


def mp3_meta(df, *, id_col: str = "doc_id", payload_col: str = "payload"):
    """HEADER-ONLY container metadata (r11): ``probe_mp3`` per payload —
    frame-sync walk over the 4-byte headers, NO requantization / IMDCT /
    synthesis. The metadata route for consumers that need layer /
    frames / bitrate / duration but not PCM: the header walk touches a
    few bytes per frame, so at 100 TB this is I/O-bound scan work while
    ``mp3_features``' full decode is CPU-linear in audio samples — point
    duration/layer-routing queries HERE, pay ``mp3_features`` only when
    a consumer reads the waveform. Malformed payloads get NULL rows
    (flag, don't fail the batch — the mp3_features contract)."""
    id_type = dict(df.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, layer int, n_frames int, sample_rate int, "
        "bitrate_kbps int, duration_ms long"
    )

    def extract(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    info = probe_mp3(bytes(payload))
                    rows.append(
                        (i, info["layer"], info["n_frames"],
                         info["sample_rate"], info["bitrate_kbps"],
                         info["duration_ms"])
                    )
                except Exception:
                    # flag-don't-fail must survive ANY malformed
                    # payload, not just the exceptions the happy-path
                    # parser anticipates (r12 advisor): struct.error /
                    # KeyError from table lookups are as malformed as
                    # a ValueError — a NULL row, never a dead batch
                    rows.append((i, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "layer", "n_frames", "sample_rate",
                         "bitrate_kbps", "duration_ms"],
            )

    return df.select(id_col, payload_col).mapInPandas(extract, schema=schema)


def mp3_features(df, *, id_col: str = "doc_id", payload_col: str = "payload"):
    """Probe + decode each MP3 payload: container stats from
    ``probe_mp3`` and RMS of the actually-decoded PCM. Non-decodable
    payloads get NULL features (flag, don't fail the batch)."""
    id_type = dict(df.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, n_frames int, sample_rate int, "
        "bitrate_kbps int, duration_ms long, rms double"
    )

    def extract(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    b = bytes(payload)
                    info = probe_mp3(b)
                    pcm, _sr = decode_mpeg_audio(b)  # Layer I or III
                    rms = float(np.sqrt(np.mean(pcm**2))) if len(pcm) else 0.0
                    rows.append(
                        (i, info["n_frames"], info["sample_rate"],
                         info["bitrate_kbps"], info["duration_ms"], rms)
                    )
                except Exception:
                    # IndexError: a truncated frame runs the bit reader
                    # off the payload; struct.error / KeyError: garbage
                    # bytes driving table lookups — all malformed, all
                    # flag-don't-fail (the audio_features contract)
                    rows.append((i, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_frames", "sample_rate", "bitrate_kbps",
                         "duration_ms", "rms"],
            )

    return df.select(id_col, payload_col).mapInPandas(extract, schema=schema)
