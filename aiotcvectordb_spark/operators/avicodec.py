"""Real MJPEG-in-AVI container codec — stdlib+numpy, like audiocodec.

Shrinks the "entropy-coded video" honesty wall (multimodal.py): generic
inter-frame codecs (H.264/VP9/...) genuinely need decoders not present
in this environment, but MOTION JPEG is just a RIFF AVI container whose
video chunks are each a complete baseline/progressive JPEG — and this
repo already ships a full ITU-T T.81 JPEG codec (``jpegcodec``). So the
video lane gets a real container: a writer emitting spec-shaped AVI
files (Microsoft AVI RIFF File Reference: LIST hdrl with avih/strh/strf
headers, LIST movi of 00dc chunks, idx1 index) and a parser that walks
the chunks and probes every frame's JPEG SOF marker for its geometry.

Reference parity ground: the vector-db reference's op 45 multimodal
surface (reference collection_view.py:425-435 get_image_url /
ParsingProcess generalization) names video among uploadable media; this
module implements the metadata/frame-walk semantics Spark-side.

Everything is pure bytes-in/bytes-out so it runs inside Arrow-batched
``mapInPandas`` stages: payloads never shuffle, outputs are narrow.
The frame walk (``parse_avi_mjpeg``) reads chunk headers plus each
JPEG's first ~kilobyte (marker scan to SOF) — at 100 TB that is
I/O-bound scan work, while full pixel decode stays opt-in per frame.
"""

from __future__ import annotations

import struct

_AVIIF_KEYFRAME = 0x10


def build_avi_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
) -> bytes:
    """RIFF AVI bytes for a list of complete JPEG frame payloads.

    Spec-shaped per the public AVI RIFF File Reference: 56-byte avih
    (dwMicroSecPerFrame, dwTotalFrames, dwStreams=1, dwWidth/Height),
    one 'vids'/'MJPG' stream (56-byte strh with dwScale/dwRate = 1/fps,
    40-byte BITMAPINFOHEADER strf with biCompression 'MJPG'), a movi
    LIST of word-aligned '00dc' chunks, and an idx1 keyframe index
    (every MJPEG frame is a keyframe)."""
    if not frames:
        raise ValueError("MJPEG AVI needs at least one frame")
    n = len(frames)
    us_per_frame = 1_000_000 // fps
    max_bytes = max(len(f) for f in frames)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, max_bytes * fps, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps, 0, n, max_bytes, 0xFFFFFFFF, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)

    movi_body = b"movi"
    idx_entries = []
    for f in frames:
        # idx1 offsets are from the movi LIST's type fourcc ('movi'
        # itself sits at offset 0), pointing at the chunk header
        idx_entries.append((len(movi_body) - 4, len(f)))
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, ln)
            for off, ln in idx_entries
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_mjpeg(payload: bytes) -> dict:
    """Header + frame-walk metadata for an MJPEG AVI, WITHOUT pixel
    decode: walks the RIFF tree for avih (declared frame count, frame
    timing, container dimensions), then walks the movi LIST probing
    every '00dc' chunk's JPEG SOF marker (``imagecodec.probe_image``)
    so the returned geometry is read from the actual frame bitstreams,
    not trusted from the container. Malformed containers raise
    ValueError (uniform codec contract).

    Returns: n_frames (counted 00dc chunks), total_frames (avih
    declared), frames_probed (chunks whose JPEG SOF parsed), width /
    height (first frame's SOF; ValueError if frames disagree),
    us_per_frame, duration_ms, n_index (idx1 entry count, -1 if no
    idx1)."""
    from aiotcvectordb_spark.operators import imagecodec

    if (
        len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        raise ValueError("not a RIFF/AVI payload")

    avih = None
    movi = None
    n_index = -1
    try:
        pos, n = 12, len(payload)
        while pos + 8 <= n:
            cid = payload[pos:pos + 4]
            clen = int.from_bytes(payload[pos + 4:pos + 8], "little")
            body = payload[pos + 8:pos + 8 + clen]
            if cid == b"LIST":
                ltype = body[:4]
                if ltype == b"movi":
                    movi = body[4:]
                elif ltype == b"hdrl":
                    # avih is the first chunk inside hdrl
                    if body[4:8] != b"avih":
                        raise ValueError("hdrl LIST without leading avih")
                    alen = int.from_bytes(body[8:12], "little")
                    avih = struct.unpack_from("<10I", body, 12)
                    if alen < 40:
                        raise ValueError("truncated avih chunk")
            elif cid == b"idx1":
                n_index = clen // 16
            pos += 8 + clen + (clen & 1)
    except struct.error as e:
        raise ValueError(f"malformed AVI structure: {e!r}") from e
    if avih is None or movi is None:
        raise ValueError("missing hdrl/movi LIST")

    us_per_frame, total_frames = avih[0], avih[4]
    n_frames = 0
    frames_probed = 0
    width = height = None
    pos, n = 0, len(movi)
    while pos + 8 <= n:
        cid = movi[pos:pos + 4]
        clen = int.from_bytes(movi[pos + 4:pos + 8], "little")
        if cid[2:4] in (b"dc", b"db"):
            n_frames += 1
            meta = imagecodec.probe_image(movi[pos + 8:pos + 8 + clen])
            if meta is not None and meta["format"] == "jpeg":
                frames_probed += 1
                if width is None:
                    width, height = meta["width"], meta["height"]
                elif (width, height) != (meta["width"], meta["height"]):
                    raise ValueError(
                        "MJPEG frame geometry varies mid-stream: "
                        f"{(width, height)} then "
                        f"{(meta['width'], meta['height'])}"
                    )
        pos += 8 + clen + (clen & 1)
    if n_frames == 0:
        raise ValueError("movi LIST holds no video chunks")
    return {
        "n_frames": n_frames,
        "total_frames": int(total_frames),
        "frames_probed": frames_probed,
        "width": width,
        "height": height,
        "us_per_frame": int(us_per_frame),
        "duration_ms": (n_frames * int(us_per_frame)) // 1000,
        "n_index": n_index,
    }


def with_mjpeg_payload(df, *, id_col: str = "doc_id",
                       text_col: str = "text", fps: int = 10):
    """Attach a REAL MJPEG AVI ``payload`` per document: ``1 + id % 6``
    JPEG frames of the shared text block-grid fixture
    (``multimodal.text_block_image``) at a PER-DOCUMENT width of
    ``2 + id % 5`` blocks, each frame encoding the byte sequence rolled
    by its frame index (so frames differ in content but not geometry),
    Huffman-encoded by the real ``jpegcodec`` and boxed by
    ``build_avi_mjpeg``. Geometry is pure doc_id + byte-count
    arithmetic — the recomputed-geometry oracle pattern."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, payload binary"

    def encode(batches):
        import numpy as np
        import pandas as pd

        from aiotcvectordb_spark.operators import jpegcodec
        from aiotcvectordb_spark.operators.multimodal import (
            text_block_image_bytes,
        )

        for pdf in batches:
            ids, payloads = [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                wide = 2 + int(i) % 5
                nf = 1 + int(i) % 6
                raw = (text or "").encode("utf-8")
                frames = []
                for f in range(nf):
                    # roll the BYTE sequence by the frame index: frames
                    # differ in content but share geometry and multiset
                    rolled = (
                        bytes(np.roll(np.frombuffer(raw, np.uint8), f))
                        if raw
                        else b""
                    )
                    img = text_block_image_bytes(rolled, wide)
                    frames.append(jpegcodec.encode_jpeg_gray(img))
                h, w = _sof_dims_from_first(frames[0])
                ids.append(i)
                payloads.append(
                    build_avi_mjpeg(frames, width=w, height=h, fps=fps)
                )
            yield pd.DataFrame({id_col: ids, "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(encode, schema=schema)


def _sof_dims_from_first(jpeg: bytes) -> tuple[int, int]:
    from aiotcvectordb_spark.operators import imagecodec

    meta = imagecodec.probe_image(jpeg)
    if meta is None:
        raise ValueError("frame is not a probeable JPEG")
    return meta["height"], meta["width"]


def mjpeg_meta(df, *, id_col: str = "doc_id", payload_col: str = "payload"):
    """Container + frame-walk metadata per MJPEG AVI payload
    (``parse_avi_mjpeg``): counted vs declared frame counts, per-frame
    SOF-probed dimensions, duration from the avih clock. No pixel
    decode — the video twin of ``mp3_meta`` / ``wav_meta``. Malformed
    payloads get NULL rows (flag, don't fail the batch)."""
    id_type = dict(df.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, n_frames int, total_frames int, "
        "frames_probed int, width int, height int, duration_ms long"
    )
    cols = ["n_frames", "total_frames", "frames_probed", "width",
            "height", "duration_ms"]

    def extract(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    m = parse_avi_mjpeg(bytes(payload))
                    rows.append((i, *[m[c] for c in cols]))
                except Exception:
                    rows.append((i, *([None] * len(cols))))
            yield pd.DataFrame(rows, columns=[id_col, *cols])

    return df.select(id_col, payload_col).mapInPandas(extract, schema=schema)


def mjpeg_frames(df, *, id_col: str = "doc_id",
                 payload_col: str = "payload", stride: int = 1):
    """FULL-DECODE frame extraction: every ``stride``-th '00dc' chunk
    is decoded by the real ``jpegcodec.decode_jpeg`` (Huffman +
    dequant + IDCT) and emits (frame_idx, f_width, f_height, px_sum,
    px_mean) from the actual pixels. Because the fixture's constant
    blocks make the quantizer exact, the INTEGER pixel sum is
    closed-form from the byte multiset — so even the pixel path is
    oracle-checkable with zero float-rounding risk (px_mean is the
    user-facing convenience). One input row → N frame rows; payloads
    never shuffle."""
    id_type = dict(df.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, frame_idx int, f_width int, f_height int, "
        "px_sum long, px_mean double"
    )

    def extract(batches):
        import pandas as pd

        from aiotcvectordb_spark.operators import jpegcodec

        for pdf in batches:
            out = {id_col: [], "frame_idx": [], "f_width": [],
                   "f_height": [], "px_sum": [], "px_mean": []}
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                if (
                    len(raw) < 12
                    or raw[:4] != b"RIFF"
                    or raw[8:12] != b"AVI "
                ):
                    continue
                movi = None
                pos, n = 12, len(raw)
                while pos + 8 <= n:
                    cid = raw[pos:pos + 4]
                    clen = int.from_bytes(raw[pos + 4:pos + 8], "little")
                    if cid == b"LIST" and raw[pos + 8:pos + 12] == b"movi":
                        movi = raw[pos + 12:pos + 8 + clen]
                        break
                    pos += 8 + clen + (clen & 1)
                if movi is None:
                    continue
                j = 0
                pos, n = 0, len(movi)
                while pos + 8 <= n:
                    cid = movi[pos:pos + 4]
                    clen = int.from_bytes(movi[pos + 4:pos + 8], "little")
                    if cid[2:4] in (b"dc", b"db"):
                        if j % stride == 0:
                            px = jpegcodec.decode_jpeg(
                                movi[pos + 8:pos + 8 + clen]
                            )
                            out[id_col].append(i)
                            out["frame_idx"].append(j)
                            out["f_width"].append(px.shape[1])
                            out["f_height"].append(px.shape[0])
                            s = int(px.astype("int64").sum())
                            out["px_sum"].append(s)
                            out["px_mean"].append(s / px.size)
                        j += 1
                    pos += 8 + clen + (clen & 1)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(extract, schema=schema)
