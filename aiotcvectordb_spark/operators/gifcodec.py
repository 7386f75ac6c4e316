"""Real GIF87a/89a decode + a matching writer (r6).

Animated GIF is a genuine entropy-coded video container — exactly the
class the multimodal ``frame_sample(mode="real")`` stub rejected —
and everything in it is algorithmic: LSB-first variable-width LZW
(width seeded by the image's minimum code size, clear/EOI codes
derived from it, no numeric spec tables), logical-screen +
image-descriptor geometry, global/local color tables, interlace row
ordering (passes at strides 8/8/4/2), GCE transparency and disposal
(1 = draw over, 2 = restore background). The writer emits indexed
frames with the mirror LZW encoder, so the whole decoder is covered
by exact round trips; the PDF codec's LZW is MSB-first with early
change — the two variants are deliberately separate implementations.

``decode_gif`` returns RGB frames as numpy arrays; ``gif_frames`` is
the Arrow-batched Spark stage used by ``multimodal.frame_sample``'s
real mode.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "build_gif"]


def _lzw_gif_decode(data: bytes, min_code_size: int, expect: int) -> bytes:
    """LSB-first GIF LZW: clear = 2^mcs, EOI = clear+1, widths grow at
    2^width with NO early change, 12-bit cap."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    bitbuf = bitcnt = 0
    for byte in data:
        bitbuf |= byte << bitcnt
        bitcnt += 8
        while bitcnt >= width:
            code = bitbuf & ((1 << width) - 1)
            bitbuf >>= width
            bitcnt -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("corrupt GIF LZW: bad first code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt GIF LZW: code out of range")
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            prev = entry
            if len(table) >= (1 << width) and width < 12:
                width += 1
            if len(out) >= expect:
                return bytes(out[:expect])
    return bytes(out)


def _lzw_gif_encode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    out = bytearray()
    bitbuf = bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    dec_len = clear + 2
    width = min_code_size + 1
    emitted = 0

    def emit_data(code: int) -> None:
        nonlocal emitted, dec_len, width
        emit(code, width)
        emitted += 1
        if emitted >= 2 and dec_len < 4096:
            dec_len += 1
        if dec_len >= (1 << width) and width < 12:
            width += 1

    emit(clear, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit_data(table[w])
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
        w = bytes([b])
    if w:
        emit_data(table[w])
    emit(clear + 1, width)  # EOI
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(data: bytes) -> tuple[int, int, list[np.ndarray], list[int]]:
    """Decode a GIF payload to (width, height, frames, delays_cs):
    frames are full-canvas (H, W, 3) uint8 RGB after disposal
    compositing; delays in centiseconds (0 for still images).
    Raises ValueError on corruption — never silent garbage."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    W, H = struct.unpack_from("<HH", data, 6)
    flags = data[10]
    bg_index = data[11]
    i = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x7)
        global_pal = np.frombuffer(
            data[i : i + 3 * n], dtype=np.uint8
        ).reshape(-1, 3).copy()
        if global_pal.shape[0] < n:
            raise ValueError("truncated global color table")
        i += 3 * n
    canvas = np.zeros((H, W, 3), dtype=np.uint8)
    if global_pal is not None and bg_index < len(global_pal):
        canvas[:] = global_pal[bg_index]
    background = canvas.copy()
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay = 0
    while i < len(data):
        b = data[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if i + 2 > len(data):
                raise ValueError("truncated GIF extension")
            label = data[i + 1]
            i += 2
            if label == 0xF9 and i + 6 <= len(data) and data[i] == 4:
                pflags = data[i + 1]
                (delay,) = struct.unpack_from("<H", data, i + 2)
                transparent = data[i + 4] if pflags & 0x1 else None
                disposal = (pflags >> 2) & 0x7
            # skip sub-blocks
            while i < len(data) and data[i]:
                i += 1 + data[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            if i + 10 > len(data):
                raise ValueError("truncated GIF image descriptor")
            left, top, w, h = struct.unpack_from("<HHHH", data, i + 1)
            iflags = data[i + 9]
            i += 10
            pal = global_pal
            if iflags & 0x80:
                n = 2 << (iflags & 0x7)
                pal = np.frombuffer(
                    data[i : i + 3 * n], dtype=np.uint8
                ).reshape(-1, 3).copy()
                if pal.shape[0] < n:
                    raise ValueError("truncated local color table")
                i += 3 * n
            if pal is None:
                raise ValueError("GIF image without any color table")
            if i >= len(data):
                raise ValueError("truncated GIF image data")
            mcs = data[i]
            if not 2 <= mcs <= 11:
                raise ValueError(f"corrupt GIF: LZW min code size {mcs}")
            i += 1
            lzw = bytearray()
            while i < len(data) and data[i]:
                sz = data[i]
                lzw += data[i + 1 : i + 1 + sz]
                i += 1 + sz
            i += 1
            idx = np.frombuffer(
                _lzw_gif_decode(bytes(lzw), mcs, w * h), dtype=np.uint8
            )
            if idx.size < w * h:
                raise ValueError("corrupt GIF: LZW data short of w*h pixels")
            idx = idx[: w * h].reshape(h, w)
            if iflags & 0x40:
                idx = _deinterlace(idx)
            if left + w > W or top + h > H:
                raise ValueError("GIF frame exceeds the logical screen")
            region = canvas[top : top + h, left : left + w]
            # disposal 3 (restore-to-previous): snapshot the region
            # BEFORE this frame draws, put it back after compositing
            prev = region.copy() if disposal == 3 else None
            safe = np.minimum(idx, len(pal) - 1)
            rgb = pal[safe]
            if transparent is not None:
                mask = (idx != transparent)[:, :, None]
                region[:] = np.where(mask, rgb, region)
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            delays.append(delay)
            if disposal == 2:  # restore background in the frame's region
                canvas[top : top + h, left : left + w] = background[
                    top : top + h, left : left + w
                ]
            elif disposal == 3:  # restore the pre-draw pixels
                canvas[top : top + h, left : left + w] = prev
            transparent = None
            disposal = 0
            delay = 0
        else:
            raise ValueError(f"corrupt GIF: unknown block 0x{b:02X}")
    if not frames:
        raise ValueError("GIF with no image frames")
    return W, H, frames, delays


def build_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    *,
    delays: list[int] | None = None,
    interlace_first: bool = False,
) -> bytes:
    """Write an animated GIF from INDEXED frames (each (H, W) uint8
    into ``palette`` rows of RGB). All frames are full-canvas draws;
    ``interlace_first`` stores frame 0 interlaced to exercise the
    deinterlacer."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    n_pal = len(palette)
    bits = max(1, (int(n_pal) - 1).bit_length())
    size_field = max(0, bits - 1)
    stored = 2 << size_field
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | size_field, 0, 0])
    pal = np.zeros((stored, 3), dtype=np.uint8)
    pal[:n_pal] = palette
    out += pal.tobytes()
    mcs = max(2, bits)
    for k, frame in enumerate(frames):
        if frame.shape != (h, w):
            raise ValueError("all frames must be full-canvas")
        if delays is not None:
            out += bytes([0x21, 0xF9, 4, 0])
            out += struct.pack("<H", delays[k] if k < len(delays) else 0)
            out += bytes([0, 0])
        interlaced = interlace_first and k == 0
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x40 if interlaced else 0x00])
        rows = frame
        if interlaced:
            order = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            rows = frame[order]
        out += bytes([mcs])
        lzw = _lzw_gif_encode(rows.astype(np.uint8).tobytes(), mcs)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark kernels (Arrow-batched, shuffle-free — the same codec-stage
# shape as the PNG/WAV/PDF kernels)

_FRAME_W = 16
_FRAME_H = 16
_MAX_FRAMES = 6
_GRAY_PAL = np.stack([np.arange(16, dtype=np.uint8) * 17] * 3, axis=1)


def with_gif_payload(df, *, id_col: str = "doc_id", text_col: str = "text"):
    """Attach a REAL animated-GIF ``payload``: the text's UTF-8 bytes
    (mod 16) become indexed 16x16 frames over a gray palette, one
    frame per 256 bytes capped at ``_MAX_FRAMES`` (zero-padded), with
    the first frame interlaced so the deinterlacer runs distributed.
    Deterministic — frame count/geometry are pure functions of the
    byte length, which is what makes the codec ORACLE-CHECKABLE."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, payload binary"
    area = _FRAME_W * _FRAME_H

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                raw = (t or "").encode("utf-8")
                n = min(max(1, -(-len(raw) // area)), _MAX_FRAMES)
                frames = []
                for j in range(n):
                    buf = np.zeros(area, dtype=np.uint8)
                    chunk = raw[j * area : (j + 1) * area]
                    buf[: len(chunk)] = np.frombuffer(chunk, dtype=np.uint8)
                    frames.append((buf % 16).reshape(_FRAME_H, _FRAME_W))
                payloads.append(
                    build_gif(frames, _GRAY_PAL, interlace_first=True)
                )
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(encode, schema=schema)


def gif_frames(df, *, id_col: str = "doc_id"):
    """Decode GIF payloads with the REAL codec and emit one row per
    frame: (id, frame_no, f_width, f_height) — geometry and frame
    count verified through actual LZW decode + compositing."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, frame_no int, f_width int, f_height int"

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                w, h, frames, _delays = decode_gif(bytes(payload))
                for j in range(len(frames)):
                    rows.append((i, j, w, h))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_no", "f_width", "f_height"]
            )

    return df.mapInPandas(decode, schema=schema)
