"""Minimal real PDF text extraction + a matching writer (op 38/44).

The reference's upload path is built around server-side *file* parsing
(reference collection_view.py:342-423, ai_database.py:76-125 carries
the ParsingProcess config); PDF is the #1 real-world RAG ingest format,
and until r5 a true binary PDF payload was honestly rejected. This
module implements the public ISO 32000-1 (PDF 1.7) subset needed to
extract page text with the Python stdlib only:

extractor (``extract_pdf_text``):
- object scan: every ``N G obj .. endobj`` in the file, no reliance on
  the xref table (broken/linearized xrefs are common in the wild);
  PDF 1.5+ object streams (``/Type /ObjStm``) are expanded so
  compressed-xref documents work too.
- streams: raw or ``/FlateDecode`` via stdlib zlib (predictors and
  other filters are honestly rejected).
- page order: Root -> Pages -> Kids tree walk, falling back to document
  order when the tree is malformed.
- content streams: a real tokenizer for literal strings (nesting +
  escapes + octal), hex strings (UTF-16BE with BOM or PDFDocEncoding),
  names, numbers, arrays, dicts; text-showing operators Tj ' " TJ and
  line-advance operators Td TD T* Tm become text and newlines.

honest rejections (ValueError, never silent garbage): encrypted
documents needing a real password or AES (the empty-user-password
RC4 standard handler decrypts since r6), unsupported stream filters
on content streams, and documents with no text-showing operators at
all (image-only scans).

writer (``build_pdf``): a correct small PDF generator (proper xref +
trailer, FlateDecode content streams, UTF-16BE hex strings so CJK
survives) used by the fixture tests and the ``pdf_extract`` registry
round trip — the same encode-then-decode oracle pattern as the PNG/JPEG
codecs: DuckDB can predict the extracted text exactly (it is the input
text), so the whole parser is hash-checked by the driver.

r6 adds the font machinery that covers the majority of in-the-wild
PDFs (subset-embedded fonts whose byte codes are NOT character codes):

- ``/ToUnicode`` CMaps (ISO 32000-1 §9.10.3): codespacerange / bfchar /
  bfrange parsing, multi-byte codes, UTF-16BE targets incl. surrogate
  pairs. The content walker tracks the current font through ``Tf`` and
  decodes each shown string with that font's CMap.
- per-font ``/Encoding`` (§9.6.5): WinAnsi (stdlib cp1252), MacRoman
  (stdlib mac_roman), Standard (ASCII + the documented high-range
  names), and ``/Differences`` arrays resolved through an algorithmic
  glyph-name mapper (``uniXXXX``/``uXXXX[XX]`` forms, AGL composition
  of accented Latin names via unicodedata, plus the standard
  punctuation/ligature names). Unknown glyph names extract as '' —
  documented lossy, never garbage bytes.
- ``/LZWDecode`` (§7.4.4, stdlib-only) and PNG predictors 10-15
  (§7.4.4.4) for both Flate and LZW streams.
- ``/Length``-sliced stream payloads: the stream dict's direct
  /Length wins over endstream scanning, so payloads that legitimately
  end in CR/LF survive (scan remains the fallback for indirect or
  inconsistent lengths).

The writer emits three font modes — ``simple`` (unencoded text
strings), ``type0`` (2-byte codes + /ToUnicode CMap), and
``differences`` (1-byte custom codes + /Differences names) — so the
whole CMap/Differences machinery is covered by the same
encode-then-decode oracle round trip as the base extractor.

r6 also implements ISO 32000-1 §7.6.3's standard security handler for
the empty-user-password case (RC4 V1/V2 R2/R3: Algorithm 2 key
derivation, Algorithm 4/5 /U validation, per-object keys): the
document is decrypted object-by-object into a plaintext map before
the normal pipeline runs. The writer's ``encrypt=True`` emits RC4-128
documents (Algorithm 3 /O, symmetric RC4 reuses the decryptor), and
~20% of the oracled round trip's documents are encrypted, so the
handler math is hash-checked too; AES-256 (V5/R6 AESV3 with the
ISO 32000-2 Algorithm 2.B hardened hash) round-trips in unit tests
(kept out of the bulk path — the 64-round hash is ~1s/derivation in
pure python). Real passwords still reject honestly. Real-world validation: the TeX/DocBook PDFs
shipped with this OS (subset fonts + ToUnicode CMaps) extract clean
text (tests/test_pdfcodec.py::test_real_world_system_pdfs).
"""

from __future__ import annotations

import re
import unicodedata
import zlib

__all__ = ["build_pdf", "extract_pdf_text"]

# ---------------------------------------------------------------------------
# extractor

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)\bendobj", re.S)
_REF_RE = re.compile(rb"/%s\s+(\d+)\s+\d+\s+R")
_WHITESPACE = b"\x00\t\n\x0c\r "
_DELIMS = b"()<>[]{}/%"


def _find_ref(body: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """ISO 32000-1 §7.4.4 LZWDecode: 9→12-bit variable-width codes,
    256 = clear table, 257 = end of data, EarlyChange default 1."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    bitbuf = bitcnt = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        bitcnt += 8
        while bitcnt >= width:
            code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
            bitcnt -= width
            if code == 256:
                del table[258:]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= 256:
                    raise ValueError("corrupt LZWDecode stream: bad first code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt LZWDecode stream: code out of range")
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            prev = entry
            # conventional EarlyChange=1: 10-bit codes once entry 511
            # exists (table len + early reaches 2^width)
            while len(table) + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _png_predictor(data: bytes, colors: int, columns: int) -> bytes:
    """Undo PNG predictors 10-15 (§7.4.4.4): each row is prefixed with
    a per-row filter byte (None/Sub/Up/Average/Paeth)."""
    rowlen = colors * columns
    out = bytearray()
    prev_row = bytes(rowlen)
    i, n = 0, len(data)
    while i + 1 <= n:
        ftype = data[i]
        row = bytearray(data[i + 1 : i + 1 + rowlen])
        if len(row) < rowlen:
            row += bytes(rowlen - len(row))
        i += 1 + rowlen
        if ftype == 1:  # Sub
            for x in range(colors, rowlen):
                row[x] = (row[x] + row[x - colors]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(rowlen):
                row[x] = (row[x] + prev_row[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(rowlen):
                left = row[x - colors] if x >= colors else 0
                row[x] = (row[x] + ((left + prev_row[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(rowlen):
                a = row[x - colors] if x >= colors else 0
                b = prev_row[x]
                c = prev_row[x - colors] if x >= colors else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"corrupt predictor row type {ftype}")
        out += row
        prev_row = bytes(row)
    return bytes(out)


def _apply_parms(payload: bytes, head: bytes) -> bytes:
    """Apply /DecodeParms predictors to a decompressed payload."""
    pm = re.search(rb"/DecodeParms\s*(?:\[\s*)?<<(.*?)>>", head, re.S)
    if not pm:
        return payload
    parms = pm.group(1)
    pred_m = re.search(rb"/Predictor\s+(\d+)", parms)
    pred = int(pred_m.group(1)) if pred_m else 1
    if pred <= 1:
        return payload
    colors_m = re.search(rb"/Colors\s+(\d+)", parms)
    cols_m = re.search(rb"/Columns\s+(\d+)", parms)
    bpc_m = re.search(rb"/BitsPerComponent\s+(\d+)", parms)
    if bpc_m and int(bpc_m.group(1)) != 8:
        raise ValueError("predictor BitsPerComponent != 8 is not implemented")
    colors = int(colors_m.group(1)) if colors_m else 1
    columns = int(cols_m.group(1)) if cols_m else 1
    if pred == 2:  # TIFF horizontal differencing (r6)
        row = colors * columns
        out = bytearray(payload)
        for r0 in range(0, len(out) - row + 1, row):
            for x in range(colors, row):
                out[r0 + x] = (out[r0 + x] + out[r0 + x - colors]) & 0xFF
        return bytes(out)
    return _png_predictor(payload, colors, columns)


def _ascii_hex_decode(data: bytes) -> bytes:
    """§7.4.2 ASCIIHexDecode: hex pairs, whitespace ignored, '>' EOD."""
    end = data.find(b">")
    digits = re.sub(rb"[^0-9A-Fa-f]", b"", data[: end if end >= 0 else len(data)])
    if len(digits) % 2:
        digits += b"0"
    try:
        return bytes.fromhex(digits.decode("ascii"))
    except ValueError as e:
        raise ValueError(f"corrupt ASCIIHexDecode stream: {e}") from None


def _ascii85_decode(data: bytes) -> bytes:
    """§7.4.3 ASCII85Decode: 5 chars -> 4 bytes base 85, 'z' = four
    zero bytes, '~>' EOD, partial final group truncated."""
    end = data.find(b"~>")
    body = re.sub(rb"[\x00\t\n\x0c\r ]", b"", data[: end if end >= 0 else len(data)])
    if body.startswith(b"<~"):
        body = body[2:]
    out = bytearray()
    group: list[int] = []
    for ch in body:
        if ch == 0x7A:  # 'z'
            if group:
                raise ValueError("corrupt ASCII85Decode: z inside a group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= ch <= 0x75:
            raise ValueError(f"corrupt ASCII85Decode: byte 0x{ch:02x}")
        group.append(ch - 0x21)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            if v > 0xFFFFFFFF:
                raise ValueError("corrupt ASCII85Decode: group overflow")
            out += v.to_bytes(4, "big")
            group = []
    if group:
        if len(group) == 1:
            raise ValueError("corrupt ASCII85Decode: lone trailing char")
        n = len(group)
        v = 0
        for g in group + [84] * (5 - n):
            v = v * 85 + g
        out += v.to_bytes(4, "big")[: n - 1]
    return bytes(out)


def _runlength_decode(data: bytes) -> bytes:
    """§7.4.5 RunLengthDecode (PackBits): len byte L<128 copies L+1
    literals, 128<L<256 repeats the next byte 257-L times, 128 EOD."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        ln = data[i]
        if ln == 128:
            break
        if ln < 128:
            chunk = data[i + 1 : i + 2 + ln]
            if len(chunk) < ln + 1:
                raise ValueError("corrupt RunLengthDecode: truncated literal")
            out += chunk
            i += 2 + ln
        else:
            if i + 1 >= n:
                raise ValueError("corrupt RunLengthDecode: truncated run")
            out += data[i + 1 : i + 2] * (257 - ln)
            i += 2
    return bytes(out)


def _stream_of(body: bytes) -> bytes | None:
    """Decoded stream payload of an object body, or None if no stream.

    The payload is sliced by the stream dict's direct /Length when it
    is present and consistent (an uncompressed stream may legitimately
    end in CR/LF, which the endstream scan would strip — r5 advice);
    endstream scanning is the fallback for indirect or wrong lengths.
    Raises ValueError for filters beyond FlateDecode/LZWDecode."""
    i = body.find(b"stream")
    if i < 0:
        return None
    head = body[:i]
    j = i + len(b"stream")
    if body[j : j + 2] == b"\r\n":
        j += 2
    elif body[j : j + 1] in (b"\n", b"\r"):
        j += 1
    raw = None
    len_m = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)", head)
    if len_m:
        length = int(len_m.group(1))
        end = j + length
        if end <= len(body) and body[end:].lstrip(_WHITESPACE).startswith(
            b"endstream"
        ):
            raw = body[j:end]
    if raw is None:
        k = body.find(b"endstream", j)
        if k < 0:
            k = len(body)
        raw = body[j:k]
        while raw[-1:] in (b"\r", b"\n"):
            raw = raw[:-1]
    filt = re.search(rb"/Filter\s*(?:\[\s*)?/(\w+)", head)
    if filt is None:
        return raw
    name = filt.group(1)
    if name == b"LZWDecode":
        early_m = re.search(rb"/EarlyChange\s+(\d+)", head)
        payload = _lzw_decode(raw, int(early_m.group(1)) if early_m else 1)
        return _apply_parms(payload, head)
    if name == b"ASCIIHexDecode":
        return _ascii_hex_decode(raw)
    if name == b"ASCII85Decode":
        return _ascii85_decode(raw)
    if name == b"RunLengthDecode":
        return _runlength_decode(raw)
    if name != b"FlateDecode":
        raise ValueError(
            f"unsupported PDF stream filter /{name.decode('latin-1')}: the "
            "text-bearing filters (Flate/LZW/ASCIIHex/ASCII85/RunLength) "
            "are implemented; image filters (DCT/CCITT/JBIG2/JPX) are not"
        )
    try:
        payload = zlib.decompress(raw)
    except zlib.error:
        # tolerate trailing garbage after the deflate stream; a stream
        # that still fails is corrupt — ValueError, never a leaked
        # zlib.error (fuzz-pinned contract)
        try:
            payload = zlib.decompressobj().decompress(raw)
        except zlib.error as e:
            raise ValueError(f"corrupt FlateDecode stream: {e}") from None
    return _apply_parms(payload, head)


def _scan_objects(data: bytes) -> dict[int, tuple[int, bytes]]:
    """Top-level objects only: num -> (generation, body)."""
    out: dict[int, tuple[int, bytes]] = {}
    for m in _OBJ_RE.finditer(data):
        out[int(m.group(1))] = (int(m.group(2)), m.group(3))
    return out


def _collect_objects(data: bytes) -> dict[int, bytes]:
    """Scan every top-level object; expand /ObjStm object streams so
    PDF 1.5+ compressed-xref files are covered."""
    objs = {num: body for num, (_, body) in _scan_objects(data).items()}
    return _expand_objstm(objs)


def _expand_objstm(objs: dict[int, bytes]) -> dict[int, bytes]:
    for body in list(objs.values()):
        i = body.find(b"stream")
        if i < 0 or b"/ObjStm" not in body[:i]:
            continue
        n_m = re.search(rb"/N\s+(\d+)", body[:i])
        first_m = re.search(rb"/First\s+(\d+)", body[:i])
        payload = _stream_of(body)
        if not (n_m and first_m and payload):
            continue
        n, first = int(n_m.group(1)), int(first_m.group(1))
        header = payload[:first].split()
        pairs = [
            (int(header[2 * t]), int(header[2 * t + 1])) for t in range(n)
        ]
        for t, (num, off) in enumerate(pairs):
            end = pairs[t + 1][1] if t + 1 < n else len(payload) - first
            objs.setdefault(num, payload[first + off : first + end])
    return objs


def _page_order(objs: dict[int, bytes], data: bytes) -> list[int]:
    """Leaf page object numbers in Root->Pages->Kids order; document
    order as the fallback for malformed trees."""
    root_m = re.search(rb"/Root\s+(\d+)\s+\d+\s+R", data)
    order: list[int] = []
    if root_m:
        root = objs.get(int(root_m.group(1)), b"")
        pages_num = _find_ref(root, b"Pages")
        seen: set[int] = set()

        def walk(num: int | None) -> None:
            if num is None or num in seen or num not in objs:
                return
            seen.add(num)
            body = objs[num]
            kids = re.search(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)*)\s*\]", body)
            if kids:
                for km in re.finditer(rb"(\d+)\s+\d+\s+R", kids.group(1)):
                    walk(int(km.group(1)))
            elif re.search(rb"/Type\s*/Page\b", body):
                order.append(num)

        walk(pages_num)
    if not order:
        order = [
            num
            for num, body in objs.items()
            if re.search(rb"/Type\s*/Page\b", body)
            and not re.search(rb"/Type\s*/Pages\b", body)
        ]
    return order


def _content_streams(objs: dict[int, bytes], page: bytes) -> list[bytes]:
    arr = re.search(rb"/Contents\s*\[((?:\s*\d+\s+\d+\s+R)*)\s*\]", page)
    nums: list[int] = []
    if arr:
        nums = [int(m.group(1)) for m in re.finditer(rb"(\d+)\s+\d+\s+R", arr.group(1))]
    else:
        one = _find_ref(page, b"Contents")
        if one is not None:
            nums = [one]
    out = []
    for num in nums:
        body = objs.get(num)
        if body is None:
            continue
        payload = _stream_of(body)
        if payload is not None:
            out.append(payload)
    return out


def _decode_pdf_string(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace")
    if raw[:3] == b"\xef\xbb\xbf":  # PDF 2.0 §7.9.2.2 UTF-8 strings
        return raw[3:].decode("utf-8", "replace")
    return raw.decode("latin-1")


# ---------------------------------------------------------------------------
# font machinery: glyph names, /Encoding /Differences, /ToUnicode CMaps

# Adobe Glyph List subset: the standard ASCII + Latin punctuation /
# symbol / ligature names (public AGL). Accented Latin letters are
# composed algorithmically below, so they need no table entries.
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "exclamdown": "¡", "cent": "¢", "sterling": "£",
    "currency": "¤", "yen": "¥", "brokenbar": "¦",
    "section": "§", "dieresis": "¨", "copyright": "©",
    "ordfeminine": "ª", "guillemotleft": "«",
    "logicalnot": "¬", "registered": "®", "macron": "¯",
    "degree": "°", "plusminus": "±", "acute": "´",
    "mu": "µ", "paragraph": "¶", "periodcentered": "·",
    "cedilla": "¸", "ordmasculine": "º",
    "guillemotright": "»", "onequarter": "¼",
    "onehalf": "½", "threequarters": "¾",
    "questiondown": "¿", "multiply": "×", "divide": "÷",
    "AE": "Æ", "ae": "æ", "Eth": "Ð", "eth": "ð",
    "Thorn": "Þ", "thorn": "þ", "germandbls": "ß",
    "OE": "Œ", "oe": "œ", "Lslash": "Ł",
    "lslash": "ł", "Oslash": "Ø", "oslash": "ø",
    "dotlessi": "ı", "florin": "ƒ", "circumflex": "ˆ",
    "caron": "ˇ", "breve": "˘", "dotaccent": "˙",
    "ring": "˚", "ogonek": "˛", "tilde": "˜",
    "hungarumlaut": "˝", "endash": "–", "emdash": "—",
    "quoteleft": "‘", "quoteright": "’",
    "quotesinglbase": "‚", "quotedblleft": "“",
    "quotedblright": "”", "quotedblbase": "„",
    "dagger": "†", "daggerdbl": "‡", "bullet": "•",
    "ellipsis": "…", "perthousand": "‰",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "fraction": "⁄", "Euro": "€", "euro": "€",
    "trademark": "™", "minus": "−", "fi": "ﬁ",
    "fl": "ﬂ",
}

_ACCENT_NAMES = {
    "grave": "GRAVE", "acute": "ACUTE", "circumflex": "CIRCUMFLEX",
    "tilde": "TILDE", "dieresis": "DIAERESIS", "ring": "RING ABOVE",
    "cedilla": "CEDILLA", "macron": "MACRON", "breve": "BREVE",
    "caron": "CARON", "hungarumlaut": "DOUBLE ACUTE",
    "ogonek": "OGONEK", "dotaccent": "DOT ABOVE",
}


def _glyph_to_char(name: str) -> str:
    """AGL-style glyph name -> character(s). Algorithmic forms
    (uniXXXX / uXXXX[XX], accent composition) first, then the table;
    unknown names map to '' — documented lossy, never wrong bytes."""
    if not name:
        return ""
    if len(name) == 1:
        return name  # single-char names map to themselves (AGL rule)
    if name.startswith("uni") and len(name) >= 7:
        try:
            units = [
                int(name[i : i + 4], 16) for i in range(3, len(name) - 3, 4)
            ]
            return (
                b"".join(u.to_bytes(2, "big") for u in units)
            ).decode("utf-16-be", "replace")
        except ValueError:
            return ""
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return chr(int(name[1:], 16))
        except (ValueError, OverflowError):
            return ""
    if name in _AGL:
        return _AGL[name]
    # compose accented Latin: 'eacute' -> LATIN SMALL LETTER E WITH ACUTE
    for suffix, uni_accent in _ACCENT_NAMES.items():
        if name.endswith(suffix) and len(name) == 1 + len(suffix):
            base = name[0]
            if base.isalpha() and base.isascii():
                case = "CAPITAL" if base.isupper() else "SMALL"
                try:
                    return unicodedata.lookup(
                        f"LATIN {case} LETTER {base.upper()} WITH {uni_accent}"
                    )
                except KeyError:
                    return ""
    return ""


class _CMapDecoder:
    """Decode font byte codes via a parsed /ToUnicode CMap
    (ISO 32000-1 §9.10.3)."""

    def __init__(self, cmap: bytes) -> None:
        self.single: dict[int, str] = {}
        self.ranges: list[tuple[int, int, int, str | list[str]]] = []
        self.code_lens: list[tuple[int, int, int]] = []  # (nbytes, lo, hi)
        self._parse(cmap)
        if not self.code_lens:
            self.code_lens = [(2, 0x0000, 0xFFFF)]

    @staticmethod
    def _hexes(chunk: bytes):
        return re.findall(rb"<([0-9A-Fa-f]+)>", chunk)

    @staticmethod
    def _utf16(hexbytes: bytes) -> str:
        digits = hexbytes.decode("ascii")
        if len(digits) % 2:
            digits += "0"
        return bytes.fromhex(digits).decode("utf-16-be", "replace")

    def _parse(self, cmap: bytes) -> None:
        for m in re.finditer(
            rb"begincodespacerange(.*?)endcodespacerange", cmap, re.S
        ):
            hx = self._hexes(m.group(1))
            for lo, hi in zip(hx[0::2], hx[1::2]):
                nbytes = max(1, len(lo) // 2)
                self.code_lens.append(
                    (nbytes, int(lo, 16), int(hi, 16))
                )
        for m in re.finditer(rb"beginbfchar(.*?)endbfchar", cmap, re.S):
            hx = self._hexes(m.group(1))
            for src, dst in zip(hx[0::2], hx[1::2]):
                self.single[int(src, 16)] = self._utf16(dst)
        for m in re.finditer(rb"beginbfrange(.*?)endbfrange", cmap, re.S):
            body = m.group(1)
            i = 0
            token = re.compile(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
                rb"(?:<([0-9A-Fa-f]+)>|\[((?:\s*<[0-9A-Fa-f]+>)*)\s*\])"
            )
            for tm in token.finditer(body):
                lo, hi = int(tm.group(1), 16), int(tm.group(2), 16)
                if tm.group(3) is not None:
                    self.ranges.append(
                        (lo, hi, len(tm.group(1)) // 2, self._utf16(tm.group(3)))
                    )
                else:
                    dsts = [self._utf16(h) for h in self._hexes(tm.group(4))]
                    self.ranges.append((lo, hi, len(tm.group(1)) // 2, dsts))
            del i

    def _lookup(self, code: int) -> str | None:
        hit = self.single.get(code)
        if hit is not None:
            return hit
        for lo, hi, _nb, dst in self.ranges:
            if lo <= code <= hi:
                if isinstance(dst, list):
                    return dst[code - lo] if code - lo < len(dst) else ""
                if not dst:
                    return ""
                # incrementing last UTF-16 unit (§9.10.3 bfrange rule)
                units = dst.encode("utf-16-be")
                last = int.from_bytes(units[-2:], "big") + (code - lo)
                return (units[:-2] + last.to_bytes(2, "big")).decode(
                    "utf-16-be", "replace"
                )
        return None

    def decode(self, raw: bytes) -> str:
        out: list[str] = []
        i, n = 0, len(raw)
        lens = sorted({nb for nb, _, _ in self.code_lens})
        while i < n:
            matched = False
            for nb, lo, hi in self.code_lens:
                if i + nb <= n:
                    code = int.from_bytes(raw[i : i + nb], "big")
                    if lo <= code <= hi:
                        hit = self._lookup(code)
                        if hit is not None:
                            out.append(hit)
                        i += nb
                        matched = True
                        break
            if not matched:
                # outside every codespace: consume the shortest code
                # width and drop it (spec: treat as undefined)
                i += lens[0] if lens else 1
        return "".join(out)


class _TableDecoder:
    """Decode 1-byte codes via a 256-entry table built from a base
    encoding (+ /Differences)."""

    def __init__(self, table: list[str]) -> None:
        self.table = table

    def decode(self, raw: bytes) -> str:
        return "".join(self.table[b] for b in raw)


def _base_encoding_table(name: bytes) -> list[str]:
    if name == b"WinAnsiEncoding":
        return [
            bytes([i]).decode("cp1252", "replace").replace("�", "")
            for i in range(256)
        ]
    if name == b"MacRomanEncoding":
        return [bytes([i]).decode("mac_roman") for i in range(256)]
    # StandardEncoding (and the default): ASCII range matches Latin-1;
    # the high range is font-specific — extract ASCII, drop the rest
    return [chr(i) if 32 <= i < 127 else "" for i in range(256)]


def _encoding_decoder(enc_body: bytes) -> _TableDecoder:
    base_m = re.search(rb"/BaseEncoding\s*/(\w+)", enc_body)
    table = _base_encoding_table(base_m.group(1) if base_m else b"")
    diff_m = re.search(rb"/Differences\s*\[(.*?)\]", enc_body, re.S)
    if diff_m:
        code = 0
        for tok in re.finditer(
            rb"(\d+)|/([^\s/<>\[\]()]+)", diff_m.group(1)
        ):
            if tok.group(1) is not None:
                code = int(tok.group(1))
            else:
                if code < 256:
                    table[code] = _glyph_to_char(
                        tok.group(2).decode("latin-1")
                    )
                code += 1
    return _TableDecoder(table)


def _font_decoders(objs: dict[int, bytes], page: bytes) -> dict[bytes, object]:
    """Resource-name -> decoder for the page's /Font resources. Fonts
    with neither /ToUnicode nor a usable /Encoding get no entry, and
    strings shown in them fall back to the default PDFDoc/UTF-16BE
    heuristic (correct for unembedded standard-14 text)."""
    out: dict[bytes, object] = {}
    fm = re.search(
        rb"/Font\s*<<((?:[^<>]|<<(?:[^<>]|<<[^<>]*>>)*>>)*)>>", page
    )
    if not fm:
        return out
    for m in re.finditer(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R", fm.group(1)):
        body = objs.get(int(m.group(2)))
        if body is None:
            continue
        tu_num = _find_ref(body, b"ToUnicode")
        if tu_num is not None and tu_num in objs:
            try:
                cmap = _stream_of(objs[tu_num])
            except ValueError:
                cmap = None
            if cmap:
                out[m.group(1)] = _CMapDecoder(cmap)
                continue
        enc_ref = _find_ref(body, b"Encoding")
        enc_body: bytes | None = None
        if enc_ref is not None and enc_ref in objs:
            enc_body = objs[enc_ref]
        else:
            em = re.search(
                rb"/Encoding\s*(<<(?:[^<>]|<<[^<>]*>>)*>>|/\w+)", body
            )
            if em:
                enc_body = em.group(1)
        if enc_body is not None and (
            b"/Differences" in enc_body
            or b"WinAnsiEncoding" in enc_body
            or b"MacRomanEncoding" in enc_body
        ):
            if enc_body.startswith(b"/"):
                enc_body = b"/BaseEncoding " + enc_body
            out[m.group(1)] = _encoding_decoder(enc_body)
    return out


_LIT_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\x0c",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _lit_string(cs: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(...)`` literal string starting at cs[i] == '('.
    Handles nesting, the standard escapes, octal escapes, and
    line-continuation backslashes (ISO 32000-1 §7.3.4.2)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(cs)
    while i < n and depth:
        c = cs[i : i + 1]
        if c == b"\\":
            nxt = cs[i + 1 : i + 2]
            if nxt in _LIT_ESCAPES:
                out += _LIT_ESCAPES[nxt]
                i += 2
            elif nxt.isdigit():
                j = i + 1
                while j < min(i + 4, n) and cs[j : j + 1].isdigit():
                    j += 1
                out.append(int(cs[i + 1 : j], 8) & 0xFF)
                i = j
            elif nxt in (b"\n", b"\r"):  # continuation: swallow the EOL
                i += 2
                if nxt == b"\r" and cs[i : i + 1] == b"\n":
                    i += 1
            else:
                out += nxt
                i += 2
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


def _hex_string(cs: bytes, i: int) -> tuple[bytes, int]:
    j = cs.find(b">", i)
    if j < 0:
        j = len(cs)
    digits = re.sub(rb"[^0-9A-Fa-f]", b"", cs[i + 1 : j])
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")), j + 1


def _skip_dict(cs: bytes, i: int) -> int:
    """Skip a ``<< .. >>`` dictionary (depth-aware; strings inside are
    skipped with the real string parsers so ')' / '>>' in data don't
    confuse the depth count)."""
    depth = 0
    n = len(cs)
    while i < n:
        if cs[i : i + 2] == b"<<":
            depth += 1
            i += 2
        elif cs[i : i + 2] == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return i
        elif cs[i : i + 1] == b"(":
            _, i = _lit_string(cs, i)
        elif cs[i : i + 1] == b"<":
            _, i = _hex_string(cs, i)
        else:
            i += 1
    return i


def _form_xobjects(objs: dict[int, bytes], page: bytes) -> dict[bytes, bytes]:
    """Name -> decoded stream for the page's /Subtype /Form XObjects
    (r5): text drawn via ``/Fm1 Do`` lives in these streams, which the
    page-content walk alone would miss. Image XObjects are skipped."""
    res = {}
    xm = re.search(
        rb"/XObject\s*<<((?:[^<>]|<<(?:[^<>]|<<[^<>]*>>)*>>)*)>>", page
    )
    if not xm:
        return res
    for m in re.finditer(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R", xm.group(1)):
        body = objs.get(int(m.group(2)))
        if body is None:
            continue
        head = body[: body.find(b"stream") if b"stream" in body else len(body)]
        if not re.search(rb"/Subtype\s*/Form\b", head):
            continue
        try:
            payload = _stream_of(body)
        except ValueError:
            continue  # unsupported filter on a form: skip, page text survives
        if payload is not None:
            res[m.group(1)] = payload
    return res


def _page_text(
    cs: bytes,
    forms: dict[bytes, bytes] | None = None,
    fonts: dict[bytes, object] | None = None,
    depth: int = 0,
) -> tuple[list[str], bool]:
    """Extract text pieces from one content stream. Returns
    (pieces, any_show_op). Newlines from line-advance operators are
    suppressed until the first show operator so the initial cursor
    positioning (``72 720 Td``) doesn't inject a leading break.
    ``Tf`` selects the current font, whose /ToUnicode CMap or
    /Encoding table decodes subsequent shown strings (r6); fonts
    without one fall back to the PDFDoc/UTF-16BE heuristic.
    ``Do`` on a known /Form XObject recurses into the form's stream
    in place (depth-capped — forms can nest and cycle)."""
    out: list[str] = []
    operands: list = []
    shown = False
    last_tm_y: float | None = None
    cur_font: object | None = None
    i, n = 0, len(cs)

    def decode(raw: bytes) -> str:
        if cur_font is not None:
            return cur_font.decode(raw)
        return _decode_pdf_string(raw)

    def newline() -> None:
        if shown:
            out.append("\n")

    while i < n:
        c = cs[i : i + 1]
        if c in b"\x00\t\n\x0c\r ":
            i += 1
        elif c == b"%":
            j = cs.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == b"(":
            s, i = _lit_string(cs, i)
            operands.append(s)
        elif c == b"<":
            if cs[i : i + 2] == b"<<":
                i = _skip_dict(cs, i)
            else:
                s, i = _hex_string(cs, i)
                operands.append(s)
        elif c == b"[":
            operands.append("[")
            i += 1
        elif c == b"]":
            arr: list = []
            while operands and operands[-1] != "[":
                arr.append(operands.pop())
            if operands:
                operands.pop()
            arr.reverse()
            operands.append(arr)
            i += 1
        elif c == b"/":
            j = i + 1
            while j < n and cs[j] not in _WHITESPACE + _DELIMS:
                j += 1
            operands.append(("name", cs[i:j]))
            i = j
        elif c in b"+-.0123456789":
            j = i + 1
            while j < n and cs[j : j + 1] in b"+-.0123456789eE":
                j += 1
            try:
                operands.append(float(cs[i:j]))
            except ValueError:
                pass
            i = j
        elif c == b"{" or c == b"}":
            i += 1
        else:
            j = i
            while j < n and cs[j] not in _WHITESPACE + _DELIMS:
                j += 1
            if j == i:  # stray delimiter (corrupt stream): skip, don't spin
                i += 1
                continue
            op = cs[i:j]
            i = j
            if op == b"Tj" and operands and isinstance(operands[-1], bytes):
                out.append(decode(operands[-1]))
                shown = True
            elif op in (b"'", b'"'):
                newline()
                strs = [o for o in operands if isinstance(o, bytes)]
                if strs:
                    out.append(decode(strs[-1]))
                shown = True
            elif op == b"TJ" and operands and isinstance(operands[-1], list):
                for el in operands[-1]:
                    if isinstance(el, bytes):
                        out.append(decode(el))
                        shown = True
                    elif isinstance(el, float) and el < -180:
                        # large negative kern == inter-word gap
                        out.append(" ")
            elif op == b"Tf":
                name = next(
                    (o[1] for o in reversed(operands)
                     if isinstance(o, tuple) and o[0] == "name"),
                    None,
                )
                if fonts is not None and name is not None:
                    cur_font = fonts.get(name[1:])
            elif op in (b"Td", b"TD"):
                if len(operands) >= 2 and isinstance(operands[-1], float):
                    if operands[-1] != 0.0:
                        newline()
            elif op == b"T*":
                newline()
            elif op == b"Tm":
                if len(operands) >= 6 and isinstance(operands[-1], float):
                    ty = operands[-1]
                    if last_tm_y is not None and ty != last_tm_y:
                        newline()
                    last_tm_y = ty
            elif op == b"BT":
                last_tm_y = None
            elif op == b"BI":
                # inline image: raw binary follows the ID operator up
                # to a whitespace-delimited EI — walking into it would
                # misparse pixel bytes as operators/text (ISO 32000-1
                # §8.9.7). Skip the whole object.
                id_at = cs.find(b"ID", i)
                scan_from = id_at + 3 if id_at >= 0 else i
                m2 = re.search(rb"[\x00\t\n\x0c\r ]EI(?=[\x00\t\n\x0c\r ]|$)",
                               cs[scan_from:])
                i = scan_from + m2.end() if m2 else n
            elif op == b"Do" and forms and depth < 8:
                name = next(
                    (o[1] for o in reversed(operands)
                     if isinstance(o, tuple) and o[0] == "name"),
                    None,
                )
                if name is not None and name[1:] in forms:
                    sub, sub_shown = _page_text(
                        forms[name[1:]], forms, fonts, depth + 1
                    )
                    out.extend(sub)
                    shown = shown or sub_shown
            operands.clear()
    return out, shown


# ---------------------------------------------------------------------------
# encryption: standard security handler, empty user password (r6)
# (ISO 32000-1 §7.6.3 — RC4 variants V1/V2, R2/R3; the algorithms and
# the 32-byte padding string are printed in the public standard)

_PW_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


# --- AES-128 (FIPS-197), stdlib-only. The S-box is GENERATED from the
# field definition (multiplicative inverse in GF(2^8) mod 0x11B, then
# the affine transform with 0x63) rather than pasted as a table, and
# tests assert sbox[inv_sbox[x]] == x and MixColumns∘InvMixColumns ==
# identity — the implementation is self-verifying, not spec-numeric.


def _gf_mul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return p


def _build_sbox() -> tuple[bytes, bytes]:
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    sbox = bytearray(256)
    for x in range(256):
        b = inv[x]
        s = 0x63
        for i in range(8):
            bit = (
                (b >> i)
                ^ (b >> ((i + 4) % 8))
                ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8))
                ^ (b >> ((i + 7) % 8))
            ) & 1
            s ^= bit << i
        sbox[x] = s
    inv_sbox = bytearray(256)
    for x in range(256):
        inv_sbox[sbox[x]] = x
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()
# precomputed GF(2^8) multiplication columns for the (Inv)MixColumns
# circulants — pure-python per-byte _gf_mul is ~10x slower
_GF_TABLES = {
    m: bytes(_gf_mul(x, m) for x in range(256))
    for m in (2, 3, 9, 11, 13, 14)
}


def _rotr8(w: int, n: int) -> int:
    return ((w >> n) | (w << (32 - n))) & 0xFFFFFFFF


def _build_t_tables() -> tuple[tuple[tuple[int, ...], ...],
                               tuple[tuple[int, ...], ...]]:
    """Word-oriented round tables (the classic T-table formulation),
    GENERATED from the derived S-box and GF multiplication columns —
    still zero pasted spec constants. T0[x] packs MixColumns applied
    to S[x] in the row-0 position; TD0 is its inverse-cipher twin;
    T1..T3 / TD1..TD3 are byte rotations for the other rows."""
    t2, t3 = _GF_TABLES[2], _GF_TABLES[3]
    t9, t11 = _GF_TABLES[9], _GF_TABLES[11]
    t13, t14 = _GF_TABLES[13], _GF_TABLES[14]
    t0 = tuple(
        (t2[s] << 24) | (s << 16) | (s << 8) | t3[s]
        for s in _SBOX
    )
    td0 = tuple(
        (t14[d] << 24) | (t9[d] << 16) | (t13[d] << 8) | t11[d]
        for d in _INV_SBOX
    )
    enc = (t0,) + tuple(tuple(_rotr8(w, 8 * k) for w in t0) for k in (1, 2, 3))
    dec = (td0,) + tuple(
        tuple(_rotr8(w, 8 * k) for w in td0) for k in (1, 2, 3)
    )
    return enc, dec


(_T0, _T1, _T2, _T3), (_TD0, _TD1, _TD2, _TD3) = _build_t_tables()


def _imc_word(w: int) -> int:
    """InvMixColumns applied to one packed round-key word (for the
    equivalent inverse cipher's key schedule)."""
    t9, t11 = _GF_TABLES[9], _GF_TABLES[11]
    t13, t14 = _GF_TABLES[13], _GF_TABLES[14]
    a0, a1, a2, a3 = (w >> 24) & 0xFF, (w >> 16) & 0xFF, (w >> 8) & 0xFF, w & 0xFF
    return (
        ((t14[a0] ^ t11[a1] ^ t13[a2] ^ t9[a3]) << 24)
        | ((t9[a0] ^ t14[a1] ^ t11[a2] ^ t13[a3]) << 16)
        | ((t13[a0] ^ t9[a1] ^ t14[a2] ^ t11[a3]) << 8)
        | (t11[a0] ^ t13[a1] ^ t9[a2] ^ t14[a3])
    )


def _aes_expand_key(key: bytes) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """FIPS-197 key expansion for AES-128 (Nk=4, Nr=10) and AES-256
    (Nk=8, Nr=14). Returns (enc_rk, dec_rk): packed uint32 round-key
    words for the forward cipher and for the equivalent inverse cipher
    (middle rounds passed through InvMixColumns, order reversed)."""
    nk = len(key) // 4
    if nk not in (4, 8) or len(key) % 4:
        raise ValueError(f"AES key must be 16 or 32 bytes, got {len(key)}")
    nr = nk + 6
    words = [int.from_bytes(key[4 * i : 4 * i + 4], "big") for i in range(nk)]
    rcon = 1
    sbox = _SBOX
    for i in range(nk, 4 * (nr + 1)):
        w = words[i - 1]
        if i % nk == 0:
            w = ((w << 8) | (w >> 24)) & 0xFFFFFFFF  # RotWord
            w = (
                (sbox[(w >> 24) & 0xFF] << 24)
                | (sbox[(w >> 16) & 0xFF] << 16)
                | (sbox[(w >> 8) & 0xFF] << 8)
                | sbox[w & 0xFF]
            )
            w ^= rcon << 24
            rcon = _gf_mul(rcon, 2)
        elif nk > 6 and i % nk == 4:
            w = (
                (sbox[(w >> 24) & 0xFF] << 24)
                | (sbox[(w >> 16) & 0xFF] << 16)
                | (sbox[(w >> 8) & 0xFF] << 8)
                | sbox[w & 0xFF]
            )
        words.append(words[i - nk] ^ w)
    enc = tuple(words)
    dec = list(enc[4 * nr : 4 * nr + 4])
    for rnd in range(1, nr):
        dec.extend(_imc_word(w) for w in enc[4 * (nr - rnd) : 4 * (nr - rnd) + 4])
    dec.extend(enc[0:4])
    return enc, tuple(dec)


def _aes_decrypt_block(block: bytes, ks) -> bytes:
    rk = ks[1]
    nr = len(rk) // 4 - 1
    w0 = int.from_bytes(block[0:4], "big") ^ rk[0]
    w1 = int.from_bytes(block[4:8], "big") ^ rk[1]
    w2 = int.from_bytes(block[8:12], "big") ^ rk[2]
    w3 = int.from_bytes(block[12:16], "big") ^ rk[3]
    td0, td1, td2, td3 = _TD0, _TD1, _TD2, _TD3
    k = 4
    for _ in range(nr - 1):
        e0 = td0[w0 >> 24] ^ td1[(w3 >> 16) & 0xFF] ^ td2[(w2 >> 8) & 0xFF] ^ td3[w1 & 0xFF] ^ rk[k]
        e1 = td0[w1 >> 24] ^ td1[(w0 >> 16) & 0xFF] ^ td2[(w3 >> 8) & 0xFF] ^ td3[w2 & 0xFF] ^ rk[k + 1]
        e2 = td0[w2 >> 24] ^ td1[(w1 >> 16) & 0xFF] ^ td2[(w0 >> 8) & 0xFF] ^ td3[w3 & 0xFF] ^ rk[k + 2]
        e3 = td0[w3 >> 24] ^ td1[(w2 >> 16) & 0xFF] ^ td2[(w1 >> 8) & 0xFF] ^ td3[w0 & 0xFF] ^ rk[k + 3]
        w0, w1, w2, w3 = e0, e1, e2, e3
        k += 4
    si = _INV_SBOX
    o0 = ((si[w0 >> 24] << 24) | (si[(w3 >> 16) & 0xFF] << 16) | (si[(w2 >> 8) & 0xFF] << 8) | si[w1 & 0xFF]) ^ rk[k]
    o1 = ((si[w1 >> 24] << 24) | (si[(w0 >> 16) & 0xFF] << 16) | (si[(w3 >> 8) & 0xFF] << 8) | si[w2 & 0xFF]) ^ rk[k + 1]
    o2 = ((si[w2 >> 24] << 24) | (si[(w1 >> 16) & 0xFF] << 16) | (si[(w0 >> 8) & 0xFF] << 8) | si[w3 & 0xFF]) ^ rk[k + 2]
    o3 = ((si[w3 >> 24] << 24) | (si[(w2 >> 16) & 0xFF] << 16) | (si[(w1 >> 8) & 0xFF] << 8) | si[w0 & 0xFF]) ^ rk[k + 3]
    return (
        o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
        + o2.to_bytes(4, "big") + o3.to_bytes(4, "big")
    )


def _aes_encrypt_block(block: bytes, ks) -> bytes:
    rk = ks[0]
    nr = len(rk) // 4 - 1
    w0 = int.from_bytes(block[0:4], "big") ^ rk[0]
    w1 = int.from_bytes(block[4:8], "big") ^ rk[1]
    w2 = int.from_bytes(block[8:12], "big") ^ rk[2]
    w3 = int.from_bytes(block[12:16], "big") ^ rk[3]
    t0, t1, t2, t3 = _T0, _T1, _T2, _T3
    k = 4
    for _ in range(nr - 1):
        e0 = t0[w0 >> 24] ^ t1[(w1 >> 16) & 0xFF] ^ t2[(w2 >> 8) & 0xFF] ^ t3[w3 & 0xFF] ^ rk[k]
        e1 = t0[w1 >> 24] ^ t1[(w2 >> 16) & 0xFF] ^ t2[(w3 >> 8) & 0xFF] ^ t3[w0 & 0xFF] ^ rk[k + 1]
        e2 = t0[w2 >> 24] ^ t1[(w3 >> 16) & 0xFF] ^ t2[(w0 >> 8) & 0xFF] ^ t3[w1 & 0xFF] ^ rk[k + 2]
        e3 = t0[w3 >> 24] ^ t1[(w0 >> 16) & 0xFF] ^ t2[(w1 >> 8) & 0xFF] ^ t3[w2 & 0xFF] ^ rk[k + 3]
        w0, w1, w2, w3 = e0, e1, e2, e3
        k += 4
    s = _SBOX
    o0 = ((s[w0 >> 24] << 24) | (s[(w1 >> 16) & 0xFF] << 16) | (s[(w2 >> 8) & 0xFF] << 8) | s[w3 & 0xFF]) ^ rk[k]
    o1 = ((s[w1 >> 24] << 24) | (s[(w2 >> 16) & 0xFF] << 16) | (s[(w3 >> 8) & 0xFF] << 8) | s[w0 & 0xFF]) ^ rk[k + 1]
    o2 = ((s[w2 >> 24] << 24) | (s[(w3 >> 16) & 0xFF] << 16) | (s[(w0 >> 8) & 0xFF] << 8) | s[w1 & 0xFF]) ^ rk[k + 2]
    o3 = ((s[w3 >> 24] << 24) | (s[(w0 >> 16) & 0xFF] << 16) | (s[(w1 >> 8) & 0xFF] << 8) | s[w2 & 0xFF]) ^ rk[k + 3]
    return (
        o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
        + o2.to_bytes(4, "big") + o3.to_bytes(4, "big")
    )


def _aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AESV2 payload: 16-byte IV || ciphertext; PKCS#5 padding."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("corrupt AESV2 payload (bad length)")
    words = _aes_expand_key(key)
    iv = data[:16]
    out = bytearray()
    prev = iv
    for i in range(16, len(data), 16):
        block = data[i : i + 16]
        plain = _aes_decrypt_block(block, words)
        out += bytes(a ^ b for a, b in zip(plain, prev))
        prev = block
    pad = out[-1]
    if not 1 <= pad <= 16:
        raise ValueError("corrupt AESV2 payload (bad padding)")
    return bytes(out[:-pad])


def _aes_cbc_encrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt, NO padding and NO IV prefix (data % 16 == 0) —
    the primitive the R6 hardened hash and UE/OE unwrapping use."""
    words = _aes_expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _aes_encrypt_block(block, words)
        out += prev
    return bytes(out)


def _aes_cbc_decrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
    words = _aes_expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i : i + 16]
        plain = _aes_decrypt_block(block, words)
        out += bytes(a ^ b for a, b in zip(plain, prev))
        prev = block
    return bytes(out)


def _aes_cbc_encrypt(key: bytes, data: bytes, iv: bytes) -> bytes:
    pad = 16 - len(data) % 16
    return iv + _aes_cbc_encrypt_raw(key, iv, data + bytes([pad]) * pad)


import functools

# KDF results shipped from the driver (see prime_hash_2b): a corpus
# written under ONE security policy has exactly a handful of distinct
# (pw, salt, udata) inputs, and recomputing the deliberately-slow
# hardened hash in every fresh Python worker is pure waste — the same
# broadcast-the-trained-artifact shape as shipping k-means codebooks.
_HASH2B_PRIMED: dict[tuple[bytes, bytes, bytes], bytes] = {}


def prime_hash_2b(pairs) -> None:
    """Install driver-precomputed Algorithm 2.B results ((pw, salt,
    udata) -> digest pairs). Only exact-match inputs are affected;
    any other document still computes the full KDF."""
    _HASH2B_PRIMED.update(pairs)


@functools.lru_cache(maxsize=256)
def _hash_2b(pw: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B hardened hash (R6): SHA-256 seed,
    then >=64 rounds of AES-128-CBC over 64 repeats of (pw|K|udata)
    with the digest size steered by the ciphertext. The KDF is a
    deliberately slow password hardener (~0.3 s here), so results are
    memoized on the exact (pw, salt, udata) input: corpora whose files
    share one security policy — same salts, same password — pay it
    once per worker instead of once per document; unique salts simply
    miss the cache and pay full price, as they must. Driver-shipped
    results (prime_hash_2b) short-circuit the computation entirely."""
    import hashlib

    hit = _HASH2B_PRIMED.get((pw, salt, udata))
    if hit is not None:
        return hit

    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = _aes_cbc_encrypt_raw(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
            sum(e[:16]) % 3
        ](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for t, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[t] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _enc_string_at(body: bytes, key: bytes) -> bytes | None:
    """Value bytes of /O or /U style 32-byte string entries."""
    m = re.search(rb"/" + key + rb"\s*(\(|<(?!<))", body)
    if not m:
        return None
    at = m.start(1)
    if body[at : at + 1] == b"(":
        raw, _ = _lit_string(body, at)
    else:
        raw, _ = _hex_string(body, at)
    return raw


class _StdDecryptor:
    """Empty-user-password standard security handler (Algorithms 2/4/5
    of §7.6.3). Raises ValueError when the document needs a real
    password or uses an unimplemented V/R/crypt filter."""

    def __init__(self, enc_body: bytes, file_id: bytes) -> None:
        import hashlib

        filt = re.search(rb"/Filter\s*/(\w+)", enc_body)
        if not filt or filt.group(1) != b"Standard":
            raise ValueError(
                "encrypted PDF: only the /Standard security handler is "
                "implemented"
            )
        v_m = re.search(rb"/V\s+(\d+)", enc_body)
        r_m = re.search(rb"/R\s+(\d+)", enc_body)
        v = int(v_m.group(1)) if v_m else 0
        r = int(r_m.group(1)) if r_m else 2
        self.aes = False
        self.v5 = False
        if v == 5 and r == 6:
            # PDF 2.0 AES-256 (AESV3): SHA-2 hardened hash, file key
            # unwrapped from /UE; strings/streams use the file key
            # directly (no per-object derivation)
            u = _enc_string_at(enc_body, b"U")
            ue = _enc_string_at(enc_body, b"UE")
            if u is None or len(u) < 48 or ue is None or len(ue) < 32:
                raise ValueError("encrypted PDF: V5 /U /UE entries missing")
            if _hash_2b(b"", u[32:40], b"") != u[:32]:
                raise ValueError(
                    "encrypted PDF: non-empty user password required "
                    "(R6 hardened-hash check failed)"
                )
            ik = _hash_2b(b"", u[40:48], b"")
            self.key = _aes_cbc_decrypt_raw(ik, b"\x00" * 16, ue[:32])
            self.aes = True
            self.v5 = True
            return
        if v == 4 and r == 4:
            # crypt-filter layer: require the default StdCF with AESV2
            # (AES-128-CBC) or V2 (RC4) as both StmF and StrF
            cfm = re.search(rb"/CFM\s*/(\w+)", enc_body)
            if cfm is None or cfm.group(1) not in (b"AESV2", b"V2"):
                raise ValueError(
                    "encrypted PDF: V4 crypt filter other than AESV2/V2 "
                    "(e.g. AESV3/Identity) not implemented"
                )
            self.aes = cfm.group(1) == b"AESV2"
        elif v not in (1, 2) or r not in (2, 3):
            raise ValueError(
                f"encrypted PDF: V={v} R={r} not implemented — RC4 V1/V2 "
                "R2/R3 and AESV2 V4/R4 are"
            )
        len_m = re.search(rb"/Length\s+(\d+)", enc_body)
        n = (int(len_m.group(1)) // 8) if len_m else 5
        if r == 2:
            n = 5
        if self.aes:
            n = 16
        self.no_meta_salt = b""
        if r >= 4 and re.search(rb"/EncryptMetadata\s+false", enc_body):
            self.no_meta_salt = b"\xff\xff\xff\xff"
        o = _enc_string_at(enc_body, b"O")
        u = _enc_string_at(enc_body, b"U")
        p_m = re.search(rb"/P\s+(-?\d+)", enc_body)
        if o is None or u is None or p_m is None:
            raise ValueError("encrypted PDF: /O /U /P entries missing")
        p = int(p_m.group(1)) & 0xFFFFFFFF
        h = hashlib.md5(
            _PW_PAD + o[:32] + p.to_bytes(4, "little") + file_id
            + self.no_meta_salt
        ).digest()
        if r >= 3:
            for _ in range(50):
                h = hashlib.md5(h[:n]).digest()
        self.key = h[:n]
        # verify the empty USER password against /U
        if r == 2:
            expect = _rc4(self.key, _PW_PAD)
            ok = expect == u[:32]
        else:
            e = hashlib.md5(_PW_PAD + file_id).digest()
            e = _rc4(self.key, e)
            for i in range(1, 20):
                e = _rc4(bytes(b ^ i for b in self.key), e)
            ok = e == u[:16]
        if not ok:
            raise ValueError(
                "encrypted PDF: non-empty user password required "
                "(standard handler check failed)"
            )

    def obj_key(self, num: int, gen: int) -> bytes:
        import hashlib

        if self.v5:
            return self.key  # AESV3: the file key IS the object key
        salt = b"sAlT" if self.aes else b""
        return hashlib.md5(
            self.key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
            + salt
        ).digest()[: min(len(self.key) + 5, 16)]

    def decrypt(self, data: bytes, num: int, gen: int) -> bytes:
        ok = self.obj_key(num, gen)
        if self.aes:
            return _aes_cbc_decrypt(ok, data)
        return _rc4(ok, data)


def _decrypt_object(body: bytes, num: int, gen: int, dec: _StdDecryptor) -> bytes:
    """Decrypt an object's stream payload and string tokens in place,
    returning a plaintext body the rest of the pipeline can treat as
    unencrypted. RC4 preserves lengths, so /Length stays valid."""
    out = bytearray()
    i = body.find(b"stream")
    dict_part = body if i < 0 else body[:i]
    j = 0
    n = len(dict_part)
    while j < n:
        c = dict_part[j : j + 1]
        if c == b"(":
            raw, j2 = _lit_string(dict_part, j)
            out += b"<" + dec.decrypt(raw, num, gen).hex().encode("ascii") + b">"
            j = j2
        elif dict_part[j : j + 2] in (b"<<", b">>"):
            out += dict_part[j : j + 2]
            j += 2
        elif c == b"<":
            raw, j2 = _hex_string(dict_part, j)
            out += b"<" + dec.decrypt(raw, num, gen).hex().encode("ascii") + b">"
            j = j2
        else:
            out += c
            j += 1
    if i < 0:
        return bytes(out)
    # stream payload: slice exactly as _stream_of would, decrypt, re-emit
    j = i + len(b"stream")
    if body[j : j + 2] == b"\r\n":
        j += 2
    elif body[j : j + 1] in (b"\n", b"\r"):
        j += 1
    raw = None
    len_m = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)", dict_part)
    if len_m:
        end = j + int(len_m.group(1))
        if end <= len(body) and body[end:].lstrip(_WHITESPACE).startswith(
            b"endstream"
        ):
            raw = body[j:end]
    if raw is None:
        k = body.find(b"endstream", j)
        if k < 0:
            k = len(body)
        raw = body[j:k]
        while raw[-1:] in (b"\r", b"\n"):
            raw = raw[:-1]
    new_payload = dec.decrypt(raw, num, gen)
    if len(new_payload) != len(raw):
        # AES adds IV+padding (encrypt) or strips them (decrypt): the
        # dict's /Length must track the stored payload or the reader's
        # slice-by-length falls back to endstream scanning, which can
        # eat ciphertext bytes that happen to end in CR/LF
        out = bytearray(
            re.sub(
                rb"/Length\s+\d+(?!\s+\d+\s+R)",
                b"/Length %d" % len(new_payload),
                bytes(out),
                count=1,
            )
        )
    out += b"stream\n" + new_payload + b"\nendstream"
    return bytes(out)


def _decrypt_document(data: bytes) -> dict[int, bytes]:
    """Build the plaintext object map of an encrypted PDF (empty user
    password) — ObjStm expansion runs after decryption, since objects
    inside object streams are not separately encrypted (§7.6.2)."""
    enc_m = re.search(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R", data)
    scanned = _scan_objects(data)
    if enc_m:
        enc_num = int(enc_m.group(1))
        enc_body = scanned.get(enc_num, (0, b""))[1]
    else:
        im = re.search(rb"/Encrypt\s*<<", data)
        if im is None:
            raise ValueError("encrypted PDF: /Encrypt dict not found")
        enc_num = -1
        end = _skip_dict(data, data.find(b"<<", im.start()))
        enc_body = data[im.start() : end]
    id_m = re.search(rb"/ID\s*\[\s*(<[0-9A-Fa-f]*>|\([^)]*\))", data)
    if id_m:
        at = id_m.start(1)
        if data[at : at + 1] == b"(":
            file_id, _ = _lit_string(data, at)
        else:
            file_id, _ = _hex_string(data, at)
    else:
        file_id = b""
    dec = _StdDecryptor(enc_body, file_id)
    objs: dict[int, bytes] = {}
    for num, (gen, body) in scanned.items():
        objs[num] = body if num == enc_num else _decrypt_object(
            body, num, gen, dec
        )
    return _expand_objstm(objs)


def extract_pdf_text(data: bytes) -> tuple[str, str | None]:
    """Extract (text, title_or_None) from a PDF byte payload.

    Raises ValueError for: non-PDF payloads, encrypted documents,
    unsupported content-stream filters, and documents with no
    text-showing operators (image-only scans) — honest rejection over
    silent garbage, the same contract as the JPEG/audio codecs."""
    text, title, _ = _extract(data)
    return text, title


def _extract(data: bytes) -> tuple[str, str | None, int]:
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF payload (missing %PDF header)")
    if re.search(rb"/Encrypt\s+\d+\s+\d+\s+R", data) or re.search(
        rb"/Encrypt\s*<<", data
    ):
        # r6: standard security handler with an EMPTY user password
        # (the common "encrypted but openable" case) decrypts RC4
        # V1/V2 R2/R3 documents; genuinely passworded or AES documents
        # still raise ValueError from the handler
        objs = _decrypt_document(data)
    else:
        objs = _collect_objects(data)
    pieces: list[str] = []
    any_shown = False
    page_order = _page_order(objs, data)
    for page_num in page_order:
        page_pieces: list[str] = []
        forms = _form_xobjects(objs, objs[page_num])
        fonts = _font_decoders(objs, objs[page_num])
        for cs in _content_streams(objs, objs[page_num]):
            ps, shown = _page_text(cs, forms, fonts)
            page_pieces.extend(ps)
            any_shown = any_shown or shown
        if pieces and page_pieces:
            pieces.append("\n")
        pieces.extend(page_pieces)
    if not any_shown:
        raise ValueError(
            "no extractable text: the PDF contains no text-showing "
            "operators (image-only scan?)"
        )
    title = None
    info_m = re.search(rb"/Info\s+(\d+)\s+\d+\s+R", data)
    if info_m:
        info = objs.get(int(info_m.group(1)), b"")
        tm = re.search(rb"/Title\s*(\(|<(?!<))", info)
        if tm:
            start = tm.start(1)
            if info[start : start + 1] == b"(":
                raw, _ = _lit_string(info, start)
            else:
                raw, _ = _hex_string(info, start)
            title = _decode_pdf_string(raw).strip() or None
    return "".join(pieces), title, len(page_order)


# ---------------------------------------------------------------------------
# writer


def _pdf_text_string(s: str) -> bytes:
    """UTF-16BE-with-BOM hex string — any Unicode text (CJK included)
    survives the round trip, ISO 32000-1 §7.9.2.2."""
    return b"<" + (b"\xfe\xff" + s.encode("utf-16-be")).hex().encode("ascii") + b">"


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """LZW encoder mirroring ``_lzw_decode`` (used by the writer's
    ``filter_mode='lzw'`` so LZWDecode is covered by the same round-trip
    oracle as FlateDecode). Width transitions simulate the decoder's
    table growth exactly."""
    out = bytearray()
    bitbuf = bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    dec_len = 258  # decoder table length, tracked exactly
    width = 9
    emitted = 0  # data codes emitted since the clear

    def emit_data(code: int) -> None:
        # The decoder appends one table entry while processing every
        # data code except the first, then bumps its width; mirror
        # that so each code is written at the width the decoder will
        # read it with.
        nonlocal emitted, dec_len, width
        emit(code, width)
        emitted += 1
        if emitted >= 2 and dec_len < 4096:
            dec_len += 1
        while dec_len + early >= (1 << width) and width < 12:
            width += 1

    emit(256, width)  # leading clear (conventional)
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
    emit(257, width)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def _codes_string(line: str, code_of: dict[str, int], nbytes: int) -> bytes:
    """Hex string of per-character font codes (type0/differences)."""
    payload = b"".join(code_of[ch].to_bytes(nbytes, "big") for ch in line)
    return b"<" + payload.hex().encode("ascii") + b">"


def _tounicode_cmap(code_of: dict[str, int]) -> bytes:
    """Minimal /ToUnicode CMap stream (§9.10.3): one codespace range +
    bfchar blocks of <=100 entries."""
    lines = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"/CMapName /Synth-Identity-UCS def",
        b"/CMapType 2 def",
        b"1 begincodespacerange",
        b"<0000> <FFFF>",
        b"endcodespacerange",
    ]
    items = sorted(code_of.items(), key=lambda kv: kv[1])
    for i in range(0, len(items), 100):
        chunk = items[i : i + 100]
        lines.append(b"%d beginbfchar" % len(chunk))
        for ch, code in chunk:
            dst = ch.encode("utf-16-be").hex().encode("ascii")
            lines.append(b"<%04x> <" % code + dst + b">")
        lines.append(b"endbfchar")
    lines += [b"endcmap", b"end", b"end"]
    return b"\n".join(lines)


_AGL_REVERSE = {ch: name for name, ch in _AGL.items() if len(ch) == 1}


def _char_glyph_name(ch: str) -> bytes:
    """Writer-side glyph name for a char: ASCII letters/digits use the
    AGL convention (letters are their own names, digits are spelled),
    known punctuation uses its AGL name, everything else uniXXXX — all
    forms the extractor's ``_glyph_to_char`` resolves."""
    if ch.isascii() and ch.isalpha():
        return ch.encode("ascii")
    if ch in _AGL_REVERSE:
        return _AGL_REVERSE[ch].encode("ascii")
    return b"uni" + b"".join(
        b"%04X" % u for u in
        (int.from_bytes(ch.encode("utf-16-be")[i : i + 2], "big")
         for i in range(0, len(ch.encode("utf-16-be")), 2))
    )


def _wrap_stream(body: bytes, filter_mode: str) -> bytes:
    if filter_mode == "flate":
        payload = zlib.compress(body)
        return (
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(payload)
            + payload
            + b"\nendstream"
        )
    if filter_mode == "lzw":
        payload = _lzw_encode(body)
        return (
            b"<< /Length %d /Filter /LZWDecode >>\nstream\n" % len(payload)
            + payload
            + b"\nendstream"
        )
    return b"<< /Length %d >>\nstream\n" % len(body) + body + b"\nendstream"


def build_pdf(
    text: str,
    *,
    title: str | None = None,
    lines_per_page: int | None = None,
    compress: bool = True,
    font_mode: str = "simple",
    filter_mode: str | None = None,
    encrypt: bool = False,
) -> bytes:
    """Write a small, valid PDF whose extracted text is exactly
    ``text``: one Tj per line, T* between lines, pages split every
    ``lines_per_page`` lines (default: single page).

    ``font_mode``: ``simple`` shows UTF-16BE text strings directly;
    ``type0`` assigns opaque 2-byte codes per distinct char and maps
    them back via an embedded /ToUnicode CMap (the subset-font shape
    that dominates real-world PDFs); ``differences`` assigns 1-byte
    codes mapped via an /Encoding /Differences array of glyph names
    (auto-falls back to type0 past 223 distinct chars).
    ``filter_mode``: ``flate`` (default when ``compress``), ``lzw``,
    or ``none``. ``encrypt`` (r6) wraps the document in the standard
    security handler (RC4-128, V2 R3, empty user/owner passwords) —
    every stream and string RC4'd with per-object keys. Used by
    fixtures and the ``pdf_extract`` oracle round trip."""
    if filter_mode is None:
        filter_mode = "flate" if compress else "none"
    lines = text.split("\n")
    if lines_per_page is None or lines_per_page <= 0:
        pages_lines = [lines]
    else:
        pages_lines = [
            lines[i : i + lines_per_page]
            for i in range(0, len(lines), lines_per_page)
        ] or [[""]]

    distinct = sorted(set(text.replace("\n", "")))
    if font_mode == "differences" and len(distinct) > 223:
        font_mode = "type0"

    objs: dict[int, bytes] = {}
    font_num = 3
    next_num = 4
    if font_mode == "type0":
        code_of = {ch: i + 1 for i, ch in enumerate(distinct)}
        cmap_num, desc_num = next_num, next_num + 1
        next_num += 2
        objs[cmap_num] = _wrap_stream(_tounicode_cmap(code_of), filter_mode)
        objs[desc_num] = (
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> >>"
        )
        objs[font_num] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth "
            b"/Encoding /Identity-H /DescendantFonts [%d 0 R] "
            b"/ToUnicode %d 0 R >>" % (desc_num, cmap_num)
        )
        enc = lambda ln: _codes_string(ln, code_of, 2)  # noqa: E731
    elif font_mode == "differences":
        code_of = {ch: 33 + i for i, ch in enumerate(distinct)}
        diffs = bytearray(b"/Differences [ 33")
        for ch in distinct:
            diffs += b" /" + _char_glyph_name(ch)
        diffs += b" ]"
        objs[font_num] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Synth "
            b"/Encoding << " + bytes(diffs) + b" >> >>"
        )
        enc = lambda ln: _codes_string(ln, code_of, 1)  # noqa: E731
    else:
        objs[font_num] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )
        enc = _pdf_text_string
    page_nums: list[int] = []
    for pl in pages_lines:
        body = b"BT /F1 12 Tf 14 TL 72 720 Td\n" + b" T*\n".join(
            enc(ln) + b" Tj" for ln in pl
        ) + b"\nET"
        stream_obj = _wrap_stream(body, filter_mode)
        content_num = next_num
        objs[content_num] = stream_obj
        page_num = next_num + 1
        objs[page_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (font_num, content_num)
        )
        page_nums.append(page_num)
        next_num += 2
    objs[2] = (
        b"<< /Type /Pages /Kids ["
        + b" ".join(b"%d 0 R" % p for p in page_nums)
        + b"] /Count %d >>" % len(page_nums)
    )
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    info_num = 0
    if title is not None:
        info_num = next_num
        next_num += 1
        objs[info_num] = b"<< /Title " + _pdf_text_string(title) + b" >>"

    enc_num = 0
    file_id = b""
    enc_mode = {True: "rc4", False: None}.get(encrypt, encrypt)
    if enc_mode not in (None, "rc4", "aes", "aes256"):
        raise ValueError(f"unknown encrypt mode {enc_mode!r}")
    if enc_mode:
        import hashlib

        file_id = hashlib.md5(
            text.encode("utf-8", "surrogatepass") + b"|pdf-id"
        ).digest()
        # Algorithm 3 (O entry), empty owner AND user passwords:
        h = hashlib.md5(_PW_PAD).digest()
        for _ in range(50):
            h = hashlib.md5(h).digest()
        okey = h[:16]
        o_entry = _rc4(okey, _PW_PAD)
        for i in range(1, 20):
            o_entry = _rc4(bytes(b ^ i for b in okey), o_entry)
        p = 0xFFFFFFFF  # /P -1: all permissions
        # Algorithm 2 (file key), then Algorithm 5 (U entry):
        h = hashlib.md5(
            _PW_PAD + o_entry + p.to_bytes(4, "little") + file_id
        ).digest()
        for _ in range(50):
            h = hashlib.md5(h[:16]).digest()
        key = h[:16]
        u = hashlib.md5(_PW_PAD + file_id).digest()
        u = _rc4(key, u)
        for i in range(1, 20):
            u = _rc4(bytes(b ^ i for b in key), u)
        u_entry = u + b"\x00" * 16
        enc_num = next_num
        next_num += 1
        if enc_mode == "aes256":
            # V5/R6 (PDF 2.0): empty user AND owner passwords. The
            # seed is a FILE-CONSTANT (one security policy across the
            # corpus, the common enterprise shape), so payloads stay
            # content-addressed AND the Algorithm 2.B KDF memoizes to
            # one evaluation per worker (fixture determinism, not key
            # hygiene).
            seed = hashlib.sha256(b"aiotcvectordb-spark|v5r6-policy").digest()
            vsalt, ksalt = seed[:8], seed[8:16]
            file_key = hashlib.sha256(seed + b"|filekey").digest()
            u48 = _hash_2b(b"", vsalt, b"") + vsalt + ksalt
            ik = _hash_2b(b"", ksalt, b"")
            ue = _aes_cbc_encrypt_raw(ik, b"\x00" * 16, file_key)
            ovsalt, oksalt = seed[16:24], seed[24:32]
            o48 = _hash_2b(b"", ovsalt, u48) + ovsalt + oksalt
            oik = _hash_2b(b"", oksalt, u48)
            oe = _aes_cbc_encrypt_raw(oik, b"\x00" * 16, file_key)
            perms = _aes_encrypt_block(
                (0xFFFFFFFF).to_bytes(4, "little")
                + b"\xff\xff\xff\xff" + b"Tadb" + seed[:4],
                _aes_expand_key(file_key),
            )
            enc_body = (
                b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P -1 "
                b"/EncryptMetadata true "
                b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen "
                b"/Length 32 >> >> /StmF /StdCF /StrF /StdCF /U <"
                + u48.hex().encode("ascii") + b"> /UE <"
                + ue.hex().encode("ascii") + b"> /O <"
                + o48.hex().encode("ascii") + b"> /OE <"
                + oe.hex().encode("ascii") + b"> /Perms <"
                + perms.hex().encode("ascii") + b"> >>"
            )
        elif enc_mode == "aes":
            enc_body = (
                b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P -1 "
                b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
                b"/Length 16 >> >> /StmF /StdCF /StrF /StdCF /O <"
                + o_entry.hex().encode("ascii")
                + b"> /U <"
                + u_entry.hex().encode("ascii")
                + b"> >>"
            )
        else:
            enc_body = (
                b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P -1 /O <"
                + o_entry.hex().encode("ascii")
                + b"> /U <"
                + u_entry.hex().encode("ascii")
                + b"> >>"
            )
        # the handler validates our own O/U/key math before use. RC4 is
        # symmetric, so encrypting IS _decrypt_object; for AES a thin
        # wrapper flips decrypt() to CBC-encrypt with a deterministic
        # per-object IV (content-addressed payloads — fixture-grade
        # determinism, not cryptographic IV hygiene)
        dec = _StdDecryptor(enc_body, file_id)
        if enc_mode in ("aes", "aes256"):
            class _AesEnc:
                def decrypt(self, data: bytes, num: int, gen: int) -> bytes:
                    ok = dec.obj_key(num, gen)
                    iv = hashlib.md5(
                        b"pdf-iv" + ok + hashlib.md5(data).digest()
                    ).digest()
                    return _aes_cbc_encrypt(ok, data, iv)

            enc_helper = _AesEnc()
        else:
            enc_helper = dec
        objs = {
            num: _decrypt_object(body, num, 0, enc_helper)
            for num, body in objs.items()
        }
        objs[enc_num] = enc_body

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    max_num = max(objs)
    out += b"xref\n0 %d\n" % (max_num + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    trailer = b"<< /Size %d /Root 1 0 R" % (max_num + 1)
    if info_num:
        trailer += b" /Info %d 0 R" % info_num
    if enc_num:
        trailer += b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (
            enc_num,
            file_id.hex().encode("ascii"),
            file_id.hex().encode("ascii"),
        )
    trailer += b" >>"
    out += b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark kernels (Arrow-batched, shuffle-free — same shape as the
# PNG/JPEG/WAV codec stages in operators/multimodal.py)


@functools.cache
def v5_policy_kdf_pairs() -> tuple[tuple[tuple[bytes, bytes, bytes], bytes], ...]:
    """The four Algorithm 2.B evaluations of the writer's file-constant
    V5/R6 security policy, computed ONCE (driver-side) so Spark stages
    can ship them to workers via prime_hash_2b instead of re-running a
    deliberately-slow KDF in every fresh Python worker."""
    import hashlib

    seed = hashlib.sha256(b"aiotcvectordb-spark|v5r6-policy").digest()
    vsalt, ksalt = seed[:8], seed[8:16]
    ovsalt, oksalt = seed[16:24], seed[24:32]
    u48 = _hash_2b(b"", vsalt, b"") + vsalt + ksalt
    return (
        ((b"", vsalt, b""), _hash_2b(b"", vsalt, b"")),
        ((b"", ksalt, b""), _hash_2b(b"", ksalt, b"")),
        ((b"", ovsalt, u48), _hash_2b(b"", ovsalt, u48)),
        ((b"", oksalt, u48), _hash_2b(b"", oksalt, u48)),
    )


def with_pdf_payload(df, *, id_col: str = "doc_id", text_col: str = "text",
                     lines_per_page: int = 20, mix_modes: bool = False):
    """Attach a real PDF ``payload`` built from ``text_col`` (one page
    per ``lines_per_page`` lines). Deterministic content-addressed
    bytes, so extraction output is a pure function of the text — what
    makes the full parser ORACLE-CHECKABLE. With ``mix_modes`` (the
    registry round trip), the font mode rotates simple/type0/
    differences and the stream filter rotates flate/lzw per document
    (keyed on a crc of the id), so the CMap, Differences, and LZW
    paths all run distributed under the same oracle. Real ingestion
    would read files via ``spark.read.format("binaryFile")`` into the
    same (id, payload) shape."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, payload binary"
    fonts = ("simple", "type0", "differences")
    filters = ("flate", "lzw")
    kdf_pairs = v5_policy_kdf_pairs() if mix_modes else ()

    def encode(batches):
        import pandas as pd

        prime_hash_2b(kdf_pairs)
        for pdf in batches:
            payloads = []
            for doc_id, t in zip(pdf[id_col], pdf[text_col]):
                # shared upload canon (CRLF/CR -> LF + C0-control
                # strip) — the extraction contract the oracles twin
                from aiotcvectordb_spark.operators.cfbdoc import (
                    canon_upload_text,
                )

                t = canon_upload_text(t)
                if mix_modes:
                    key = zlib.crc32(str(doc_id).encode("utf-8"))
                    fm, flt = fonts[key % 3], filters[(key // 3) % 2]
                    # ~1/15 each of RC4-, AES-128- and AES-256-encrypted
                    # documents (pure-python ciphers are the dominant
                    # writer cost; 1/15 of sf0.01's 500 docs still gives
                    # ~33 docs per cipher under the oracle). AES-256's
                    # Algorithm 2.B KDF memoizes across the corpus's
                    # shared security policy, so V5/R6 is bulk-viable.
                    enc = (
                        ("rc4", "aes", "aes256")[key % 15]
                        if key % 15 < 3
                        else None
                    )
                else:
                    fm, flt, enc = "simple", "flate", None
                payloads.append(
                    build_pdf(
                        t or "",
                        lines_per_page=lines_per_page,
                        font_mode=fm,
                        filter_mode=flt,
                        encrypt=enc or False,
                    )
                )
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(encode, schema=schema)


def extract_text_df(df, *, id_col: str = "doc_id", prime_kdf=()):
    """Run the real PDF text extractor over a (id, payload) frame;
    returns (id, text, n_pages). Shuffle-free mapInPandas — the codec
    cost partitions with the data, the 100 TB shape. ``prime_kdf``:
    driver-precomputed Algorithm 2.B pairs (e.g.
    ``v5_policy_kdf_pairs()``) shipped to workers when the corpus is
    known to share one AES-256 security policy, so fresh workers skip
    the slow password-hardening KDF; any other encrypted document
    still computes it."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, text string, n_pages int"

    def decode(batches):
        import pandas as pd

        prime_hash_2b(prime_kdf)
        for pdf in batches:
            texts, pages = [], []
            for payload in pdf["payload"]:
                text, _, n_pages = _extract(bytes(payload))
                texts.append(text)
                pages.append(n_pages)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "text": texts, "n_pages": pages}
            )

    return df.mapInPandas(decode, schema=schema)
