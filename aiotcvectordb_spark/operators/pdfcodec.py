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
documents (``/Encrypt``), unsupported stream filters on content
streams, and documents with no text-showing operators at all
(image-only scans).

writer (``build_pdf``): a correct small PDF generator (proper xref +
trailer, FlateDecode content streams, UTF-16BE hex strings so CJK
survives) used by the fixture tests and the ``pdf_extract`` registry
round trip — the same encode-then-decode oracle pattern as the PNG/JPEG
codecs: DuckDB can predict the extracted text exactly (it is the input
text), so the whole parser is hash-checked by the driver.

Font ``/ToUnicode`` CMaps and per-font ``/Encoding`` differences are
NOT implemented: 1-byte strings decode as PDFDocEncoding≈Latin-1 and
2-byte strings as UTF-16BE — exactly right for the writers that cover
the vast majority of text-first PDFs (and for this module's own
writer), wrong for exotic subset-embedded fonts, which would need the
full CMap machinery.
"""

from __future__ import annotations

import re
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


def _stream_of(body: bytes) -> bytes | None:
    """Decoded stream payload of an object body, or None if no stream.
    Raises ValueError for filters beyond FlateDecode."""
    i = body.find(b"stream")
    if i < 0:
        return None
    head = body[:i]
    j = i + len(b"stream")
    if body[j : j + 2] == b"\r\n":
        j += 2
    elif body[j : j + 1] in (b"\n", b"\r"):
        j += 1
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
    if name != b"FlateDecode":
        raise ValueError(
            f"unsupported PDF stream filter /{name.decode('latin-1')}: only "
            "FlateDecode (stdlib zlib) is implemented"
        )
    try:
        return zlib.decompress(raw)
    except zlib.error:
        # tolerate trailing garbage after the deflate stream; a stream
        # that still fails is corrupt — ValueError, never a leaked
        # zlib.error (fuzz-pinned contract)
        try:
            return zlib.decompressobj().decompress(raw)
        except zlib.error as e:
            raise ValueError(f"corrupt FlateDecode stream: {e}") from None


def _collect_objects(data: bytes) -> dict[int, bytes]:
    """Scan every top-level object; expand /ObjStm object streams so
    PDF 1.5+ compressed-xref files are covered."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        objs[int(m.group(1))] = m.group(3)
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
    return raw.decode("latin-1")


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
    depth: int = 0,
) -> tuple[list[str], bool]:
    """Extract text pieces from one content stream. Returns
    (pieces, any_show_op). Newlines from line-advance operators are
    suppressed until the first show operator so the initial cursor
    positioning (``72 720 Td``) doesn't inject a leading break.
    ``Do`` on a known /Form XObject recurses into the form's stream
    in place (depth-capped — forms can nest and cycle)."""
    out: list[str] = []
    operands: list = []
    shown = False
    last_tm_y: float | None = None
    i, n = 0, len(cs)

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
                out.append(_decode_pdf_string(operands[-1]))
                shown = True
            elif op in (b"'", b'"'):
                newline()
                strs = [o for o in operands if isinstance(o, bytes)]
                if strs:
                    out.append(_decode_pdf_string(strs[-1]))
                shown = True
            elif op == b"TJ" and operands and isinstance(operands[-1], list):
                for el in operands[-1]:
                    if isinstance(el, bytes):
                        out.append(_decode_pdf_string(el))
                        shown = True
                    elif isinstance(el, float) and el < -180:
                        # large negative kern == inter-word gap
                        out.append(" ")
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
                        forms[name[1:]], forms, depth + 1
                    )
                    out.extend(sub)
                    shown = shown or sub_shown
            operands.clear()
    return out, shown


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
    if re.search(rb"/Encrypt\s+\d+\s+\d+\s+R", data) or b"/Encrypt<<" in data:
        raise ValueError(
            "encrypted PDF: decryption (RC4/AES per ISO 32000-1 §7.6) is "
            "not implemented"
        )
    objs = _collect_objects(data)
    pieces: list[str] = []
    any_shown = False
    page_order = _page_order(objs, data)
    for page_num in page_order:
        page_pieces: list[str] = []
        forms = _form_xobjects(objs, objs[page_num])
        for cs in _content_streams(objs, objs[page_num]):
            ps, shown = _page_text(cs, forms)
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


def build_pdf(
    text: str,
    *,
    title: str | None = None,
    lines_per_page: int | None = None,
    compress: bool = True,
) -> bytes:
    """Write a small, valid PDF whose extracted text is exactly
    ``text``: one Tj per line, T* between lines, pages split every
    ``lines_per_page`` lines (default: single page). Content streams
    are FlateDecode'd by default. Used by fixtures and by the
    ``pdf_extract`` oracle round trip."""
    lines = text.split("\n")
    if lines_per_page is None or lines_per_page <= 0:
        pages_lines = [lines]
    else:
        pages_lines = [
            lines[i : i + lines_per_page]
            for i in range(0, len(lines), lines_per_page)
        ] or [[""]]

    objs: dict[int, bytes] = {}
    font_num = 3
    objs[font_num] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    page_nums: list[int] = []
    next_num = 4
    for pl in pages_lines:
        body = b"BT /F1 12 Tf 14 TL 72 720 Td\n" + b" T*\n".join(
            _pdf_text_string(ln) + b" Tj" for ln in pl
        ) + b"\nET"
        if compress:
            payload = zlib.compress(body)
            stream_obj = (
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(payload)
                + payload
                + b"\nendstream"
            )
        else:
            stream_obj = (
                b"<< /Length %d >>\nstream\n" % len(body) + body + b"\nendstream"
            )
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
        objs[info_num] = b"<< /Title " + _pdf_text_string(title) + b" >>"

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
    trailer += b" >>"
    out += b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


# ---------------------------------------------------------------------------
# Spark kernels (Arrow-batched, shuffle-free — same shape as the
# PNG/JPEG/WAV codec stages in operators/multimodal.py)


def with_pdf_payload(df, *, id_col: str = "doc_id", text_col: str = "text",
                     lines_per_page: int = 20):
    """Attach a real FlateDecode PDF ``payload`` built from
    ``text_col`` (one page per ``lines_per_page`` lines). Deterministic
    content-addressed bytes, so extraction output is a pure function of
    the text — what makes the full parser ORACLE-CHECKABLE. Real
    ingestion would read files via ``spark.read.format("binaryFile")``
    into the same (id, payload) shape."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, payload binary"

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": [
                        build_pdf(t or "", lines_per_page=lines_per_page)
                        for t in pdf[text_col]
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(encode, schema=schema)


def extract_text_df(df, *, id_col: str = "doc_id"):
    """Run the real PDF text extractor over a (id, payload) frame;
    returns (id, text, n_pages). Shuffle-free mapInPandas — the codec
    cost partitions with the data, the 100 TB shape."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, text string, n_pages int"

    def decode(batches):
        import pandas as pd

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
