"""Legacy binary PowerPoint (.ppt) and Excel (.xls) text extraction +
matching writers (ops 38/44, r6) — the last two upload formats the
reference's server-side parsing path covers that this engine rejected
(reference collection_view.py:342-423 ``upload_file``/ParsingProcess).

Both record formats are PUBLIC specs and the text layer is fully
algorithmic:

- **[MS-PPT]**: the ``PowerPoint Document`` stream is a tree of
  records with 8-byte headers (recVer/recInstance, recType, recLen);
  containers have recVer 0xF. Text lives in ``TextCharsAtom``
  (0x0FA0, UTF-16LE) and ``TextBytesAtom`` (0x0FA8, cp1252) atoms.
  Extraction follows the spec's reading order ([MS-PPT] 2.1.2):
  CurrentUserAtom → UserEditAtom chain → merged PersistDirectoryAtoms
  → the live DocumentContainer's SlideListWithText, whose
  SlidePersistAtoms give slide order and whose referenced Slide
  containers are walked for drawing-hosted text — so incrementally
  edited decks yield only the current edit's text, never superseded
  content. Decks without the persist machinery fall back to
  depth-first stream-order atom collection.
- **[MS-XLS]** (BIFF8): the ``Workbook`` stream is a flat record
  sequence (2-byte type + 2-byte length). Strings live in the shared
  string table (``SST`` 0x00FC, XLUnicodeRichExtendedString entries
  with the fHighByte/fRichSt/fExtSt flags) referenced by ``LabelSst``
  cells (0x00FD); inline ``Label`` (0x0204) and numeric ``Number``
  (0x0203) / ``RK`` (0x027E) cells are also decoded. Cells group into
  rows (tab-joined) in (row, col) order, one line per row — the same
  text shape as the OOXML .xlsx parser. SST tables spanning
  ``Continue`` (0x003C) records — every real workbook beyond ~8 KB of
  strings, since BIFF bodies cap at 8224 bytes — are fully supported:
  strings may split inside their character array (each continuation
  restarts with a fresh fHighByte option byte, so the character width
  can legally change mid-string) or between strings / inside rich-run
  and ExtRst payloads (no option byte), per [MS-XLS] 2.5.293 +
  2.4.58. The writer emits spec-correct Continue splits so the
  spanning decode path is round-trip proven at both widths.

The writers emit spec-correct minimal files inside real CFB
containers (via ``cfbdoc``), covering both character widths per
format, which makes both parsers oracle-checkable via the same
encode-then-decode round trip as the PDF/.doc codecs
(``ppt_extract`` / ``xls_extract`` registry queries).

Encrypted documents (``EncryptionHeader`` / ``FilePass`` records)
raise ValueError.
"""

from __future__ import annotations

import struct

from aiotcvectordb_spark.operators.cfbdoc import CfbReader, _cfb_build

__all__ = ["parse_ppt", "build_ppt", "parse_xls", "build_xls"]

# [MS-PPT] record types
_RT_DOCUMENT = 0x03E8
_RT_SLIDE = 0x03EE
_RT_SLIDE_PERSIST_ATOM = 0x03F3
_RT_SLIDE_LIST_WITH_TEXT = 0x0FF0
_RT_USER_EDIT_ATOM = 0x0FF5
_RT_CURRENT_USER_ATOM = 0x0FF6
_RT_TEXT_HEADER_ATOM = 0x0F9F
_RT_TEXT_CHARS_ATOM = 0x0FA0
_RT_TEXT_BYTES_ATOM = 0x0FA8
_RT_PERSIST_DIRECTORY_ATOM = 0x1772
_RT_ENCRYPTION = 0x2F14  # CryptSession10Container

_CU_TOKEN_PLAIN = 0xE391C05F
_CU_TOKEN_ENCRYPTED = 0xF3D1C4DF


def _ppt_walk(data: bytes, out: list[str]) -> None:
    i, n = 0, len(data)
    while i + 8 <= n:
        (ver_inst, rec_type, rec_len) = struct.unpack_from("<HHI", data, i)
        i += 8
        if rec_len > n - i:
            raise ValueError("corrupt .ppt: record length overruns stream")
        body = data[i : i + rec_len]
        i += rec_len
        rec_ver = ver_inst & 0xF
        if rec_type == _RT_ENCRYPTION:
            raise ValueError(
                "encrypted .ppt: CryptSession10 decryption not implemented"
            )
        if rec_ver == 0xF:  # container: recurse
            _ppt_walk(body, out)
        elif rec_type == _RT_TEXT_CHARS_ATOM:
            out.append(body.decode("utf-16-le", "replace"))
        elif rec_type == _RT_TEXT_BYTES_ATOM:
            out.append(body.decode("cp1252", "replace"))


def _ppt_decode_atom(rec_type: int, body: bytes) -> str:
    if rec_type == _RT_TEXT_CHARS_ATOM:
        return body.decode("utf-16-le", "replace")
    return body.decode("cp1252", "replace")


def _ppt_rec_at(stream: bytes, off: int) -> tuple[int, int, bytes]:
    """Record header + body at absolute stream offset ``off``."""
    if off < 0 or off + 8 > len(stream):
        raise ValueError("persist offset outside the PowerPoint stream")
    ver_inst, rec_type, rec_len = struct.unpack_from("<HHI", stream, off)
    body = stream[off + 8 : off + 8 + rec_len]
    if len(body) != rec_len:
        raise ValueError("persist record overruns the PowerPoint stream")
    return ver_inst, rec_type, body


def _ppt_current_edit_offset(cfb: CfbReader) -> int:
    """offsetToCurrentEdit from the Current User stream's
    CurrentUserAtom ([MS-PPT] 2.3.2). Raises ValueError when the
    stream is absent/malformed (caller falls back to stream order) or
    when the headerToken marks the deck encrypted (not swallowed)."""
    cu = cfb.stream("Current User")  # KeyError → caller falls back
    if len(cu) < 20:
        raise ValueError("Current User stream too short")
    (_vi, rec_type, _ln) = struct.unpack_from("<HHI", cu, 0)
    if rec_type != _RT_CURRENT_USER_ATOM:
        raise ValueError("Current User stream without a CurrentUserAtom")
    _size, token, off_cur_edit = struct.unpack_from("<III", cu, 8)
    if token == _CU_TOKEN_ENCRYPTED:
        raise ValueError(
            "encrypted .ppt: CryptSession10 decryption not implemented"
        )
    if token != _CU_TOKEN_PLAIN:
        raise ValueError("unrecognized CurrentUserAtom headerToken")
    return off_cur_edit


def _ppt_persist_texts(stream: bytes, cur_edit_off: int) -> list[str]:
    """Text atoms of the CURRENT edit, in slide order ([MS-PPT] 2.1.2
    reading order): walk the UserEditAtom chain newest→oldest, merge
    PersistDirectoryAtoms oldest→newest so later edits override, then
    read the live DocumentContainer's SlideListWithText — its
    SlidePersistAtoms give slide order, and each referenced slide's own
    container is walked for drawing-hosted text. Superseded edits'
    text never appears (the stream-order fallback would leak it)."""
    persist: dict[int, int] = {}
    dirs: list[int] = []
    doc_ref = None
    off = cur_edit_off
    seen: set[int] = set()
    while off:
        if off in seen:
            raise ValueError("UserEditAtom chain loops")
        seen.add(off)
        _vi, rec_type, body = _ppt_rec_at(stream, off)
        if rec_type != _RT_USER_EDIT_ATOM or len(body) < 20:
            raise ValueError("offsetToCurrentEdit is not a UserEditAtom")
        off_last, off_dir, doc_pid = struct.unpack_from("<III", body, 8)
        if doc_ref is None:
            doc_ref = doc_pid
        dirs.append(off_dir)
        off = off_last
    for d in reversed(dirs):  # oldest first → newest edits override
        _vi, rec_type, body = _ppt_rec_at(stream, d)
        if rec_type != _RT_PERSIST_DIRECTORY_ATOM:
            raise ValueError("offsetPersistDirectory mismatch")
        i = 0
        while i + 4 <= len(body):
            (word,) = struct.unpack_from("<I", body, i)
            i += 4
            pid, cnt = word & 0xFFFFF, word >> 20
            if i + 4 * cnt > len(body):
                raise ValueError("PersistDirectoryAtom entry overruns")
            for k in range(cnt):
                persist[pid + k] = struct.unpack_from("<I", body, i)[0]
                i += 4
    if doc_ref is None or doc_ref not in persist:
        raise ValueError("docPersistIdRef unresolved")
    _vi, rec_type, doc_body = _ppt_rec_at(stream, persist[doc_ref])
    if rec_type != _RT_DOCUMENT:
        raise ValueError("document persist object is not a DocumentContainer")

    doc_texts: list[str] = []
    slides: list[tuple[int, list[str]]] = []  # (persistIdRef, SLWT texts)

    def walk(data: bytes, in_slwt: bool) -> None:
        i, n = 0, len(data)
        while i + 8 <= n:
            ver_inst, rec_type, rec_len = struct.unpack_from("<HHI", data, i)
            i += 8
            if rec_len > n - i:
                raise ValueError("corrupt .ppt: record length overruns stream")
            body = data[i : i + rec_len]
            i += rec_len
            rec_ver = ver_inst & 0xF
            if rec_type == _RT_ENCRYPTION:
                raise ValueError(
                    "encrypted .ppt: CryptSession10 decryption not implemented"
                )
            if rec_ver == 0xF:
                walk(body, in_slwt or rec_type == _RT_SLIDE_LIST_WITH_TEXT)
            elif in_slwt and rec_type == _RT_SLIDE_PERSIST_ATOM and len(body) >= 4:
                slides.append((struct.unpack_from("<I", body, 0)[0], []))
            elif rec_type in (_RT_TEXT_CHARS_ATOM, _RT_TEXT_BYTES_ATOM):
                s = _ppt_decode_atom(rec_type, body)
                if in_slwt and slides:
                    slides[-1][1].append(s)
                else:
                    doc_texts.append(s)

    walk(doc_body, False)
    out = list(doc_texts)
    for pid, texts in slides:
        out.extend(texts)
        s_off = persist.get(pid)
        if s_off is None:
            continue
        _vi, s_type, s_body = _ppt_rec_at(stream, s_off)
        if s_type == _RT_SLIDE:
            extra: list[str] = []
            _ppt_walk(s_body, extra)
            out.extend(extra)
    return out


def parse_ppt(data: bytes) -> tuple[str, str | None]:
    """Extract (text, title) from a binary PowerPoint .ppt payload, in
    slide order via the CurrentUserAtom → UserEditAtom →
    PersistDirectoryAtom machinery (so incrementally-edited decks show
    only the live edit); falls back to stream-order atom collection for
    decks without that machinery. Title = first text atom. Raises
    ValueError for encrypted decks and non-PowerPoint CFB files —
    never struct.error (same fuzz-pinned contract as cfbdoc.parse_doc)."""
    try:
        return _parse_ppt(data)
    except struct.error as e:
        raise ValueError(f"corrupt .ppt: {e}") from None


def _parse_ppt(data: bytes) -> tuple[str, str | None]:
    cfb = CfbReader(data)
    try:
        stream = cfb.stream("PowerPoint Document")
    except KeyError:
        names = [n for n, t, _, _ in cfb.dir_entries if t == 2]
        raise ValueError(
            f"OLE2 container without a PowerPoint Document stream "
            f"(streams: {names[:8]})"
        ) from None
    atoms: list[str] | None = None
    try:
        cur_edit = _ppt_current_edit_offset(cfb)
    except (KeyError, ValueError, struct.error) as e:
        if "encrypted" in str(e):
            raise
        cur_edit = None
    if cur_edit is not None:
        try:
            atoms = _ppt_persist_texts(stream, cur_edit) or None
        except (ValueError, struct.error) as e:
            if "encrypted" in str(e):
                raise
            atoms = None
    if atoms is None:
        atoms = []
        _ppt_walk(stream, atoms)
    if not atoms:
        raise ValueError("no text atoms found in the PowerPoint stream")
    # PPT uses CR as the in-atom paragraph separator
    lines = [a.replace("\r", "\n").rstrip("\n") for a in atoms]
    text = "\n".join(lines).strip("\n")
    from aiotcvectordb_spark.operators.cfbdoc import read_summary_title

    title = read_summary_title(cfb) or next(
        (ln for ln in text.split("\n") if ln.strip()), ""
    ) or None
    return text, title


def _ppt_record(rec_type: int, body: bytes, container: bool = False) -> bytes:
    ver = 0xF if container else 0x0
    return struct.pack("<HHI", ver, rec_type, len(body)) + body


def _ppt_text_atom(line: str, idx: int, force_unicode: bool) -> bytes:
    use_bytes = not force_unicode and idx % 2 == 0
    if use_bytes:
        try:
            return _ppt_record(_RT_TEXT_BYTES_ATOM, line.encode("cp1252"))
        except UnicodeEncodeError:
            pass
    return _ppt_record(_RT_TEXT_CHARS_ATOM, line.encode("utf-16-le"))


def _ppt_build_edit(
    stream: bytearray,
    text: str,
    *,
    force_unicode: bool,
    prev_edit_off: int,
    first_slide_pid: int,
) -> tuple[int, int]:
    """Append one complete edit — per-line Slide persist objects, a
    DocumentContainer whose SlideListWithText orders them via
    SlidePersistAtoms, a PersistDirectoryAtom, and a UserEditAtom — to
    ``stream``. Returns (user_edit_offset, next_free_persist_id). The
    document always claims persist id 1, so a later edit supersedes an
    earlier one exactly like an incremental PowerPoint save."""
    lines = text.split("\n")
    slide_offs: list[int] = []
    for _ in lines:
        slide_offs.append(len(stream))
        stream += _ppt_record(_RT_SLIDE, b"", container=True)
    atoms = bytearray()
    for idx, line in enumerate(lines):
        atoms += _ppt_record(
            _RT_SLIDE_PERSIST_ATOM,
            struct.pack("<IIiii", first_slide_pid + idx, 0, 1, 256 + idx, 0),
        )
        atoms += _ppt_record(_RT_TEXT_HEADER_ATOM, struct.pack("<I", 0))
        atoms += _ppt_text_atom(line, idx, force_unicode)
    slwt = _ppt_record(_RT_SLIDE_LIST_WITH_TEXT, bytes(atoms), container=True)
    doc_off = len(stream)
    stream += _ppt_record(_RT_DOCUMENT, slwt, container=True)
    pd = bytearray(struct.pack("<II", 1 | (1 << 20), doc_off))
    if slide_offs:
        pd += struct.pack("<I", first_slide_pid | (len(slide_offs) << 20))
        for so in slide_offs:
            pd += struct.pack("<I", so)
    pd_off = len(stream)
    stream += _ppt_record(_RT_PERSIST_DIRECTORY_ATOM, bytes(pd))
    ue_off = len(stream)
    next_pid = first_slide_pid + len(lines)
    stream += _ppt_record(
        _RT_USER_EDIT_ATOM,
        struct.pack(
            "<IHBBIIIIHH",
            256 + len(lines) - 1,  # lastSlideIdRef
            0, 0, 3,  # version, minorVersion, majorVersion
            prev_edit_off,
            pd_off,
            1,  # docPersistIdRef
            next_pid,  # persistIdSeed
            0, 0,
        ),
    )
    return ue_off, next_pid


def _ppt_current_user_stream(off_cur_edit: int) -> bytes:
    body = struct.pack(
        "<IIIHHBBH",
        0x14, _CU_TOKEN_PLAIN, off_cur_edit,
        0,  # lenUserName (empty)
        0x03F4, 0x03, 0x00, 0,
    ) + struct.pack("<I", 0x00000009)  # relVersion
    return struct.pack("<HHI", 0, _RT_CURRENT_USER_ATOM, len(body)) + body


def build_ppt(
    text: str, *, force_unicode: bool = False, stale_text: str | None = None
) -> bytes:
    """Write a valid .ppt whose extracted text is ``text``: one slide
    per line (Slide persist object + SlidePersistAtom-ordered text in
    SlideListWithText), with the full CurrentUserAtom → UserEditAtom →
    PersistDirectoryAtom machinery, alternating TextBytesAtom (cp1252)
    and TextCharsAtom (UTF-16LE) so both widths round-trip. When
    ``stale_text`` is given, that content is written as a FIRST,
    superseded edit and ``text`` as an incremental save on top — a
    persist-aware reader must return only ``text`` while naive
    stream-order collection would leak both."""
    stream = bytearray()
    prev_edit = 0
    next_pid = 2
    if stale_text is not None:
        prev_edit, next_pid = _ppt_build_edit(
            stream, stale_text, force_unicode=force_unicode,
            prev_edit_off=0, first_slide_pid=next_pid,
        )
    cur_edit, _ = _ppt_build_edit(
        stream, text, force_unicode=force_unicode,
        prev_edit_off=prev_edit, first_slide_pid=next_pid,
    )
    return _cfb_build({
        "PowerPoint Document": bytes(stream),
        "Current User": _ppt_current_user_stream(cur_edit),
    })


# ---------------------------------------------------------------------------
# [MS-XLS] BIFF8

_B_BOF = 0x0809
_B_EOF = 0x000A
_B_SST = 0x00FC
_B_LABELSST = 0x00FD
_B_LABEL = 0x0204
_B_NUMBER = 0x0203
_B_RK = 0x027E
_B_FILEPASS = 0x002F
_B_CONTINUE = 0x003C
_B_FORMULA = 0x0006
_B_STRING = 0x0207


class _SstCursor:
    """Byte cursor over the SST body plus its trailing Continue record
    bodies ([MS-XLS] 2.4.58 + 2.5.293). ``read_raw`` spans record
    boundaries transparently (string headers, rich runs, ExtRst);
    ``read_chars`` is the character-array reader that consumes the
    fresh option-flags byte a continuation begins with when a string's
    character data is what got split — the width may change there."""

    def __init__(self, parts: list[bytes]) -> None:
        self.parts = parts
        self.p = 0
        self.o = 0

    def _avail(self) -> int:
        return len(self.parts[self.p]) - self.o

    def _advance(self) -> None:
        self.p += 1
        self.o = 0
        if self.p >= len(self.parts):
            raise ValueError(
                "corrupt .xls: SST data overruns its Continue records"
            )

    def read_raw(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            while self._avail() == 0:
                self._advance()
            take = min(n, self._avail())
            out += self.parts[self.p][self.o : self.o + take]
            self.o += take
            n -= take
        return bytes(out)

    def read_chars(self, cch: int, high: int) -> str:
        text: list[str] = []
        while cch > 0:
            if self._avail() == 0:
                self._advance()
                # continuation within character data: fresh option byte
                high = self.read_raw(1)[0] & 0x1
            width = 2 if high else 1
            nch = min(cch, self._avail() // width)
            if nch == 0:
                raise ValueError(
                    "corrupt .xls: Continue boundary splits a UTF-16 "
                    "code unit"
                )
            raw = self.read_raw(nch * width)
            text.append(
                raw.decode("utf-16-le", "replace")
                if high
                else raw.decode("cp1252")
            )
            cch -= nch
        return "".join(text)


def _sst_parse(parts: list[bytes]) -> list[str]:
    """Decode the full shared string table from the SST record body and
    any trailing Continue bodies."""
    if len(parts[0]) < 8:
        return []
    (_total, unique) = struct.unpack_from("<ii", parts[0], 0)
    cur = _SstCursor(parts)
    cur.o = 8
    out: list[str] = []
    for _ in range(max(0, unique)):
        cch, flags = struct.unpack("<HB", cur.read_raw(3))
        high = flags & 0x1
        c_run = 0
        cb_ext = 0
        if flags & 0x8:  # fRichSt
            (c_run,) = struct.unpack("<H", cur.read_raw(2))
        if flags & 0x4:  # fExtSt
            (cb_ext,) = struct.unpack("<i", cur.read_raw(4))
        out.append(cur.read_chars(cch, high))
        if c_run:
            cur.read_raw(4 * c_run)
        if cb_ext > 0:
            cur.read_raw(cb_ext)
    return out


def _xl_string(data: bytes, i: int) -> tuple[str, int]:
    """XLUnicodeRichExtendedString at data[i]; returns (s, next_i)."""
    (cch, flags) = struct.unpack_from("<HB", data, i)
    i += 3
    high = flags & 0x1
    ext = flags & 0x4
    rich = flags & 0x8
    c_run = 0
    cb_ext = 0
    if rich:
        (c_run,) = struct.unpack_from("<H", data, i)
        i += 2
    if ext:
        (cb_ext,) = struct.unpack_from("<i", data, i)
        i += 4
    nbytes = cch * 2 if high else cch
    if i + nbytes > len(data):
        raise ValueError("corrupt .xls: inline string overruns its record")
    raw = data[i : i + nbytes]
    s = raw.decode("utf-16-le", "replace") if high else raw.decode("cp1252")
    i += nbytes + 4 * c_run + cb_ext
    return s, i


def _fmt_num(v: float) -> str:
    return str(int(v)) if v == int(v) and abs(v) < 1e15 else repr(v)


def _decode_rk(rk: int) -> float:
    div100 = rk & 0x1
    if rk & 0x2:  # signed 30-bit integer (arithmetic shift)
        v = float(struct.unpack("<i", struct.pack("<I", rk & 0xFFFFFFFF))[0] >> 2)
    else:  # high 30 bits of an IEEE double
        v = struct.unpack(
            "<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC)
        )[0]
    return v / 100.0 if div100 else v


def parse_xls(data: bytes) -> tuple[str, str | None]:
    """Extract (text, title=None) from a binary Excel .xls payload:
    one line per row, cells tab-joined in (row, col) order, sheets in
    stream order — the same shape as the .xlsx parser. Raises
    ValueError for encrypted workbooks and non-Excel CFB files —
    never struct.error (a Label record whose length lies about the
    fRichSt/fExtSt trailers would otherwise leak one from
    unpack_from; same fuzz-pinned contract as cfbdoc.parse_doc)."""
    try:
        return _parse_xls(data)
    except struct.error as e:
        raise ValueError(f"corrupt .xls: {e}") from None


def _parse_xls(data: bytes) -> tuple[str, str | None]:
    cfb = CfbReader(data)
    stream = None
    for name in ("Workbook", "Book"):
        try:
            stream = cfb.stream(name)
            break
        except KeyError:
            continue
    if stream is None:
        names = [n for n, t, _, _ in cfb.dir_entries if t == 2]
        raise ValueError(
            f"OLE2 container without a Workbook stream (streams: {names[:8]})"
        )
    sst: list[str] = []
    sheets: list[dict[tuple[int, int], str]] = []
    cells: dict[tuple[int, int], str] | None = None
    pending_str: tuple[int, int] | None = None  # Formula awaiting String
    i, n = 0, len(stream)
    while i + 4 <= n:
        (rec_type, rec_len) = struct.unpack_from("<HH", stream, i)
        i += 4
        body = stream[i : i + rec_len]
        i += rec_len
        if rec_type == _B_FILEPASS:
            raise ValueError(
                "encrypted .xls: FilePass (XOR/RC4) decryption not implemented"
            )
        if rec_type == _B_BOF:
            # BOF's dt field: 0x0005 workbook globals, 0x0010 worksheet
            dt = struct.unpack_from("<H", body, 2)[0] if rec_len >= 4 else 0
            if dt == 0x0005:
                cells = None  # globals substream (SST lives here)
            else:
                cells = {}
                sheets.append(cells)
            pending_str = None
            continue
        if rec_type == _B_EOF:
            cells = None
            pending_str = None
            continue
        if rec_type == _B_SST and rec_len >= 8:
            parts = [body]
            while i + 4 <= n:
                (nxt_type, nxt_len) = struct.unpack_from("<HH", stream, i)
                if nxt_type != _B_CONTINUE:
                    break
                parts.append(stream[i + 4 : i + 4 + nxt_len])
                i += 4 + nxt_len
            sst = _sst_parse(parts)
        elif cells is not None and rec_type == _B_LABELSST and rec_len >= 10:
            rw, col, _ixfe, isst = struct.unpack_from("<HHHi", body, 0)
            cells[(rw, col)] = sst[isst] if 0 <= isst < len(sst) else ""
        elif cells is not None and rec_type == _B_LABEL and rec_len >= 9:
            rw, col, _ixfe = struct.unpack_from("<HHH", body, 0)
            s, _ = _xl_string(body, 6)
            cells[(rw, col)] = s
        elif cells is not None and rec_type == _B_NUMBER and rec_len >= 14:
            rw, col, _ixfe = struct.unpack_from("<HHH", body, 0)
            (v,) = struct.unpack_from("<d", body, 6)
            cells[(rw, col)] = _fmt_num(v)
        elif cells is not None and rec_type == _B_RK and rec_len >= 10:
            rw, col, _ixfe = struct.unpack_from("<HHH", body, 0)
            (rk,) = struct.unpack_from("<I", body, 6)
            cells[(rw, col)] = _fmt_num(_decode_rk(rk))
        elif cells is not None and rec_type == _B_FORMULA and rec_len >= 20:
            # [MS-XLS] 2.4.127: the parser renders the CACHED result
            # (FormulaValue / trailing String record) — real workbooks
            # are full of Formula cells and BIFF stores the last
            # computed value inline, so no expression evaluation needed
            rw, col, _ixfe = struct.unpack_from("<HHH", body, 0)
            val = body[6:14]
            if val[6:8] == b"\xff\xff":
                t = val[0]
                if t == 0:  # cached string follows in a String record
                    cells[(rw, col)] = ""
                    pending_str = (rw, col)
                elif t == 1:  # cached boolean
                    cells[(rw, col)] = "TRUE" if val[2] else "FALSE"
                elif t == 3:  # cached blank string
                    cells[(rw, col)] = ""
                else:  # cached error value
                    cells[(rw, col)] = "#ERR"
            else:
                (v,) = struct.unpack_from("<d", body, 6)
                cells[(rw, col)] = _fmt_num(v)
        elif (
            cells is not None
            and rec_type == _B_STRING
            and pending_str is not None
            and rec_len >= 3
        ):
            cch, fl = struct.unpack_from("<HB", body, 0)
            width = 2 if fl & 0x1 else 1
            raw = body[3 : 3 + cch * width]
            if len(raw) < cch * width:
                raise ValueError("corrupt .xls: String record short of cch")
            cells[pending_str] = (
                raw.decode("utf-16-le", "replace")
                if width == 2
                else raw.decode("cp1252")
            )
            pending_str = None
    if not sheets and not sst:
        raise ValueError("no BIFF cell records found in the Workbook stream")
    out_lines: list[str] = []
    for sheet in sheets:
        if not sheet:
            continue
        rows: dict[int, dict[int, str]] = {}
        for (rw, col), s in sheet.items():
            rows.setdefault(rw, {})[col] = s
        for rw in sorted(rows):
            cols = rows[rw]
            out_lines.append(
                "\t".join(cols.get(c, "") for c in range(max(cols) + 1))
            )
    from aiotcvectordb_spark.operators.cfbdoc import read_summary_title

    return "\n".join(out_lines).strip("\n"), read_summary_title(cfb)


def _biff_record(rec_type: int, body: bytes) -> bytes:
    return struct.pack("<HH", rec_type, len(body)) + body


_BIFF_MAX_BODY = 8224  # [MS-XLS] 2.1.4: record bodies cap at 8224 bytes


def _utf16_units(s: str) -> list[bytes]:
    """The string as UTF-16LE code units (surrogate pairs = 2 units)."""
    u = s.encode("utf-16-le")
    return [u[i : i + 2] for i in range(0, len(u), 2)]


def _is_high_surrogate(unit: bytes) -> bool:
    return (unit[1] & 0xFC) == 0xD8


def _sst_records(
    total_refs: int, strings: list[str], *, max_body: int = _BIFF_MAX_BODY
) -> bytes:
    """Serialize the SST as one 0x00FC record plus as many Continue
    (0x003C) records as needed, splitting only where [MS-XLS] 2.5.293
    allows: between strings, or inside a character array with a fresh
    option byte opening the continuation."""
    if not 8 <= max_body <= _BIFF_MAX_BODY:
        raise ValueError("max_body out of range")
    bodies: list[bytearray] = []
    cur = bytearray(struct.pack("<ii", total_refs, len(strings)))

    def room() -> int:
        return max_body - len(cur)

    def flush() -> None:
        nonlocal cur
        bodies.append(cur)
        cur = bytearray()

    for s in strings:
        try:
            s.encode("cp1252")
            high = 0
        except UnicodeEncodeError:
            high = 1
        width = 2 if high else 1
        # cch counts UTF-16 code units, not code points ([MS-XLS]
        # 2.5.293 rgb is "cch characters" of 2-byte UTF-16) — a
        # non-BMP char is TWO units, so counting Python chars here
        # truncated the tail of any string with astral-plane text.
        # narrow path: cch == chars == bytes, the str itself suffices
        units = _utf16_units(s) if high else s
        if len(units) > 0xFFFF:
            raise ValueError("SST string longer than 65535 characters")
        # the 3-byte header (plus one character, if any) must not split
        if room() < 3 + (width if s else 0):
            flush()
        cur += struct.pack("<HB", len(units), high)
        pos = 0
        while pos < len(units):
            if room() < width:
                flush()
                cur.append(high)  # continuation inside character data
            nch = min(len(units) - pos, room() // width)
            if high:
                # never split a surrogate pair across Continue records
                # — the reader decodes each span independently
                while nch > 1 and _is_high_surrogate(units[pos + nch - 1]):
                    nch -= 1
                if (nch == 1 and pos + 1 < len(units)
                        and _is_high_surrogate(units[pos])):
                    flush()
                    cur.append(high)
                    continue
                cur += b"".join(units[pos : pos + nch])
            else:
                cur += units[pos : pos + nch].encode("cp1252")
            pos += nch
    flush()
    out = _biff_record(_B_SST, bytes(bodies[0]))
    for b in bodies[1:]:
        out += _biff_record(_B_CONTINUE, bytes(b))
    return out


def _formula_cached_number(rw: int, col: int, v: float) -> bytes:
    """Formula record whose FormulaValue is the cached double and
    whose rgce is the matching PtgNum constant expression."""
    rgce = b"\x1f" + struct.pack("<d", v)
    return _biff_record(
        _B_FORMULA,
        struct.pack("<HHH", rw, col, 15)
        + struct.pack("<d", v)
        + struct.pack("<HIH", 0, 0, len(rgce))
        + rgce,
    )


def _formula_cached_string(rw: int, col: int, s: str) -> bytes:
    """Formula record with the string-result marker (byte 0 = 0,
    bytes 6-7 = FFFF), a PtgStr constant rgce, and the cached value in
    the trailing String record ([MS-XLS] 2.5.133 + 2.4.268)."""
    try:
        enc, high = s.encode("cp1252"), 0
    except UnicodeEncodeError:
        enc, high = s.encode("utf-16-le"), 1
    # cch is UTF-16 code units when wide ([MS-XLS] 2.5.268), so
    # astral-plane chars count as two — byte length over width, not
    # len(s).
    cch = len(enc) // 2 if high else len(s)
    if cch > 0xFF:
        raise ValueError("cached formula string longer than PtgStr's cap")
    rgce = b"\x17" + bytes([cch, high]) + enc
    formula = _biff_record(
        _B_FORMULA,
        struct.pack("<HHH", rw, col, 15)
        + bytes([0, 0, 0, 0, 0, 0, 0xFF, 0xFF])
        + struct.pack("<HIH", 0, 0, len(rgce))
        + rgce,
    )
    return formula + _biff_record(
        _B_STRING, struct.pack("<HB", cch, high) + enc
    )


def build_xls(
    text: str,
    *,
    sst_max_body: int = _BIFF_MAX_BODY,
    formula_cells: bool = False,
) -> bytes:
    """Write a minimal valid BIFF8 .xls whose extracted text is
    ``text``: lines become rows, tabs split cells; all cells go
    through the SST + LabelSst path (both character widths chosen per
    cell content). ``sst_max_body`` shrinks the record cap so tests
    can force Continue splits without megabyte inputs.
    ``formula_cells`` (r7) stores eligible cells as Formula records
    carrying CACHED results instead: canonical integer cells as a
    cached-number FormulaValue (PtgNum rgce), and every second string
    cell of <= 255 chars as a cached-string Formula + String record
    pair — the record shapes real workbooks are full of."""
    rows = [line.split("\t") for line in text.split("\n")]
    strings: list[str] = []
    index: dict[str, int] = {}
    cell_recs = bytearray()
    total_refs = 0
    for rw, cols in enumerate(rows):
        if rw > 0xFFFF:
            raise ValueError("too many rows for BIFF8 (max 65536)")
        for col, s in enumerate(cols):
            if (
                formula_cells
                and s.isdigit()
                and len(s) <= 15  # exact in a double
                and s == str(int(s))
            ):
                cell_recs += _formula_cached_number(rw, col, float(s))
                continue
            if (
                formula_cells
                and 0 < len(s)
                # PtgStr caps cch at 255 UTF-16 code units, not chars
                and len(s.encode("utf-16-le")) <= 510
                and (rw + col) % 2 == 0
            ):
                cell_recs += _formula_cached_string(rw, col, s)
                continue
            if s not in index:
                index[s] = len(strings)
                strings.append(s)
            cell_recs += _biff_record(
                _B_LABELSST,
                struct.pack("<HHHi", rw, col, 15, index[s]),
            )
            total_refs += 1
    bof = _biff_record(_B_BOF, struct.pack("<HHHIII", 0x0600, 0x0005, 0, 0, 0, 0))
    bof_sheet = _biff_record(
        _B_BOF, struct.pack("<HHHIII", 0x0600, 0x0010, 0, 0, 0, 0)
    )
    eof = _biff_record(_B_EOF, b"")
    workbook = (
        bof
        + _sst_records(total_refs, strings, max_body=sst_max_body)
        + eof
        + bof_sheet
        + bytes(cell_recs)
        + eof
    )
    return _cfb_build({"Workbook": workbook})


# ---------------------------------------------------------------------------
# Spark kernels (Arrow-batched, shuffle-free — same shape as the
# PDF/.doc codec stages; codec cost partitions with the data)


def with_office_payload(df, builder, *, id_col: str = "doc_id",
                        text_col: str = "text", alternate: bool = True,
                        variant_fn=None):
    """Attach a binary payload built from ``text_col`` by ``builder``
    (build_ppt / build_xls). For build_ppt, ``alternate`` flips
    force_unicode on a crc of the id so both atom widths run
    distributed. ``variant_fn(id, text) -> kwargs`` lets callers vary
    builder options deterministically per row (stale edits, forced
    Continue splits) so those decode paths run distributed too.

    Text is canonicalized (CRLF / lone CR -> LF, XML-invalid C0
    controls stripped — ``cfbdoc.canon_upload_text``) before
    building: the upload-extraction contract every real pipeline
    applies, what makes the round trip well-defined across formats
    whose native line separator IS CR (.ppt atoms, .doc paragraph
    marks) or whose XML parsers normalize CR on read (OOXML), and
    what keeps the XML writers from emitting characters XML 1.0
    cannot represent; the extract oracles apply the same canon."""
    import zlib

    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, payload binary"

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            from aiotcvectordb_spark.operators.cfbdoc import canon_upload_text

            for i, t in zip(pdf[id_col], pdf[text_col]):
                t = canon_upload_text(t)
                kwargs = dict(variant_fn(i, t)) if variant_fn else {}
                if alternate and builder is build_ppt:
                    kwargs.setdefault(
                        "force_unicode",
                        bool(zlib.crc32(str(i).encode("utf-8")) % 2),
                    )
                payloads.append(builder(t or "", **kwargs))
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(encode, schema=schema)


def extract_office_text_df(df, parser, *, id_col: str = "doc_id"):
    """Run ``parser`` (parse_ppt / parse_xls) over a (id, payload)
    frame; returns (id, text)."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, text string"

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            texts = [parser(bytes(p))[0] for p in pdf["payload"]]
            yield pd.DataFrame({id_col: pdf[id_col], "text": texts})

    return df.mapInPandas(decode, schema=schema)
