"""Legacy binary Word (.doc) text extraction + a matching writer
(ops 38/44, r6).

The reference's server-side upload parsing (reference
collection_view.py:342-423 ``upload_file``/ParsingProcess) covers the
formats enterprises actually upload; until r6 OLE2 binaries were
honestly rejected. Both layers needed here are PUBLIC, fully
algorithmic specs, so a stdlib implementation is possible:

- **[MS-CFB]** — the OLE2 compound file container (magic
  ``D0 CF 11 E0 A1 B1 1A E1``): 512/4096-byte sectors, a FAT whose
  sector list lives in the header DIFAT (+ chained DIFAT sectors), a
  directory of 128-byte entries (UTF-16LE names, red-black sibling
  tree flattened here by scanning), and a mini-FAT for streams under
  4096 bytes carved from the root entry's mini stream in 64-byte
  mini sectors.
- **[MS-DOC]** — the WordDocument stream's FIB: ``wIdent`` 0xA5EC,
  ``fWhichTblStm`` (FIB base flag bit 0x0200) selecting the 0Table /
  1Table stream, ``fibRgLw.ccpText`` (main-document CP count, FIB
  offset 0x4C) and ``fibRgFcLcb97.fcClx/lcbClx`` (pair 33, FIB offset
  0x1A2). The Clx in the table stream holds the **piece table**
  (Pcdt/PlcPcd): n+1 CPs + n PCDs, each PCD's fc bit 30
  (``fCompressed``) selecting 8-bit cp1252 at ``fc/2`` vs UTF-16LE at
  ``fc`` in the WordDocument stream.

Extraction walks the pieces covering the main document range, maps
Word's control characters (CR and VT become newlines, cell/row mark
0x07 becomes a tab/newline, field characters 0x13/0x14/0x15 and other
controls are dropped), and strips the trailing paragraph mark.

The writer (``build_doc``) emits a spec-correct CFB with WordDocument
+ 0Table streams — small streams genuinely go through the mini
stream/miniFAT path, large ones through the FAT — with a multi-piece
piece table mixing compressed (cp1252) and UTF-16LE pieces. That
makes the whole container + FIB + piece-table machinery
oracle-checkable via the same encode-then-decode round trip as the
PDF codec (``doc_extract`` registry query).

Honest rejections (ValueError): encrypted documents (FIB base flag
``fEncrypted`` 0x0100), non-Word CFB files (no WordDocument stream),
and corrupt containers. Legacy .ppt/.xls are parsed by
``operators/olebin`` on top of this module's CfbReader; document
titles come from the [MS-OLEPS] SummaryInformation property set.
"""

from __future__ import annotations

import struct

__all__ = ["parse_doc", "build_doc", "CfbReader"]

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC
_MINI_CUTOFF = 4096
_MINI_SHIFT = 6  # 64-byte mini sectors


class CfbReader:
    """[MS-CFB] compound file reader: directory + stream access."""

    def __init__(self, data: bytes) -> None:
        if data[:8] != _CFB_MAGIC:
            raise ValueError("not an OLE2/CFB container (bad magic)")
        if len(data) < 512:
            raise ValueError("truncated CFB header")
        (sector_shift,) = struct.unpack_from("<H", data, 30)
        if sector_shift not in (9, 12):
            raise ValueError(f"corrupt CFB: sector shift {sector_shift}")
        self.data = data
        self.ssz = 1 << sector_shift
        (self.n_fat_sects,) = struct.unpack_from("<I", data, 44)
        (self.dir_start,) = struct.unpack_from("<I", data, 48)
        (self.minifat_start,) = struct.unpack_from("<I", data, 60)
        (self.n_minifat_sects,) = struct.unpack_from("<I", data, 64)
        (self.difat_start,) = struct.unpack_from("<I", data, 68)
        (self.n_difat_sects,) = struct.unpack_from("<I", data, 72)
        self.fat = self._load_fat()
        self.dir_entries = self._load_dir()
        self.minifat = self._load_minifat()
        self.mini_stream = self._load_mini_stream()

    def _sector(self, sid: int) -> bytes:
        off = 512 + sid * self.ssz
        if off + self.ssz > len(self.data):
            # tolerate a short final sector (writers often truncate)
            chunk = self.data[off:]
            if not chunk:
                raise ValueError(f"corrupt CFB: sector {sid} out of range")
            return chunk + b"\x00" * (self.ssz - len(chunk))
        return self.data[off : off + self.ssz]

    def _load_fat(self) -> list[int]:
        difat: list[int] = list(
            struct.unpack_from("<109I", self.data, 76)
        )
        sid = self.difat_start
        guard = 0
        while sid not in (_ENDOFCHAIN, _FREESECT) and guard < 1 << 16:
            sect = self._sector(sid)
            entries = struct.unpack(f"<{self.ssz // 4}I", sect)
            difat.extend(entries[:-1])
            sid = entries[-1]
            guard += 1
        fat: list[int] = []
        for fsid in difat:
            if fsid in (_FREESECT, _ENDOFCHAIN):
                continue
            fat.extend(
                struct.unpack(f"<{self.ssz // 4}I", self._sector(fsid))
            )
        return fat

    def _chain(self, start: int, fat: list[int]) -> list[int]:
        chain: list[int] = []
        sid = start
        seen: set[int] = set()
        while sid not in (_ENDOFCHAIN, _FREESECT):
            if sid in seen or sid >= len(fat):
                raise ValueError("corrupt CFB: FAT chain cycle/overrun")
            seen.add(sid)
            chain.append(sid)
            sid = fat[sid]
        return chain

    def _read_chain(self, start: int) -> bytes:
        return b"".join(self._sector(s) for s in self._chain(start, self.fat))

    def _load_dir(self) -> list[tuple[str, int, int, int]]:
        """(name, type, start_sector, size) per directory entry."""
        raw = self._read_chain(self.dir_start)
        out = []
        for off in range(0, len(raw) - 127, 128):
            (name_len,) = struct.unpack_from("<H", raw, off + 64)
            if not 2 <= name_len <= 64:
                continue
            name = raw[off : off + name_len - 2].decode("utf-16-le", "replace")
            obj_type = raw[off + 66]
            (start,) = struct.unpack_from("<I", raw, off + 116)
            (size,) = struct.unpack_from("<Q", raw, off + 120)
            if self.ssz == 512:
                size &= 0xFFFFFFFF  # v3: only the low 4 bytes are valid
            out.append((name, obj_type, start, size))
        return out

    def _load_minifat(self) -> list[int]:
        if self.minifat_start in (_ENDOFCHAIN, _FREESECT):
            return []
        raw = self._read_chain(self.minifat_start)
        return list(struct.unpack(f"<{len(raw) // 4}I", raw))

    def _load_mini_stream(self) -> bytes:
        for name, obj_type, start, size in self.dir_entries:
            if obj_type == 5:  # root entry carries the mini stream
                if start in (_ENDOFCHAIN, _FREESECT):
                    return b""
                return self._read_chain(start)[:size]
        return b""

    def stream(self, name: str) -> bytes:
        for ent_name, obj_type, start, size in self.dir_entries:
            if obj_type == 2 and ent_name == name:
                if size < _MINI_CUTOFF:
                    msz = 1 << _MINI_SHIFT
                    chain = self._chain(start, self.minifat) if size else []
                    raw = b"".join(
                        self.mini_stream[s * msz : (s + 1) * msz]
                        for s in chain
                    )
                    return raw[:size]
                return self._read_chain(start)[:size]
        raise KeyError(name)


# ---------------------------------------------------------------------------
# [MS-DOC] text extraction

_FIB_FLAGS_OFF = 0x0A
_F_ENCRYPTED = 0x0100
_F_WHICH_TBL = 0x0200
_CCP_TEXT_OFF = 0x4C
_FC_CLX_OFF = 0x1A2  # fibRgFcLcb97 pair 33


def _map_word_text(s: str) -> str:
    """Word control characters -> plain text (CR/VT to newline, cell
    mark to tab, page/section/field marks dropped)."""
    out: list[str] = []
    for ch in s:
        o = ord(ch)
        if ch in ("\r", "\x0b"):
            out.append("\n")
        elif ch == "\x07":  # cell separator / row terminator
            out.append("\t")
        elif ch in ("\t", "\n"):
            out.append(ch)
        elif o < 0x20 or o == 0x7F:
            continue  # field chars 13/14/15, page breaks, specials
        else:
            out.append(ch)
    return "".join(out)


def parse_doc(data: bytes) -> tuple[str, str | None]:
    """Extract (text, title) from a binary Word .doc payload. Title
    comes from the [MS-OLEPS] SummaryInformation property set when
    present (r6).

    Raises ValueError for encrypted documents, non-Word CFB files, and
    corrupt containers — honest rejection over silent garbage; no
    struct.error/KeyError ever leaks (fuzz-pinned contract)."""
    try:
        return _parse_doc(data)
    except struct.error as e:
        raise ValueError(f"corrupt .doc: {e}") from None


def _parse_doc(data: bytes) -> tuple[str, str | None]:
    cfb = CfbReader(data)
    try:
        word = cfb.stream("WordDocument")
    except KeyError:
        names = [n for n, t, _, _ in cfb.dir_entries if t == 2]
        raise ValueError(
            f"OLE2 container without a WordDocument stream (streams: "
            f"{names[:8]}) — only .doc is implemented, .ppt/.xls are not"
        ) from None
    if len(word) < 0x200:
        raise ValueError("corrupt .doc: WordDocument stream too short")
    (w_ident,) = struct.unpack_from("<H", word, 0)
    if w_ident != 0xA5EC:
        raise ValueError(f"corrupt .doc: FIB wIdent 0x{w_ident:04X}")
    (flags,) = struct.unpack_from("<H", word, _FIB_FLAGS_OFF)
    if flags & _F_ENCRYPTED:
        raise ValueError("encrypted .doc: XOR/RC4 obfuscation not implemented")
    table_name = "1Table" if flags & _F_WHICH_TBL else "0Table"
    try:
        table = cfb.stream(table_name)
    except KeyError:
        raise ValueError(f"corrupt .doc: {table_name} stream missing") from None
    (ccp_text,) = struct.unpack_from("<i", word, _CCP_TEXT_OFF)
    fc_clx, lcb_clx = struct.unpack_from("<II", word, _FC_CLX_OFF)
    if lcb_clx == 0 or fc_clx + lcb_clx > len(table):
        raise ValueError("corrupt .doc: Clx out of table-stream range")
    clx = table[fc_clx : fc_clx + lcb_clx]
    # Clx = RgPrc (clxt=1 blocks) then Pcdt (clxt=2)
    i = 0
    while i < len(clx) and clx[i] == 0x01:
        (cb,) = struct.unpack_from("<h", clx, i + 1)
        i += 3 + cb
    if i >= len(clx) or clx[i] != 0x02:
        raise ValueError("corrupt .doc: piece table (Pcdt) not found")
    (lcb_plc,) = struct.unpack_from("<I", clx, i + 1)
    plc = clx[i + 5 : i + 5 + lcb_plc]
    if len(plc) < lcb_plc or (lcb_plc - 4) % 12:
        raise ValueError("corrupt .doc: PlcPcd size")
    n = (lcb_plc - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    pieces: list[str] = []
    got_cps = 0
    for k in range(n):
        cp_len = cps[k + 1] - cps[k]
        if cp_len <= 0:
            continue
        pcd_off = 4 * (n + 1) + 8 * k
        (fc_raw,) = struct.unpack_from("<I", plc, pcd_off + 2)
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        take = cp_len
        if got_cps >= ccp_text:
            break  # only the main document range (headers etc. follow)
        take = min(take, ccp_text - got_cps)
        if compressed:
            raw = word[fc // 2 : fc // 2 + take]
            pieces.append(raw.decode("cp1252", "replace"))
        else:
            raw = word[fc : fc + 2 * take]
            pieces.append(raw.decode("utf-16-le", "replace"))
        got_cps += take
    text = _map_word_text("".join(pieces)).rstrip("\n")
    return text, read_summary_title(cfb)


# ---------------------------------------------------------------------------
# writer

_PIECE_CPS = 4000  # UTF-16 code units per written piece


def _cfb_build(streams: dict[str, bytes]) -> bytes:
    """Assemble a spec-correct v3 CFB: streams under 4096 bytes go
    through the mini stream + miniFAT, larger ones through the FAT."""
    ssz, msz = 512, 64
    per_sect = ssz // 4

    big = {n: d for n, d in streams.items() if len(d) >= _MINI_CUTOFF}
    small = {n: d for n, d in streams.items() if len(d) < _MINI_CUTOFF}

    # mini stream layout
    mini_offsets: dict[str, int] = {}
    mini = bytearray()
    for name, d in small.items():
        mini_offsets[name] = len(mini) // msz
        mini += d
        if len(mini) % msz:
            mini += b"\x00" * (msz - len(mini) % msz)
    n_mini_sects = len(mini) // msz
    minifat: list[int] = []
    for name, d in small.items():
        cnt = max(1, (len(d) + msz - 1) // msz) if d else 0
        start = mini_offsets[name]
        for t in range(cnt):
            minifat.append(start + t + 1 if t + 1 < cnt else _ENDOFCHAIN)
    assert len(minifat) == n_mini_sects

    # sector plan: [FAT sectors][minifat sectors][mini-stream sectors]
    # [big streams][directory]
    sects: list[bytes] = []

    def add_stream(d: bytes) -> tuple[int, int]:
        start = len(sects)
        for off in range(0, max(len(d), 1), ssz):
            chunk = d[off : off + ssz]
            sects.append(chunk + b"\x00" * (ssz - len(chunk)))
        return start, len(sects) - start

    # lay out payload sectors first (indices resolved after we know
    # how many FAT sectors precede them) — easier: build with FAT
    # sector count solved iteratively
    minifat_raw = b"".join(struct.pack("<I", v) for v in minifat)
    dir_entries = 1 + len(streams)  # root + streams
    n_dir_sects = (dir_entries * 128 + ssz - 1) // ssz

    def total_payload_sects(n_fat: int) -> int:
        n = 0
        n += (len(minifat_raw) + ssz - 1) // ssz if minifat_raw else 0
        n += (len(mini) + ssz - 1) // ssz if mini else 0
        for d in big.values():
            n += (len(d) + ssz - 1) // ssz
        n += n_dir_sects
        return n_fat + n

    n_fat = 1
    while (total_payload_sects(n_fat) + per_sect - 1) // per_sect > n_fat:
        n_fat += 1
    if n_fat > 109:
        raise ValueError("document too large for a header-DIFAT-only writer")

    fat: list[int] = []
    sect_data: list[bytes] = []

    def alloc(d: bytes) -> int:
        start = len(sect_data) + n_fat
        n_s = max(1, (len(d) + ssz - 1) // ssz) if d else 0
        for t in range(n_s):
            chunk = d[t * ssz : (t + 1) * ssz]
            sect_data.append(chunk + b"\x00" * (ssz - len(chunk)))
            fat.append(start + t + 1 if t + 1 < n_s else _ENDOFCHAIN)
        return start if n_s else _ENDOFCHAIN

    for _ in range(n_fat):
        fat.append(_FATSECT)
    minifat_start = alloc(minifat_raw) if minifat_raw else _ENDOFCHAIN
    mini_start = alloc(bytes(mini)) if mini else _ENDOFCHAIN
    big_starts = {name: alloc(d) for name, d in big.items()}
    # directory
    dir_raw = bytearray()

    def dir_entry(
        name: str, obj_type: int, start: int, size: int,
        left: int = _FREESECT, right: int = _FREESECT, child: int = _FREESECT,
    ) -> bytes:
        nm = name.encode("utf-16-le")
        ent = bytearray(128)
        ent[0 : len(nm)] = nm
        struct.pack_into("<H", ent, 64, len(nm) + 2)
        ent[66] = obj_type
        ent[67] = 1  # black
        struct.pack_into("<III", ent, 68, left, right, child)
        struct.pack_into("<I", ent, 116, start)
        struct.pack_into("<Q", ent, 120, size)
        return bytes(ent)

    names = list(streams)
    # root's child points at the first stream; remaining streams chain
    # through right-siblings (a valid, if degenerate, red-black tree)
    dir_raw += dir_entry(
        "Root Entry", 5, mini_start if mini else _ENDOFCHAIN, len(mini),
        child=1 if names else _FREESECT,
    )
    for idx, name in enumerate(names):
        d = streams[name]
        start = (
            big_starts[name] if name in big
            else (mini_offsets[name] if d else _ENDOFCHAIN)
        )
        right = idx + 2 if idx + 1 < len(names) else _FREESECT
        dir_raw += dir_entry(name, 2, start, len(d), right=right)
    dir_start = alloc(bytes(dir_raw))

    while len(fat) < n_fat * per_sect:
        fat.append(_FREESECT)

    header = bytearray(512)
    header[0:8] = _CFB_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor version
    struct.pack_into("<H", header, 26, 3)  # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little endian
    struct.pack_into("<H", header, 30, 9)  # sector shift
    struct.pack_into("<H", header, 32, _MINI_SHIFT)
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, _MINI_CUTOFF)
    struct.pack_into(
        "<I", header, 60, minifat_start if minifat_raw else _ENDOFCHAIN
    )
    struct.pack_into(
        "<I", header, 64,
        (len(minifat_raw) + ssz - 1) // ssz if minifat_raw else 0,
    )
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    for t in range(109):
        struct.pack_into(
            "<I", header, 76 + 4 * t, t if t < n_fat else _FREESECT
        )

    fat_raw = b"".join(struct.pack("<I", v) for v in fat)
    out = bytes(header) + fat_raw + b"".join(sect_data)
    return out


def _utf16_pieces(text: str, max_cps: int) -> list[str]:
    """Split text into pieces of <= max_cps UTF-16 code units without
    splitting a surrogate pair (piece CP counts are UTF-16 units)."""
    pieces: list[str] = []
    cur: list[str] = []
    cur_cps = 0
    for ch in text:
        w = 2 if ord(ch) > 0xFFFF else 1
        if cur_cps + w > max_cps and cur:
            pieces.append("".join(cur))
            cur, cur_cps = [], 0
        cur.append(ch)
        cur_cps += w
    if cur or not pieces:
        pieces.append("".join(cur))
    return pieces


# C0 controls except tab/newline: stripped by every upload payload
# kernel (after CRLF/CR -> LF). XML 1.0 cannot represent them at all
# (a writer that emitted them produced OOXML its own parser rejected),
# and binary Word assigns some of them structural meaning (0x07 is the
# cell mark) — a real extraction pipeline normalizes them away. The
# extract oracles apply the identical translate().
_CTRL_CODES = [c for c in range(0x20) if c not in (0x09, 0x0A, 0x0D)]
_CTRL_DELETE = dict.fromkeys(_CTRL_CODES)


def canon_upload_text(t: str) -> str:
    """The upload-extraction text canon shared by every payload
    kernel: CRLF / lone CR -> LF, then XML-invalid C0 controls
    stripped (tab and newline survive)."""
    return (
        (t or "")
        .replace("\r\n", "\n")
        .replace("\r", "\n")
        .translate(_CTRL_DELETE)
    )


def build_doc(
    text: str, *, force_unicode: bool = False, title: str | None = None
) -> bytes:
    """Write a valid binary Word .doc whose extracted text is exactly
    ``text`` (modulo Word's CR paragraph marks: '\\n' is written as CR
    and read back as '\\n'). The piece table splits every
    ``_PIECE_CPS`` code units; each piece is written compressed
    (cp1252) when its characters allow and ``force_unicode`` is off,
    else UTF-16LE — so both PCD shapes run in the round trip. Streams
    under 4096 bytes exercise the mini-stream path, larger ones the
    FAT path."""
    body = text.replace("\n", "\r") + "\r"
    pieces = _utf16_pieces(body, _PIECE_CPS)

    word = bytearray(0x600)  # FIB area, zero-filled
    struct.pack_into("<H", word, 0, 0xA5EC)
    struct.pack_into("<H", word, 2, 0x00C1)  # nFib: Word 97
    struct.pack_into("<H", word, _FIB_FLAGS_OFF, 0)  # 0Table, unencrypted
    piece_entries: list[tuple[int, bool, int]] = []  # (fc_raw, compressed, cps)
    for idx, p in enumerate(pieces):
        compressed = not force_unicode and idx % 2 == 0
        if compressed:
            try:
                raw = p.encode("cp1252")
            except UnicodeEncodeError:
                compressed = False
        if compressed:
            if len(word) % 2:
                word += b"\x00"
            fc_raw = (len(word) * 2) | 0x40000000
            word += raw
        else:
            if len(word) % 2:
                word += b"\x00"
            fc_raw = len(word)
            word += p.encode("utf-16-le")
        cps = sum(2 if ord(c) > 0xFFFF else 1 for c in p)
        piece_entries.append((fc_raw, compressed, cps))

    ccp_text = sum(cps for _, _, cps in piece_entries)
    struct.pack_into("<i", word, _CCP_TEXT_OFF, ccp_text)

    n = len(piece_entries)
    cps_acc = [0]
    for _, _, cps in piece_entries:
        cps_acc.append(cps_acc[-1] + cps)
    plc = b"".join(struct.pack("<I", v) for v in cps_acc) + b"".join(
        struct.pack("<HIH", 0, fc_raw, 0) for fc_raw, _, _ in piece_entries
    )
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    table = clx  # Clx at offset 0 of 0Table
    struct.pack_into("<II", word, _FC_CLX_OFF, 0, len(clx))

    streams = {"WordDocument": bytes(word), "0Table": table}
    if title is not None:
        streams["\x05SummaryInformation"] = build_summary_stream(title)
    return _cfb_build(streams)


# ---------------------------------------------------------------------------
# Spark kernels (Arrow-batched, shuffle-free — same shape as the PDF
# codec stages; the codec cost partitions with the data, the 100 TB
# shape)


def with_doc_payload(df, *, id_col: str = "doc_id", text_col: str = "text"):
    """Attach a real binary .doc ``payload`` built from ``text_col``.
    Unicode forcing alternates on a crc of the id so the compressed
    (cp1252) and UTF-16LE piece paths both run distributed."""
    import zlib

    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, payload binary"

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            # canon_upload_text: CRLF/CR -> LF + C0-control strip, the
            # canon every payload kernel applies; Word stores paragraph
            # marks as CR and cell marks as 0x07, so uncanonicalized
            # input would round trip with phantom breaks/tabs
            payloads = [
                build_doc(
                    canon_upload_text(t),
                    force_unicode=bool(
                        zlib.crc32(str(i).encode("utf-8")) % 2
                    ),
                )
                for i, t in zip(pdf[id_col], pdf[text_col])
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(encode, schema=schema)


def extract_text_df(df, *, id_col: str = "doc_id"):
    """Run the .doc extractor over a (id, payload) frame; returns
    (id, text)."""
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, text string"

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            texts = [parse_doc(bytes(p))[0] for p in pdf["payload"]]
            yield pd.DataFrame({id_col: pdf[id_col], "text": texts})

    return df.mapInPandas(decode, schema=schema)


# ---------------------------------------------------------------------------
# [MS-OLEPS] SummaryInformation: document title (r6)

_FMTID_SUMMARY = bytes.fromhex("e0859ff2f94f6810ab9108002b27b3d9")
_PIDSI_TITLE = 0x02
_VT_LPSTR = 30
_VT_LPWSTR = 31


def read_summary_title(cfb: CfbReader) -> str | None:
    """Title from the \\x05SummaryInformation property set, or None.
    Property-set layout per [MS-OLEPS]: header + per-set (FMTID,
    offset), each set = size + count + (propId, propOffset) pairs;
    the title is PIDSI_TITLE (0x02) as VT_LPSTR (cp1252, the set's
    code page is honored as cp1252/utf-16 via the VT) or VT_LPWSTR."""
    try:
        raw = cfb.stream("\x05SummaryInformation")
    except KeyError:
        return None
    try:
        (n_sets,) = struct.unpack_from("<I", raw, 24)
        for k in range(min(n_sets, 4)):
            fmtid = raw[28 + 20 * k : 44 + 20 * k]
            (off,) = struct.unpack_from("<I", raw, 44 + 20 * k)
            if fmtid != _FMTID_SUMMARY:
                continue
            (_size, n_props) = struct.unpack_from("<II", raw, off)
            for p in range(n_props):
                pid, poff = struct.unpack_from("<II", raw, off + 8 + 8 * p)
                if pid != _PIDSI_TITLE:
                    continue
                vt, = struct.unpack_from("<I", raw, off + poff)
                (cb,) = struct.unpack_from("<I", raw, off + poff + 4)
                at = off + poff + 8
                if vt == _VT_LPSTR:
                    s = raw[at : at + cb].split(b"\x00")[0].decode(
                        "cp1252", "replace"
                    )
                elif vt == _VT_LPWSTR:
                    s = raw[at : at + 2 * cb].decode(
                        "utf-16-le", "replace"
                    ).split("\x00")[0]
                else:
                    return None
                return s.strip() or None
    except struct.error:
        return None
    return None


def build_summary_stream(title: str) -> bytes:
    """A minimal \\x05SummaryInformation stream carrying one
    PIDSI_TITLE property (VT_LPWSTR so any Unicode survives)."""
    chars = title + "\x00"
    prop = struct.pack("<II", _VT_LPWSTR, len(chars)) + chars.encode(
        "utf-16-le"
    )
    if len(prop) % 4:
        prop += b"\x00" * (4 - len(prop) % 4)
    # one set, one property: set body = size + count + (pid, off) + prop
    body = struct.pack("<IIII", 16 + len(prop), 1, _PIDSI_TITLE, 16) + prop
    header = (
        struct.pack("<HHI", 0xFFFE, 0, 0)
        + b"\x00" * 16
        + struct.pack("<I", 1)
        + _FMTID_SUMMARY
        + struct.pack("<I", 48)
    )
    return header + body
