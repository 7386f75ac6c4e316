"""OOXML (.docx / .pptx / .xlsx) text extraction for the RAG upload
path (ops 38/44) — stdlib only (r5).

The reference's server-side file parsing (reference
collection_view.py:342-423 ParsingProcess) covers Office uploads;
until r5 every Office binary was honestly rejected. Modern Office
files are ZIP containers of ECMA-376 XML parts, so the stdlib
``zipfile`` + ``xml.etree`` are a complete, real parser:

- **.docx**: ``word/document.xml`` — paragraphs ``<w:p>`` become
  lines; text runs ``<w:t>``, tabs ``<w:tab/>``, explicit breaks
  ``<w:br/>``; title from ``docProps/core.xml`` ``<dc:title>``.
- **.pptx**: every ``ppt/slides/slideN.xml`` in slide order; text runs
  ``<a:t>``, one line per paragraph ``<a:p>``; slide boundaries are
  blank lines; title = first text line of slide 1.
- **.xlsx**: ``xl/sharedStrings.xml`` string table + every worksheet's
  inline strings, one line per row (cells tab-joined), sheets in
  workbook order. Numbers/formulas render as their cached values.

Legacy OLE2/CFB binaries (.doc/.ppt/.xls, magic D0 CF 11 E0) remain
honestly rejected — the Word/PowerPoint binary record formats need far
more than a container walk, and a half-parse would silently emit
garbage. Encrypted OOXML (which is OLE2-wrapped) is rejected by the
same magic check.
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib
from xml.etree import ElementTree

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_DC = "{http://purl.org/dc/elements/1.1/}"

_OLE2_MAGIC = b"\xd0\xcf\x11\xe0"


def _open_zip(data: bytes, kind: str) -> zipfile.ZipFile:
    if data[:4] == _OLE2_MAGIC:
        raise ValueError(
            f"legacy OLE2 {kind} binary: only OOXML (ZIP) Office files "
            "are parseable with the stdlib (encrypted OOXML is OLE2-"
            "wrapped and is rejected the same way)"
        )
    try:
        return zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not an OOXML {kind} container: {e}") from None


def _read_xml(zf: zipfile.ZipFile, name: str):
    """Read + parse one XML part; any corruption (bad deflate, CRC
    mismatch, malformed XML) surfaces as ValueError — never a leaked
    zlib.error / BadZipFile / ParseError (fuzz-pinned contract)."""
    try:
        return ElementTree.fromstring(zf.read(name))
    except KeyError:
        raise
    except (
        zlib.error,              # bad deflate data
        zipfile.BadZipFile,      # CRC / local-header mismatch
        ElementTree.ParseError,  # malformed XML
        NotImplementedError,     # flipped compression-method byte
        RuntimeError,            # "encrypted, password required"
        EOFError,
        OSError,
    ) as e:
        raise ValueError(f"corrupt OOXML part {name!r}: {e}") from None


def _core_title(zf: zipfile.ZipFile) -> str | None:
    try:
        root = _read_xml(zf, "docProps/core.xml")
    except (KeyError, ValueError):
        return None
    el = root.find(f"{_DC}title")
    return (el.text or "").strip() or None if el is not None else None


def parse_docx(data: bytes) -> tuple[str, str | None]:
    """Extract (text, title) from a .docx payload."""
    zf = _open_zip(data, ".docx")
    try:
        root = _read_xml(zf, "word/document.xml")
    except KeyError:
        raise ValueError("not a .docx: word/document.xml missing") from None
    lines: list[str] = []
    for p in root.iter(f"{_W}p"):
        parts: list[str] = []
        for el in p.iter():
            if el.tag == f"{_W}t":
                parts.append(el.text or "")
            elif el.tag == f"{_W}tab":
                parts.append("\t")
            elif el.tag == f"{_W}br":
                parts.append("\n")
        lines.append("".join(parts))
    text = "\n".join(lines).strip("\n")
    return text, _core_title(zf)


def parse_pptx(data: bytes) -> tuple[str, str | None]:
    """Extract (text, title) from a .pptx payload, slides in order."""
    zf = _open_zip(data, ".pptx")
    slide_names = sorted(
        (n for n in zf.namelist()
         if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
        key=lambda n: int(re.search(r"(\d+)", n).group(1)),
    )
    if not slide_names:
        raise ValueError("not a .pptx: no ppt/slides/slide*.xml parts")
    slides: list[str] = []
    for name in slide_names:
        root = _read_xml(zf, name)
        lines = []
        for p in root.iter(f"{_A}p"):
            runs = [t.text or "" for t in p.iter(f"{_A}t")]
            lines.append("".join(runs))
        slides.append("\n".join(line for line in lines))
    text = "\n\n".join(s.strip("\n") for s in slides).strip("\n")
    title = _core_title(zf)
    if title is None:
        first = next((ln for ln in text.split("\n") if ln.strip()), "")
        title = first.strip() or None
    return text, title


def parse_xlsx(data: bytes) -> tuple[str, str | None]:
    """Extract (text, title) from an .xlsx payload: one line per row,
    cells tab-joined, sheets in workbook order."""
    zf = _open_zip(data, ".xlsx")
    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        sroot = _read_xml(zf, "xl/sharedStrings.xml")
        for si in sroot.iter(f"{_S}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{_S}t")))
    sheet_names = sorted(
        (n for n in zf.namelist()
         if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
        key=lambda n: int(re.search(r"(\d+)", n).group(1)),
    )
    if not sheet_names:
        raise ValueError("not an .xlsx: no xl/worksheets/sheet*.xml parts")
    out_lines: list[str] = []
    for name in sheet_names:
        root = _read_xml(zf, name)
        for row in root.iter(f"{_S}row"):
            cells: list[str] = []
            for c in row.iter(f"{_S}c"):
                ctype = c.get("t")
                v = c.find(f"{_S}v")
                if ctype == "s" and v is not None:
                    idx = int(v.text or 0)
                    cells.append(shared[idx] if idx < len(shared) else "")
                elif ctype == "inlineStr":
                    is_el = c.find(f"{_S}is")
                    cells.append(
                        "".join(t.text or "" for t in is_el.iter(f"{_S}t"))
                        if is_el is not None else ""
                    )
                else:
                    cells.append((v.text or "") if v is not None else "")
            out_lines.append("\t".join(cells))
    return "\n".join(out_lines).strip("\n"), _core_title(zf)
