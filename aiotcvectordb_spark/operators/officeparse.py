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
  Footnotes/endnotes (``word/footnotes.xml``/``word/endnotes.xml``,
  skipping the separator/continuationSeparator stubs) and then
  headers/footers (``word/header*.xml``/``footer*.xml``, name-sorted)
  are appended after the body in that documented order — real-world
  documents carry citation text there (r6).
- **.pptx**: every ``ppt/slides/slideN.xml`` in slide order; text runs
  ``<a:t>``, one line per paragraph ``<a:p>``; slide boundaries are
  blank lines; title = first text line of slide 1.
- **.xlsx**: ``xl/sharedStrings.xml`` string table + every worksheet's
  inline strings, one line per row (cells tab-joined), sheets in
  workbook order. Numbers/formulas render as their cached values.

Legacy OLE2/CFB binaries (.doc/.ppt/.xls, magic D0 CF 11 E0) are
routed to the real binary parsers (``cfbdoc``/``olebin``) by this
module's magic check via ``docparse``; encrypted OOXML (OLE2-wrapped)
is rejected there. The ``build_docx``/``build_pptx``/``build_xlsx``
writers emit spec-shaped minimal packages so all three parsers are
oracle-checkable by encode-then-decode round trips
(``docx_extract``/``pptx_extract``/``xlsx_extract`` registry queries),
the same proof pattern as the PDF/.doc/.ppt/.xls codecs.
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
    except (zipfile.BadZipFile, NotImplementedError, ValueError, OSError) as e:
        # NotImplementedError: central-directory extract_version byte
        # beyond the stdlib's max (fuzz-pinned); ValueError/OSError:
        # truncated or inconsistent end-of-central-directory records
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


def _docx_paragraph_lines(root) -> list[str]:
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
    return lines


_NOTE_STUB_TYPES = ("separator", "continuationSeparator")


def parse_docx(data: bytes) -> tuple[str, str | None]:
    """Extract (text, title) from a .docx payload: body paragraphs,
    then footnotes/endnotes (Word's empty separator/
    continuationSeparator stubs skipped), then headers/footers
    (name-sorted) — one documented, deterministic reading order."""
    zf = _open_zip(data, ".docx")
    try:
        root = _read_xml(zf, "word/document.xml")
    except KeyError:
        raise ValueError("not a .docx: word/document.xml missing") from None
    lines = _docx_paragraph_lines(root)
    names = set(zf.namelist())
    for part, tag in (
        ("word/footnotes.xml", f"{_W}footnote"),
        ("word/endnotes.xml", f"{_W}endnote"),
    ):
        if part not in names:
            continue
        nroot = _read_xml(zf, part)
        for note in nroot.iter(tag):
            if note.get(f"{_W}type") in _NOTE_STUB_TYPES:
                continue
            lines.extend(_docx_paragraph_lines(note))
    for part in sorted(
        n for n in names if re.fullmatch(r"word/(header|footer)\d+\.xml", n)
    ):
        lines.extend(_docx_paragraph_lines(_read_xml(zf, part)))
    text = "\n".join(lines).strip("\n")
    return text, _core_title(zf)


def _pptx_slide_text(root) -> str:
    lines = []
    for p in root.iter(f"{_A}p"):
        runs = [t.text or "" for t in p.iter(f"{_A}t")]
        lines.append("".join(runs))
    return "\n".join(lines)


def parse_pptx(data: bytes) -> tuple[str, str | None]:
    """Extract (text, title) from a .pptx payload, slides in numeric
    order, then SPEAKER NOTES (``ppt/notesSlides/notesSlideN.xml``,
    numeric order) appended after the deck body (r7) — real decks
    carry substantial prose there and dropping it loses exactly the
    content a RAG upload wants. One documented, deterministic reading
    order: slides -> notes, blank-line-separated."""
    zf = _open_zip(data, ".pptx")
    names = zf.namelist()

    def numbered(pattern: str) -> list[str]:
        return sorted(
            (n for n in names if re.fullmatch(pattern, n)),
            key=lambda n: int(re.search(r"(\d+)\.xml$", n).group(1)),
        )

    slide_names = numbered(r"ppt/slides/slide\d+\.xml")
    if not slide_names:
        raise ValueError("not a .pptx: no ppt/slides/slide*.xml parts")
    parts = [_pptx_slide_text(_read_xml(zf, n)) for n in slide_names]
    parts += [
        _pptx_slide_text(_read_xml(zf, n))
        for n in numbered(r"ppt/notesSlides/notesSlide\d+\.xml")
    ]
    text = "\n\n".join(s.strip("\n") for s in parts).strip("\n")
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
                elif ctype == "b":  # boolean cells render as Excel shows them
                    cells.append(
                        "TRUE" if v is not None and v.text == "1" else "FALSE"
                    )
                else:  # n (number), str (formula cache), e (error): raw <v>
                    cells.append((v.text or "") if v is not None else "")
            out_lines.append("\t".join(cells))
    return "\n".join(out_lines).strip("\n"), _core_title(zf)


# ---------------------------------------------------------------------------
# Writers: minimal spec-shaped ECMA-376 packages, so each parser is
# oracle-checkable via an encode-then-decode round trip (the same
# proof pattern as the PDF/.doc/.ppt/.xls codecs).

_XML_DECL = '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
_W_URI = _W[1:-1]
_A_URI = _A[1:-1]
_S_URI = _S[1:-1]
_DC_URI = _DC[1:-1]
_P_URI = "http://schemas.openxmlformats.org/presentationml/2006/main"
_CT_XML = (
    _XML_DECL
    + '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types"><Default Extension="xml" '
    'ContentType="application/xml"/></Types>'
)


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _zip_pack(parts: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in parts.items():
            zf.writestr(name, content)
    return buf.getvalue()


def _core_xml(title: str) -> str:
    return (
        _XML_DECL
        + '<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/'
        f'package/2006/metadata/core-properties" xmlns:dc="{_DC_URI}">'
        f"<dc:title>{_xml_escape(title)}</dc:title></cp:coreProperties>"
    )


def _w_runs(segment: str) -> str:
    runs = (
        f'<w:r><w:t xml:space="preserve">{_xml_escape(seg)}</w:t></w:r>'
        for seg in segment.split("\t")
    )
    return "<w:r><w:tab/></w:r>".join(runs)


def _w_paragraph(line: str, *, br_first_space: bool = False) -> str:
    if br_first_space and " " in line:
        a, b = line.split(" ", 1)
        inner = _w_runs(a) + "<w:r><w:br/></w:r>" + _w_runs(b)
    else:
        inner = _w_runs(line)
    return "<w:p>" + inner + "</w:p>"


def build_docx(
    text: str,
    *,
    title: str | None = None,
    footnote: str | None = None,
    header: str | None = None,
    br_first_space: bool = False,
) -> bytes:
    """Write a minimal valid .docx whose extracted text is ``text``
    (lines = paragraphs, tabs preserved as <w:tab/>), optionally with
    a real footnote part (including Word's separator/
    continuationSeparator stubs, which extraction must skip) and a
    header part — appended to the extraction in the parser's
    documented body -> notes -> header order. ``br_first_space`` (r7)
    stores each paragraph's FIRST space as an explicit line break
    ``<w:br/>`` — the extractor reads it back as a newline, putting
    the break path on oracled round trips."""
    body = "".join(
        _w_paragraph(ln, br_first_space=br_first_space)
        for ln in text.split("\n")
    )
    parts = {
        "[Content_Types].xml": _CT_XML,
        "word/document.xml": (
            _XML_DECL
            + f'<w:document xmlns:w="{_W_URI}"><w:body>{body}</w:body>'
            "</w:document>"
        ),
    }
    if footnote is not None:
        parts["word/footnotes.xml"] = (
            _XML_DECL
            + f'<w:footnotes xmlns:w="{_W_URI}">'
            '<w:footnote w:type="separator" w:id="-1"><w:p/></w:footnote>'
            '<w:footnote w:type="continuationSeparator" w:id="0"><w:p/>'
            "</w:footnote>"
            f'<w:footnote w:id="1">{_w_paragraph(footnote)}</w:footnote>'
            "</w:footnotes>"
        )
    if header is not None:
        parts["word/header1.xml"] = (
            _XML_DECL
            + f'<w:hdr xmlns:w="{_W_URI}">{_w_paragraph(header)}</w:hdr>'
        )
    if title is not None:
        parts["docProps/core.xml"] = _core_xml(title)
    return _zip_pack(parts)


def build_pptx(
    text: str, *, title: str | None = None, notes: str | None = None
) -> bytes:
    """Write a minimal valid .pptx whose extracted text is ``text``:
    blank-line-separated groups become slides, lines inside a group
    become <a:p> paragraphs. ``notes`` (r7) writes a real
    ``ppt/notesSlides/notesSlide1.xml`` part — the extractor appends
    speaker notes after the deck body, so the notes path is
    round-trip provable."""
    slides = text.split("\n\n")
    parts = {"[Content_Types].xml": _CT_XML}

    def txbody(content: str, root: str) -> str:
        paras = "".join(
            f"<a:p><a:r><a:t>{_xml_escape(ln)}</a:t></a:r></a:p>"
            for ln in content.split("\n")
        )
        return (
            _XML_DECL
            + f'<p:{root} xmlns:p="{_P_URI}" xmlns:a="{_A_URI}">'
            f"<p:cSld><p:spTree><p:sp><p:txBody>{paras}</p:txBody></p:sp>"
            f"</p:spTree></p:cSld></p:{root}>"
        )

    for i, slide in enumerate(slides, start=1):
        parts[f"ppt/slides/slide{i}.xml"] = txbody(slide, "sld")
    if notes is not None:
        parts["ppt/notesSlides/notesSlide1.xml"] = txbody(notes, "notes")
    if title is not None:
        parts["docProps/core.xml"] = _core_xml(title)
    return _zip_pack(parts)


def build_xlsx(
    text: str, *, title: str | None = None, sheets: int = 1
) -> bytes:
    """Write a minimal valid .xlsx whose extracted text is ``text``
    (lines = rows, tabs = cells). Cell encodings rotate deterministically
    so all three decode paths run: pure-digit cells as number cells,
    every third remaining cell as inlineStr, the rest through the
    sharedStrings table. ``sheets`` > 1 (r7) splits the rows into that
    many CONTIGUOUS worksheet parts (one sharedStrings table spanning
    all of them), so the reader's multi-sheet walk and cross-sheet SST
    indexing run on oracled round trips; trailing sheets may be empty
    for short texts."""
    shared: list[str] = []
    index: dict[str, int] = {}
    rows_xml: list[str] = []
    for line in text.split("\n"):
        cells_xml: list[str] = []
        for j, cell in enumerate(line.split("\t")):
            if cell.isdigit():
                cells_xml.append(f"<c><v>{cell}</v></c>")
            elif j % 3 == 2:
                cells_xml.append(
                    '<c t="inlineStr"><is><t xml:space="preserve">'
                    f"{_xml_escape(cell)}</t></is></c>"
                )
            else:
                if cell not in index:
                    index[cell] = len(shared)
                    shared.append(cell)
                cells_xml.append(f'<c t="s"><v>{index[cell]}</v></c>')
        rows_xml.append("<row>" + "".join(cells_xml) + "</row>")
    sst = "".join(
        f'<si><t xml:space="preserve">{_xml_escape(s)}</t></si>'
        for s in shared
    )
    parts = {
        "[Content_Types].xml": _CT_XML,
        "xl/sharedStrings.xml": (
            _XML_DECL + f'<sst xmlns="{_S_URI}">{sst}</sst>'
        ),
    }
    if sheets < 1:
        raise ValueError("sheets must be >= 1")
    per = -(-len(rows_xml) // sheets)  # ceil — contiguous chunks
    for k in range(sheets):
        chunk = rows_xml[k * per : (k + 1) * per]
        parts[f"xl/worksheets/sheet{k + 1}.xml"] = (
            _XML_DECL
            + f'<worksheet xmlns="{_S_URI}"><sheetData>'
            + "".join(chunk)
            + "</sheetData></worksheet>"
        )
    if title is not None:
        parts["docProps/core.xml"] = _core_xml(title)
    return _zip_pack(parts)
