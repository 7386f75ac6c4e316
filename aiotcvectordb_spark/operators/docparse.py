"""Server-side document parsing for the RAG upload path (ops 38/44).

The reference's ``upload_file``/``load_and_split_text`` carry a
``ParsingProcess`` config and a file name whose extension decides how
the server extracts text before splitting (reference
collection_view.py:342-423, ai_database.py:76-125 — upload to COS,
server parses). This module is that parser, for the formats honestly
implementable without third-party parsing deps:

- HTML (.html/.htm): script/style/comment removal, tag stripping,
  entity unescape, whitespace collapse; <title>/<h1> becomes the
  document title.
- Markdown (.md/.markdown): fence/heading/emphasis/link/image/inline-
  code/blockquote/list-marker stripping (content survives, syntax
  dies); first heading becomes the document title.
- Plain text (everything else): passthrough.

PDF (r5, font machinery + encryption r6): real binary PDF payloads
are parsed by ``operators/pdfcodec.extract_pdf_text`` — a stdlib-only
ISO 32000-1 subset (object scan + ObjStm expansion, Flate/LZW
filters, ToUnicode CMaps and /Differences encodings, the
empty-user-password RC4/AESV2 standard security handler). Passworded
and image-only PDFs are honestly rejected (ValueError from the
codec).

Office (r5): OOXML containers (.docx/.pptx/.xlsx — ZIP of ECMA-376
XML) are parsed for real by ``operators/officeparse`` with stdlib
zipfile + ElementTree. Legacy OLE2 binaries (r6): .doc via
``operators/cfbdoc`` ([MS-CFB] container + [MS-DOC] piece table),
.ppt/.xls via ``operators/olebin`` ([MS-PPT] record walk / [MS-XLS]
BIFF8). Encrypted documents stay honestly rejected — ``ValueError``
instead of silently splitting raw binary soup.

Parsing is pure-Python string work exposed both as driver-side
functions (the single-file API path) and usable inside any Arrow batch
stage (the bulk path maps ``parse_document`` over ``mapInPandas``
batches like every other kernel).
"""

from __future__ import annotations

import html as _html
import re

# extensions the reference's server-side pipeline accepts for parsing
_HTML_EXTS = (".html", ".htm")
_MD_EXTS = (".md", ".markdown")
_PDF_EXTS = (".pdf",)
_OOXML_EXTS = (".docx", ".pptx", ".xlsx")
_RTF_EXTS = (".rtf",)
_EPUB_EXTS = (".epub",)
_DOC_EXTS = (".doc",)
_PPT_EXTS = (".ppt",)
_XLS_EXTS = (".xls",)

_SCRIPT_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.I | re.S)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_TAG_RE = re.compile(r"<[^>]+>")
_TITLE_RE = re.compile(r"<(?:title|h1)\b[^>]*>(.*?)</(?:title|h1)\s*>", re.I | re.S)
_BLOCK_TAG_RE = re.compile(
    r"</?(?:p|div|br|li|ul|ol|table|tr|td|th|h[1-6]|section|article|header|footer)\b[^>]*>",
    re.I,
)
_WS_RE = re.compile(r"[ \t\r\f\v]+")
_NL_RE = re.compile(r"\n{2,}")

_MD_FENCE_RE = re.compile(r"^```[^\n]*$", re.M)
_MD_HEADING_RE = re.compile(r"^#{1,6}\s+", re.M)
_MD_SETEXT_RE = re.compile(r"^(=+|-{2,})\s*$", re.M)
_MD_IMAGE_RE = re.compile(r"!\[([^\]]*)\]\([^)]*\)")
_MD_LINK_RE = re.compile(r"\[([^\]]+)\]\([^)]*\)")
_MD_EMPH_RE = re.compile(r"(\*{1,3}|_{1,3})(?=\S)(.+?)(?<=\S)\1")
_MD_CODE_RE = re.compile(r"`([^`]*)`")
_MD_QUOTE_RE = re.compile(r"^>\s?", re.M)
_MD_LIST_RE = re.compile(r"^[ \t]*(?:[-*+]|\d+\.)\s+", re.M)
_MD_HRULE_RE = re.compile(r"^[ \t]*(?:\*\s*){3,}$", re.M)
_MD_FIRST_HEADING_RE = re.compile(r"^#{1,6}\s+(.+?)\s*$", re.M)


def detect_file_type(doc_name: str) -> str:
    """File type from the upload name, the way the reference's server
    decides the parser (extension-driven)."""
    low = (doc_name or "").lower()
    if low.endswith(_HTML_EXTS):
        return "html"
    if low.endswith(_MD_EXTS):
        return "markdown"
    if low.endswith(_PDF_EXTS):
        return "pdf"
    if low.endswith(_OOXML_EXTS):
        return low.rsplit(".", 1)[1]  # "docx" | "pptx" | "xlsx"
    if low.endswith(_RTF_EXTS):
        return "rtf"
    if low.endswith(_EPUB_EXTS):
        return "epub"
    if low.endswith(_DOC_EXTS):
        return "doc"
    if low.endswith(_PPT_EXTS):
        return "ppt"
    if low.endswith(_XLS_EXTS):
        return "xls"
    return "text"


def parse_html(raw: str) -> tuple[str, str | None]:
    """Strip an HTML document to its text. Returns (text, title)."""
    m = _TITLE_RE.search(raw)
    title = None
    if m:
        title = _WS_RE.sub(" ", _html.unescape(_TAG_RE.sub("", m.group(1)))).strip() or None
    s = _SCRIPT_RE.sub(" ", raw)
    s = _COMMENT_RE.sub(" ", s)
    s = _BLOCK_TAG_RE.sub("\n", s)  # block boundaries become line breaks
    s = _TAG_RE.sub("", s)
    s = _html.unescape(s)
    s = _WS_RE.sub(" ", s)
    s = "\n".join(line.strip() for line in s.split("\n"))
    s = _NL_RE.sub("\n", s).strip()
    return s, title


def parse_markdown(raw: str) -> tuple[str, str | None]:
    """Strip Markdown syntax, keep content. Returns (text, title)."""
    m = _MD_FIRST_HEADING_RE.search(raw)
    title = m.group(1).strip() if m else None
    s = _MD_FENCE_RE.sub("", raw)
    s = _MD_IMAGE_RE.sub(r"\1", s)
    s = _MD_LINK_RE.sub(r"\1", s)
    s = _MD_HEADING_RE.sub("", s)
    s = _MD_SETEXT_RE.sub("", s)
    s = _MD_HRULE_RE.sub("", s)
    s = _MD_EMPH_RE.sub(r"\2", s)
    s = _MD_CODE_RE.sub(r"\1", s)
    s = _MD_QUOTE_RE.sub("", s)
    s = _MD_LIST_RE.sub("", s)
    s = _WS_RE.sub(" ", s)
    s = "\n".join(line.strip() for line in s.split("\n"))
    s = _NL_RE.sub("\n", s).strip()
    return s, title


def parse_document(raw: str, doc_name: str) -> tuple[str, str | None]:
    """Parse an uploaded document per its extension. Returns
    (plain_text, title_or_None). Raises ValueError for formats whose
    parsers would need libraries absent from this environment."""
    ftype = detect_file_type(doc_name)
    if ftype == "html":
        return parse_html(raw)
    if ftype == "markdown":
        return parse_markdown(raw)
    if ftype == "pdf" and raw.startswith("%PDF"):
        # a REAL binary PDF payload (str carries the bytes latin-1 /
        # surrogateescape-style): extract text with the stdlib ISO
        # 32000-1 subset. Encrypted / image-only / exotic-filter PDFs
        # raise ValueError from the codec — honest rejection survives.
        from aiotcvectordb_spark.operators.pdfcodec import extract_pdf_text

        return extract_pdf_text(raw.encode("latin-1", "surrogateescape"))
    if ftype == "rtf" and raw.startswith("{\\rtf"):
        from aiotcvectordb_spark.operators.rtfepub import parse_rtf

        return parse_rtf(raw)
    if ftype == "epub" and _looks_binary(raw):
        from aiotcvectordb_spark.operators.rtfepub import parse_epub

        return parse_epub(raw.encode("latin-1", "surrogateescape"))
    if ftype in ("docx", "pptx", "xlsx") and _looks_binary(raw):
        # real OOXML container (ZIP magic or embedded NULs): stdlib
        # zipfile + ElementTree parse. Legacy OLE2 / encrypted OOXML
        # raise inside officeparse. Pre-extracted TEXT under a .docx
        # name (client-side-extraction flow) passes through below.
        from aiotcvectordb_spark.operators import officeparse

        payload = raw.encode("latin-1", "surrogateescape")
        parser = {
            "docx": officeparse.parse_docx,
            "pptx": officeparse.parse_pptx,
            "xlsx": officeparse.parse_xlsx,
        }[ftype]
        return parser(payload)
    if ftype == "doc" and _looks_binary(raw):
        # legacy binary Word (r6): real [MS-CFB] + [MS-DOC] piece-table
        # extraction. Encrypted .doc and non-Word CFB raise inside
        # cfbdoc. Pre-extracted TEXT under a .doc name passes through.
        from aiotcvectordb_spark.operators.cfbdoc import parse_doc

        return parse_doc(raw.encode("latin-1", "surrogateescape"))
    if ftype in ("ppt", "xls") and _looks_binary(raw):
        # legacy binary PowerPoint/Excel (r6): real [MS-PPT] record
        # walk / [MS-XLS] BIFF8 record scan. Encrypted documents raise
        # inside olebin.
        from aiotcvectordb_spark.operators import olebin

        parser = olebin.parse_ppt if ftype == "ppt" else olebin.parse_xls
        return parser(raw.encode("latin-1", "surrogateescape"))
    return raw, None


_BINARY_MAGICS = ("%PDF", "PK\x03\x04", "\xd0\xcf\x11\xe0")


def _looks_binary(raw: str) -> bool:
    return raw.startswith(_BINARY_MAGICS) or "\x00" in raw[:4096]
