"""RTF and EPUB text extraction for the RAG upload path (r5) — stdlib
only, same honest-rejection contract as the PDF/OOXML parsers.

- **RTF** (public Microsoft RTF spec): a text format of control words
  and groups. The parser walks the token stream — ``\\par``/``\\line``
  become newlines, ``\\tab`` a tab, ``\\'hh`` hex escapes and
  ``\\uN`` Unicode escapes decode (with the ``\\ucN`` skip-count
  honored), destination groups whose content is not document text
  (``\\fonttbl``, ``\\stylesheet``, ``\\*`` destinations, pict, info)
  are skipped wholesale, everything else passes through.
- **EPUB** (IDPF OCF/OPF): a ZIP whose ``content.opf`` manifest +
  spine order the XHTML chapters; each chapter runs through the
  existing HTML tag-stripper (``docparse.parse_html``). Falls back to
  archive order for a missing/odd OPF. DRM'd EPUBs (``encryption.xml``
  present) are honestly rejected.
"""

from __future__ import annotations

import io
import posixpath
import re
import zipfile
import zlib

# destinations whose group content is metadata/binary, not body text
_RTF_SKIP_DESTS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "themedata", "colorschememapping", "listtable",
    "listoverridetable", "latentstyles", "rsidtbl", "generator",
    "xmlnstbl", "datastore",
}
_RTF_CW = re.compile(r"\\([a-zA-Z]+)(-?\d+)? ?|\\'([0-9a-fA-F]{2})|\\(.)")


def parse_rtf(raw: str) -> tuple[str, str | None]:
    """Extract plain text from an RTF document. Returns (text, None) —
    RTF carries its title only in the skipped \\info destination."""
    if not raw.startswith("{\\rtf"):
        raise ValueError("not an RTF payload (missing {\\rtf header)")
    out: list[str] = []
    i, n = 0, len(raw)
    depth = 0
    skip_until_depth: int | None = None
    uc_skip = 1
    pending_skip = 0
    while i < n:
        c = raw[i]
        if c == "{":
            depth += 1
            i += 1
        elif c == "}":
            depth -= 1
            if skip_until_depth is not None and depth < skip_until_depth:
                skip_until_depth = None
            i += 1
        elif c == "\\":
            m = _RTF_CW.match(raw, i)
            if not m:
                i += 1
                continue
            i = m.end()
            word, param, hexc, esc = m.groups()
            if skip_until_depth is not None:
                continue
            if word:
                if word in _RTF_SKIP_DESTS:
                    skip_until_depth = depth
                elif word in ("par", "line", "sect", "page"):
                    out.append("\n")
                elif word == "tab":
                    out.append("\t")
                elif word == "uc":
                    uc_skip = int(param or 1)
                elif word == "u":
                    # \uN is a signed 16-bit value per spec; mask so a
                    # malformed huge parameter cannot overflow chr()
                    cp = int(param or 0) & 0xFFFF
                    out.append(chr(cp))
                    pending_skip = uc_skip
                elif word in ("emdash", "endash"):
                    out.append("\u2014" if word == "emdash" else "\u2013")
                elif word in ("lquote", "rquote"):
                    out.append("\u2018" if word == "lquote" else "\u2019")
                elif word in ("ldblquote", "rdblquote"):
                    out.append("\u201c" if word == "ldblquote" else "\u201d")
                # other control words (formatting) are ignored
            elif hexc is not None:
                if pending_skip:
                    pending_skip -= 1
                else:
                    out.append(bytes([int(hexc, 16)]).decode("cp1252", "replace"))
            elif esc is not None:
                if esc in "{}\\":
                    out.append(esc)
                elif esc == "*":
                    # ignorable-destination marker: {\*\dest ...} group
                    # content is never body text (spec: readers that
                    # don't understand \dest must discard the group);
                    # skip EVERY starred destination, not just the ones
                    # in _RTF_SKIP_DESTS (r5 advice: unknown ones like
                    # \*\wgrffmtfilter leaked their payload)
                    skip_until_depth = depth
                elif esc == "~":
                    out.append("\u00a0")
                elif esc in "\r\n":
                    out.append("\n")
        else:
            if skip_until_depth is None:
                if pending_skip and c not in "\r\n":
                    pending_skip -= 1
                elif c not in "\r\n":
                    out.append(c)
            i += 1
    joined = "".join(out)
    # \uN escapes carry UTF-16 code units, so an astral char arrives as
    # two surrogate chr()s — re-decode through UTF-16 to combine pairs
    # (a lone surrogate in malformed input becomes U+FFFD, never an
    # unpaired surrogate that would break Arrow transfer downstream)
    joined = joined.encode("utf-16-le", "surrogatepass").decode(
        "utf-16-le", "replace"
    )
    text = re.sub(r"\n{3,}", "\n\n", joined).strip("\n ")
    return text, None


def parse_epub(data: bytes) -> tuple[str, str | None]:
    """Extract (text, title) from an EPUB: chapters in spine order via
    the OPF manifest, each tag-stripped by the HTML parser."""
    from aiotcvectordb_spark.operators.docparse import parse_html

    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except (zipfile.BadZipFile, NotImplementedError, ValueError, OSError) as e:
        # NotImplementedError: central-directory extract_version beyond
        # the stdlib's max (fuzz-pinned); ValueError/OSError: truncated
        # or inconsistent end-of-central-directory records
        raise ValueError(f"not an EPUB container: {e}") from None
    names = zf.namelist()
    if any(n.endswith("META-INF/encryption.xml") for n in names):
        raise ValueError("DRM-protected EPUB (encryption.xml present)")

    def read(name: str) -> str:
        try:
            return zf.read(name).decode("utf-8", "replace")
        except (KeyError, zlib.error, zipfile.BadZipFile, NotImplementedError,
                RuntimeError, EOFError, OSError) as e:
            raise ValueError(f"corrupt EPUB part {name!r}: {e}") from None

    title = None
    ordered: list[str] = []
    opf_name = next((n for n in names if n.endswith(".opf")), None)
    if opf_name:
        opf = read(opf_name)
        tm = re.search(r"<dc:title[^>]*>(.*?)</dc:title>", opf, re.S)
        if tm:
            title = tm.group(1).strip() or None
        base = posixpath.dirname(opf_name)
        # id -> href regardless of attribute order within the tag
        by_id: dict[str, str] = {}
        for tag in re.findall(r"<item\b[^>]*>", opf):
            mid = re.search(r'\bid="([^"]+)"', tag)
            mhref = re.search(r'\bhref="([^"]+)"', tag)
            if mid and mhref:
                by_id[mid.group(1)] = mhref.group(1)
        for idref in re.findall(r'<itemref\b[^>]*?\bidref="([^"]+)"', opf):
            href = by_id.get(idref)
            if href:
                ordered.append(
                    posixpath.normpath(posixpath.join(base, href))
                )
    if not ordered:
        ordered = [
            n for n in names if n.lower().endswith((".xhtml", ".html", ".htm"))
        ]
    if not ordered:
        raise ValueError("not an EPUB: no XHTML chapters found")
    chapters: list[str] = []
    for name in ordered:
        if name not in names:
            continue
        text, chap_title = parse_html(read(name))
        if title is None and chap_title:
            title = chap_title
        if text:
            chapters.append(text)
    return "\n\n".join(chapters).strip("\n"), title


# ---------------------------------------------------------------------------
# Writers: minimal spec-shaped RTF / EPUB documents, so both parsers
# are oracle-checkable by encode-then-decode round trips
# (``rtf_extract`` / ``epub_extract``), like every other upload format.


def build_rtf(text: str) -> str:
    """Write a minimal valid RTF document whose extracted text is
    ``text`` (newlines as ``\\par``, tabs as ``\\tab``, non-ASCII as
    ``\\uN?`` escapes, astral chars as surrogate-pair escapes per
    RTF 1.9). Includes an ``{\\info}`` block and
    a starred ``{\\*\\wgrffmtfilter}`` destination so the parser's
    group-skipping machinery runs on every round trip. Exact for
    texts without leading/trailing whitespace or 3+ consecutive
    newlines (the parser canonicalizes those)."""
    out = [
        "{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Helvetica;}}",
        "{\\info{\\title synthetic}}{\\*\\wgrffmtfilter 013f}\\uc1 ",
    ]
    for i, line in enumerate(text.split("\n")):
        if i:
            out.append("\\par ")
        for c in line:
            cp = ord(c)
            if c in "\\{}":
                out.append("\\" + c)
            elif c == "\t":
                out.append("\\tab ")
            elif 32 <= cp < 128:
                out.append(c)
            elif cp <= 0xFFFF:
                out.append(f"\\u{cp if cp < 0x8000 else cp - 0x10000}?")
            else:
                # RTF 1.9 writes astral chars as a UTF-16 surrogate
                # pair: two \uN? escapes with the signed-16-bit unit
                # values (both units are >= 0x8000, hence - 0x10000)
                v = cp - 0x10000
                hi = 0xD800 + (v >> 10)
                lo = 0xDC00 + (v & 0x3FF)
                out.append(f"\\u{hi - 0x10000}?\\u{lo - 0x10000}?")
    out.append("}")
    return "".join(out)


def _x(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def build_epub(
    text: str, *, title: str = "Synthetic Book", chapter_lines: int | None = None
) -> bytes:
    """Write a minimal valid EPUB (OCF container, OPF manifest+spine,
    XHTML chapters; one ``<p>`` per line) whose extracted text is
    ``text``. ``chapter_lines`` splits lines into multiple spine
    chapters (the parser joins chapters with a blank line, so exact
    round trips use the default single chapter). The HTML stripper
    canonicalizes whitespace, so exact for single-spaced text."""
    lines = text.split("\n")
    if chapter_lines:
        groups = [
            lines[i : i + chapter_lines]
            for i in range(0, len(lines), chapter_lines)
        ] or [[""]]
    else:
        groups = [lines]
    manifest = []
    spine = []
    parts: dict[str, str | bytes] = {
        "mimetype": "application/epub+zip",
        "META-INF/container.xml": (
            '<?xml version="1.0"?><container version="1.0" '
            'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
            "<rootfiles><rootfile full-path=\"OEBPS/content.opf\" "
            'media-type="application/oebps-package+xml"/></rootfiles>'
            "</container>"
        ),
    }
    for i, group in enumerate(groups, start=1):
        body = "".join(f"<p>{_x(ln)}</p>" for ln in group)
        parts[f"OEBPS/chap{i}.xhtml"] = (
            "<html><head></head><body>" + body + "</body></html>"
        )
        manifest.append(
            f'<item id="c{i}" href="chap{i}.xhtml" '
            'media-type="application/xhtml+xml"/>'
        )
        spine.append(f'<itemref idref="c{i}"/>')
    parts["OEBPS/content.opf"] = (
        '<?xml version="1.0"?><package xmlns="http://www.idpf.org/2007/opf" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/" version="2.0">'
        f"<metadata><dc:title>{_x(title)}</dc:title></metadata>"
        f"<manifest>{''.join(manifest)}</manifest>"
        f"<spine>{''.join(spine)}</spine></package>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in parts.items():
            zf.writestr(name, content)
    return buf.getvalue()
