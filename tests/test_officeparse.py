"""OOXML text extraction (operators/officeparse): real ZIP+XML
fixtures built with the stdlib, dispatch through docparse, upload e2e,
and the honest-rejection contract for legacy OLE2 binaries."""

from __future__ import annotations

import io
import zipfile

import pytest

from aiotcvectordb_spark.operators import docparse, officeparse

_W_NS = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
_A_NS = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'
_S_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
_CORE = (
    '<cp:coreProperties '
    'xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" '
    'xmlns:dc="http://purl.org/dc/elements/1.1/">'
    "<dc:title>Quarterly Report</dc:title></cp:coreProperties>"
)


def _zip_bytes(parts: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in parts.items():
            zf.writestr(name, content)
    return buf.getvalue()


def _docx(paragraphs: list[str]) -> bytes:
    body = "".join(
        f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>" for p in paragraphs
    )
    return _zip_bytes(
        {
            "word/document.xml": f"<w:document {_W_NS}><w:body>{body}</w:body></w:document>",
            "docProps/core.xml": _CORE,
        }
    )


def test_docx_paragraphs_and_title():
    data = _docx(["Revenue grew ten percent.", "Apples and bananas."])
    text, title = officeparse.parse_docx(data)
    assert text == "Revenue grew ten percent.\nApples and bananas."
    assert title == "Quarterly Report"


def test_docx_tabs_and_breaks():
    doc = (
        f"<w:document {_W_NS}><w:body><w:p><w:r>"
        "<w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t>"
        "</w:r></w:p></w:body></w:document>"
    )
    text, _ = officeparse.parse_docx(_zip_bytes({"word/document.xml": doc}))
    assert text == "a\tb\nc"


def test_pptx_slides_in_order():
    def slide(lines):
        ps = "".join(
            f"<a:p><a:r><a:t>{ln}</a:t></a:r></a:p>" for ln in lines
        )
        return f"<p:sld xmlns:p=\"urn:x\" {_A_NS}><p:cSld>{ps}</p:cSld></p:sld>"

    data = _zip_bytes(
        {
            "ppt/slides/slide2.xml": slide(["second slide"]),
            "ppt/slides/slide1.xml": slide(["Deck Title", "intro line"]),
            "ppt/slides/slide10.xml": slide(["tenth slide"]),
        }
    )
    text, title = officeparse.parse_pptx(data)
    # numeric sort: 1, 2, 10 — not lexicographic 1, 10, 2
    assert text.index("Deck Title") < text.index("second slide") < text.index("tenth slide")
    assert title == "Deck Title"


def test_xlsx_shared_and_inline_strings():
    shared = (
        f"<sst {_S_NS}><si><t>alpha</t></si><si><t>beta</t></si></sst>"
    )
    sheet = (
        f"<worksheet {_S_NS}><sheetData>"
        '<row><c t="s"><v>0</v></c><c><v>42</v></c></row>'
        '<row><c t="s"><v>1</v></c><c t="inlineStr"><is><t>gamma</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    data = _zip_bytes(
        {"xl/sharedStrings.xml": shared, "xl/worksheets/sheet1.xml": sheet}
    )
    text, _ = officeparse.parse_xlsx(data)
    assert text == "alpha\t42\nbeta\tgamma"


def test_docx_footnotes_headers_and_stub_skipping():
    from aiotcvectordb_spark.operators.officeparse import build_docx

    payload = build_docx(
        "Body para one\nBody two\tcol",
        footnote="A real citation",
        header="Confidential",
        title="Deep Doc",
    )
    text, title = officeparse.parse_docx(payload)
    # documented order: body -> footnotes -> headers; separator stubs
    # contribute NOTHING (they hold an empty <w:p/>)
    assert text == "Body para one\nBody two\tcol\nA real citation\nConfidential"
    assert title == "Deep Doc"


def test_ooxml_writer_round_trips():
    from aiotcvectordb_spark.operators.officeparse import (
        build_docx,
        build_pptx,
        build_xlsx,
    )

    cases = [
        "plain text",
        "tabs\tand <xml> & escapes",
        "宽字符 mixed with ascii",
        "42\t007\tnot42x",  # digit cells take the number path
        "",
    ]
    for t in cases:
        assert officeparse.parse_docx(build_docx(t))[0] == t.strip("\n")
        assert officeparse.parse_pptx(build_pptx(t))[0] == t.strip("\n")
        assert officeparse.parse_xlsx(build_xlsx(t))[0] == t.strip("\n")
    # pptx: blank-line groups become slides and survive
    deck = "s1 line1\ns1 line2\n\ns2 only"
    assert officeparse.parse_pptx(build_pptx(deck))[0] == deck


def test_ole2_rejected():
    ole = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 64
    with pytest.raises(ValueError, match="OLE2"):
        officeparse.parse_docx(ole)
    # .doc now routes to the real CFB parser (r6), which rejects this
    # truncated container as corrupt rather than "no parser"
    with pytest.raises(ValueError, match="truncated CFB|corrupt CFB"):
        docparse.parse_document(ole.decode("latin-1"), "legacy.doc")
    # .ppt/.xls now route to the real BIFF/record parsers (r6), which
    # reject this truncated container as corrupt
    with pytest.raises(ValueError, match="truncated CFB|corrupt CFB"):
        docparse.parse_document(ole.decode("latin-1"), "legacy.ppt")


def test_garbage_zip_rejected():
    with pytest.raises(ValueError, match="not an OOXML"):
        officeparse.parse_pptx(b"PK\x03\x04 but not really a zip")


def test_dispatch_through_parse_document():
    data = _docx(["hello from word"])
    text, title = docparse.parse_document(
        data.decode("latin-1"), "report.docx"
    )
    assert text == "hello from word"
    assert title == "Quarterly Report"
    # pre-extracted text under an OOXML name still passes through
    assert docparse.parse_document("plain text", "notes.docx") == (
        "plain text", None,
    )


def test_upload_docx_e2e(engine):
    from aiotcvectordb_spark.collection_view import CollectionViewManager

    engine.create_ai_database("ai_office")
    mgr = CollectionViewManager(engine)
    mgr.create_collection_view(
        "ai_office",
        "cv_office",
        splitter_process={"chunk_size": 60, "overlap": 10},
        parsing_process={"parsing_type": "AlgorithmParsing"},
    )
    data = _docx(["Revenue grew ten percent this quarter.", "Apples."])
    res = mgr.load_and_split_text(
        "ai_office",
        "cv_office",
        doc_name="report.docx",
        text=data.decode("latin-1"),
    )
    chunks = mgr.get_chunks(
        "ai_office", "cv_office", document_set_id=res["doc_set_id"]
    )
    joined = " ".join(c["text"] for c in chunks)
    assert "Revenue grew ten percent" in joined
    assert "word/document" not in joined


def test_docx_oracle_agrees_on_trailing_newline_texts():
    """r7 advice: texts ending in newlines used to hash-diverge when
    the footnote/header variant fired (oracle trimmed the body before
    appending notes; the parser kept the trailing empty paragraph).
    Pin builder+parser == ORACLE_DOCX_EXTRACT for that class."""
    import hashlib

    import duckdb

    from aiotcvectordb_spark.queries import ORACLE_DOCX_EXTRACT

    texts = ["body line\n", "a\n\n", "para\n\npara2\n\n\n", "x", "tab\there\n"]
    rows = [(i, texts[(i - 1) % len(texts)]) for i in range(1, 21)]

    def tabify_line(line: str) -> str:
        i = line.find(" ")
        j = line.find(" ", i + 1) if i >= 0 else -1
        return line if j < 0 else line[:j] + "\t" + line[j + 1 :]

    def extract(doc_id: int, t: str) -> str:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[0]
        kw = {}
        if h in "01234":
            kw = {
                "footnote": f"Footnote for {doc_id}",
                "header": f"Header of {doc_id}",
            }
        t = t.strip("\n")
        if h in "567":
            kw = {"br_first_space": True}
        if h in "89a":
            t = "\n".join(tabify_line(ln) for ln in t.split("\n"))
        data = officeparse.build_docx(t, **kw)
        return officeparse.parse_docx(data)[0]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    oracle = dict(con.execute(ORACLE_DOCX_EXTRACT).fetchall())
    variant_fired = 0
    for doc_id, t in rows:
        assert extract(doc_id, t) == oracle[doc_id], (doc_id, t)
        if hashlib.md5(str(doc_id).encode()).hexdigest()[0] in "01234":
            variant_fired += 1
    assert variant_fired > 0


def test_docx_br_first_space_round_trip():
    data = officeparse.build_docx(
        "alpha beta gamma\nsecond line here", br_first_space=True
    )
    text, _ = officeparse.parse_docx(data)
    assert text == "alpha\nbeta gamma\nsecond\nline here"


def test_xlsx_multisheet_round_trip_and_layout():
    src = "r1c1\tr1c2\nrow two\nrow three\nrow four\nrow five"
    data = officeparse.build_xlsx(src, sheets=3)
    import io
    import zipfile

    names = zipfile.ZipFile(io.BytesIO(data)).namelist()
    assert {f"xl/worksheets/sheet{k}.xml" for k in (1, 2, 3)} <= set(names)
    text, _ = officeparse.parse_xlsx(data)
    assert text == src
    # short text: trailing sheets empty, round trip still exact
    short = officeparse.build_xlsx("only row", sheets=3)
    assert officeparse.parse_xlsx(short)[0] == "only row"


def test_pptx_speaker_notes_round_trip():
    data = officeparse.build_pptx(
        "Title slide\n\nSecond slide body", notes="Speaker note line\nmore"
    )
    text, title = officeparse.parse_pptx(data)
    assert text == "Title slide\n\nSecond slide body\n\nSpeaker note line\nmore"
    assert title == "Title slide"
    # notes order is numeric, appended strictly after every slide
    plain = officeparse.parse_pptx(officeparse.build_pptx("just a deck"))[0]
    assert plain == "just a deck"


def test_xlsx_boolean_and_error_cells():
    sheet = (
        f"<worksheet {_S_NS}><sheetData>"
        '<row><c t="b"><v>1</v></c><c t="b"><v>0</v></c>'
        '<c t="e"><v>#DIV/0!</v></c><c t="str"><v>cached</v></c></row>'
        "</sheetData></worksheet>"
    )
    text, _ = officeparse.parse_xlsx(
        _zip_bytes({"xl/worksheets/sheet1.xml": sheet})
    )
    assert text == "TRUE\tFALSE\t#DIV/0!\tcached"
