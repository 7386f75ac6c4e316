"""RTF + EPUB extraction (operators/rtfepub): token-level RTF corners
(escapes, unicode with uc skip counts, skipped destinations), EPUB
spine ordering through a real OPF, dispatch via docparse, and honest
rejection (DRM EPUB, non-RTF payloads)."""

from __future__ import annotations

import io
import zipfile

import pytest

from aiotcvectordb_spark.operators import docparse
from aiotcvectordb_spark.operators.rtfepub import parse_epub, parse_rtf

RTF_DOC = (
    r"{\rtf1\ansi\deff0{\fonttbl{\f0 Times New Roman;}}"
    r"{\info{\title hidden}}"
    r"\f0\fs24 Revenue grew \b ten percent\b0  this quarter.\par "
    r"Second paragraph with a \tab tab and \'e9 accent.\par "
    "\\uc1\\u20013? China and an em\\emdash dash.}"
)


def test_rtf_basic_text_and_structure():
    text, title = parse_rtf(RTF_DOC)
    assert "Revenue grew ten percent this quarter." in text
    assert "Second paragraph with a \ttab and é accent." in text
    assert "中 China and an em—dash." in text
    # metadata destinations are skipped wholesale
    assert "Times New Roman" not in text and "hidden" not in text
    assert title is None


def test_rtf_escaped_braces_and_backslash():
    text, _ = parse_rtf(r"{\rtf1 literal \{braces\} and \\slash}")
    assert text == "literal {braces} and \\slash"


def test_rtf_unicode_skip_count():
    # \uc2 means two fallback chars follow each \uN and must be skipped
    text, _ = parse_rtf(r"{\rtf1 \uc2\u960?? pi}")
    assert text == "π pi"


def test_rtf_rejects_non_rtf():
    with pytest.raises(ValueError, match="not an RTF"):
        parse_rtf("plain text, no header")


def _epub(chapters: dict[str, str], spine: list[str], title: str = "The Book",
          encrypted: bool = False) -> bytes:
    items = "".join(
        f'<item id="c{i}" href="{name}" media-type="application/xhtml+xml"/>'
        for i, name in enumerate(chapters)
    )
    refs = "".join(
        f'<itemref idref="c{list(chapters).index(name)}"/>' for name in spine
    )
    opf = (
        '<package xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f"<metadata><dc:title>{title}</dc:title></metadata>"
        f"<manifest>{items}</manifest><spine>{refs}</spine></package>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr("OEBPS/content.opf", opf)
        for name, body in chapters.items():
            zf.writestr(
                f"OEBPS/{name}",
                f"<html><body><p>{body}</p></body></html>",
            )
        if encrypted:
            zf.writestr("META-INF/encryption.xml", "<encryption/>")
    return buf.getvalue()


def test_epub_spine_order_and_title():
    data = _epub(
        {"ch1.xhtml": "first chapter", "ch2.xhtml": "second chapter"},
        spine=["ch2.xhtml", "ch1.xhtml"],  # deliberately reversed
    )
    text, title = parse_epub(data)
    assert title == "The Book"
    assert text.index("second chapter") < text.index("first chapter")


def test_epub_drm_rejected():
    data = _epub({"ch1.xhtml": "secret"}, spine=["ch1.xhtml"], encrypted=True)
    with pytest.raises(ValueError, match="DRM"):
        parse_epub(data)


def test_dispatch_through_parse_document():
    text, _ = docparse.parse_document(RTF_DOC, "memo.rtf")
    assert "Revenue grew ten percent" in text
    data = _epub({"a.xhtml": "epub body text"}, spine=["a.xhtml"])
    text, title = docparse.parse_document(
        data.decode("latin-1"), "book.epub"
    )
    assert "epub body text" in text and title == "The Book"
    assert docparse.detect_file_type("memo.rtf") == "rtf"
    assert docparse.detect_file_type("book.epub") == "epub"


def test_upload_rtf_and_epub_e2e(engine):
    from aiotcvectordb_spark.collection_view import CollectionViewManager

    engine.create_ai_database("ai_rtfepub")
    mgr = CollectionViewManager(engine)
    mgr.create_collection_view(
        "ai_rtfepub",
        "cv_re",
        splitter_process={"chunk_size": 60, "overlap": 10},
        parsing_process={"parsing_type": "AlgorithmParsing"},
    )
    res = mgr.load_and_split_text(
        "ai_rtfepub", "cv_re", doc_name="memo.rtf", text=RTF_DOC
    )
    chunks = mgr.get_chunks(
        "ai_rtfepub", "cv_re", document_set_id=res["doc_set_id"]
    )
    joined = " ".join(c["text"] for c in chunks)
    assert "Revenue grew ten percent" in joined and "fonttbl" not in joined

    data = _epub(
        {"c.xhtml": "epub chapter body for chunking"}, spine=["c.xhtml"]
    )
    res = mgr.load_and_split_text(
        "ai_rtfepub", "cv_re", doc_name="book.epub", text=data.decode("latin-1")
    )
    chunks = mgr.get_chunks(
        "ai_rtfepub", "cv_re", document_set_id=res["doc_set_id"]
    )
    joined = " ".join(c["text"] for c in chunks)
    assert "epub chapter body" in joined and "content.opf" not in joined


def test_rtf_oracle_agrees_on_blank_line_runs():
    """r7 advice twin of the docx case: the RTF oracle used to predict
    only the edge trim while parse_rtf also collapses 3+ newline runs.
    Pin builder+parser == ORACLE_RTF_EXTRACT for that class."""
    import re

    import duckdb

    from aiotcvectordb_spark.operators import rtfepub
    from aiotcvectordb_spark.queries import ORACLE_RTF_EXTRACT

    texts = [
        "a\n\n\nb",
        " leading and trailing \n",
        "x\n\n\n\n\ny\n",
        "plain",
        "\n mixed \n\n\n edges \n ",
    ]
    rows = [(i, texts[i - 1]) for i in range(1, len(texts) + 1)]

    def extract(t: str) -> str:
        c = re.sub(r"\n{3,}", "\n\n", t).strip("\n ")
        return rtfepub.parse_rtf(rtfepub.build_rtf(c))[0]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    oracle = dict(con.execute(ORACLE_RTF_EXTRACT).fetchall())
    for doc_id, t in rows:
        assert extract(t) == oracle[doc_id], (doc_id, t)


def test_rtf_astral_surrogate_pair_round_trip():
    # RTF 1.9 stores non-BMP chars as two signed-16-bit \uN? escapes
    # (the UTF-16 surrogate pair); the parser re-combines them
    from aiotcvectordb_spark.operators.rtfepub import build_rtf

    t = "emoji \U0001F600 and \U0001D400 math"
    assert parse_rtf(build_rtf(t))[0] == t


def test_rtf_lone_surrogate_becomes_replacement_char():
    # malformed input: a high surrogate escape with no low half must
    # never surface as an unpaired surrogate (breaks Arrow transfer)
    doc = "{\\rtf1 a\\u-10179?b}"
    assert parse_rtf(doc)[0] == "a�b"
