"""Document parsing for the RAG upload path (ParsingProcess semantics).

Reference: upload_file/load_and_split_text carry a ParsingProcess config
and the server parses by file type (collection_view.py:342-423,
ai_database.py:76-125). Here: HTML/markdown tag-strip + plaintext
passthrough, honest rejection of PDF/Office.
"""

from __future__ import annotations

import pytest

from aiotcvectordb_spark.operators import docparse


HTML_DOC = """<!DOCTYPE html>
<html><head><title>Quarterly Report</title>
<style>body { color: red; }</style>
<script>alert("hi");</script></head>
<body>
<!-- a comment -->
<h1>Revenue &amp; Growth</h1>
<p>Revenue grew <b>ten percent</b> this quarter.</p>
<ul><li>apples</li><li>bananas</li></ul>
</body></html>"""

MD_DOC = """# Quarterly Report

Revenue grew **ten percent** this quarter.

- apples
- bananas

See [the appendix](https://example.com/a) and ![chart](img.png).

```python
print("code fences stripped, content kept")
```
> quoted remark
"""


def test_html_parse_strips_markup_keeps_text():
    text, title = docparse.parse_html(HTML_DOC)
    assert title == "Quarterly Report"
    assert "Revenue grew ten percent this quarter." in text
    assert "apples" in text and "bananas" in text
    assert "Revenue & Growth" in text  # entity unescaped
    for forbidden in ("<p>", "alert", "color: red", "a comment", "<h1"):
        assert forbidden not in text


def test_markdown_parse_strips_syntax_keeps_content():
    text, title = docparse.parse_markdown(MD_DOC)
    assert title == "Quarterly Report"
    assert "Revenue grew ten percent this quarter." in text
    assert "the appendix" in text and "chart" in text
    assert 'print("code fences stripped, content kept")' in text
    assert "quoted remark" in text
    for forbidden in ("**", "](", "```", "# ", "> "):
        assert forbidden not in text


def test_detect_and_dispatch():
    assert docparse.detect_file_type("a.HTML") == "html"
    assert docparse.detect_file_type("b.md") == "markdown"
    assert docparse.detect_file_type("notes.txt") == "text"
    assert docparse.detect_file_type("slides.pptx") == "pptx"  # r5: OOXML parsed
    assert docparse.detect_file_type("deck.ppt") == "ppt"  # r6: parsed for real
    assert docparse.detect_file_type("paper.pdf") == "pdf"
    assert docparse.parse_document("plain", "notes.txt") == ("plain", None)
    # a truncated/contentless PDF is rejected by the codec, not parsed
    with pytest.raises(ValueError, match="no extractable text"):
        docparse.parse_document("%PDF-1.4", "paper.pdf")
    # a malformed OOXML container is rejected by the zip layer
    with pytest.raises(ValueError, match="not an OOXML"):
        docparse.parse_document("PK\x03\x04binary soup", "deck.pptx")
    # a truncated OLE2 container is rejected by the CFB layer (r6:
    # .doc/.ppt/.xls all parse for real now)
    with pytest.raises(ValueError, match="CFB"):
        docparse.parse_document(
            "\xd0\xcf\x11\xe0binary soup", "deck.ppt"
        )


@pytest.fixture()
def cv_mgr(engine):
    from aiotcvectordb_spark.collection_view import CollectionViewManager

    engine.create_ai_database("ai_parse")
    mgr = CollectionViewManager(engine)
    mgr.create_collection_view(
        "ai_parse",
        "cv_parse",
        splitter_process={
            "chunk_size": 60,
            "overlap": 10,
            "append_title_to_chunk": True,
        },
        parsing_process={"parsing_type": "AlgorithmParsing"},
    )
    return mgr


def test_upload_html_e2e_chunks_contain_stripped_text(cv_mgr):
    res = cv_mgr.load_and_split_text(
        "ai_parse", "cv_parse", doc_name="report.html", text=HTML_DOC
    )
    assert res["indexed_status"] == "Ready"
    chunks = cv_mgr.get_chunks("ai_parse", "cv_parse", document_set_id=res["doc_set_id"])
    assert chunks, "HTML upload produced no chunks"
    joined = " ".join(c["text"] for c in chunks)
    assert "Revenue grew ten percent" in joined
    assert "<p>" not in joined and "alert" not in joined
    # append_title_to_chunk honored: every chunk opens with the title
    assert all(c["text"].startswith("Quarterly Report\n") for c in chunks)

    # config round-trips through describe
    desc = cv_mgr.describe_collection_view("ai_parse", "cv_parse")
    assert desc["parsingProcess"] == {"parsing_type": "AlgorithmParsing"}
    assert desc["splitterPreprocess"]["append_title_to_chunk"] is True


def test_upload_markdown_e2e(cv_mgr):
    res = cv_mgr.load_and_split_text(
        "ai_parse", "cv_parse", doc_name="notes.md", text=MD_DOC
    )
    chunks = cv_mgr.get_chunks("ai_parse", "cv_parse", document_set_id=res["doc_set_id"])
    joined = " ".join(c["text"] for c in chunks)
    assert "Revenue grew ten percent" in joined
    assert "](" not in joined and "```" not in joined


def test_upload_pdf_e2e_chunks_contain_extracted_text(cv_mgr):
    """r5: a REAL binary PDF payload (FlateDecode content stream) is
    parsed by the stdlib codec; chunks address the extracted text."""
    from aiotcvectordb_spark.operators.pdfcodec import build_pdf

    pdf = build_pdf(
        "Revenue grew ten percent this quarter.\nApples and bananas.",
        title="Quarterly Report",
    )
    res = cv_mgr.load_and_split_text(
        "ai_parse",
        "cv_parse",
        doc_name="report.pdf",
        text=pdf.decode("latin-1"),
    )
    assert res["indexed_status"] == "Ready"
    chunks = cv_mgr.get_chunks(
        "ai_parse", "cv_parse", document_set_id=res["doc_set_id"]
    )
    assert chunks, "PDF upload produced no chunks"
    joined = " ".join(c["text"] for c in chunks)
    assert "Revenue grew ten percent" in joined
    assert "%PDF" not in joined and "FlateDecode" not in joined
    # append_title_to_chunk honored from the PDF /Info /Title
    assert all(c["text"].startswith("Quarterly Report\n") for c in chunks)


def test_upload_encrypted_pdf_rejected(cv_mgr):
    from aiotcvectordb_spark.operators.pdfcodec import build_pdf

    pdf = build_pdf("secret").replace(
        b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R"
    )
    with pytest.raises(ValueError, match="encrypted PDF"):
        cv_mgr.load_and_split_text(
            "ai_parse",
            "cv_parse",
            doc_name="secret.pdf",
            text=pdf.decode("latin-1"),
        )


def test_upload_corrupt_legacy_office_rejected(cv_mgr):
    # r6: .ppt parses for real; a truncated container still rejects
    with pytest.raises(ValueError, match="CFB"):
        cv_mgr.load_and_split_text(
            "ai_parse",
            "cv_parse",
            doc_name="deck.ppt",
            text="\xd0\xcf\x11\xe0 legacy binary",
        )
