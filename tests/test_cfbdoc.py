"""Binary Word .doc extraction (operators/cfbdoc): CFB container +
[MS-DOC] piece-table round trips through the module's own writer,
mini-stream vs FAT paths, dispatch through docparse, upload e2e, and
the honest-rejection contract (encrypted docs, non-Word CFB)."""

from __future__ import annotations

import struct

import pytest

from aiotcvectordb_spark.operators import docparse
from aiotcvectordb_spark.operators.cfbdoc import (
    CfbReader,
    build_doc,
    parse_doc,
)


@pytest.mark.parametrize(
    "text",
    [
        "hello world",
        "para one\npara two\npara three",
        "CJK 中文段落\n第二段 mixed",
        "tabs\there kept",
        "astral \U0001F600 pair",
        "",
        "trailing newline\n",
    ],
)
@pytest.mark.parametrize("force_unicode", [False, True])
def test_round_trip(text, force_unicode):
    got, title = parse_doc(build_doc(text, force_unicode=force_unicode))
    assert got == text.rstrip("\n")
    assert title is None


def test_small_doc_uses_mini_stream_and_large_uses_fat():
    small = build_doc("tiny")
    cfb = CfbReader(small)
    word_entry = next(e for e in cfb.dir_entries if e[0] == "WordDocument")
    assert word_entry[3] < 4096  # stream size under the mini cutoff
    assert cfb.minifat, "small streams must go through the miniFAT"
    big_text = ("long line of body text " * 40 + "\n") * 60
    big = build_doc(big_text)
    cfb2 = CfbReader(big)
    word2 = next(e for e in cfb2.dir_entries if e[0] == "WordDocument")
    assert word2[3] >= 4096  # FAT path
    assert parse_doc(big)[0] == big_text.rstrip("\n")


def test_multi_piece_table():
    # > _PIECE_CPS chars forces several pieces, alternating compressed
    # and UTF-16LE; reassembly must be seamless
    text = "".join(f"word{i} " for i in range(3000))
    assert parse_doc(build_doc(text))[0] == text


def test_cp1252_and_unicode_pieces_mix():
    # piece 0 (even) is cp1252-able, piece content with CJK forces
    # UTF-16 even at an even index
    text = "plain ascii piece " * 300 + "中文" * 2500
    assert parse_doc(build_doc(text))[0] == text


def test_rejects_non_cfb():
    with pytest.raises(ValueError, match="not an OLE2/CFB"):
        parse_doc(b"PK\x03\x04 not a compound file")


def test_rejects_encrypted_doc():
    doc = bytearray(build_doc("secret"))
    # set fEncrypted in the FIB inside the WordDocument stream: find
    # the wIdent magic and flip the flag two bytes at offset 0x0A
    idx = bytes(doc).find(struct.pack("<H", 0xA5EC))
    assert idx >= 0
    flags = struct.unpack_from("<H", doc, idx + 0x0A)[0]
    struct.pack_into("<H", doc, idx + 0x0A, flags | 0x0100)
    with pytest.raises(ValueError, match="encrypted .doc"):
        parse_doc(bytes(doc))


def test_rejects_cfb_without_worddocument():
    from aiotcvectordb_spark.operators.cfbdoc import _cfb_build

    ppt_like = _cfb_build({"PowerPoint Document": b"\x00" * 64})
    with pytest.raises(ValueError, match="without a WordDocument"):
        parse_doc(ppt_like)


def test_docparse_dispatch():
    data = build_doc("Body text from a legacy doc.\nSecond paragraph.")
    text, title = docparse.parse_document(
        data.decode("latin-1"), "legacy.doc"
    )
    assert text == "Body text from a legacy doc.\nSecond paragraph."
    # a CFB that claims to be PowerPoint but has no text atoms is
    # rejected by the real .ppt parser (r6), not a blanket "no parser"
    from aiotcvectordb_spark.operators.cfbdoc import _cfb_build

    ppt = _cfb_build({"PowerPoint Document": b"\x00" * 64})
    with pytest.raises(ValueError, match="text atoms"):
        docparse.parse_document(ppt.decode("latin-1"), "deck.ppt")


def test_fuzz_no_hangs_no_foreign_exceptions():
    import random

    rng = random.Random(7)
    doc = build_doc("fuzz me gently\nsecond line " * 30)
    for _ in range(150):
        b = bytearray(doc)
        for _ in range(rng.randrange(1, 8)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        if rng.random() < 0.3:
            b = b[: rng.randrange(len(b))]
        try:
            text, _ = parse_doc(bytes(b))
            assert isinstance(text, str)
        except ValueError:
            pass  # the ONLY exception the contract allows


def test_upload_doc_e2e(engine):
    from aiotcvectordb_spark.collection_view import CollectionViewManager

    engine.create_ai_database("ai_legacy")
    mgr = CollectionViewManager(engine)
    mgr.create_collection_view(
        "ai_legacy",
        "cv_legacy",
        splitter_process={"chunk_size": 60, "overlap": 10},
        parsing_process={"parsing_type": "AlgorithmParsing"},
    )
    data = build_doc("Margins improved across legacy divisions.\nAppendix.")
    res = mgr.load_and_split_text(
        "ai_legacy",
        "cv_legacy",
        doc_name="archive.doc",
        text=data.decode("latin-1"),
    )
    chunks = mgr.get_chunks(
        "ai_legacy", "cv_legacy", document_set_id=res["doc_set_id"]
    )
    joined = " ".join(c["text"] for c in chunks)
    assert "Margins improved across legacy divisions" in joined
    assert "WordDocument" not in joined  # no container bytes leaked


def test_summary_information_title():
    """r6: [MS-OLEPS] SummaryInformation title round trip (VT_LPWSTR),
    and VT_LPSTR variant read."""
    import struct as _s

    from aiotcvectordb_spark.operators.cfbdoc import (
        _FMTID_SUMMARY,
        _cfb_build,
        build_summary_stream,
        read_summary_title,
    )

    got, title = parse_doc(build_doc("body", title="Annual Report 年报"))
    assert title == "Annual Report 年报"
    assert parse_doc(build_doc("body"))[1] is None
    # VT_LPSTR (cp1252) variant
    chars = b"Legacy Title\x00"
    prop = _s.pack("<II", 30, len(chars)) + chars
    body = _s.pack("<IIII", 16 + len(prop), 1, 0x02, 16) + prop
    header = (
        _s.pack("<HHI", 0xFFFE, 0, 0) + b"\x00" * 16
        + _s.pack("<I", 1) + _FMTID_SUMMARY + _s.pack("<I", 48)
    )
    data = _cfb_build(
        {"WordDocument": b"\x00" * 64, "\x05SummaryInformation": header + body}
    )
    assert read_summary_title(CfbReader(data)) == "Legacy Title"
