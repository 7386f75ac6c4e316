"""Binary PowerPoint/.xls extraction (operators/olebin): record-tree
and BIFF8 round trips through the module's own writers, dispatch
through docparse, upload e2e, fuzz, and honest rejection of encrypted
documents."""

from __future__ import annotations

import struct

import pytest

from aiotcvectordb_spark.operators import docparse
from aiotcvectordb_spark.operators.olebin import (
    build_ppt,
    build_xls,
    parse_ppt,
    parse_xls,
)


@pytest.mark.parametrize(
    "text",
    [
        "Slide title\nBullet one\nBullet two",
        "CJK 演示文稿\n第二行 mixed ascii",
        "single line",
        "",
        "x\n" * 300 + "big deck tail",
    ],
)
@pytest.mark.parametrize("force_unicode", [False, True])
def test_ppt_round_trip(text, force_unicode):
    got, title = parse_ppt(build_ppt(text, force_unicode=force_unicode))
    assert got == text.strip("\n")


def test_ppt_incremental_edit_supersedes_stale_text():
    # an incremental save: the persist-aware reader must return only
    # the live edit; naive stream-order collection would leak both.
    payload = build_ppt(
        "Fresh title\nFresh bullet",
        stale_text="Old title\nOld bullet one\nOld bullet two",
    )
    got, title = parse_ppt(payload)
    assert got == "Fresh title\nFresh bullet"
    assert "Old" not in got
    assert title == "Fresh title"

    # sanity: the stale text IS physically present in the stream
    from aiotcvectordb_spark.operators.cfbdoc import CfbReader
    from aiotcvectordb_spark.operators.olebin import _ppt_walk

    raw_atoms: list[str] = []
    _ppt_walk(CfbReader(payload).stream("PowerPoint Document"), raw_atoms)
    assert any("Old" in a for a in raw_atoms)


def test_ppt_slide_order_follows_persist_atoms_not_stream():
    # hand-build a deck whose SLWT orders slides opposite to their
    # stream position: persist-aware extraction follows SLWT order.
    from aiotcvectordb_spark.operators.cfbdoc import _cfb_build
    from aiotcvectordb_spark.operators.olebin import (
        _RT_DOCUMENT,
        _RT_PERSIST_DIRECTORY_ATOM,
        _RT_SLIDE,
        _RT_SLIDE_LIST_WITH_TEXT,
        _RT_SLIDE_PERSIST_ATOM,
        _RT_TEXT_CHARS_ATOM,
        _RT_USER_EDIT_ATOM,
        _ppt_current_user_stream,
        _ppt_record,
    )

    stream = bytearray()
    off_b = len(stream)
    stream += _ppt_record(_RT_SLIDE, b"", container=True)
    off_a = len(stream)
    stream += _ppt_record(_RT_SLIDE, b"", container=True)
    atoms = bytearray()
    for pid, label in ((3, "first"), (2, "second")):  # pid 3 = off_a
        atoms += _ppt_record(
            _RT_SLIDE_PERSIST_ATOM, struct.pack("<IIiii", pid, 0, 1, 0, 0)
        )
        atoms += _ppt_record(_RT_TEXT_CHARS_ATOM, label.encode("utf-16-le"))
    slwt = _ppt_record(_RT_SLIDE_LIST_WITH_TEXT, bytes(atoms), container=True)
    doc_off = len(stream)
    stream += _ppt_record(_RT_DOCUMENT, slwt, container=True)
    pd = struct.pack("<II", 1 | (1 << 20), doc_off) + struct.pack(
        "<III", 2 | (2 << 20), off_b, off_a
    )
    pd_off = len(stream)
    stream += _ppt_record(_RT_PERSIST_DIRECTORY_ATOM, pd)
    ue_off = len(stream)
    stream += _ppt_record(
        _RT_USER_EDIT_ATOM,
        struct.pack("<IHBBIIIIHH", 256, 0, 0, 3, 0, pd_off, 1, 4, 0, 0),
    )
    data = _cfb_build(
        {
            "PowerPoint Document": bytes(stream),
            "Current User": _ppt_current_user_stream(ue_off),
        }
    )
    assert parse_ppt(data)[0] == "first\nsecond"


def test_ppt_title_is_first_text_line():
    _, title = parse_ppt(build_ppt("Deck Title\nbody"))
    assert title == "Deck Title"


def test_ppt_cr_paragraphs_become_newlines():
    # a hand-built TextCharsAtom with CR-separated paragraphs
    from aiotcvectordb_spark.operators.cfbdoc import _cfb_build
    from aiotcvectordb_spark.operators.olebin import (
        _RT_DOCUMENT,
        _RT_TEXT_CHARS_ATOM,
        _ppt_record,
    )

    atom = _ppt_record(
        _RT_TEXT_CHARS_ATOM, "para one\rpara two".encode("utf-16-le")
    )
    doc = _ppt_record(_RT_DOCUMENT, atom, container=True)
    data = _cfb_build({"PowerPoint Document": doc})
    assert parse_ppt(data)[0] == "para one\npara two"


def test_ppt_rejects_encrypted():
    from aiotcvectordb_spark.operators.cfbdoc import _cfb_build
    from aiotcvectordb_spark.operators.olebin import (
        _RT_DOCUMENT,
        _RT_ENCRYPTION,
        _ppt_record,
    )

    enc = _ppt_record(_RT_ENCRYPTION, b"\x00" * 16)
    doc = _ppt_record(_RT_DOCUMENT, enc, container=True)
    with pytest.raises(ValueError, match="encrypted .ppt"):
        parse_ppt(_cfb_build({"PowerPoint Document": doc}))


@pytest.mark.parametrize(
    "text",
    [
        "alpha\t42\nbeta\tgamma",
        "a\tb\tc\nd\te\tf\ng",
        "中文\tcell\nrow2 wide 值",
        "one",
        "x\t\ty",
        "",
    ],
)
def test_xls_round_trip(text):
    got, _ = parse_xls(build_xls(text))
    assert got == text.strip("\n")


def test_xls_number_and_rk_cells():
    from aiotcvectordb_spark.operators.cfbdoc import _cfb_build
    from aiotcvectordb_spark.operators.olebin import (
        _B_BOF,
        _B_EOF,
        _B_NUMBER,
        _B_RK,
        _biff_record,
    )

    bof_g = _biff_record(_B_BOF, struct.pack("<HHHIII", 0x600, 0x5, 0, 0, 0, 0))
    bof_s = _biff_record(_B_BOF, struct.pack("<HHHIII", 0x600, 0x10, 0, 0, 0, 0))
    eof = _biff_record(_B_EOF, b"")
    num = _biff_record(_B_NUMBER, struct.pack("<HHHd", 0, 0, 15, 2.5))
    rk_int = _biff_record(_B_RK, struct.pack("<HHHI", 0, 1, 15, (7 << 2) | 0x2))
    wb = bof_g + eof + bof_s + num + rk_int + eof
    got, _ = parse_xls(_cfb_build({"Workbook": wb}))
    assert got == "2.5\t7"


def test_xls_truncated_label_raises_valueerror_not_struct_error():
    # Label with rec_len 9 (cch+flags only) but fRichSt|fExtSt set:
    # the c_run/cb_ext unpacks read past the body and must surface as
    # the module's ValueError contract, never a leaked struct.error.
    from aiotcvectordb_spark.operators.cfbdoc import _cfb_build
    from aiotcvectordb_spark.operators.olebin import (
        _B_BOF,
        _B_EOF,
        _B_LABEL,
        _biff_record,
    )

    bof_g = _biff_record(_B_BOF, struct.pack("<HHHIII", 0x600, 0x5, 0, 0, 0, 0))
    bof_s = _biff_record(_B_BOF, struct.pack("<HHHIII", 0x600, 0x10, 0, 0, 0, 0))
    eof = _biff_record(_B_EOF, b"")
    bad = _biff_record(_B_LABEL, struct.pack("<HHHHB", 0, 0, 15, 1, 0x0C))
    wb = bof_g + eof + bof_s + bad + eof
    with pytest.raises(ValueError):
        parse_xls(_cfb_build({"Workbook": wb}))


def test_xls_sst_continue_spanning_round_trip():
    # Force many Continue splits with a tiny record cap: splits land
    # between strings, inside narrow character data, and inside wide
    # character data (fresh option byte each time, width may change).
    rows = []
    for i in range(40):
        wide = "值" * (i % 7) + f"宽{i}" if i % 3 == 0 else ""
        rows.append(f"cell{i}-" + "x" * (i % 11) + ("\t" + wide if wide else ""))
    text = "\n".join(rows)
    payload = build_xls(text, sst_max_body=64)
    got, _ = parse_xls(payload)
    assert got == text

    # same content must also survive the real 8224-byte cap
    big = "\n".join(f"row{i}\t" + "long cell value 宽 " * 40 for i in range(200))
    got_big, _ = parse_xls(build_xls(big))
    assert got_big == big


def test_xls_sst_single_string_spans_many_continues():
    # one 20k-char string (both widths) crossing dozens of boundaries
    for ch in ("a", "文"):
        text = ch * 20000
        got, _ = parse_xls(build_xls(text, sst_max_body=512))
        assert got == text


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_cell_text = st.text(
    alphabet=st.sampled_from("abcXYZ09 宽值文"), min_size=0, max_size=40
)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.lists(_cell_text, min_size=1, max_size=4), min_size=1, max_size=12
    ),
    max_body=st.integers(min_value=16, max_value=200),
)
def test_xls_sst_continue_round_trip_property(rows, max_body):
    """Any cell grid survives the SST writer/reader at ANY record cap:
    splits land at arbitrary points between strings, inside narrow and
    wide character arrays, and around headers."""
    text = "\n".join("\t".join(cols) for cols in rows)
    got, _ = parse_xls(build_xls(text, sst_max_body=max_body))
    assert got == text.strip("\n")


def test_xls_sst_overrun_is_honest_valueerror():
    from aiotcvectordb_spark.operators.cfbdoc import _cfb_build
    from aiotcvectordb_spark.operators.olebin import (
        _B_BOF,
        _B_EOF,
        _B_SST,
        _biff_record,
    )

    bof = _biff_record(_B_BOF, struct.pack("<HHHIII", 0x600, 0x5, 0, 0, 0, 0))
    # SST claims 2 strings but carries only one short one
    body = struct.pack("<ii", 2, 2) + struct.pack("<HB", 3, 0) + b"abc"
    wb = bof + _biff_record(_B_SST, body) + _biff_record(_B_EOF, b"")
    with pytest.raises(ValueError, match="overruns its Continue"):
        parse_xls(_cfb_build({"Workbook": wb}))


def test_xls_rejects_encrypted():
    from aiotcvectordb_spark.operators.cfbdoc import _cfb_build
    from aiotcvectordb_spark.operators.olebin import (
        _B_BOF,
        _B_FILEPASS,
        _biff_record,
    )

    wb = _biff_record(_B_BOF, struct.pack("<HHHIII", 0x600, 0x5, 0, 0, 0, 0))
    wb += _biff_record(_B_FILEPASS, b"\x01\x00")
    with pytest.raises(ValueError, match="encrypted .xls"):
        parse_xls(_cfb_build({"Workbook": wb}))


def test_docparse_dispatch_ppt_xls():
    text, title = docparse.parse_document(
        build_ppt("Deck heading\nBody bullet").decode("latin-1"), "deck.ppt"
    )
    assert text == "Deck heading\nBody bullet"
    assert title == "Deck heading"
    text2, _ = docparse.parse_document(
        build_xls("h1\th2\nv1\tv2").decode("latin-1"), "sheet.xls"
    )
    assert text2 == "h1\th2\nv1\tv2"


def test_fuzz_no_hangs_no_foreign_exceptions():
    import random

    rng = random.Random(11)
    for build, parse in ((build_ppt, parse_ppt), (build_xls, parse_xls)):
        blob = build("fuzz target\tcell\nanother row " * 20)
        for _ in range(120):
            b = bytearray(blob)
            for _ in range(rng.randrange(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            if rng.random() < 0.3:
                b = b[: rng.randrange(len(b))]
            try:
                text, _ = parse(bytes(b))
                assert isinstance(text, str)
            except ValueError:
                pass


def test_upload_ppt_xls_e2e(engine):
    from aiotcvectordb_spark.collection_view import CollectionViewManager

    engine.create_ai_database("ai_olebin")
    mgr = CollectionViewManager(engine)
    mgr.create_collection_view(
        "ai_olebin",
        "cv_olebin",
        splitter_process={"chunk_size": 60, "overlap": 10},
        parsing_process={"parsing_type": "AlgorithmParsing"},
    )
    for name, payload in (
        ("deck.ppt", build_ppt("Forecast overview slide.\nDetails follow.")),
        ("sheet.xls", build_xls("region\trevenue\nwest\t1200")),
    ):
        res = mgr.load_and_split_text(
            "ai_olebin", "cv_olebin", doc_name=name,
            text=payload.decode("latin-1"),
        )
        chunks = mgr.get_chunks(
            "ai_olebin", "cv_olebin", document_set_id=res["doc_set_id"]
        )
        joined = " ".join(c["text"] for c in chunks)
        if name.endswith(".ppt"):
            assert "Forecast overview slide" in joined
        else:
            assert "revenue" in joined and "1200" in joined


def test_xls_formula_cached_values_round_trip():
    # mixed rows: canonical integers -> cached-number Formula records,
    # short strings on even (rw+col) -> cached-string Formula + String
    # record pairs, everything else through the SST/LabelSst path
    text = "alpha\t123\tbeta\n42\tgamma delta\t007\nwide值\t999999999999999"
    got, _ = parse_xls(build_xls(text, formula_cells=True))
    assert got == text
    # formula mode composes with forced SST Continue splits
    got2, _ = parse_xls(build_xls(text, formula_cells=True, sst_max_body=64))
    assert got2 == text


def test_xls_formula_cached_bool_error_blank():
    from aiotcvectordb_spark.operators.cfbdoc import _cfb_build
    from aiotcvectordb_spark.operators.olebin import (
        _B_BOF,
        _B_EOF,
        _B_FORMULA,
        _biff_record,
    )

    def fval(t, b2=0):
        return bytes([t, 0, b2, 0, 0, 0, 0xFF, 0xFF])

    bof_g = _biff_record(_B_BOF, struct.pack("<HHHIII", 0x600, 0x5, 0, 0, 0, 0))
    bof_s = _biff_record(_B_BOF, struct.pack("<HHHIII", 0x600, 0x10, 0, 0, 0, 0))
    eof = _biff_record(_B_EOF, b"")

    def frec(col, val):
        return _biff_record(
            _B_FORMULA,
            struct.pack("<HHH", 0, col, 15) + val + struct.pack("<HIH", 0, 0, 0),
        )

    wb = (
        bof_g + eof + bof_s
        + frec(0, fval(1, 1))   # cached TRUE
        + frec(1, fval(1, 0))   # cached FALSE
        + frec(2, fval(2, 7))   # cached error
        + frec(3, fval(3))      # cached blank
        + eof
    )
    got, _ = parse_xls(_cfb_build({"Workbook": wb}))
    assert got == "TRUE\tFALSE\t#ERR\t"


def test_xls_sst_astral_utf16_unit_counts():
    # cch counts UTF-16 code units ([MS-XLS] 2.5.293): astral chars
    # are two units each, and the Continue splitter must never part a
    # surrogate pair (each span decodes independently)
    t = "emoji \U0001F600\U0001F680\U0001F600\U0001F680 tail chars"
    for max_body in (256, 16, 17):
        got = parse_xls(build_xls(t, sst_max_body=max_body))[0]
        assert got == t, max_body
    got = parse_xls(build_xls(t, formula_cells=True))[0]
    assert got == t
