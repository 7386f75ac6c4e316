"""PDF text extraction (operators/pdfcodec): round trips through the
module's own writer plus HAND-WRITTEN fixtures exercising the ISO
32000-1 corners the writer doesn't emit — literal-string escapes, TJ
kern arrays, Tm line advances, object streams (ObjStm), uncompressed
streams — and the honest-rejection contract."""

from __future__ import annotations

import zlib

import pytest

from aiotcvectordb_spark.operators.pdfcodec import build_pdf, extract_pdf_text


# ---------------------------------------------------------------------------
# writer round trips


@pytest.mark.parametrize(
    "text",
    [
        "hello world",
        "line one\nline two\nline three",
        "a\n\nblank line above",
        "trailing newline\n",
        "\nleading newline",
        "中文文本测试\n第二行也是中文",
        "par(en)s, \\backslash, and a > bracket <",
    ],
)
@pytest.mark.parametrize("compress", [True, False])
def test_round_trip(text, compress):
    got, _ = extract_pdf_text(build_pdf(text, compress=compress))
    assert got == text


def test_multi_page_order_and_title():
    text = "\n".join(f"line {i}" for i in range(10))
    pdf = build_pdf(text, title="The Title", lines_per_page=3)
    got, title = extract_pdf_text(pdf)
    assert got == text  # Kids walk preserves page order
    assert title == "The Title"


# ---------------------------------------------------------------------------
# hand-written fixtures (shapes the writer never produces)


def _wrap_single_page(content: bytes, extra_objs: bytes = b"") -> bytes:
    """Minimal single-page PDF around a raw (uncompressed) content
    stream, hand-assembled; offsets in the xref are dummies — the
    extractor must not depend on the xref table."""
    return (
        b"%%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
        % (len(content), content)
        + extra_objs
        + b"trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )


def test_literal_string_escapes():
    content = (
        rb"BT /F1 12 Tf 72 720 Td"
        rb" (tab\there \(nested\) \\slash\n) Tj"
        rb" (octal: \101\102\103) Tj"
        b" (split \\\nover lines) Tj ET"
    )
    got, _ = extract_pdf_text(_wrap_single_page(content))
    assert got == "tab\there (nested) \\slash\noctal: ABC" + "split over lines"


def test_tj_array_kerns_become_word_gaps():
    # small kerns are glyph spacing (no gap); large negative kerns are
    # inter-word gaps (pdftotext heuristic)
    content = b"BT /F1 12 Tf 72 720 Td [(Hel) -20 (lo) -400 (world)] TJ ET"
    got, _ = extract_pdf_text(_wrap_single_page(content))
    assert got == "Hello world"


def test_quote_operators_advance_line():
    content = b"BT /F1 12 Tf 72 720 Td (first) Tj (second) ' 1 1 (third) \" ET"
    got, _ = extract_pdf_text(_wrap_single_page(content))
    assert got == "first\nsecond\nthird"


def test_tm_y_change_is_a_line_break():
    content = (
        b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (up) Tj"
        b" 1 0 0 1 300 720 Tm (same line) Tj"
        b" 1 0 0 1 72 700 Tm (down) Tj ET"
    )
    got, _ = extract_pdf_text(_wrap_single_page(content))
    assert got == "upsame line\ndown"


def test_inline_dict_and_comment_skipped():
    content = (
        b"% a comment with (parens) and Tj inside\n"
        b"BT /F1 12 Tf 72 720 Td\n"
        b"/GS1 << /Type /ExtGState /Junk (string) >> scn\n"
        b"(real text) Tj ET"
    )
    got, _ = extract_pdf_text(_wrap_single_page(content))
    assert got == "real text"


def test_object_stream_pdf15():
    """Page + catalog objects packed inside a FlateDecode /ObjStm (the
    PDF 1.5 compressed-xref layout) — the raw-scan-only path would see
    no pages at all."""
    inner = (
        b"<< /Type /Catalog /Pages 2 0 R >>"
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    )
    o1 = b"<< /Type /Catalog /Pages 2 0 R >>"
    o2 = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    o3 = b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    header = b"1 0 2 %d 3 %d " % (len(o1), len(o1) + len(o2))
    payload = header + o1 + o2 + o3
    objstm = zlib.compress(payload)
    content = b"BT /F1 12 Tf 72 720 Td (from objstm) Tj ET"
    pdf = (
        b"%%PDF-1.5\n"
        b"5 0 obj << /Type /ObjStm /N 3 /First %d /Length %d "
        b"/Filter /FlateDecode >> stream\n%s\nendstream endobj\n"
        % (len(header), len(objstm), objstm)
        + b"4 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
        % (len(content), content)
        + b"trailer << /Size 6 /Root 1 0 R >>\n%%EOF\n"
    )
    got, _ = extract_pdf_text(pdf)
    assert got == "from objstm"
    assert inner  # silence unused warning pattern


# ---------------------------------------------------------------------------
# honest rejection


def test_rejects_non_pdf():
    with pytest.raises(ValueError, match="not a PDF"):
        extract_pdf_text(b"GIF89a not a pdf")


def test_rejects_encrypted_with_unknown_handler():
    # /Encrypt pointing at a missing object -> no /Standard filter
    pdf = build_pdf("x").replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    with pytest.raises(ValueError, match="security handler"):
        extract_pdf_text(pdf)


def test_encrypted_rc4_round_trip():
    """r6: standard security handler, RC4-128, empty user password —
    writer encrypts every stream/string with per-object keys, extractor
    validates /U and decrypts."""
    for fm in ("simple", "type0", "differences"):
        pdf = build_pdf(
            "classified body\nsecond line", font_mode=fm, encrypt=True,
            title="Dossier",
        )
        assert b"/Encrypt" in pdf and b"classified" not in pdf
        got, title = extract_pdf_text(pdf)
        assert got == "classified body\nsecond line"
        assert title == "Dossier"  # /Info strings decrypt too


def test_encrypted_wrong_password_rejected():
    pdf = bytearray(build_pdf("x", encrypt=True))
    i = pdf.find(b"/U <")
    pdf[i + 4 : i + 8] = b"dead"  # corrupt the /U validator
    with pytest.raises(ValueError, match="password"):
        extract_pdf_text(bytes(pdf))


def test_rejects_unsupported_filter():
    # image filters stay out of scope (RunLength is a TEXT filter and
    # decodes since r6 — see test_text_bearing_filters)
    content = b"BT (hi) Tj ET"
    pdf = _wrap_single_page(content).replace(
        b"<< /Length %d >>" % len(content),
        b"<< /Length %d /Filter /JBIG2Decode >>" % len(content),
    )
    with pytest.raises(ValueError, match="unsupported PDF stream filter"):
        extract_pdf_text(pdf)


def test_lzw_filter_supported():
    from aiotcvectordb_spark.operators.pdfcodec import _lzw_encode

    content = b"BT (lzw payload) Tj ET"
    payload = _lzw_encode(content)
    pdf = _wrap_single_page(payload).replace(
        b"<< /Length %d >>" % len(payload),
        b"<< /Length %d /Filter /LZWDecode >>" % len(payload),
    )
    assert extract_pdf_text(pdf)[0] == "lzw payload"


def test_rejects_image_only():
    content = b"q 612 0 0 792 0 0 cm /Im1 Do Q"  # no text-showing ops
    with pytest.raises(ValueError, match="no extractable text"):
        extract_pdf_text(_wrap_single_page(content))


def test_form_xobject_text_extracted():
    """r5: text drawn via a /Form XObject (``/Fm1 Do``) must be
    extracted in place — the page content walk alone would miss it."""
    content = b"BT /F1 12 Tf 72 720 Td (before) Tj ET /Fm1 Do BT (after) Tj ET"
    form = b"BT /F1 10 Tf 100 100 Td (inside form) Tj ET"
    pdf = (
        b"%%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /XObject << /Fm1 5 0 R >> >> >> endobj\n"
        b"4 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
        % (len(content), content)
        + b"5 0 obj << /Type /XObject /Subtype /Form /Length %d >> "
        b"stream\n%s\nendstream endobj\n" % (len(form), form)
        + b"trailer << /Size 6 /Root 1 0 R >>\n%%EOF\n"
    )
    got, _ = extract_pdf_text(pdf)
    assert got == "beforeinside formafter"


def test_form_xobject_cycle_is_depth_capped():
    # a form whose stream invokes itself must not recurse forever
    content = b"/Fm1 Do BT (page) Tj ET"
    form = b"BT (loop) Tj ET /Fm1 Do"
    pdf = (
        b"%%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /XObject << /Fm1 5 0 R >> >> >> endobj\n"
        b"4 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
        % (len(content), content)
        + b"5 0 obj << /Type /XObject /Subtype /Form /Length %d >> "
        b"stream\n%s\nendstream endobj\n" % (len(form), form)
        + b"trailer << /Size 6 /Root 1 0 R >>\n%%EOF\n"
    )
    got, _ = extract_pdf_text(pdf)
    assert "loop" in got and "page" in got


def test_inline_image_binary_skipped():
    """r5: inline-image binary (BI .. ID <bytes> EI) must be skipped
    wholesale — its bytes can contain anything, including sequences
    that would misparse as text-showing operators."""
    fake_ops = b"(garbage) Tj \xff\x00\x9c (more) Tj"
    content = (
        b"BT /F1 12 Tf 72 720 Td (before) Tj ET "
        b"BI /W 4 /H 4 /BPC 8 /CS /G ID " + fake_ops + b" EI "
        b"BT (after) Tj ET"
    )
    got, _ = extract_pdf_text(_wrap_single_page(content))
    assert got == "beforeafter"


# ---------------------------------------------------------------------------
# r6 font machinery: ToUnicode CMaps, /Differences, LZW, predictors


def test_round_trip_all_font_and_filter_modes():
    from aiotcvectordb_spark.operators.pdfcodec import build_pdf

    texts = [
        "Hello, World!\nSecond line: #$%&",
        "CJK: 中文文档测试\nRussian: привет мир",
        "accents: éèêë ÄÖÜ ß œ ñ",
        "astral: \U0001F600 \U0001D400 mixed",
        "",
    ]
    for fm in ("simple", "type0", "differences"):
        for flt in ("flate", "lzw", "none"):
            for t in texts:
                pdf = build_pdf(t, font_mode=fm, filter_mode=flt, lines_per_page=2)
                got, _ = extract_pdf_text(pdf)
                assert got == t, (fm, flt, t[:30], got[:50])


def test_differences_mode_falls_back_to_type0_past_223_chars():
    from aiotcvectordb_spark.operators.pdfcodec import build_pdf

    text = "".join(chr(0x4E00 + i) for i in range(300))
    pdf = build_pdf(text, font_mode="differences")
    assert b"/ToUnicode" in pdf  # type0 machinery engaged
    assert extract_pdf_text(pdf)[0] == text


def test_glyph_name_resolver():
    from aiotcvectordb_spark.operators.pdfcodec import _glyph_to_char

    assert _glyph_to_char("a") == "a"
    assert _glyph_to_char("Q") == "Q"
    assert _glyph_to_char("seven") == "7"
    assert _glyph_to_char("comma") == ","
    assert _glyph_to_char("eacute") == "é"
    assert _glyph_to_char("Adieresis") == "Ä"
    assert _glyph_to_char("ccedilla") == "ç"
    assert _glyph_to_char("ntilde") == "ñ"
    assert _glyph_to_char("germandbls") == "ß"
    assert _glyph_to_char("quotedblleft") == "“"
    assert _glyph_to_char("emdash") == "—"
    assert _glyph_to_char("fi") == "ﬁ"
    assert _glyph_to_char("uni4E2D") == "中"
    assert _glyph_to_char("uni0041") == "A"
    assert _glyph_to_char("u1F600") == "\U0001F600"
    assert _glyph_to_char("notarealglyphname") == ""
    assert _glyph_to_char("") == ""


def test_hand_built_differences_with_winansi_base():
    # codes: 65 -> eacute via Differences; 0x80 stays WinAnsi euro
    font = (
        b"5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /X "
        b"/Encoding << /BaseEncoding /WinAnsiEncoding "
        b"/Differences [ 65 /eacute ] >> >> endobj\n"
    )
    content = b"BT /F1 12 Tf <41 80> Tj ET"
    pdf = _wrap_single_page(content, extra_objs=font).replace(
        b"/Contents 4 0 R",
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R",
    )
    got, _ = extract_pdf_text(pdf)
    assert got == "é€"


def test_hand_built_tounicode_bfrange():
    cmap = (
        b"begincodespacerange <00> <FF> endcodespacerange\n"
        b"1 beginbfrange <41> <43> <0061> endbfrange\n"
        b"1 beginbfchar <20> <0020> endbfchar\n"
    )
    objs = (
        b"5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /X "
        b"/ToUnicode 6 0 R >> endobj\n"
        b"6 0 obj << /Length %d >> stream\n%s\nendstream endobj\n"
        % (len(cmap), cmap)
    )
    content = b"BT /F1 12 Tf <41 42 43 20 41> Tj ET"
    pdf = _wrap_single_page(content, extra_objs=objs).replace(
        b"/Contents 4 0 R",
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R",
    )
    got, _ = extract_pdf_text(pdf)
    assert got == "abc a"  # bfrange increments, 1-byte codespace honored


def test_length_sliced_stream_keeps_trailing_newline_data():
    # an uncompressed stream whose payload legitimately ends in \n:
    # /Length slicing must keep it (the old endstream scan stripped it)
    content = b"BT (line) Tj ET\n"
    pdf = _wrap_single_page(content)
    assert extract_pdf_text(pdf)[0] == "line"
    # and a wrong /Length falls back to scanning without crashing
    bad = pdf.replace(b"<< /Length %d >>" % len(content), b"<< /Length 9999 >>")
    assert extract_pdf_text(bad)[0] == "line"


def test_png_predictor_roundtrip():
    import zlib as _z

    from aiotcvectordb_spark.operators.pdfcodec import _png_predictor

    # predictor rows: filter byte 2 (Up) over two 4-byte rows
    raw = bytes([0, 1, 2, 3, 4]) + bytes([2, 1, 1, 1, 1])
    out = _png_predictor(raw, 1, 4)
    assert out == bytes([1, 2, 3, 4, 2, 3, 4, 5])
    # wire it through a Flate stream with DecodeParms
    content = b"BT (pred) Tj ET"
    # encode with predictor 0 rows (None filter): payload = rows of 15
    rows = b"".join(b"\x00" + content[i : i + 15] for i in range(0, len(content), 15))
    payload = _z.compress(rows)
    pdf = _wrap_single_page(payload).replace(
        b"<< /Length %d >>" % len(payload),
        b"<< /Length %d /Filter /FlateDecode /DecodeParms "
        b"<< /Predictor 12 /Columns 15 >> >>" % len(payload),
    )
    assert extract_pdf_text(pdf)[0] == "pred"


def test_lzw_codec_exhaustive():
    import os as _os
    import random as _r

    from aiotcvectordb_spark.operators.pdfcodec import _lzw_decode, _lzw_encode

    _r.seed(13)
    for n in (0, 1, 2, 257, 1000, 9000):
        blob = _os.urandom(n)
        assert _lzw_decode(_lzw_encode(blob)) == blob
    rep = b"tika" * 3000  # repetitive: deep table
    assert _lzw_decode(_lzw_encode(rep)) == rep


def test_real_world_system_pdfs():
    """The r6 font machinery must extract real TeX/DocBook PDFs (subset
    fonts + ToUnicode CMaps) shipped with the OS — skipped when the
    docs packages are absent."""
    import os

    fixtures = [
        ("/usr/share/doc/libtasn1-doc/libtasn1.pdf", "Abstract Syntax Notation"),
        (
            "/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf",
            "Shared MIME-info Database",
        ),
    ]
    ran = 0
    for path, needle in fixtures:
        if not os.path.exists(path):
            continue
        text, _ = extract_pdf_text(open(path, "rb").read())
        assert needle in text, (path, text[:200])
        assert len(text) > 10_000
        ran += 1
    if not ran:
        pytest.skip("no system PDFs present")


def test_aes_fips_vector_and_selfchecks():
    """The AES core is generated from the field definition; pin it to
    the official FIPS-197 Appendix B vector so a table-generation slip
    can never ship."""
    from aiotcvectordb_spark.operators.pdfcodec import (
        _INV_SBOX,
        _SBOX,
        _aes_decrypt_block,
        _aes_encrypt_block,
        _aes_expand_key,
    )

    assert _SBOX[0x00] == 0x63 and _SBOX[0x53] == 0xED
    assert all(_INV_SBOX[_SBOX[x]] == x for x in range(256))
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pt = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    ct = _aes_encrypt_block(pt, _aes_expand_key(key))
    assert ct == bytes.fromhex("3925841d02dc09fbdc118597196a0b32")
    assert _aes_decrypt_block(ct, _aes_expand_key(key)) == pt


def test_encrypted_aes_round_trip():
    for fm in ("simple", "type0", "differences"):
        pdf = build_pdf(
            "aes classified\nsecond line 中文", font_mode=fm,
            encrypt="aes", title="Vault",
        )
        assert b"/AESV2" in pdf and b"classified" not in pdf
        got, title = extract_pdf_text(pdf)
        assert got == "aes classified\nsecond line 中文"
        assert title == "Vault"
    # padding edge: lengths that make the last pad byte land on \n
    for ln in range(1, 34):
        t = "y" * ln
        assert extract_pdf_text(build_pdf(t, encrypt="aes"))[0] == t


def test_aesv3_still_rejected():
    pdf = build_pdf("x", encrypt="aes").replace(b"/CFM /AESV2", b"/CFM /AESV3")
    with pytest.raises(ValueError, match="AESV3|crypt filter"):
        extract_pdf_text(pdf)


def test_tiff_predictor_2_and_utf8_strings():
    import zlib as _z

    # TIFF predictor: rows stored as horizontal differences
    content = b"BT (tiff) Tj ET"
    row = 15
    diffed = bytearray()
    for r0 in range(0, len(content), row):
        chunk = content[r0 : r0 + row]
        prev = 0
        for i, b in enumerate(chunk):
            diffed.append((b - (chunk[i - 1] if i else 0)) & 0xFF)
    payload = _z.compress(bytes(diffed))
    pdf = _wrap_single_page(payload).replace(
        b"<< /Length %d >>" % len(payload),
        b"<< /Length %d /Filter /FlateDecode /DecodeParms "
        b"<< /Predictor 2 /Columns 15 >> >>" % len(payload),
    )
    assert extract_pdf_text(pdf)[0] == "tiff"
    # PDF 2.0 UTF-8 text string with BOM
    utf8 = b"\xef\xbb\xbf" + "café 中".encode("utf-8")
    content2 = b"BT <" + utf8.hex().encode() + b"> Tj ET"
    assert extract_pdf_text(_wrap_single_page(content2))[0] == "café 中"


def _a85(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i : i + 4]
        pad = 4 - len(chunk)
        v = int.from_bytes(chunk + b"\x00" * pad, "big")
        if v == 0 and pad == 0:
            out += b"z"
            continue
        g = []
        for _ in range(5):
            g.append(v % 85)
            v //= 85
        enc = bytes(33 + x for x in reversed(g))
        out += enc[: 5 - pad]
    return bytes(out) + b"~>"


def _rle(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        j = i
        while j + 1 < len(data) and data[j + 1] == data[i] and j - i < 126:
            j += 1
        if j > i:
            out += bytes([257 - (j - i + 1), data[i]])
            i = j + 1
        else:
            k = i
            while (
                k < len(data)
                and (k + 1 >= len(data) or data[k + 1] != data[k])
                and k - i < 127
            ):
                k += 1
            out += bytes([k - i - 1]) + data[i:k]
            i = k
    return bytes(out) + b"\x80"


@pytest.mark.parametrize(
    "fname,enc",
    [
        ("ASCIIHexDecode", lambda d: d.hex().encode() + b">"),
        ("ASCII85Decode", _a85),
        ("RunLengthDecode", _rle),
    ],
)
def test_text_bearing_filters(fname, enc):
    """r6: the three remaining text-bearing stream filters decode;
    reference encoders live in this test, independent of the codec."""
    import os as _os
    import random as _r

    from aiotcvectordb_spark.operators import pdfcodec as P

    dec = {
        "ASCIIHexDecode": P._ascii_hex_decode,
        "ASCII85Decode": P._ascii85_decode,
        "RunLengthDecode": P._runlength_decode,
    }[fname]
    _r.seed(9)
    for n in (0, 1, 3, 4, 5, 100, 997):
        d = _os.urandom(n)
        assert dec(enc(d)) == d, (fname, n)
    content = b"BT (filtered text) Tj ET"
    payload = enc(content)
    pdf = _wrap_single_page(payload).replace(
        b"<< /Length %d >>" % len(payload),
        b"<< /Length %d /Filter /%s >>" % (len(payload), fname.encode()),
    )
    assert extract_pdf_text(pdf)[0] == "filtered text"


def test_image_filters_still_rejected():
    content = b"BT (x) Tj ET"
    pdf = _wrap_single_page(content).replace(
        b"<< /Length %d >>" % len(content),
        b"<< /Length %d /Filter /DCTDecode >>" % len(content),
    )
    with pytest.raises(ValueError, match="unsupported PDF stream filter"):
        extract_pdf_text(pdf)


def test_aes256_fips_vector():
    from aiotcvectordb_spark.operators.pdfcodec import (
        _aes_decrypt_block,
        _aes_encrypt_block,
        _aes_expand_key,
    )

    # FIPS-197 Appendix C.3
    key = bytes(range(32))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = _aes_encrypt_block(pt, _aes_expand_key(key))
    assert ct == bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
    assert _aes_decrypt_block(ct, _aes_expand_key(key)) == pt


def test_encrypted_aes256_r6_round_trip():
    """PDF 2.0 AES-256 (V5/R6): hardened-hash /U validation, file key
    unwrapped from /UE, strings+streams under the file key directly.
    (The bulk pdf_extract round trip carries a 1/15 AES-256 share; the
    file-constant policy's KDF results memoize + ship to workers.)"""
    pdf = build_pdf(
        "R6 sealed body\n第二行", encrypt="aes256", title="Vault256",
    )
    assert b"/AESV3" in pdf and b"sealed" not in pdf
    got, title = extract_pdf_text(pdf)
    assert got == "R6 sealed body\n第二行"
    assert title == "Vault256"
    # tampered /U -> honest password rejection
    b = bytearray(pdf)
    i = b.find(b"/U <")
    b[i + 4 : i + 8] = b"dead"
    with pytest.raises(ValueError, match="password"):
        extract_pdf_text(bytes(b))


def test_v5_policy_kdf_pairs_match_fresh_computation():
    # the driver-shipped KDF results must equal the real Algorithm 2.B
    # output — priming is memoization, never a different code path
    from aiotcvectordb_spark.operators import pdfcodec
    from aiotcvectordb_spark.operators.pdfcodec import (
        _hash_2b,
        v5_policy_kdf_pairs,
    )

    pairs = v5_policy_kdf_pairs()
    saved = dict(pdfcodec._HASH2B_PRIMED)
    pdfcodec._HASH2B_PRIMED.clear()
    try:
        for args, digest in pairs:
            assert _hash_2b.__wrapped__(*args) == digest
            assert len(digest) == 32
    finally:
        pdfcodec._HASH2B_PRIMED.update(saved)
