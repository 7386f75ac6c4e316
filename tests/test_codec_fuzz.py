"""Codec robustness fuzz (r5): random bit flips + truncations of valid
PDF and MP3 payloads must either still decode or raise ValueError —
never hang (a stray delimiter once span the PDF content tokenizer
forever), never leak a foreign exception type (zlib.error, IndexError),
and never return a wrong-typed result. Seeded, so failures reproduce."""

from __future__ import annotations

import random

import numpy as np
import pytest

from aiotcvectordb_spark.operators import mp3codec as M
from aiotcvectordb_spark.operators import officeparse as O
from aiotcvectordb_spark.operators import pdfcodec as P


def _mutations(payload: bytes, rng: random.Random, n: int):
    for _ in range(n):
        b = bytearray(payload)
        for _ in range(rng.randint(1, 8)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        if rng.random() < 0.3:
            b = b[: max(1, rng.randrange(len(b)))]
        yield bytes(b)


def test_pdf_fuzz_no_hangs_no_foreign_exceptions():
    rng = random.Random(42)
    pdf = P.build_pdf("hello fuzz\nsecond line " * 20, title="T")
    for b in _mutations(pdf, rng, 200):
        try:
            text, title = P.extract_pdf_text(b)
            assert isinstance(text, str)
        except ValueError:
            pass


def test_pdf_fuzz_font_modes_and_lzw():
    """r6: the CMap/Differences decode paths and the LZW inflater must
    also honor the ValueError-or-success contract under mutation."""
    rng = random.Random(1042)
    base_text = "CMap fuzz 中文 éß\nline two " * 10
    for fm, flt in (("type0", "lzw"), ("differences", "flate"), ("type0", "none")):
        pdf = P.build_pdf(base_text, font_mode=fm, filter_mode=flt)
        for b in _mutations(pdf, rng, 80):
            try:
                text, _ = P.extract_pdf_text(b)
                assert isinstance(text, str)
            except ValueError:
                pass


def test_mp3_fuzz_no_hangs_no_foreign_exceptions():
    rng = random.Random(43)
    x = 0.4 * np.sin(2 * np.pi * 800 * np.arange(9216) / 44100)
    mp3 = M.encode_mp3(x, 44100, 128)
    for b in _mutations(mp3, rng, 200):
        try:
            pcm, sr = M.decode_mp3(b)
            assert sr > 0
        except ValueError:
            pass


def test_ooxml_fuzz_no_foreign_exceptions():
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "word/document.xml",
            '<w:document xmlns:w="http://schemas.openxmlformats.org/'
            'wordprocessingml/2006/main"><w:body>'
            + "<w:p><w:r><w:t>fuzz target text</w:t></w:r></w:p>" * 10
            + "</w:body></w:document>",
        )
    docx = buf.getvalue()
    rng = random.Random(44)
    for b in _mutations(docx, rng, 200):
        try:
            text, _ = O.parse_docx(b)
            assert isinstance(text, str)
        except ValueError:
            pass


def test_writer_built_formats_fuzz_no_foreign_exceptions():
    """Mutations of every writer-built upload payload either parse to a
    str or raise ValueError — never a leaked zlib/zipfile/etree/struct
    error (the same contract the binary codecs pin)."""
    from aiotcvectordb_spark.operators import rtfepub
    from aiotcvectordb_spark.operators.officeparse import (
        build_docx,
        build_pptx,
        build_xlsx,
        parse_pptx,
        parse_xlsx,
    )

    seed_text = "fuzz target text\twith cells\nand a second row\t42"
    cases = [
        (build_docx(seed_text, footnote="note", header="hdr"), O.parse_docx),
        (build_pptx(seed_text), parse_pptx),
        (build_xlsx(seed_text), parse_xlsx),
        (
            rtfepub.build_rtf(seed_text).encode("utf-8"),
            lambda b: rtfepub.parse_rtf(bytes(b).decode("utf-8", "replace")),
        ),
        (rtfepub.build_epub(seed_text), rtfepub.parse_epub),
    ]
    rng = random.Random(45)
    for payload, parse in cases:
        for b in _mutations(payload, rng, 120):
            try:
                text, _ = parse(b)
                assert isinstance(text, str)
            except ValueError:
                pass
