"""Adversarial-corpus oracle parity for the whole extract family.

The driver's correctness gate runs the extract round trips on the
synthetic corpus, which is pure-ASCII, single-line, single-spaced by
construction — so the builder/parser/oracle agreement it hash-checks
never sees the text shapes real uploads have (trailing newlines,
blank-line runs, tabs, CJK, multi-space, carriage returns). The r6
advisory found exactly that divergence class latent in the docx and
RTF oracles (green only because the corpus had no trailing-newline
texts). This test closes the class: it writes a small documents table
of deliberately nasty shapes, runs every extract query's REAL Spark
path and its REAL DuckDB oracle on it, and diffs per doc_id.

doc_ids 0..95 cycle through the shapes, so every md5-bucketed writer
variant (footnote/br/tab docx modes, multisheet xlsx, encrypted PDFs,
notes pptx, formula xls, ...) gets hit with several shapes each.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aiotcvectordb_spark import queries as Q

SHAPES = [
    "plain single line",
    "trailing newline\n",
    "\nleading newline",
    "blank\n\n\n\nrun of newlines",
    "tab\tseparated\tcells",
    "multi  space   runs    here",
    "line with trailing space \nsecond line",
    " leading space line",
    "中文文本 mixed ascii\n第二行纯中文",
    "specials {braces} \\backslash & <tag> \"quotes\" 'apos'",
    "x",
    "ends with space ",
    "\n\n",
    "carriage\r\nreturn line\r\nwindows style",
    "interior\n\ttab after newline",
    "a " * 400 + "long line tail",
    "around\n   \nwhitespace-only line",
    "lone\rcarriage returns\rclassic mac",
    "emoji 😀 non-bmp \U0001f680 line",
    "ends with cr\r",
    "ctrl\x01chars\x00here\x07bell\x1besc",
    "\x0b\x0conly controls\x1f",
]

EXTRACT_QUERIES = [
    "pdf_extract",
    "doc_extract",
    "ppt_extract",
    "xls_extract",
    "docx_extract",
    "pptx_extract",
    "xlsx_extract",
    "rtf_extract",
    "epub_extract",
]

N_DOCS = 96


@pytest.fixture(scope="module")
def nasty_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("nasty_sf")
    texts = [SHAPES[i % len(SHAPES)] for i in range(N_DOCS)]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                ["zh" if "中" in t else "en" for t in texts], pa.string()
            ),
            "source": pa.array(
                [f"src{i % 4}" for i in range(N_DOCS)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", EXTRACT_QUERIES)
def test_extract_matches_oracle_on_nasty_corpus(spark, nasty_sf, name):
    sdf = Q.QUERIES[name](spark, nasty_sf).toPandas()

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{nasty_sf}/documents.parquet'"
    )
    odf = con.sql(Q.ORACLES[name]).df()

    assert sorted(sdf.columns) == sorted(odf.columns), name
    s = sdf.sort_values("doc_id").reset_index(drop=True)
    o = odf.sort_values("doc_id").reset_index(drop=True)
    assert list(s["doc_id"]) == list(o["doc_id"]), (
        f"{name}: row set differs: spark={len(s)} oracle={len(o)}"
    )
    for col in sorted(sdf.columns):
        sv, ov = list(s[col]), list(o[col])
        for i, (a, b) in enumerate(zip(sv, ov)):
            if str(a) != str(b):
                did = s["doc_id"][i]
                shape = SHAPES[did % len(SHAPES)]
                pytest.fail(
                    f"{name} doc_id={did} col={col} shape={shape!r}:\n"
                    f"  spark : {a!r}\n  oracle: {b!r}"
                )
