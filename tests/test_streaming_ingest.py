"""Streaming document ingest (streaming/ingest.py): the streamed
upload pipeline must produce exactly the batch parse+split result,
survive poison documents, and run shuffle-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiotcvectordb_spark.operators.cfbdoc import build_doc
from aiotcvectordb_spark.operators.docparse import parse_document
from aiotcvectordb_spark.operators.olebin import build_ppt, build_xls
from aiotcvectordb_spark.operators.pdfcodec import build_pdf
from aiotcvectordb_spark.streaming.ingest import (
    parse_documents_stream,
    split_chunks_stream,
)


def _uploads(spark):
    rows = [
        ("report.pdf", build_pdf("PDF body line.\nSecond.", font_mode="type0").decode("latin-1")),
        ("memo.doc", build_doc("Word memo body.", title="Memo").decode("latin-1")),
        ("deck.ppt", build_ppt("Deck heading\nBullet").decode("latin-1")),
        ("sheet.xls", build_xls("h\tv\n1\t2").decode("latin-1")),
        ("notes.md", "# Title\nplain *markdown* text"),
        ("page.html", "<html><title>T</title><body><p>web text</p></body></html>"),
        ("poison.doc", "\xd0\xcf\x11\xe0 truncated junk"),
    ]
    return spark.createDataFrame(rows, "doc_name string, payload string")


def _expected_chunks(rows):
    out = set()
    for name, payload in rows:
        try:
            text, title = parse_document(payload, name)
        except ValueError as e:
            out.add((name, -1, None, str(e) is not None))
            continue
        from aiotcvectordb_spark.operators.chunks import split_text

        for pos, _s, _e, chunk in split_text(text, chunk_size=30, overlap=5):
            out.add((name, pos, chunk, False))
    return out


def test_stream_ingest_equals_batch(spark, tmp_path):
    uploads = _uploads(spark)
    rows = [(r.doc_name, r.payload) for r in uploads.collect()]
    expected = _expected_chunks(rows)

    src = tmp_path / "uploads"
    src.mkdir()
    uploads.filter("doc_name < 'n'").write.parquet(f"{src}/w1.parquet")
    uploads.filter("doc_name >= 'n'").write.parquet(f"{src}/w2.parquet")
    stream = (
        spark.readStream.schema(uploads.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    chunks = split_chunks_stream(
        parse_documents_stream(stream), chunk_size=30, overlap=5
    )
    out_dir = str(tmp_path / "chunks")
    q = (
        chunks.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.doc_name, r.chunk_id, r.chunk_text, r.error is not None)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == expected
    # the poison .doc surfaced as an error row, not a dead stream
    assert any(name == "poison.doc" and err for name, _, _, err in got)
    # real parses produced real chunks
    assert any(name == "report.pdf" and cid == 0 for name, cid, _, _ in got)


def test_ingest_stages_are_shuffle_free(spark):
    uploads = _uploads(spark)
    plan = split_chunks_stream(
        parse_documents_stream(uploads)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # codec cost partitions with the data


def test_parsed_titles_survive(spark):
    parsed = parse_documents_stream(_uploads(spark)).collect()
    by_name = {r.doc_name: r for r in parsed}
    assert by_name["memo.doc"].title == "Memo"  # OLEPS property set
    assert by_name["page.html"].title == "T"
    assert by_name["poison.doc"].error
