"""Streaming document ingest: the upload path as a stream (r6).

The batch upload path (``collection_view.load_and_split_text`` →
``operators/docparse.parse_document`` → chunk split) processes one
file per call; a production RAG ingest is a continuous feed of (name,
payload) pairs. This operator runs the SAME parser + splitter kernels
inside a Structured Streaming pipeline, so batch and stream are twins
by construction:

- ``parse_documents_stream``: a stateless ``mapInPandas`` stage over
  the streaming frame — extension-dispatched parsing (PDF incl. CMaps
  and the empty-password handler, OOXML, legacy .doc/.ppt/.xls, RTF,
  EPUB, HTML, Markdown — everything ``parse_document`` speaks), with
  per-document error capture: a failed parse yields a row with
  ``error`` set instead of killing the stream (poison-pill isolation;
  the batch API raises, a stream must not die on one bad upload).
- ``split_chunks_stream``: the same chunk splitter the batch path
  uses (``operators/chunks.split_text``), exploded to one row per
  chunk with stable (doc_name, chunk_id) keys — idempotent under
  at-least-once replay because chunk ids are a pure function of the
  input.

Both stages are narrow (no shuffle, no state store): parsing cost
partitions with the arriving data, which is the 100 TB ingest shape —
a 1000-executor cluster parses 1000 partitions of uploads
concurrently, and a restart replays only the unacknowledged
micro-batch. Batch≡stream equality is pinned in
tests/test_streaming_ingest.py via the foreachBatch collector
harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def parse_documents_stream(
    df: DataFrame, *, name_col: str = "doc_name", payload_col: str = "payload"
) -> DataFrame:
    """(doc_name, payload string) stream -> (doc_name, text, title,
    error). Exactly ``docparse.parse_document`` per row; parse
    failures become rows with ``error`` set (the stream must survive
    poison documents)."""
    schema = f"{name_col} string, text string, title string, error string"

    def run(batches):
        import pandas as pd

        from aiotcvectordb_spark.operators.docparse import parse_document

        for pdf in batches:
            names, texts, titles, errors = [], [], [], []
            for name, payload in zip(pdf[name_col], pdf[payload_col]):
                names.append(name)
                try:
                    text, title = parse_document(payload or "", name or "")
                    texts.append(text)
                    titles.append(title)
                    errors.append(None)
                except ValueError as e:
                    texts.append(None)
                    titles.append(None)
                    errors.append(str(e))
                except Exception as e:  # noqa: BLE001 — poison-document
                    # isolation: parsers promise ValueError, but a
                    # leaked struct.error/KeyError from a hostile
                    # payload must not kill the whole streaming query
                    texts.append(None)
                    titles.append(None)
                    errors.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {
                    name_col: names,
                    "text": texts,
                    "title": titles,
                    "error": errors,
                }
            )

    return df.select(name_col, payload_col).mapInPandas(run, schema=schema)


def split_chunks_stream(
    parsed: DataFrame,
    *,
    chunk_size: int = 200,
    overlap: int = 20,
    name_col: str = "doc_name",
) -> DataFrame:
    """Parsed-documents stream -> one row per chunk: (doc_name,
    chunk_id, chunk_text, title). Failed documents pass through with
    chunk_id -1 and the error in chunk_text's place being NULL — they
    stay observable downstream instead of vanishing."""
    schema = (
        f"{name_col} string, chunk_id int, chunk_text string, "
        "title string, error string"
    )

    def run(batches):
        import pandas as pd

        from aiotcvectordb_spark.operators.chunks import split_text

        for pdf in batches:
            rows = []
            for name, text, title, error in zip(
                pdf[name_col], pdf["text"], pdf["title"], pdf["error"]
            ):
                if error is not None or text is None:
                    rows.append((name, -1, None, title, error))
                    continue
                for pos, _start, _end, chunk in split_text(
                    text, chunk_size=chunk_size, overlap=overlap
                ):
                    rows.append((name, pos, chunk, title, None))
            yield pd.DataFrame(
                rows,
                columns=[name_col, "chunk_id", "chunk_text", "title", "error"],
            )

    return parsed.mapInPandas(run, schema=schema)
