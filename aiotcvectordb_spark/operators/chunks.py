"""RAG document pipeline: split → embed → chunk search (ops 35-47).

Re-implements the server-side AI document pipeline the reference client
drives (reference: aiotcvectordb/model/collection_view.py:60-171 —
upload → server parses/splits/embeds → semantic chunk search with
``expand_chunk``; chunks carry startPos/endPos/text,
collection_view.py:332-339).

Spark shape: ingestion is a batch job ``text -> flatMap(split) ->
embed_udf -> chunks table``; chunk search is the kNN operator over the
chunks table; ``expand_chunk`` is a self-join on
(doc_set_id, |chunk_pos - hit_pos| <= w) — expressed as a range join
that Catalyst turns into a broadcast range filter for small hit sets.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aiotcvectordb_spark.functions.embedding import _embed_one
from aiotcvectordb_spark.operators import knn

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_set_id", T.StringType(), False),
        T.StructField("chunk_pos", T.IntegerType(), False),
        T.StructField("start_pos", T.IntegerType(), False),
        T.StructField("end_pos", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("vector", T.ArrayType(T.DoubleType()), True),
    ]
)


def split_text(
    text: str, *, chunk_size: int = 200, overlap: int = 50
) -> list[tuple[int, int, int, str]]:
    """Sliding-window splitter with overlap (the reference's
    SplitterProcess semantics — chunk windows over the raw text).
    Returns (chunk_pos, start, end, chunk_text)."""
    if chunk_size <= overlap:
        raise ValueError("chunk_size must exceed overlap")
    out = []
    step = chunk_size - overlap
    pos = 0
    for start in range(0, max(len(text) - overlap, 1), step):
        end = min(start + chunk_size, len(text))
        out.append((pos, start, end, text[start:end]))
        pos += 1
        if end >= len(text):
            break
    return out


_KW_STOPWORDS = frozenset(
    "the a an and or of to in for on with is are was were be been this "
    "that these those it its as at by from not but if then than into "
    "about over under after before between out up down off will would "
    "can could should may might do does did done have has had you your "
    "we our they their he she his her i me my".split()
)


def document_keywords(text: str, *, k: int = 5) -> list[str]:
    """Deterministic document keywords for
    SplitterProcess.appendKeywordsToChunk: top-``k`` tokens by
    (frequency desc, token asc) using the engine's BM25 tokenizer
    (latin words / CJK bigrams), stopwords and short latin tokens
    dropped. Pure function of the text, so keyworded chunks stay
    content-addressed."""
    from collections import Counter

    from aiotcvectordb_spark.functions.sparse import _TOKENS_FOR_QUERY

    counts = Counter(
        t
        for t in _TOKENS_FOR_QUERY(text or "")
        if t not in _KW_STOPWORDS and (len(t) >= 3 or not t.isascii())
    )
    return [t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]]


def load_and_split_text(
    spark: SparkSession,
    docs: Sequence[tuple[str, str]],
    *,
    chunk_size: int = 200,
    overlap: int = 50,
    dim: int = 32,
    title_prefix: str | None = None,
    keywords_prefix: str | None = None,
) -> DataFrame:
    """Ingestion job: (doc_set_id, full_text) pairs → chunks DataFrame
    with embedded vectors. Splitting + embedding run distributed via
    mapInPandas (Arrow batches), so a million documents fan out across
    executors; nothing is driver-side except the input handles.

    ``title_prefix`` implements SplitterProcess.appendTitleToChunk and
    ``keywords_prefix`` appendKeywordsToChunk (reference
    collection_view.py splitter config): each chunk's TEXT and
    EMBEDDING get the document title and/or keyword line prepended;
    start/end positions keep addressing the body so expand_chunk
    ranges stay valid."""
    src = spark.createDataFrame(
        list(docs), "doc_set_id string, full_text string"
    )

    def split_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ds_id, full in zip(pdf.doc_set_id, pdf.full_text):
                for pos, s, e, chunk in split_text(
                    full, chunk_size=chunk_size, overlap=overlap
                ):
                    if keywords_prefix:
                        chunk = f"{keywords_prefix}\n{chunk}"
                    if title_prefix:
                        chunk = f"{title_prefix}\n{chunk}"
                    rows.append(
                        (ds_id, pos, s, e, chunk, _embed_one(chunk, dim))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_set_id", "chunk_pos", "start_pos", "end_pos",
                    "text", "vector",
                ],
            )

    return src.mapInPandas(split_batches, schema=CHUNK_SCHEMA)


def chunk_search(
    chunks: DataFrame,
    query_text: str,
    *,
    dim: int = 32,
    limit: int = 3,
    document_set_names: Sequence[str] | None = None,
    expand_chunk: int = 0,
    filter: str | None = None,
) -> DataFrame:
    """Semantic chunk retrieval (op 39): embed query → kNN over chunks →
    optionally expand each hit with neighboring chunks (window
    ``rowsBetween`` analog via range self-join)."""
    df = chunks
    if document_set_names:
        df = df.filter(F.col("doc_set_id").isin(list(document_set_names)))
    if filter:
        df = df.filter(filter)
    df = df.withColumn(
        "__cid",
        F.concat_ws("#", F.col("doc_set_id"), F.col("chunk_pos").cast("string")),
    )
    qv = _embed_one(query_text, dim)
    hits = knn.knn_search(
        df,
        [qv],
        vector_col="vector",
        id_col="__cid",
        metric="COSINE",
        limit=limit,
        output_fields=["doc_set_id", "chunk_pos", "start_pos", "end_pos", "text"],
    ).drop("query_idx")
    if expand_chunk <= 0:
        return hits.drop("__cid")
    w = expand_chunk
    hit_keys = hits.select(
        F.col("doc_set_id").alias("h_ds"),
        F.col("chunk_pos").alias("h_pos"),
        "rank",
        "score",
    )
    expanded = (
        chunks.join(
            F.broadcast(hit_keys),
            (F.col("doc_set_id") == F.col("h_ds"))
            & (F.abs(F.col("chunk_pos") - F.col("h_pos")) <= w),
        )
        .select(
            "rank", "score", "doc_set_id", "chunk_pos", "start_pos",
            "end_pos", "text",
            (F.col("chunk_pos") == F.col("h_pos")).alias("is_hit"),
        )
        .orderBy("rank", "chunk_pos")
    )
    return expanded
