"""File-format ingestion connectors: CSV / JSON-lines / text / binary.

The reference ingests only via HTTP JSON bodies (documents) and raw file
upload to object storage (RAG path, reference
aiotcvectordb/model/collection_view.py:60-142). A Spark engine gets file
sources natively; these wrappers standardize the entry points and the
collection-merge path:

- ``read_source``: one call for csv/json/parquet/text/binaryFile with
  the right defaults (header CSV, JSON-lines, recursive binary). The
  result is a plain DataFrame — filters/projection on it push down to
  the file scan via Catalyst.
- ``ingest_dataframe``: DataFrame -> collection merge (upsert-by-pk
  rewrite, same protocol as engine.upsert but set-oriented, so 100M-row
  backfills don't pass through the 1000-doc client batch cap, which is
  an HTTP-API artifact — reference stub.py:453).
- ``ingest_files``: read_source + optional column mapping + merge.

Binary ingestion (``fmt="binaryFile"``) produces the multimodal column
shape consumed by ``operators.multimodal`` (payload + typed metadata).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aiotcvectordb_spark.errors import ParamError

_FORMATS = {"csv", "json", "parquet", "text", "binaryFile"}


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    *,
    schema: str | None = None,
    options: Mapping[str, str] | None = None,
) -> DataFrame:
    if fmt not in _FORMATS:
        raise ParamError(f"unsupported source format {fmt!r}; one of {sorted(_FORMATS)}")
    reader = spark.read
    defaults: dict[str, str] = {}
    if fmt == "csv":
        defaults = {"header": "true", "inferSchema": "false" if schema else "true"}
    elif fmt == "json":
        # JSON-lines by default; callers opt into multiLine for arrays
        defaults = {"multiLine": "false"}
    elif fmt == "binaryFile":
        defaults = {"pathGlobFilter": "*"}
    for k, v in {**defaults, **dict(options or {})}.items():
        reader = reader.option(k, v)
    if schema:
        reader = reader.schema(schema)
    return reader.format(fmt).load(path)


def binary_to_media(df: DataFrame, *, id_from: str = "path") -> DataFrame:
    """binaryFile rows -> the multimodal media shape: (media_id, payload,
    media_type, media_meta). Keeps bytes opaque; metadata typed."""
    return df.select(
        F.col(id_from).alias("media_id"),
        F.col("content").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.create_map(
            F.lit("length"), F.col("length").cast("string"),
            F.lit("modificationTime"), F.col("modificationTime").cast("string"),
        ).alias("media_meta"),
    )


def ingest_dataframe(
    engine,
    database: str,
    collection: str,
    df: DataFrame,
) -> dict:
    """Set-oriented upsert: replace-by-pk then append the remainder —
    one anti-join + union, executed as a full-table rewrite through the
    store's atomic version flip. Returns {'affectedCount': n_new_rows}.
    """
    from aiotcvectordb_spark.engine import upsert_dataframes

    meta = engine.catalog.get_collection(database, collection)
    pk = meta.primary_key
    if pk not in df.columns:
        raise ParamError(f"ingested data lacks primary key column {pk!r}")
    n = df.count()
    try:
        old = engine.store.read(engine.spark, database, meta.name)
    except FileNotFoundError:
        old = None
    # Bulk file ingest is unbounded — leave the anti-join unhinted.
    merged = df if old is None else upsert_dataframes(old, df, pk, known_small=False)
    engine.store.write(merged, database, meta.name, shard=meta.shard)
    return {"affectedCount": n}


def ingest_files(
    engine,
    database: str,
    collection: str,
    path: str,
    fmt: str = "csv",
    *,
    schema: str | None = None,
    options: Mapping[str, str] | None = None,
    column_map: Mapping[str, str] | None = None,
) -> dict:
    """Read files and merge them into a collection, optionally renaming
    source columns (``column_map={"src": "dest"}``)."""
    df = read_source(engine.spark, path, fmt, schema=schema, options=options)
    for src, dest in (column_map or {}).items():
        df = df.withColumnRenamed(src, dest)
    return ingest_dataframe(engine, database, collection, df)
