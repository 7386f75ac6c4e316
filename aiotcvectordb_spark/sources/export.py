"""Export sinks: write a collection (or any DataFrame) to parquet / CSV
/ JSON-lines, optionally hive-partitioned by columns.

The reference client has no export surface (results come back as JSON
over HTTP); an embedded batch engine needs one. Spark-first choices:

- ``partition_by`` columns become hive directory partitions; the frame
  is repartitioned on them first so each partition directory gets one
  file per shuffle partition instead of one file per *input* task x
  partition value — the small-files failure mode at 100 TB.
- CSV cannot carry arrays/structs/maps, so complex columns are
  serialized with ``to_json`` (lossless, documented, reversible with
  ``from_json``); JSON-lines and parquet keep native types.
- ``coalesce_files`` caps output file count for small dimension dumps;
  leave it None for big tables so write parallelism is preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_COMPLEX_KINDS = ("array", "map", "struct")


def _csv_safe(df: DataFrame) -> DataFrame:
    cols = []
    for f in df.schema.fields:
        if f.dataType.typeName() in _COMPLEX_KINDS:
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def export_dataframe(
    df: DataFrame,
    path: str,
    *,
    format: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    coalesce_files: int | None = None,
    options: dict | None = None,
) -> None:
    if format not in ("parquet", "csv", "json"):
        raise ValueError(f"unsupported export format: {format}")
    if format == "csv":
        df = _csv_safe(df)
    if partition_by:
        # co-locate rows of each partition value before the write
        df = df.repartition(*[F.col(c) for c in partition_by])
    elif coalesce_files:
        df = df.coalesce(coalesce_files)
    writer = df.write.format(format).mode(mode)
    if format == "csv":
        writer = writer.option("header", "true")
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def export_collection(
    engine,
    database: str,
    collection: str,
    path: str,
    *,
    format: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    honor_ttl: bool = True,
    coalesce_files: int | None = None,
    options: dict | None = None,
) -> int:
    """Export a collection snapshot; returns the exported row count."""
    df = engine.read(database, collection, honor_ttl=honor_ttl)
    export_dataframe(
        df,
        path,
        format=format,
        partition_by=partition_by,
        mode=mode,
        coalesce_files=coalesce_files,
        options=options,
    )
    return df.count()
