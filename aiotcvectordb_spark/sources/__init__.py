from aiotcvectordb_spark.sources.parquet_store import ParquetStore

__all__ = ["ParquetStore"]
