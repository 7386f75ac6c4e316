"""aiotcvectordb_spark — a PySpark-native analytics/vector engine.

Re-implements, Spark-first, the query semantics exposed by the
``alviezhang/aiotcvectordb`` client SDK (filtered exact/approx kNN, hybrid
dense+sparse retrieval with rank fusion, BM25 full-text search, document
CRUD with a SQL-like filter language, sort/pagination/projection, TTL,
deterministic embedding, RAG chunk pipeline) plus large-scale
training-data-pipeline operators (dedup, similarity join, text analysis,
multimodal plumbing).

Reference semantics: /root/reference (aiotcvectordb, read-only snapshot).
Execution: Spark DataFrame/SQL — Catalyst plans, Tungsten executes.
Storage: parquet-backed collections + a JSON catalog.
"""

from aiotcvectordb_spark.engine import VectorDBEngine
from aiotcvectordb_spark.params import ReadConsistency
from aiotcvectordb_spark.session import get_spark

__all__ = ["VectorDBEngine", "ReadConsistency", "get_spark"]
__version__ = "0.1.0"
