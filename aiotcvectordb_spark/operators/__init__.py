from aiotcvectordb_spark.operators.knn import knn_search

__all__ = ["knn_search"]
