from aiotcvectordb_spark.functions.vector import (
    cosine_score,
    dot_score,
    l2_score,
    metric_score,
    score_is_better_desc,
    vector_norm,
)

__all__ = [
    "cosine_score",
    "dot_score",
    "l2_score",
    "metric_score",
    "score_is_better_desc",
    "vector_norm",
]
