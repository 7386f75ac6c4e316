"""Embedding-space operators beyond plain kNN: MMR diversified
re-ranking and PCA dimensionality reduction.

Neither exists in the reference client (its server exposes only
similarity search — reference: aiotcvectordb/client/stub.py:589-636),
but both are standard post-retrieval / preprocessing stages of a
training-data or RAG pipeline, so they're first-class here.

Scale shapes:

- **MMR** is inherently a greedy sequential selection over a SMALL
  candidate pool, so the correct distributed plan is: bounded exact
  kNN fetch (``knn_search``, bounded-shuffle ``local_topk`` at scale)
  to get ``fetch_k`` candidates per query, then one
  ``applyInPandas`` group per query over those ≤ ``fetch_k`` rows.
  The iterative part never touches more than ``fetch_k`` vectors per
  query, and groups are independent → perfectly parallel across
  queries.
- **PCA** uses Spark MLlib's distributed covariance path
  (``pyspark.ml.feature.PCA``): one pass to form the Gram matrix
  (d×d, driver-side eigendecomposition on a 64×64 matrix), one
  map-only pass to project. Nothing but the d×d matrix ever leaves
  the executors.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aiotcvectordb_spark.operators import knn

QUERY_IDX = knn.QUERY_IDX


def mmr_rerank(
    df: DataFrame,
    vectors: Sequence[Sequence[float]],
    *,
    vector_col: str = "vector",
    id_col: str = "id",
    metric: str = "COSINE",
    fetch_k: int = 50,
    limit: int = 10,
    lambda_mult: float = 0.5,
    filter: str | None = None,
    strategy: str = "sql",
    round_digits: int | None = None,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking.

    Fetch the exact top-``fetch_k`` per query, then greedily select
    ``limit`` items maximizing
    ``lambda * relevance - (1 - lambda) * max_sim_to_selected``
    (Carbonell & Goldstein 1998). Relevance is the metric score from
    the kNN stage; redundancy is cosine similarity between candidate
    vectors. Deterministic: ties break on ascending id.

    Returns ``(query_idx, <id>, relevance, mmr_score, mmr_rank)``.
    """
    if not 0.0 <= lambda_mult <= 1.0:
        raise ValueError("lambda_mult must be in [0, 1]")
    if fetch_k < limit:
        raise ValueError("fetch_k must be >= limit")

    cand = knn.knn_search(
        df,
        vectors,
        vector_col=vector_col,
        id_col=id_col,
        metric=metric,
        limit=fetch_k,
        filter=filter,
        retrieve_vector=True,
        strategy=strategy,
        round_digits=round_digits,
    ).select(QUERY_IDX, id_col, "score", vector_col)

    # the id keeps its source type (collections use string primary keys
    # per the reference data model; the registry's vec_id is long) —
    # hardcoding a type here would break at the Arrow schema boundary
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(QUERY_IDX, T.IntegerType(), False),
            T.StructField(id_col, id_type, False),
            T.StructField("relevance", T.DoubleType(), False),
            T.StructField("mmr_score", T.DoubleType(), False),
            T.StructField("mmr_rank", T.IntegerType(), False),
        ]
    )
    lam = float(lambda_mult)
    k_out = int(limit)
    rd = round_digits

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        # sort by (-score, id): deterministic candidate order
        pdf = pdf.sort_values(["score", id_col], ascending=[False, True])
        ids = pdf[id_col].to_numpy()
        rel = pdf["score"].to_numpy(dtype=np.float64)
        mat = np.array(pdf[vector_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        sim = unit @ unit.T  # fetch_k x fetch_k — bounded, per-group
        if rd is not None:
            # round BEFORE the greedy loop so near-tie selections are
            # decided on the same rounded cosines the SQL oracle uses
            # (the semdedup.assign_cells rule): an unrounded argmax and
            # a rounded one can pick different candidates when two
            # objectives differ below 10^-rd, which would cascade
            # through every later step of the greedy selection.
            # Half-AWAY-from-zero like mmr_score below (not numpy's
            # half-to-even): a raw cosine landing exactly on a rounding
            # boundary must tie-break the same way SQL round() does, or
            # the boundary flips a selection and cascades.
            # ULP caveat (r10 advisor): the boundary test happens in
            # floating point, so a double whose *f product sits within
            # one ULP of .5 can still round differently from a
            # BigDecimal HALF_UP over the exact binary value. The
            # sf0.01 parity pin is the contract; if a future corpus
            # trips it, fall back to per-element decimal.Decimal
            # quantize(ROUND_HALF_UP) for values within 1 ULP of a
            # boundary.
            f = 10.0**rd
            sim = np.sign(sim) * np.floor(np.abs(sim) * f + 0.5) / f
        n = len(ids)
        chosen: list[int] = []
        mmr_scores: list[float] = []
        max_sim = np.full(n, -np.inf)
        picked = np.zeros(n, dtype=bool)
        for _ in range(min(k_out, n)):
            if not chosen:
                obj = lam * rel
            else:
                obj = lam * rel - (1.0 - lam) * max_sim
            obj = np.where(picked, -np.inf, obj)
            # argmax with ascending-id tiebreak: ids are sorted within
            # equal scores already, and np.argmax takes the first max
            best = int(np.argmax(obj))
            chosen.append(best)
            mmr_scores.append(float(obj[best]))
            picked[best] = True
            max_sim = np.maximum(max_sim, sim[:, best])
        qi = int(pdf[QUERY_IDX].iloc[0])
        res = pd.DataFrame(
            {
                QUERY_IDX: qi,
                id_col: ids[chosen],
                "relevance": rel[chosen],
                "mmr_score": mmr_scores,
                "mmr_rank": np.arange(1, len(chosen) + 1, dtype=np.int32),
            }
        )
        if rd is not None:
            res["relevance"] = res["relevance"].round(rd)
            # half-AWAY-from-zero, not numpy's half-to-even: the
            # objective is 0.5 * (values already rounded to rd), so it
            # lands EXACTLY on the .5 rounding boundary for ~half of
            # all rows — banker's rounding here would systematically
            # disagree with SQL round() (Spark and DuckDB both round
            # halves away from zero)
            f = 10.0**rd
            a = res["mmr_score"].to_numpy(dtype=np.float64)
            res["mmr_score"] = np.sign(a) * np.floor(np.abs(a) * f + 0.5) / f
        return res

    return cand.groupBy(QUERY_IDX).applyInPandas(_mmr, schema=out_schema)


def pca_fit_transform(
    df: DataFrame,
    *,
    vector_col: str = "embedding",
    id_col: str = "id",
    k: int = 16,
) -> tuple[DataFrame, list[float]]:
    """Distributed PCA: project ``vector_col`` (array<float/double>)
    onto its top-``k`` principal components.

    Returns ``(projected_df, explained_variance)`` where the DataFrame
    has ``(id_col, reduced: array<double>)`` and the list holds the
    explained-variance fraction per component (descending).

    Uses ``pyspark.ml.feature.PCA``: the covariance accumulation is a
    single distributed tree-aggregate of d×d outer products; only the
    d×d matrix is eigendecomposed on the driver, so this scales to any
    row count (d = embedding dim, 64 here).
    """
    from pyspark.ml.feature import PCA as MlPCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vec = df.select(
        F.col(id_col),
        array_to_vector(F.col(vector_col).cast("array<double>")).alias("__v"),
    )
    model = MlPCA(k=k, inputCol="__v", outputCol="__p").fit(vec)
    out = model.transform(vec).select(
        F.col(id_col), vector_to_array(F.col("__p")).alias("reduced")
    )
    return out, [float(x) for x in model.explainedVariance]
