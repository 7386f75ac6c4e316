"""Product quantization (PQ) — compressed-domain ANN for 100 TB corpora.

At real scale the embedding table itself is the cost: 10^10 vectors x
64 float32 = 2.5 TB that every brute-force query must stream. PQ
(Jegou, Douze, Schmid — "Product Quantization for Nearest Neighbor
Search", TPAMI 2011; the FAISS workhorse) cuts that by ~16-32x: split
each vector into ``m`` subvectors, vector-quantize every subspace with
its own small codebook, and store only the per-subspace code bytes.
Queries score codes with an ADC lookup table (m x k partial distances
computed once per query) — no decompression, sequential byte reads.

Division of labor (the standard one):
- **codebook training** runs on a BOUNDED sample on the driver
  (deterministic seeded Lloyd's in numpy; FAISS trains on samples the
  same way) — it is O(sample x k x iters), independent of corpus size;
- **encode** is an Arrow-batched ``mapInPandas`` pass over the corpus:
  vectorized argmin against the broadcast codebooks, emitting
  ``m``-byte codes;
- **search** broadcasts the per-query LUT and scores code bytes
  executor-side, keeping k per partition (the bounded-shuffle top-k
  shape of ``operators/knn.local_topk``), then optionally exact-rescores
  the ADC survivors against the raw vectors — precision comes from the
  rescore, speed from scanning bytes instead of floats.

COSINE/IP note: vectors are unit-normalized before encoding, so
squared-L2 ADC ranking is monotone in cosine (||a-b||^2 = 2 - 2cos on
the unit sphere); the final rescore reports true cosine scores.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PQModel:
    """Trained codebooks: (m, k, dsub) float64, plus geometry.

    ``normalize=True`` (COSINE/IP service): vectors are unit-normalized
    before quantization so squared-L2 ADC is rank-equivalent to cosine.
    ``normalize=False`` (L2 service): raw vectors are quantized and ADC
    approximates true L2 distances."""

    codebooks: np.ndarray
    dim: int
    normalize: bool = True

    def to_state(self) -> dict:
        """JSON-serializable form for catalog persistence."""
        return {
            "codebooks": [
                [[float(x) for x in c] for c in book] for book in self.codebooks
            ],
            "dim": int(self.dim),
            "normalize": bool(self.normalize),
        }

    @classmethod
    def from_state(cls, state: dict) -> "PQModel":
        return cls(
            codebooks=np.asarray(state["codebooks"], dtype=np.float64),
            dim=int(state["dim"]),
            normalize=bool(state.get("normalize", True)),
        )

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def k(self) -> int:
        return self.codebooks.shape[1]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]


def _unit(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def _lloyd(pts: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Seeded Lloyd's k-means on a bounded sample (driver-side numpy).
    k-means++-style probabilistic seeding, then ``iters`` refinements;
    empty clusters re-seed to the farthest point."""
    rng = np.random.default_rng(seed)
    cents = pts[rng.choice(len(pts), size=1)]
    for _ in range(k - 1):
        d2 = np.min(
            ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(-1), axis=1
        )
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        cents = np.vstack([cents, pts[rng.choice(len(pts), p=probs)]])
    for _ in range(iters):
        d2 = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        for j in range(k):
            sel = pts[assign == j]
            if len(sel):
                cents[j] = sel.mean(0)
            else:
                cents[j] = pts[d2.min(1).argmax()]
    return cents


def train_pq(
    df: DataFrame,
    *,
    vector_col: str = "embedding",
    m: int = 8,
    nbits: int = 5,
    train_sample: int = 16384,
    iters: int = 10,
    seed: int = 42,
    normalize: bool = True,
) -> PQModel:
    """Fit per-subspace codebooks on a bounded sample of ``df``.

    The collect is capped at ``train_sample`` rows (~4 MB at dim 64) no
    matter the corpus size — the unbounded work (encode, search) stays
    distributed. ``normalize=False`` trains on raw vectors (L2
    service)."""
    rows = (
        df.select(vector_col).limit(train_sample).collect()
    )
    mat = np.asarray([r[0] for r in rows], dtype=np.float64)
    if normalize:
        mat = _unit(mat)
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub, k = dim // m, 1 << nbits
    if len(mat) < k:
        raise ValueError(
            f"training sample {len(mat)} smaller than codebook size {k}; "
            "lower nbits or raise train_sample"
        )
    books = np.stack(
        [
            _lloyd(mat[:, s * dsub : (s + 1) * dsub], k, iters, seed + s)
            for s in range(m)
        ]
    )
    return PQModel(codebooks=books, dim=dim, normalize=normalize)


def encode_pq(
    df: DataFrame,
    model: PQModel,
    *,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): each vector quantized to m subspace code
    indices. Arrow-batched, vectorized argmin per subspace; the
    codebooks ride to executors inside the serialized closure (tiny:
    m*k*dsub floats)."""
    books, m, dsub = model.codebooks, model.m, model.dsub
    do_norm = model.normalize
    id_type = dict(df.dtypes)[id_col]  # id passes through untouched
    schema = f"{id_col} {id_type}, codes array<int>"

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            vecs = np.asarray(list(pdf[vector_col]), dtype=np.float64)
            if do_norm:
                vecs = _unit(vecs)
            codes = np.empty((len(vecs), m), dtype=np.int64)
            for s in range(m):
                sub = vecs[:, s * dsub : (s + 1) * dsub]
                # (n, k) distances via ||x||^2 - 2 x.c + ||c||^2; the
                # x^2 term is constant per row and drops out of argmin
                d = -2.0 * sub @ books[s].T + (books[s] ** 2).sum(1)[None, :]
                codes[:, s] = d.argmin(1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": list(codes)}
            )

    return df.select(id_col, vector_col).mapInPandas(enc, schema=schema)


def search_pq(
    codes_df: DataFrame,
    model: PQModel,
    query_vecs: list[list[float]],
    *,
    id_col: str = "vec_id",
    k: int = 10,
    rescore: DataFrame | None = None,
    rescore_k: int = 50,
    vector_col: str = "embedding",
    round_digits: int | None = 6,
    metric: str = "COSINE",
) -> DataFrame:
    """ADC top-k over PQ codes for each query vector.

    Returns (query_idx, id, score, rank). With ``rescore`` (the raw
    vector table), the ADC pass fetches ``rescore_k`` candidates per
    query and the final ranking uses the EXACT ``metric`` on those —
    the IVF-PQ-style refine step; without it, scores are the (negated)
    ADC distances. Per-partition cost is a (batch x m) byte gather
    against the broadcast LUT; shuffle is queries x rescore_k rows,
    never the corpus. COSINE/IP require a normalize=True model; L2 a
    normalize=False one (ADC must approximate the service metric's
    geometry)."""
    metric_u = metric.upper()
    if (metric_u == "L2") == model.normalize:
        raise ValueError(
            f"metric {metric_u} needs a PQModel trained with "
            f"normalize={'False' if metric_u == 'L2' else 'True'}"
        )
    q = np.asarray(query_vecs, dtype=np.float64)
    if model.normalize:
        q = _unit(q)
    books, m, dsub = model.codebooks, model.m, model.dsub
    nq = len(q)
    fetch = max(k, rescore_k if rescore is not None else k)
    # LUT[qi, s, c] = squared distance of query qi's subvector s to
    # centroid c — the only query-dependent state, broadcast once.
    lut = np.stack(
        [
            ((q[:, None, s * dsub : (s + 1) * dsub] - books[s][None, :, :]) ** 2).sum(-1)
            for s in range(m)
        ],
        axis=1,
    )
    id_type = dict(codes_df.dtypes)[id_col]
    schema = f"query_idx int, __id {id_type}, adc double"

    def adc_topk(batches):
        import pandas as pd

        for pdf in batches:
            codes = np.asarray(list(pdf["codes"]), dtype=np.int64)
            ids = pdf[id_col].to_numpy()
            if not len(codes):
                continue
            out_q, out_i, out_d = [], [], []
            for qi in range(nq):
                # gather: sum over subspaces of LUT[qi, s, code[:, s]]
                d = lut[qi, np.arange(m)[None, :], codes].sum(1)
                top = np.argsort(d, kind="stable")[:fetch]
                out_q.extend([qi] * len(top))
                out_i.extend(ids[top])
                out_d.extend(d[top])
            yield pd.DataFrame(
                {"query_idx": out_q, "__id": out_i, "adc": out_d}
            )

    part = codes_df.select(id_col, "codes").mapInPandas(
        adc_topk, schema=schema
    )
    # per-partition survivors -> global top-fetch per query (bounded:
    # partitions x queries x fetch rows enter this window)
    from pyspark.sql import Window

    w = Window.partitionBy("query_idx").orderBy(
        F.col("adc").asc(), F.col("__id").asc()
    )
    cand = (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= fetch)
        .select("query_idx", F.col("__id").alias(id_col), "adc")
    )
    if rescore is None:
        w2 = Window.partitionBy("query_idx").orderBy(
            F.col("adc").asc(), F.col(id_col).asc()
        )
        score = F.col("adc") if metric_u == "L2" else -F.col("adc")
        return (
            cand.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select("query_idx", id_col, score.alias("score"), "rank")
        )
    from aiotcvectordb_spark.functions.vector import (
        metric_score_fixed,
        score_is_better_desc,
    )

    qdf = cand.sparkSession.createDataFrame(
        [(i, [float(x) for x in query_vecs[i]]) for i in range(nq)],
        "query_idx int, __qv array<double>",
    )
    dim = model.dim
    joined = (
        cand.join(rescore.select(id_col, vector_col), id_col)
        .join(F.broadcast(qdf), "query_idx")
        .withColumn(
            "score", metric_score_fixed(metric_u, vector_col, "__qv", dim)
        )
    )
    if round_digits is not None:
        joined = joined.withColumn("score", F.round("score", round_digits))
    order = (
        F.col("score").desc()
        if score_is_better_desc(metric_u)
        else F.col("score").asc()
    )
    w3 = Window.partitionBy("query_idx").orderBy(order, F.col(id_col).asc())
    return (
        joined.withColumn("rank", F.row_number().over(w3))
        .filter(F.col("rank") <= k)
        .select("query_idx", id_col, "score", "rank")
    )
