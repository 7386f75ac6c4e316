"""Shared SemDeDup kernels (Abbas et al. 2023, arXiv:2303.09540).

The batch queries (``semantic_dedup`` / ``semantic_dedup_auto`` in
queries.py) and the streaming ingest twin (streaming/semdedup.py) must
agree bit-for-bit, so the two numpy kernels live here and both paths
call them:

- :func:`assign_cells` — hard max-cosine cell assignment against a
  small centroid matrix, one Arrow matmul per batch (ties → lowest
  cell id, cosines rounded so every engine agrees);
- :func:`prune_cells` — the within-cell domination prune: members are
  ordered by the keep rule (centroid-cosine ASC — the paper keeps the
  example LEAST similar to its centroid — then id ASC) and a member is
  a ``semantic_dup`` iff ANY earlier member's cosine reaches tau. The
  cosine matrix is computed as chunked matmuls (never an m² temporary
  beyond m×chunk, never a per-pair JVM expression).

Cells are bounded (nlist ∝ N at scale), so per-cell work is constant
as the corpus grows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

_ROUND_DIGITS = 6
_CHUNK = 1024


def _unit_rows(embeddings) -> np.ndarray:
    X = np.asarray(list(embeddings), dtype=np.float64)
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def assign_cells(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, embedding, cell, ccos): hard max-cosine assignment as one
    Arrow mapInPandas matmul per batch against the ~k×dim float64
    centroid matrix (a few MB in the task closure — never the data)."""
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    CU = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    id_type = dict(df.dtypes)[id_col]
    emb_type = dict(df.dtypes)[vec_col]
    schema = f"{id_col} {id_type}, {vec_col} {emb_type}, cell int, ccos double"

    def assign(batches):
        CT = CU.T
        for pdf in batches:
            if not len(pdf):
                continue
            U = _unit_rows(pdf[vec_col])
            # round BEFORE argmax so ties are decided on the same
            # rounded cosines the SQL twin sorts by (ORDER BY ccos
            # DESC, cell): two centroids within <5e-7 of each other
            # round to an exact tie and argmax then matches the
            # lowest-cell rule.
            S = np.round(U @ CT, _ROUND_DIGITS)
            cell = np.argmax(S, axis=1)  # ties → lowest cell id
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "cell": cell.astype(np.int32),
                    "ccos": S[np.arange(len(S)), cell],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(assign, schema=schema)


def flag_members(
    pdf,
    tau: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """In-memory domination flags for ONE cell's members (a pandas
    frame sorted here by the keep rule). If a boolean ``prior`` column
    is present, prior=True rows are already-accepted members that
    dominate EVERY batch row they reach (first-arrival-wins — the
    streaming causality), and only prior=False rows are returned.
    Returns (sorted batch frame, dup bool array)."""
    has_prior = "prior" in pdf.columns
    prior = pdf[pdf["prior"]] if has_prior else pdf.iloc[0:0]
    batch = (pdf[~pdf["prior"]] if has_prior else pdf).sort_values(
        ["ccos", id_col]
    ).reset_index(drop=True)
    m = len(batch)
    dup = np.zeros(m, dtype=bool)
    if m == 0:
        return batch, dup
    U = _unit_rows(batch[vec_col])
    if len(prior):
        P = _unit_rows(prior[vec_col])
        for a in range(0, m, _CHUNK):
            b = min(a + _CHUNK, m)
            S = np.round(U[a:b] @ P.T, _ROUND_DIGITS)
            dup[a:b] |= (S >= tau).any(axis=1)
    for a in range(0, m, _CHUNK):
        b = min(a + _CHUNK, m)
        S = np.round(U[:b] @ U[a:b].T, _ROUND_DIGITS)
        for t in range(a, b):
            if t > 0 and not dup[t]:
                dup[t] = bool((S[:t, t - a] >= tau).any())
    return batch, dup


def prune_cells(
    assigned: DataFrame,
    tau: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, ccos, semantic_dup) from (id, embedding, cell, ccos):
    the batch prune — one applyInPandas per cell over bounded cells."""
    import pandas as pd

    id_type = dict(assigned.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, cell int, ccos double, semantic_dup boolean"

    def prune(pdf: "pd.DataFrame") -> "pd.DataFrame":
        batch, dup = flag_members(pdf, tau, id_col=id_col, vec_col=vec_col)
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "cell": batch["cell"].astype("int32"),
                "ccos": batch["ccos"],
                "semantic_dup": dup,
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        lambda _, pdf: prune(pdf), schema=out_schema
    )
