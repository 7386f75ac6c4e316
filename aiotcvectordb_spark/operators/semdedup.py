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


# ---------------------------------------------------------------------------
# Spark-plan-exact kernels (r13): the ORACLED fixed-cell lanes
# (semantic_dedup / incremental_semantic_dedup, and curate_corpus_v2
# which composes them) replace their in-cell self-joins with these.
# Unlike flag_members above (the trained/streaming lane: unit-row
# matmul + np.round), these reproduce the SQL plan's pair decision
# BIT-FOR-BIT: score = round(seq_dot(a, b) / (nrm_a * nrm_b), 6) with
# Spark round semantics (HALF_UP on the double's shortest decimal
# repr), where seq_dot is the left-associated fold the unrolled codegen
# expression evaluates and nrm is the assignment projection's own norm
# column. Fast path = one GEMM per chunk; any pair whose scaled score
# lands within 1e-6 of a rounding tie (covers both the ~1e-14
# GEMM-vs-sequential drift band and the float-vs-decimal-string gap) is
# recomputed with the exact sequential fold + Decimal(repr) HALF_UP —
# so no pair's flag can differ from the join plan it replaces.

_Q6 = None  # lazy Decimal quantum (Decimal import deferred)


def _seq_dot_py(a, b) -> float:
    """The left-associated sequential dot the unrolled SQL spells."""
    acc = 0.0
    for i in range(len(a)):
        acc = acc + float(a[i]) * float(b[i])
    return acc


def _spark_round6(x: float) -> float:
    """Spark round(x, 6): HALF_UP on the double's shortest decimal
    repr (BigDecimal.valueOf semantics; Python repr is the same
    shortest round-trip string)."""
    global _Q6
    from decimal import ROUND_HALF_UP, Decimal

    if _Q6 is None:
        _Q6 = Decimal("0.000001")
    return float(Decimal(repr(x)).quantize(_Q6, rounding=ROUND_HALF_UP))


def pair_reaches_exact(
    Xa: np.ndarray,
    Xb: np.ndarray,
    na: np.ndarray,
    nb: np.ndarray,
    tau: float,
) -> np.ndarray:
    """(len(a), len(b)) bool: round6(cos(a, b)) >= tau, Spark-exact
    (cos = seq_dot / (nrm_a * nrm_b); zero denominator -> 0.0, the
    NULLIF/COALESCE contract)."""
    S = Xa @ Xb.T
    den = na[:, None] * nb[None, :]
    C = np.divide(S, den, out=np.zeros_like(S), where=den != 0.0)
    y = np.abs(C) * 1e6
    r = np.copysign(np.floor(y + 0.5) / 1e6, C)
    near = np.abs(y - np.floor(y) - 0.5) < 1e-6
    if near.any():
        ia, ib = np.nonzero(near)
        for a_i, b_i in zip(ia.tolist(), ib.tolist()):
            d = den[a_i, b_i]
            c = 0.0 if d == 0.0 else _seq_dot_py(Xa[a_i], Xb[b_i]) / d
            r[a_i, b_i] = _spark_round6(c)
    return r >= tau


def flag_members_exact(
    pdf,
    tau: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Spark-plan-exact twin of :func:`flag_members` for the oracled
    fixed-cell lanes: same keep order (ccos ASC, id ASC) and the same
    prior semantics (prior=True rows dominate every batch row they
    reach, regardless of order), but pair scores are the SQL plan's
    bit-for-bit (see module section comment). Expects the assignment
    projection's ``ccos`` and ``nrm`` columns in ``pdf``."""
    has_prior = "prior" in pdf.columns
    prior = pdf[pdf["prior"]] if has_prior else pdf.iloc[0:0]
    batch = (pdf[~pdf["prior"]] if has_prior else pdf).sort_values(
        ["ccos", id_col]
    ).reset_index(drop=True)
    m = len(batch)
    dup = np.zeros(m, dtype=bool)
    if m == 0:
        return batch, dup
    X = np.asarray(list(batch[vec_col]), dtype=np.float64)
    nb = batch["nrm"].to_numpy(dtype=np.float64)
    if len(prior):
        P = np.asarray(list(prior[vec_col]), dtype=np.float64)
        pn = prior["nrm"].to_numpy(dtype=np.float64)
        for a in range(0, m, _CHUNK):
            b = min(a + _CHUNK, m)
            R = pair_reaches_exact(X[a:b], P, nb[a:b], pn, tau)
            dup[a:b] |= R.any(axis=1)
    for a in range(0, m, _CHUNK):
        b = min(a + _CHUNK, m)
        R = pair_reaches_exact(X[:b], X[a:b], nb[:b], nb[a:b], tau)
        for t in range(a, b):
            if t > 0 and not dup[t]:
                dup[t] = bool(R[:t, t - a].any())
    return batch, dup


def prune_cells_exact(
    assigned: DataFrame,
    tau: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, ccos, semantic_dup) from the assignment projection
    (id, embedding, cell, ccos, nrm[, prior]) — ONE applyInPandas per
    cell instead of the celled self-join + DISTINCT + flag join-back.
    With a ``prior`` column only non-prior rows are returned (the
    incremental lane's contract). Same sum(cell^2) pair work, done as
    chunked BLAS inside the task instead of codegen pair rows through
    two extra exchanges."""
    import pandas as pd

    id_type = dict(assigned.dtypes)[id_col]
    out_schema = (
        f"{id_col} {id_type}, cell int, ccos double, semantic_dup boolean"
    )

    def prune(pdf: "pd.DataFrame") -> "pd.DataFrame":
        batch, dup = flag_members_exact(
            pdf, tau, id_col=id_col, vec_col=vec_col
        )
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
