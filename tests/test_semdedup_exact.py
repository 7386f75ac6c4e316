"""The Spark-plan-exact per-cell SemDeDup kernel (r13).

``prune_cells_exact`` replaces the oracled queries' in-cell self-join:
its pair decision must be bit-for-bit the SQL plan's —
round(seq_dot(a,b)/(nrm_a*nrm_b), 6) >= tau with Spark round semantics
(HALF_UP on the double's shortest decimal repr). These tests pin the
kernel against a scalar reference that spells exactly that arithmetic.
"""
from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pytest

from aiotcvectordb_spark.operators.semdedup import (
    _spark_round6,
    flag_members_exact,
    pair_reaches_exact,
)


def _seq_dot(a, b):
    acc = 0.0
    for i in range(len(a)):
        acc = acc + float(a[i]) * float(b[i])
    return acc


def _ref_round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP))


def test_pair_reaches_matches_scalar_reference():
    rng = np.random.RandomState(5)
    X = rng.randn(220, 64).astype(np.float32).astype(np.float64)
    nrm = np.array([np.sqrt(_seq_dot(x, x)) for x in X])
    R = pair_reaches_exact(X, X, nrm, nrm, 0.45)
    for a in range(0, 220, 7):
        for b in range(0, 220, 3):
            d = nrm[a] * nrm[b]
            c = 0.0 if d == 0.0 else _seq_dot(X[a], X[b]) / d
            assert R[a, b] == (_ref_round6(c) >= 0.45), (a, b, c)


def test_round6_ties_and_signs():
    assert _spark_round6(0.4499995) == 0.45
    assert _spark_round6(0.4499994999) == 0.449999
    assert _spark_round6(-0.4499995) == -0.45
    assert _spark_round6(0.45000049999) == 0.45
    assert _spark_round6(0.0) == 0.0


def test_pair_reaches_zero_norm_is_zero_cosine():
    X = np.zeros((2, 64))
    X[1, 0] = 1.0
    nrm = np.array([0.0, 1.0])
    R = pair_reaches_exact(X, X, nrm, nrm, 0.45)
    assert not R[0, 0] and not R[0, 1] and not R[1, 0]
    assert R[1, 1]  # cos(x, x) = 1 >= tau


def test_flag_members_exact_domination_semantics():
    import pandas as pd

    rng = np.random.RandomState(9)
    m = 160
    X = rng.randn(m, 8).astype(np.float32)
    # force near-dup clusters so flags are nontrivial
    for j in range(0, m, 4):
        X[j + 1] = X[j] + rng.randn(8).astype(np.float32) * 0.01
    Xd = X.astype(np.float64)
    nrm = np.array([np.sqrt(_seq_dot(x, x)) for x in Xd])
    ccos = np.round(rng.rand(m), 6)
    pdf = pd.DataFrame({
        "vec_id": np.arange(m, dtype=np.int64),
        "embedding": list(X),
        "ccos": ccos,
        "nrm": nrm,
    })
    tau = 0.9
    batch, dup = flag_members_exact(pdf, tau, id_col="vec_id",
                                    vec_col="embedding")
    # scalar reference: keep order (ccos ASC, id ASC); dup iff ANY
    # earlier member reaches tau
    order = sorted(range(m), key=lambda i: (ccos[i], i))
    ref = {}
    for t, i in enumerate(order):
        hit = False
        for j in order[:t]:
            d = nrm[i] * nrm[j]
            c = 0.0 if d == 0.0 else _seq_dot(Xd[i], Xd[j]) / d
            if _ref_round6(c) >= tau:
                hit = True
                break
        ref[i] = hit
    got = dict(zip(batch["vec_id"].tolist(), dup.tolist()))
    assert got == ref
    assert any(dup), "fixture should contain at least one dup"


def test_flag_members_exact_prior_dominates_unordered():
    import pandas as pd

    rng = np.random.RandomState(2)
    m = 40
    X = rng.randn(m, 8).astype(np.float32)
    X[5] = X[30] * np.float32(1.001)  # batch 30 ~ prior 5
    Xd = X.astype(np.float64)
    nrm = np.array([np.sqrt(_seq_dot(x, x)) for x in Xd])
    pdf = pd.DataFrame({
        "vec_id": np.arange(m, dtype=np.int64),
        "embedding": list(X),
        "ccos": np.round(rng.rand(m), 6),
        "nrm": nrm,
        "prior": [i < 20 for i in range(m)],
    })
    batch, dup = flag_members_exact(pdf, 0.99, id_col="vec_id",
                                    vec_col="embedding")
    got = dict(zip(batch["vec_id"].tolist(), dup.tolist()))
    assert set(got) == set(range(20, 40))  # batch rows only
    assert got[30], "standing member must dominate its batch near-dup"


@pytest.mark.parametrize("seed", [1, 2])
def test_flag_members_exact_empty_and_single(seed):
    import pandas as pd

    rng = np.random.RandomState(seed)
    one = pd.DataFrame({
        "vec_id": np.array([7], dtype=np.int64),
        "embedding": [rng.randn(8).astype(np.float32)],
        "ccos": [0.5],
        "nrm": [1.0],
    })
    batch, dup = flag_members_exact(one, 0.5, id_col="vec_id",
                                    vec_col="embedding")
    assert len(batch) == 1 and not dup[0]
