"""Adversarial-corpus oracle parity for the vector-search family.

The driver corpus's embeddings are well-behaved random vectors; a
100 TB embedding column will also contain zero vectors (failed
upstream encodes), exact duplicates, near-duplicates of the query,
huge- and tiny-magnitude vectors, and all-negative vectors. Cosine
divides by the norm, so the zero vector is the interesting row: both
engines must agree on what it scores (or that it never surfaces in
the top-k). This sweep runs every embeddings-based oracled query on
such a table and compares with the driver's rule.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aiotcvectordb_spark import queries as Q

DIM = 64

QUERY_NAMES = [
    "search_flat_cosine",
    "search_flat_ip",
    "search_flat_l2",
    "search_flat_cosine_local_topk",
    "search_radius",
    "search_udtf_topk",
    "search_binary_hamming",
    "search_by_id",
    "knn_join",
    "label_centroids",
    "embedding_outliers",
    "embedding_near_dup",
    "ann_ivf_fullprobe",
    "ann_pq_fullrescore",
    # r8 promotions/additions: the hash-embedder search and SemDeDup
    # are oracled — run them against the nasty vectors cross-engine
    "search_by_text",
    "semantic_dedup",
    # r9 promotion: BQ's sign-pack → Hamming → exact-rescore plan is
    # fully closed-form; zero/huge/tiny vectors exercise the sign
    # boundary (x > 0) and the guarded cosine in both engines
    "ann_bq_cosine",
    # r9 promotion: SQ8's min/max grid — zero vectors hit the
    # dequantized-norm greatest() guard, constant dims hit span<=0
    "ann_sq8_cosine",
    # r9 promotion: the greedy MMR loop replayed as a recursive CTE —
    # duplicates/zero vectors force max-sim ties through every step
    "mmr_rerank",
    # r9: grouped search — duplicate scores force the struct-min's
    # (score, id) tie rule; zero vectors the guarded cosine
    "search_grouped",
]


def _vec(kind: str, i: int) -> list[float]:
    if kind == "zero":
        return [0.0] * DIM
    if kind == "huge":
        return [1e18 if j % 2 == 0 else -1e18 for j in range(DIM)]
    if kind == "tiny":
        return [1e-18 * ((j % 5) - 2) for j in range(DIM)]
    if kind == "negative":
        return [-abs(round(math.sin(0.1 * j + i), 6)) for j in range(DIM)]
    if kind == "axis":
        v = [0.0] * DIM
        v[i % DIM] = 1.0
        return v
    if kind == "qlike":  # nearly the qvec(1.0) query vector
        return [round(math.sin(0.1 * j + 1.0), 6) for j in range(DIM)]
    # generic deterministic vector
    return [round(math.sin(0.1 * j + 0.01 * i), 6) for j in range(DIM)]


@pytest.fixture(scope="module")
def nasty_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("nasty_emb_sf")
    kinds = (
        ["zero", "huge", "tiny", "negative", "qlike", "qlike"]
        + ["axis"] * 6
        + ["gen"] * 108
    )
    vecs = [_vec(k, i) for i, k in enumerate(kinds)]
    # exact duplicates of a generic vector (near-dup groups)
    vecs += [vecs[20][:] for _ in range(4)]
    n = len(vecs)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([i % 10 for i in range(n)], pa.int32()),
        }
    )
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    import shutil

    for t in ("documents", "events", "orders", "customer", "nation",
              "region", "supplier", "part", "lineitem"):
        src = f"/root/testdata/sf0.001/{t}.parquet"
        if os.path.exists(src):
            shutil.copyfile(src, str(d / f"{t}.parquet"))
    return str(d)


def _norm_hash(df) -> str:
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        if str(d[c].dtype) in ("float64", "float32"):
            d[c] = d[c].astype("float64").round(9)
    rows = sorted(
        tuple(str(v) for v in row)
        for row in d.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_vector_query_matches_oracle_on_nasty_table(spark, nasty_sf, name):
    sdf = Q.QUERIES[name](spark, nasty_sf).toPandas()

    con = duckdb.connect()
    for t in ("embeddings", "documents", "events", "orders", "customer",
              "nation", "region", "supplier", "part", "lineitem"):
        p = f"{nasty_sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    odf = con.sql(Q.ORACLES[name]).df()

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} != {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), (
        f"{name}: rows spark={len(sdf)} oracle={len(odf)}"
    )
    if _norm_hash(sdf) != _norm_hash(odf):
        s_rows = sorted(
            tuple(str(v) for v in r)
            for r in sdf[sorted(sdf.columns)].itertuples(index=False, name=None)
        )
        o_rows = sorted(
            tuple(str(v) for v in r)
            for r in odf[sorted(odf.columns)].itertuples(index=False, name=None)
        )
        diff = next(
            (i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b),
            min(len(s_rows), len(o_rows)) - 1,
        )
        pytest.fail(
            f"{name}: value hash mismatch; first differing sorted row "
            f"#{diff}:\n  spark : {s_rows[diff]}\n  oracle: {o_rows[diff]}"
        )


ROWS_ONLY = [
    "ann_bq_cosine",
    "ann_ivf_cosine",
    "ann_lsh_l2",
    "ann_pq_cosine",
    "embedding_near_dup_auto",
    "embedding_near_dup_ivf",
    "embedding_pca",
    "mmr_rerank",
    "semantic_dedup_auto",
]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_vector_query_survives_nasty_table(spark, nasty_sf, name):
    """No oracle to compare, but the approximate/model operators must
    not ABORT on zero vectors, 1e18 magnitudes, or duplicates — the
    failure mode the oracled sweep caught in every cosine path."""
    sdf = Q.QUERIES[name](spark, nasty_sf).toPandas()
    assert len(sdf) >= 0
    for col in sdf.columns:
        if str(sdf[col].dtype) in ("float64", "float32"):
            import numpy as np

            assert not np.isnan(sdf[col].to_numpy()).any(), (
                f"{name}: NaN leaked into {col}"
            )


@pytest.fixture(scope="module")
def constdim_sf(tmp_path_factory):
    """A corpus where dims 0-31 are CONSTANT across every vector (dim 0
    = 0.0, dims 1-31 = 7.25) and dims 32-63 vary — pins SQ8's span<=0
    branch (constant dims dequantize to lo exactly, in both engines)
    on a table where HALF the grid is degenerate."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("constdim_emb_sf")
    vecs = []
    for i in range(64):
        v = [0.0] + [7.25] * 31 + [
            round(math.sin(0.1 * j + 0.05 * i), 6) for j in range(32)
        ]
        vecs.append(v)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([i % 5 for i in range(len(vecs))], pa.int32()),
        }
    )
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def test_sq8_constant_dims_cross_engine(spark, constdim_sf):
    """ann_sq8_cosine must hash-match DuckDB when half the grid has
    span = 0 — the span<=0 guard must fire identically in the Spark
    literal expression and the SQL CASE."""
    import duckdb

    sdf = Q.QUERIES["ann_sq8_cosine"](spark, constdim_sf).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{constdim_sf}/embeddings.parquet'"
    )
    odf = con.sql(Q.ORACLES["ann_sq8_cosine"]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf) > 0
    assert _norm_hash(sdf) == _norm_hash(odf)
