"""Vector search semantics.

Mirrors reference tests/test_documents/test_documents_search.py:
search_by_id top-1 is the doc itself with score 1.0 (COSINE); batch
search returns one hit-list per query; filtered search respects the
filter and trims fields.
"""

from __future__ import annotations

import pytest

from tests.test_engine_api import DOCS, make_collection


def test_search_by_id_top1_is_self(engine):
    db, coll = make_collection(engine)
    engine.upsert(db, coll, DOCS)
    res = engine.search_by_id(db, coll, ["v1"], limit=3)
    assert res[0][0]["id"] == "v1"
    assert res[0][0]["score"] == pytest.approx(1.0)


def test_batch_search_shape(engine):
    db, coll = make_collection(engine)
    engine.upsert(db, coll, DOCS)
    res = engine.search(
        db, coll, [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], limit=2
    )
    assert len(res) == 2
    assert all(len(hits) == 2 for hits in res)
    assert res[0][0]["id"] == "v1"
    assert res[1][0]["id"] == "v3"


def test_filtered_search_and_projection(engine):
    db, coll = make_collection(engine)
    engine.upsert(db, coll, DOCS)
    res = engine.search(
        db, coll, [[1.0, 0.0, 0.0]], limit=4,
        filter="tag = 'b'", output_fields=["tag"],
    )
    hits = res[0]
    assert {h["id"] for h in hits} <= {"v3", "v4"}
    assert all(h["tag"] == "b" for h in hits)
    assert all("page" not in h for h in hits)
    assert all("vector" not in h for h in hits)


def test_radius_threshold(engine):
    db, coll = make_collection(engine)
    engine.upsert(db, coll, DOCS)
    res = engine.search(db, coll, [[1.0, 0.0, 0.0]], limit=4, radius=0.5)
    assert all(h["score"] >= 0.5 for h in res[0])
    assert {h["id"] for h in res[0]} == {"v1", "v2"}


def test_l2_metric_orders_ascending(engine):
    db, coll = make_collection(engine)
    engine.upsert(db, coll, DOCS)
    res = engine.search(db, coll, [[1.0, 0.0, 0.0]], limit=4, metric="L2")
    scores = [h["score"] for h in res[0]]
    assert scores == sorted(scores)
    assert res[0][0]["id"] == "v1" and res[0][0]["score"] == pytest.approx(0.0)


def test_search_accepts_ndarray(engine, spark, sf_dir):
    """Reference stub.py:602: query vectors may be a numpy ndarray."""
    import numpy as np

    from aiotcvectordb_spark.catalog import IndexField

    engine.create_database("db_nd")
    engine.create_collection(
        "db_nd", "emb",
        indexes=[
            IndexField(name="vec_id", kind="primary_key", field_type="uint64"),
            IndexField(
                name="embedding", kind="vector", field_type="vector",
                metric_type="COSINE", index_type="FLAT", dimension=64,
            ),
        ],
    )
    engine.store.write(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), "db_nd", "emb"
    )
    q = np.sin(np.arange(64, dtype=np.float64) * 0.1 + 1.0)
    via_nd = engine.search("db_nd", "emb", np.stack([q]), limit=5, round_digits=6)
    via_list = engine.search("db_nd", "emb", [q.tolist()], limit=5, round_digits=6)
    assert [h["vec_id"] for h in via_nd[0]] == [h["vec_id"] for h in via_list[0]]
