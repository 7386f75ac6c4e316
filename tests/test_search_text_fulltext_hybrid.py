"""Embedding search, BM25 full-text, and hybrid fusion.

Mirrors reference tests/test_documents/test_documents_search_text.py
(semantic top-1) and the hybrid/fulltext operator semantics
(stub.py:737-826).
"""

from __future__ import annotations

from aiotcvectordb_spark.catalog import IndexField


def make_embedding_collection(engine, db="db_t", coll="embed_coll"):
    if not engine.catalog.database_exists(db):
        engine.create_database(db)
    engine.create_collection(
        db,
        coll,
        indexes=[
            IndexField(name="id", kind="primary_key", field_type="string"),
            IndexField(
                name="vector", kind="vector", field_type="vector",
                metric_type="COSINE", index_type="FLAT", dimension=32,
            ),
            IndexField(name="text", kind="filter", field_type="string"),
        ],
        embedding={"field": "text", "vector_field": "vector", "model": "hash-embed"},
        if_not_exists=True,
    )
    return db, coll


TEXT_DOCS = [
    {"id": "t_spark", "text": "spark dataframe join aggregation shuffle"},
    {"id": "t_fruit", "text": "apple banana cherry orchard harvest"},
    {"id": "t_db", "text": "vector database index search embedding"},
]


def test_text_upsert_embeds_and_search_by_text_ranks(engine):
    db, coll = make_embedding_collection(engine)
    res = engine.upsert(
        db, coll, [{"id": d["id"], "vector": d["text"]} for d in TEXT_DOCS]
    )
    assert res["affectedCount"] == 3
    assert "embeddingExtraInfo" in res and res["embeddingExtraInfo"]["tokenUsed"] > 0
    hits = engine.search_by_text(
        db, coll, ["apple banana orchard"], limit=3, output_fields=["text"]
    )
    assert hits[0][0]["id"] == "t_fruit"


def test_fulltext_bm25_ranks_matching_doc(engine):
    db, coll = make_embedding_collection(engine, coll="ft_coll")
    engine.upsert(
        db, coll,
        [{"id": d["id"], "text": d["text"], "vector": d["text"]} for d in TEXT_DOCS],
    )
    hits = engine.fulltext_search(
        db, coll, "spark join shuffle", text_col="text", limit=3
    )
    assert hits[0]["id"] == "t_spark"
    assert hits[0]["score"] > 0


def test_hybrid_rrf_fuses_legs(engine):
    db, coll = make_embedding_collection(engine, coll="hy_coll")
    engine.upsert(
        db, coll,
        [{"id": d["id"], "text": d["text"], "vector": d["text"]} for d in TEXT_DOCS],
    )
    from aiotcvectordb_spark.functions.embedding import embed_udf

    qv = embed_udf.python_fn(32)("spark dataframe join")
    res = engine.hybrid_search(
        db, coll,
        ann_vectors=[qv],
        match_text="spark join shuffle",
        limit=3,
        text_col="text",
    )
    assert res[0][0]["id"] == "t_spark"


def test_hybrid_weighted(engine):
    db, coll = make_embedding_collection(engine, coll="hyw_coll")
    engine.upsert(
        db, coll,
        [{"id": d["id"], "text": d["text"], "vector": d["text"]} for d in TEXT_DOCS],
    )
    from aiotcvectordb_spark.functions.embedding import embed_udf

    qv = embed_udf.python_fn(32)("vector database search")
    res = engine.hybrid_search(
        db, coll,
        ann_vectors=[qv],
        match_text="vector database index",
        rerank={"type": "weighted", "weights": [0.5, 0.5]},
        limit=3,
        text_col="text",
    )
    assert res[0][0]["id"] == "t_db"
