"""AI document pipeline (SURVEY §2.6 ops 35-47): ingest → chunk search →
expand_chunk → docset CRUD → multimodal metadata."""

from __future__ import annotations

from aiotcvectordb_spark.collection_view import CollectionViewManager

LONG_TEXT = (
    "Spark structured streaming handles late data with watermarks. "
    "DataFrames are the declarative API over Catalyst. "
    "Vector search scores embeddings by cosine similarity. "
    "Full text retrieval uses BM25 term weighting over postings. "
    "Hybrid retrieval fuses dense and sparse rankings with RRF. "
) * 4


def make_cv(engine, db="aidb1", cv="docs_cv"):
    if not engine.catalog.database_exists(db):
        engine.create_ai_database(db)
    mgr = CollectionViewManager(engine)
    if not engine.catalog.collection_exists(db, cv):
        mgr.create_collection_view(
            db, cv, splitter_process={"chunk_size": 120, "overlap": 30}
        )
    return mgr, db, cv


def test_ingest_and_get_chunks(engine):
    mgr, db, cv = make_cv(engine)
    res = mgr.load_and_split_text(db, cv, doc_name="doc1.txt", text=LONG_TEXT)
    assert res["indexed_status"] == "Ready"
    assert res["chunk_num"] > 3
    chunks = mgr.get_chunks(db, cv, document_set_name="doc1.txt")
    assert chunks[0]["chunk_pos"] == 0
    assert all(c["end_pos"] > c["start_pos"] for c in chunks)
    # overlap: consecutive chunks share text
    assert chunks[1]["start_pos"] < chunks[0]["end_pos"]
    page = mgr.get_chunks(db, cv, document_set_name="doc1.txt", limit=2, offset=1)
    assert [c["chunk_pos"] for c in page] == [1, 2]


def test_chunk_search_and_expand(engine):
    mgr, db, cv = make_cv(engine, cv="cv_search")
    mgr.load_and_split_text(db, cv, doc_name="a.txt", text=LONG_TEXT)
    hits = mgr.search(db, cv, "vector cosine similarity embeddings", limit=2)
    assert len(hits) == 2
    assert any("cosine" in h["text"] for h in hits)
    expanded = mgr.search(
        db, cv, "vector cosine similarity embeddings", limit=1, expand_chunk=1
    )
    assert len(expanded) >= 2  # hit + neighbors
    assert any(e["is_hit"] for e in expanded)


def test_docset_query_and_delete(engine):
    mgr, db, cv = make_cv(engine, cv="cv_crud")
    mgr.load_and_split_text(db, cv, doc_name="a.txt", text=LONG_TEXT)
    mgr.load_and_split_text(db, cv, doc_name="b.txt", text="short doc " * 30)
    listing = mgr.query(db, cv)
    assert {d["doc_set_name"] for d in listing} == {"a.txt", "b.txt"}
    one = mgr.get_document_set(db, cv, document_set_name="a.txt")
    assert one is not None and one["text"].startswith("Spark")
    assert mgr.delete(db, cv, document_set_names=["a.txt"])["affectedCount"] == 1
    assert {d["doc_set_name"] for d in mgr.query(db, cv)} == {"b.txt"}
    assert mgr.get_chunks(db, cv, document_set_name="a.txt") == []
    info = mgr.describe_collection_view(db, cv)
    assert info["documentSetCount"] == 1
    assert mgr.truncate_collection_view(db, cv)["affectedCount"] == 1


def test_images_metadata(engine):
    mgr, db, cv = make_cv(engine, cv="cv_img")
    mgr.load_and_split_text(db, cv, doc_name="img.pdf", text="doc with figures")
    ds = mgr.get_document_set(db, cv, document_set_name="img.pdf")
    mgr.register_images(
        db, cv,
        [
            {
                "doc_set_id": ds["doc_set_id"], "file_name": "img.pdf",
                "image_url": "store://img1.png", "width": 64, "height": 64,
                "content": b"\x89PNG-fake",
            }
        ],
    )
    urls = mgr.get_image_url(db, cv, document_ids=[ds["doc_set_id"]])
    assert urls == [
        {
            "doc_set_id": ds["doc_set_id"], "file_name": "img.pdf",
            "image_url": "store://img1.png",
        }
    ]


def test_docset_update_and_alias(engine):
    import pytest

    from aiotcvectordb_spark.errors import ParamError

    mgr, db, cv = make_cv(engine, cv="upd_cv")
    mgr.load_and_split_text(db, cv, doc_name="u1.txt", text=LONG_TEXT)
    mgr.load_and_split_text(db, cv, doc_name="u2.txt", text=LONG_TEXT)

    out = mgr.update(
        db, cv, document_set_names=["u1.txt"],
        values={"indexed_status": "Expired", "meta_json": "{'k': 1}"},
    )
    assert out["affectedCount"] == 1
    d1 = mgr.get_document_set(db, cv, document_set_name="u1.txt")
    d2 = mgr.get_document_set(db, cv, document_set_name="u2.txt")
    assert d1["indexed_status"] == "Expired"
    assert d2["indexed_status"] == "Ready"

    with pytest.raises(ParamError):
        mgr.update(db, cv, document_set_names=["u1.txt"], values={})
    with pytest.raises(ParamError):
        mgr.update(db, cv, values={"indexed_status": "x"})
    with pytest.raises(ParamError):
        mgr.update(db, cv, filter="true", values={"doc_set_id": "nope"})

    # alias indirection resolves to the same CV in the catalog
    mgr.set_alias(db, cv, "cv_alias")
    meta = engine.catalog.get_collection(db, "cv_alias")
    assert meta.name == cv
    assert mgr.delete_alias(db, "cv_alias")["affectedCount"] == 1


def test_ai_object_handles(engine):
    """aidb = engine.ai_database(x); cv = aidb.collection_view(y);
    cv.search(...) — the reference's AI-side object pattern."""
    import pytest as _pytest

    from aiotcvectordb_spark.errors import DatabaseNotExistError

    _, db, cv_name = make_cv(engine)
    aidb = engine.ai_database(db)
    assert cv_name in aidb.list_collection_views()
    cv = aidb.collection_view(cv_name)
    cv.load_and_split_text(doc_name="obj.txt", text=LONG_TEXT)
    chunks = cv.get_chunks(document_set_name="obj.txt")
    assert chunks
    hits = cv.search(LONG_TEXT.split(".")[0], limit=2)
    assert hits
    with _pytest.raises(DatabaseNotExistError):
        engine.ai_database("nope")
    with _pytest.raises(Exception):
        aidb.collection_view("nope")


def test_append_keywords_to_chunk(engine):
    """r6: SplitterProcess.appendKeywordsToChunk — deterministic top-k
    keywords prepended to every chunk (after the title line when both
    are on), positions still addressing the body text."""
    from aiotcvectordb_spark.collection_view import CollectionViewManager

    engine.create_ai_database("ai_kw")
    mgr = CollectionViewManager(engine)
    mgr.create_collection_view(
        "ai_kw",
        "cv_kw",
        splitter_process={
            "chunk_size": 40,
            "overlap": 5,
            "append_keywords_to_chunk": True,
        },
        parsing_process={"parsing_type": "AlgorithmParsing"},
    )
    body = "revenue revenue margin margin margin growth outlook " * 4
    res = mgr.load_and_split_text(
        "ai_kw", "cv_kw", doc_name="kpi.txt", text=body
    )
    chunks = mgr.get_chunks(
        "ai_kw", "cv_kw", document_set_id=res["doc_set_id"]
    )
    assert chunks
    for c in chunks:
        first_line = c["text"].split("\n")[0]
        assert first_line.startswith("margin, revenue") or "margin" in first_line
