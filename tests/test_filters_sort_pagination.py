"""Filter / sort / pagination semantics.

Mirrors reference tests/test_documents/test_documents_filters.py and
test_documents_query_sort_pagination.py: filter query returns only
matching docs; filtered update touches all matching rows; filtered
delete with limit=1 removes exactly one; sort ascending; pages disjoint;
projection returns exactly the id column.
"""

from __future__ import annotations

from tests.test_engine_api import DOCS, make_collection


def test_filter_query_matches_only(engine):
    db, coll = make_collection(engine)
    engine.upsert(db, coll, DOCS)
    rows = engine.query(db, coll, filter="tag = 'a'")
    assert len(rows) == 2 and all(r["tag"] == "a" for r in rows)


def test_filtered_update_all_matching(engine):
    db, coll = make_collection(engine)
    engine.upsert(db, coll, DOCS)
    res = engine.update(db, coll, {"page": 100}, filter="tag = 'a'")
    assert res["affectedCount"] == 2
    assert all(
        r["page"] == 100 for r in engine.query(db, coll, filter="tag = 'a'")
    )


def test_filtered_delete_with_limit(engine):
    db, coll = make_collection(engine)
    engine.upsert(db, coll, DOCS)
    res = engine.delete(db, coll, filter="tag = 'b'", limit=1)
    assert res["affectedCount"] == 1
    assert engine.count(db, coll, filter="tag = 'b'") == 1


def test_filter_list_operators(engine):
    db, coll = make_collection(engine)
    engine.upsert(db, coll, DOCS)
    rows = engine.query(db, coll, filter="page in (1, 3)")
    assert {r["id"] for r in rows} == {"v1", "v3"}
    rows = engine.query(db, coll, filter="page not in (1, 3)")
    assert {r["id"] for r in rows} == {"v2", "v4"}


def test_sort_ascending(engine):
    db, coll = make_collection(engine)
    engine.upsert(db, coll, DOCS)
    rows = engine.query(
        db, coll, sort={"fieldName": "page", "direction": "asc"}
    )
    assert [r["page"] for r in rows] == [1, 2, 3, 4]
    rows = engine.query(
        db, coll, sort={"fieldName": "page", "direction": "desc"}
    )
    assert [r["page"] for r in rows] == [4, 3, 2, 1]


def test_pagination_disjoint_pages(engine):
    db, coll = make_collection(engine)
    engine.upsert(db, coll, DOCS)
    p1 = engine.query(
        db, coll, sort={"fieldName": "page", "direction": "asc"},
        limit=2, offset=0,
    )
    p2 = engine.query(
        db, coll, sort={"fieldName": "page", "direction": "asc"},
        limit=2, offset=2,
    )
    ids1 = {r["id"] for r in p1}
    ids2 = {r["id"] for r in p2}
    assert len(p1) == 2 and len(p2) == 2 and not (ids1 & ids2)


def test_projection_only_id(engine):
    db, coll = make_collection(engine)
    engine.upsert(db, coll, DOCS)
    rows = engine.query(db, coll, output_fields=[])
    assert all(list(r.keys()) == ["id"] for r in rows)
