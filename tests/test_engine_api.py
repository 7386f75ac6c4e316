"""Document CRUD round-trips through the engine API.

Mirrors the reference's end-to-end assertions
(reference: tests/test_documents/test_documents_api.py — upsert /
query-by-ids / update-by-ids / delete-by-ids round-trips on
affectedCount and field values).
"""

from __future__ import annotations

import pytest

from aiotcvectordb_spark.catalog import IndexField
from aiotcvectordb_spark.errors import ParamError


def make_collection(engine, name="coll0", db="db0"):
    engine.create_database_if_not_exists(db) if hasattr(
        engine, "create_database_if_not_exists"
    ) else None
    if not engine.catalog.database_exists(db):
        engine.create_database(db)
    engine.create_collection(
        db,
        name,
        indexes=[
            IndexField(name="id", kind="primary_key", field_type="string"),
            IndexField(
                name="vector", kind="vector", field_type="vector",
                metric_type="COSINE", index_type="FLAT", dimension=3,
            ),
            IndexField(name="tag", kind="filter", field_type="string"),
            IndexField(name="page", kind="filter", field_type="uint64"),
        ],
        if_not_exists=True,
    )
    return db, name


DOCS = [
    {"id": "v1", "vector": [1.0, 0.0, 0.0], "tag": "a", "page": 1},
    {"id": "v2", "vector": [0.9, 0.1, 0.0], "tag": "a", "page": 2},
    {"id": "v3", "vector": [0.0, 1.0, 0.0], "tag": "b", "page": 3},
    {"id": "v4", "vector": [0.0, 0.0, 1.0], "tag": "b", "page": 4},
]


def test_upsert_and_query_by_ids(engine):
    db, coll = make_collection(engine)
    res = engine.upsert(db, coll, DOCS)
    assert res["affectedCount"] == 4
    rows = engine.query(db, coll, document_ids=["v1", "v3"])
    assert {r["id"] for r in rows} == {"v1", "v3"}
    assert all("vector" not in r for r in rows)  # retrieve_vector defaults off
    rows = engine.query(db, coll, document_ids=["v1"], retrieve_vector=True)
    assert rows[0]["vector"] == [1.0, 0.0, 0.0]


def test_upsert_replaces_by_id(engine):
    db, coll = make_collection(engine)
    engine.upsert(db, coll, DOCS)
    engine.upsert(db, coll, [{"id": "v1", "vector": [0.5, 0.5, 0.0], "tag": "z", "page": 9}])
    assert engine.count(db, coll) == 4
    row = engine.query(db, coll, document_ids=["v1"])[0]
    assert row["tag"] == "z" and row["page"] == 9


def test_update_by_ids(engine):
    db, coll = make_collection(engine)
    engine.upsert(db, coll, DOCS)
    res = engine.update(db, coll, {"page": 100}, document_ids=["v1", "v2"])
    assert res["affectedCount"] == 2
    rows = engine.query(db, coll, document_ids=["v1", "v2"])
    assert all(r["page"] == 100 for r in rows)
    other = engine.query(db, coll, document_ids=["v3"])[0]
    assert other["page"] == 3


def test_delete_by_ids(engine):
    db, coll = make_collection(engine)
    engine.upsert(db, coll, DOCS)
    res = engine.delete(db, coll, document_ids=["v2", "v4"])
    assert res["affectedCount"] == 2
    assert engine.count(db, coll) == 2
    assert {r["id"] for r in engine.query(db, coll)} == {"v1", "v3"}


def test_upsert_batch_cap(engine):
    db, coll = make_collection(engine)
    with pytest.raises(ParamError):
        engine.upsert(
            db, coll,
            [{"id": f"x{i}", "vector": [0.0, 0.0, 1.0]} for i in range(1001)],
        )


def test_update_requires_predicate(engine):
    db, coll = make_collection(engine)
    engine.upsert(db, coll, DOCS)
    with pytest.raises(ParamError):
        engine.update(db, coll, {"page": 1})


def test_add_index_build_existed_data_clusters(engine, spark):
    """build_existed_data=True rewrites the collection clustered on the
    new field: each output file covers a narrow value range, so parquet
    row-group stats prune for predicates on it."""
    from aiotcvectordb_spark.catalog import IndexField

    db, coll = make_collection(engine)
    engine.upsert(
        db, coll,
        [{"id": f"d{i}", "vector": [float(i % 7), 0.0, 1.0],
          "tag": "ab"[i % 2], "page": (i * 37) % 1000} for i in range(500)],
    )
    engine.add_index(
        db, coll,
        [IndexField(name="page", kind="filter", field_type="uint64")],
        build_existed_data=True,
    )
    # correctness preserved
    assert engine.count(db, coll) == 500
    got = engine.query(db, coll, filter="page < 100", limit=1000)
    assert all(d["page"] < 100 for d in got)
    # clustered: parquet files have disjoint-ish page ranges
    import glob as _glob

    import pyarrow.parquet as pq

    path = engine.store.data_path(db, coll)
    ranges = []
    for f in _glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["page"]
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        ranges.append((lo, hi))
    ranges.sort()
    overlaps = sum(
        1 for (a, b), (c, d) in zip(ranges, ranges[1:]) if c < b
    )
    assert overlaps == 0, f"files overlap after clustering: {ranges}"


def test_engine_sql_over_collections(engine):
    db, coll = make_collection(engine)
    engine.upsert(
        db, coll,
        [{"id": "a", "vector": [1.0, 0.0, 0.0], "tag": "x", "page": 1},
         {"id": "b", "vector": [0.0, 1.0, 0.0], "tag": "y", "page": 2},
         {"id": "c", "vector": [0.0, 0.0, 1.0], "tag": "x", "page": 3}],
    )
    engine.set_alias(db, coll, "cview")
    rows = engine.sql(
        db,
        f"SELECT tag, count(*) AS n, sum(page) AS p FROM {coll} GROUP BY tag ORDER BY tag",
    ).collect()
    assert [(r.tag, r.n, r.p) for r in rows] == [("x", 2, 4), ("y", 1, 2)]
    via_alias = engine.sql(db, "SELECT count(*) AS n FROM cview").first().n
    assert via_alias == 3


def test_compact_reduces_files(engine, spark):
    import glob as _glob

    db, coll = make_collection(engine, name="compact_coll")
    # 20 tiny upserts -> many small files
    for i in range(20):
        engine.upsert(
            db, coll,
            [{"id": f"r{i}", "vector": [1.0, 0.0, 0.0], "tag": "t", "page": i}],
        )
    before = len(_glob.glob(f"{engine.store.data_path(db, coll)}/*.parquet"))
    engine.compact(db, coll, target_files=2)
    after = len(_glob.glob(f"{engine.store.data_path(db, coll)}/*.parquet"))
    assert after <= 2 < before or before <= 2
    assert engine.count(db, coll) == 20


def test_time_travel_read(engine):
    """Each write retains one back-version; version= reads the prior
    snapshot, and GC'd versions raise."""
    db, coll = make_collection(engine, name="tt_coll")
    engine.upsert(db, coll, [{"id": "a", "vector": [0.1, 0.2, 0.3], "tag": "x", "page": 1}])
    v0 = engine.store.current_version(db, coll)
    engine.upsert(db, coll, [{"id": "b", "vector": [0.4, 0.5, 0.6], "tag": "y", "page": 2}])
    assert engine.read(db, coll).count() == 2
    old = engine.read(db, coll, version=v0)
    assert [r.id for r in old.collect()] == ["a"]
    # a third write GC's v0
    engine.upsert(db, coll, [{"id": "c", "vector": [0.7, 0.8, 0.9], "tag": "z", "page": 3}])
    versions = engine.store.list_versions(db, coll)
    assert len(versions) == 2 and v0 not in versions
    with pytest.raises(FileNotFoundError):
        engine.read(db, coll, version=v0)


def test_sql_vector_functions(engine):
    """cosine_sim/dot_product/l2_distance as SQL scalar functions:
    a pure-SQL top-k vector search matches engine.search exactly."""
    db, coll = make_collection(engine, name="sqlfn_coll")
    engine.upsert(
        db, coll,
        [
            {"id": f"d{i}", "vector": [0.1 * i, 0.5, 1.0 - 0.05 * i],
             "tag": "a", "page": i}
            for i in range(20)
        ],
    )
    q = [0.3, 0.5, 0.8]
    qlit = f"array({q[0]}D, {q[1]}D, {q[2]}D)"
    rows = engine.sql(
        db,
        f"""
        SELECT id, round(cosine_sim(vector, {qlit}), 6) AS score
        FROM {coll} ORDER BY score DESC, id LIMIT 5
        """,
    ).collect()
    hits = engine.search(db, coll, [q], limit=5, round_digits=6)[0]
    assert [r.id for r in rows] == [h["id"] for h in hits]
    assert [float(r.score) for r in rows] == [h["score"] for h in hits]
    one = engine.sql(
        db,
        f"SELECT round(l2_distance({qlit}, {qlit}), 6) AS d, "
        f"round(dot_product({qlit}, {qlit}), 6) AS p",
    ).first()
    assert one.d == 0.0 and abs(one.p - sum(x * x for x in q)) < 1e-6


def test_sql_topk_table_function(engine):
    """The topk_by_score UDTF is on the engine.sql surface: the emitted
    two-phase table-function SQL matches engine.search ranking."""
    from aiotcvectordb_spark.functions.topk_udtf import knn_topk_sql

    db, coll = make_collection(engine, name="udtf_coll")
    engine.upsert(
        db, coll,
        [
            {"id": f"d{i:02d}", "vector": [0.1 * i, 0.5, 1.0 - 0.05 * i],
             "tag": "a", "page": i}
            for i in range(20)
        ],
    )
    q = [0.3, 0.5, 0.8]
    rows = engine.sql(
        db,
        knn_topk_sql(coll, q, vector_col="vector", id_col="id",
                     metric="COSINE", k=5, parts=4),
    ).collect()
    hits = engine.search(db, coll, [q], limit=5)[0]
    assert [r.id for r in rows] == [h["id"] for h in hits]


def test_object_handles_mirror_reference_usage(engine):
    """db = engine.database(x); coll = db.collection(y); coll.search(...)
    — the reference's object-oriented pattern over the flat engine."""
    import pytest as _pytest

    from aiotcvectordb_spark.errors import (
        CollectionNotExistError,
        DatabaseNotExistError,
    )

    db_name, coll_name = make_collection(engine, name="obj_coll")
    db = engine.database(db_name)
    assert coll_name in db.list_collections()
    coll = db.collection(coll_name)
    coll.upsert([
        {"id": "a", "vector": [1.0, 0.0, 0.0], "tag": "x", "page": 1},
        {"id": "b", "vector": [0.0, 1.0, 0.0], "tag": "y", "page": 2},
    ])
    assert coll.count() == 2
    hits = coll.search([[1.0, 0.0, 0.0]], limit=1)[0]
    assert hits[0]["id"] == "a"
    assert engine.collection(db_name, coll_name).count() == 2
    with _pytest.raises(DatabaseNotExistError):
        engine.database("nope")
    with _pytest.raises(CollectionNotExistError):
        db.collection("nope")
    with _pytest.raises(AttributeError):
        coll.create_database  # not a collection-scoped op


def test_read_consistency_accepted_everywhere(spark, tmp_path):
    """Reference-style calls carry read_consistency at construction and
    per read call (reference stub.py:29, collection.py:658,681); the
    engine accepts it as a validated no-op on every surface."""
    import pytest as _pytest

    from aiotcvectordb_spark.engine import VectorDBEngine
    from aiotcvectordb_spark.errors import ParamError
    from aiotcvectordb_spark.params import ReadConsistency

    engine = VectorDBEngine(
        spark,
        str(tmp_path / "vdb_rc"),
        read_consistency=ReadConsistency.EVENTUAL_CONSISTENCY,
        timeout=10,  # transport kwargs from the reference ctor are ignored
    )
    assert engine.read_consistency is ReadConsistency.EVENTUAL_CONSISTENCY
    db, coll = make_collection(engine, name="rc_coll", db="rc_db")
    engine.upsert(db, coll, DOCS)

    rc = ReadConsistency.STRONG_CONSISTENCY
    assert len(engine.query(db, coll, limit=10, read_consistency=rc)) == len(DOCS)
    assert engine.count(db, coll, read_consistency=rc) == len(DOCS)
    hits = engine.search(db, coll, [[1.0, 0.0, 0.0]], limit=2, read_consistency=rc)
    assert hits[0][0]["id"] == "v1"
    byid = engine.search_by_id(db, coll, ["v1"], limit=1, read_consistency=rc)
    assert byid[0][0]["id"] == "v1"
    # string forms (enum name and wire value) both validate
    engine.query(db, coll, limit=1, read_consistency="STRONG_CONSISTENCY")
    engine.query(db, coll, limit=1, read_consistency="eventualConsistency")
    # object handles take it like the reference Database/Collection do
    h = engine.database(db)
    coll_h = h.collection(coll)
    assert coll_h.count(read_consistency=rc) == len(DOCS)
    with _pytest.raises(ParamError):
        engine.query(db, coll, limit=1, read_consistency="bogus")
    with _pytest.raises(ParamError):
        VectorDBEngine(spark, str(tmp_path / "vdb_rc2"), read_consistency=42)


def test_profile_collection(engine):
    db, coll = make_collection(engine, name="prof_coll")
    engine.upsert(
        db, coll,
        [{"id": f"r{i}", "vector": [1.0, 0.0, 0.0], "tag": f"t{i % 3}",
          "page": i} for i in range(30)],
    )
    prof = {p["column"]: p for p in engine.profile(db, coll)}
    assert "vector" not in prof  # arrays skipped
    assert prof["page"]["n_rows"] == 30
    assert prof["page"]["n_null"] == 0
    assert prof["page"]["n_distinct"] == 30
    assert prof["page"]["min"] == 0.0 and prof["page"]["max"] == 29.0
    assert prof["tag"]["n_distinct"] == 3
    # string columns profile length range
    assert prof["id"]["min"] == 2.0 and prof["id"]["max"] == 3.0
    # column subset selection
    only = engine.profile(db, coll, columns=["page"])
    assert [p["column"] for p in only] == ["page"]


def test_store_commit_marker_protocol(spark, tmp_path):
    """r8: the store is append-only commit markers over the Hadoop FS
    API — no pointer file, no rename. A data directory WITHOUT its
    marker (crash before the commit point) is invisible to every read,
    and a retried write regenerates the same version number."""
    from aiotcvectordb_spark.sources.parquet_store import ParquetStore

    store = ParquetStore(str(tmp_path / "store"), spark)
    df = spark.range(5).withColumnRenamed("id", "pk")
    assert store.write(df, "db", "c") == 0
    assert store.write(df, "db", "c") == 1
    assert store.current_version("db", "c") == 1
    assert store.list_versions("db", "c") == [0, 1]

    # simulate a crashed write: v2 data lands but the marker never does
    df.write.mode("overwrite").parquet(str(tmp_path / "store/db/c/v2"))
    assert store.current_version("db", "c") == 1  # invisible
    assert store.read(spark, "db", "c").count() == 5
    # the retried write reuses version 2 and commits it
    assert store.write(df.limit(3), "db", "c") == 2
    assert store.current_version("db", "c") == 2
    assert store.read(spark, "db", "c").count() == 3
    # GC keeps exactly one back-version
    assert store.list_versions("db", "c") == [1, 2]
    assert store.read(spark, "db", "c", version=1).count() == 5
