"""Catalog / DDL lifecycle ops (SURVEY §2.1, ops 1-13)."""

from __future__ import annotations

import pytest

from aiotcvectordb_spark.catalog import IndexField
from aiotcvectordb_spark.errors import (
    CollectionNotExistError,
    DatabaseNotExistError,
    ParamError,
)
from tests.test_engine_api import DOCS, make_collection


def test_database_lifecycle(engine):
    engine.create_database("db_a")
    assert {d["name"] for d in engine.list_databases()} >= {"db_a"}
    with pytest.raises(ParamError):
        engine.create_database("db_a")
    engine.create_database_if_not_exists("db_a")
    assert engine.drop_database("db_a")["affectedCount"] == 1
    assert engine.drop_database("db_a")["affectedCount"] == 0  # swallow not-exist


def test_database_name_rules(engine):
    with pytest.raises(ParamError):
        engine.create_database("bad-name!")
    with pytest.raises(ParamError):
        engine.create_database("x" * 129)


def test_ai_database_type(engine):
    engine.create_ai_database("aidb")
    info = [d for d in engine.list_databases() if d["name"] == "aidb"][0]
    assert info["dbType"] == "AI_DOC"


def test_collection_lifecycle(engine):
    db, coll = make_collection(engine)
    assert engine.exists_collection(db, coll)
    assert not engine.exists_collection(db, "nope")
    desc = engine.describe_collection(db, coll)
    assert desc["documentCount"] == 0
    assert coll in engine.list_collections(db)
    engine.upsert(db, coll, DOCS)
    assert engine.describe_collection(db, coll)["documentCount"] == 4
    assert engine.truncate_collection(db, coll)["affectedCount"] == 4
    assert engine.count(db, coll) == 0
    engine.drop_collection(db, coll)
    assert not engine.exists_collection(db, coll)
    with pytest.raises(CollectionNotExistError):
        engine.describe_collection(db, coll)


def test_alias_resolution(engine):
    db, coll = make_collection(engine)
    engine.upsert(db, coll, DOCS)
    engine.set_alias(db, coll, "current")
    assert engine.count(db, "current") == 4
    engine.delete_alias(db, "current")
    with pytest.raises(CollectionNotExistError):
        engine.count(db, "current")


def test_unknown_database_raises(engine):
    with pytest.raises(DatabaseNotExistError):
        engine.list_collections("ghost")


def test_add_drop_index(engine):
    db, coll = make_collection(engine)
    engine.add_index(
        db, coll, [IndexField(name="extra", kind="filter", field_type="string")]
    )
    meta = engine.catalog.get_collection(db, coll)
    assert any(ix.name == "extra" for ix in meta.indexes)
    engine.drop_index(db, coll, ["extra"])
    meta = engine.catalog.get_collection(db, coll)
    assert not any(ix.name == "extra" for ix in meta.indexes)


def test_ttl_expiry(engine, spark):
    db = "db_ttl"
    engine.create_database(db)
    engine.create_collection(
        db,
        "c",
        indexes=[
            IndexField(name="id", kind="primary_key", field_type="string"),
            IndexField(
                name="vector", kind="vector", field_type="vector",
                metric_type="COSINE", index_type="FLAT", dimension=2,
            ),
            IndexField(name="expire_at", kind="filter", field_type="uint64"),
        ],
        ttl_config={"enable": True, "timeField": "expire_at"},
    )
    engine.upsert(
        db, "c",
        [
            {"id": "live", "vector": [1.0, 0.0], "expire_at": 4102444800},  # 2100
            {"id": "dead", "vector": [0.0, 1.0], "expire_at": 946684800},  # 2000
        ],
    )
    assert {r["id"] for r in engine.query(db, "c")} == {"live"}
    assert engine.count(db, "c") == 1


def test_describe_lists_aliases(engine):
    engine.create_database("db_alias2")
    from aiotcvectordb_spark.catalog import IndexField

    engine.create_collection(
        "db_alias2", "c1",
        indexes=[IndexField(name="id", kind="primary_key", field_type="string")],
    )
    assert engine.describe_collection("db_alias2", "c1")["alias"] == []
    engine.set_alias("db_alias2", "c1", "current")
    engine.set_alias("db_alias2", "c1", "backup")
    assert engine.describe_collection("db_alias2", "c1")["alias"] == [
        "backup", "current",
    ]
    engine.delete_alias("db_alias2", "backup")
    assert engine.describe_collection("db_alias2", "c1")["alias"] == ["current"]


def test_jsonstate_crash_artifact_falls_back_to_committed(spark, tmp_path):
    """r8: metadata state files are versioned Hadoop-FS objects — a
    half-written newest version (crash mid-create) parses as garbage
    and load() falls back to the newest committed version instead of
    failing or resetting to the default."""
    from aiotcvectordb_spark.metastore import JsonState

    st = JsonState(str(tmp_path), "meta", {"v": 0}, spark)
    assert st.load() == {"v": 0}  # no versions yet -> default
    st.save({"v": 1})
    st.save({"v": 2})
    assert st.load() == {"v": 2}
    # simulate a crashed half-write at the next version id
    (tmp_path / "meta.2.json").write_text('{"v": 3, "trunc')
    assert st.load() == {"v": 2}
    # the next save supersedes the artifact and GC keeps one back
    st.save({"v": 4})
    assert st.load() == {"v": 4}
