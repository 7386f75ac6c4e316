"""File-format ingestion: CSV / JSON-lines / binaryFile readers and the
set-oriented collection merge path."""

from __future__ import annotations

import json

import pytest

from aiotcvectordb_spark.catalog import IndexField
from aiotcvectordb_spark.errors import ParamError
from aiotcvectordb_spark.sources import ingest


@pytest.fixture()
def coll(engine):
    engine.create_database("db0")
    engine.create_collection(
        "db0",
        "docs",
        indexes=[
            IndexField(name="id", kind="primary_key", field_type="string"),
            IndexField(name="tag", kind="filter", field_type="string"),
            IndexField(name="page", kind="filter", field_type="uint64"),
        ],
    )
    return "db0", "docs"


def test_csv_roundtrip(engine, coll, tmp_path):
    db, name = coll
    p = tmp_path / "in.csv"
    p.write_text("id,tag,page\nd1,a,1\nd2,b,2\nd3,a,3\n")
    out = ingest.ingest_files(
        engine, db, name, str(p), "csv",
        schema="id string, tag string, page long",
    )
    assert out["affectedCount"] == 3
    assert engine.count(db, name) == 3

    # re-ingest with an overlapping key: replace, not duplicate
    p2 = tmp_path / "in2.csv"
    p2.write_text("id,tag,page\nd3,z,30\nd4,c,4\n")
    ingest.ingest_files(
        engine, db, name, str(p2), "csv",
        schema="id string, tag string, page long",
    )
    assert engine.count(db, name) == 4
    assert engine.query(db, name, document_ids=["d3"])[0]["tag"] == "z"


def test_jsonl_with_column_map(engine, coll, tmp_path):
    db, name = coll
    p = tmp_path / "in.jsonl"
    rows = [{"doc": "j1", "tag": "x", "page": 7}, {"doc": "j2", "tag": "y", "page": 8}]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    ingest.ingest_files(
        engine, db, name, str(p), "json",
        schema="doc string, tag string, page long",
        column_map={"doc": "id"},
    )
    got = {d["id"]: d["page"] for d in engine.query(db, name, limit=10)}
    assert got == {"j1": 7, "j2": 8}


def test_missing_pk_rejected(engine, coll, spark):
    db, name = coll
    df = spark.createDataFrame([("a",)], "tag string")
    with pytest.raises(ParamError):
        ingest.ingest_dataframe(engine, db, name, df)


def test_unknown_format_rejected(spark):
    with pytest.raises(ParamError):
        ingest.read_source(spark, "/tmp/x", "avro")


def test_binary_file_to_media(spark, tmp_path):
    (tmp_path / "a.bin").write_bytes(b"\x00\x01payload-a")
    (tmp_path / "b.bin").write_bytes(b"payload-b")
    df = ingest.read_source(spark, str(tmp_path), "binaryFile")
    media = ingest.binary_to_media(df)
    rows = {r.media_id.rsplit("/", 1)[-1]: r for r in media.collect()}
    assert set(rows) == {"a.bin", "b.bin"}
    assert bytes(rows["a.bin"].payload) == b"\x00\x01payload-a"
    assert rows["b.bin"].media_type == "application/octet-stream"
    assert rows["b.bin"].media_meta["length"] == "9"

    # media shape feeds the multimodal feature extractor unchanged
    from aiotcvectordb_spark.operators import multimodal

    feats = multimodal.decode_features(media, id_col="media_id")
    assert dict(feats.dtypes)["media_id"] == "string"  # id type passes through
    got = feats.collect()
    assert {r.n_bytes for r in got} == {11, 9}


def test_csv_filter_pushdown_reaches_scan(engine, coll, tmp_path, spark):
    """Projection/filter on a file source must reach the FileScan node."""
    p = tmp_path / "in.csv"
    p.write_text("id,tag,page\n" + "\n".join(f"d{i},t{i % 3},{i}" for i in range(100)))
    df = ingest.read_source(
        spark, str(p), "csv", schema="id string, tag string, page long"
    )
    plan = df.filter("page > 50").select("id")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(page), GreaterThan(page,50)]" in plan
