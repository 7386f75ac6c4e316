"""Payload store (r12): build-once / read-after semantics, version
keying, torn-write self-healing."""

import os

from aiotcvectordb_spark import payloadstore as P


def _docs(spark):
    return spark.createDataFrame(
        [(i, f"store doc {i}") for i in range(8)], "doc_id long, text string"
    )


def test_builds_once_then_reads(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PAYLOAD_STORE", str(tmp_path))
    calls = []

    def build():
        calls.append(1)
        return _docs(spark).selectExpr(
            "doc_id", "cast(encode(text, 'utf-8') as binary) as payload"
        )

    a = P.payload_table(spark, "/some/sf_dir", "k", 1, build)
    assert a.count() == 8 and calls == [1]
    b = P.payload_table(spark, "/some/sf_dir", "k", 1, build)
    assert b.count() == 8 and calls == [1]  # second call read the store
    rows = {r.doc_id: bytes(r.payload) for r in b.collect()}
    assert rows[3] == b"store doc 3"


def test_version_and_sf_dir_key_separate_tables(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PAYLOAD_STORE", str(tmp_path))
    calls = []

    def build():
        calls.append(1)
        return _docs(spark).selectExpr("doc_id", "encode(text, 'utf-8') as payload")

    P.payload_table(spark, "/sf/a", "k", 1, build)
    P.payload_table(spark, "/sf/b", "k", 1, build)   # different dir
    P.payload_table(spark, "/sf/a", "k", 2, build)   # bumped version
    # same-basename dirs must not collide (the probe-ladder temp dirs)
    P.payload_table(spark, "/other/a", "k", 1, build)
    assert len(calls) == 4
    assert P.store_path("/sf/a", "k", 1) != P.store_path("/other/a", "k", 1)


def test_torn_write_self_heals(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PAYLOAD_STORE", str(tmp_path))
    path = P.store_path("/sf/torn", "k", 1)
    os.makedirs(path)  # directory exists but no _SUCCESS marker
    with open(os.path.join(path, "part-junk.parquet"), "wb") as f:
        f.write(b"torn")
    df = P.payload_table(
        spark, "/sf/torn", "k", 1,
        lambda: _docs(spark).selectExpr("doc_id", "encode(text,'utf-8') as payload"),
    )
    assert df.count() == 8
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
