"""Export sinks: parquet / CSV / JSON-lines, partitioned writes, and
round-trip fidelity (including complex-column CSV serialization)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aiotcvectordb_spark.catalog import IndexField
from aiotcvectordb_spark.sources.export import export_collection, export_dataframe


@pytest.fixture()
def coll(engine):
    engine.create_database("db0")
    engine.create_collection(
        "db0",
        "docs",
        indexes=[
            IndexField(name="id", kind="primary_key", field_type="string"),
            IndexField(name="vector", kind="vector", field_type="vector", dimension=3),
            IndexField(name="tag", kind="filter", field_type="string"),
        ],
    )
    engine.upsert(
        "db0",
        "docs",
        [
            {"id": f"d{i}", "vector": [0.1 * i, 0.2, 0.3], "tag": "ab"[i % 2]}
            for i in range(20)
        ],
    )
    return "db0", "docs"


def test_parquet_partitioned_roundtrip(engine, coll, spark, tmp_path):
    out = str(tmp_path / "out_parquet")
    n = export_collection(engine, *coll, out, partition_by=["tag"])
    assert n == 20
    # hive layout: one directory per tag value
    assert sorted(
        d for d in os.listdir(out) if d.startswith("tag=")
    ) == ["tag=a", "tag=b"]
    back = spark.read.parquet(out)
    assert back.count() == 20
    # partition pruning: a tag filter scans one directory only
    plan = back.filter("tag = 'a'")._jdf.queryExecution().executedPlan().toString()
    assert "tag=b" not in plan


def test_csv_serializes_complex_columns(engine, coll, spark, tmp_path):
    out = str(tmp_path / "out_csv")
    export_collection(engine, *coll, out, format="csv", coalesce_files=1)
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 20
    row = back.filter("id = 'd1'").first()
    # vector column became a JSON array string — reversible
    parsed = spark.createDataFrame([(row.vector,)], ["v"]).select(
        F.from_json("v", "array<float>").alias("v")
    ).first()
    assert [round(x, 5) for x in parsed.v] == [0.1, 0.2, 0.3]


def test_jsonl_roundtrip_keeps_types(engine, coll, spark, tmp_path):
    out = str(tmp_path / "out_json")
    export_collection(engine, *coll, out, format="json")
    back = spark.read.json(out)
    assert back.count() == 20
    assert dict(back.dtypes)["vector"].startswith("array")


def test_export_dataframe_mode_and_bad_format(spark, tmp_path):
    df = spark.range(5).withColumn("k", F.col("id") % 2)
    out = str(tmp_path / "o")
    export_dataframe(df, out)
    export_dataframe(df, out, mode="overwrite")
    assert spark.read.parquet(out).count() == 5
    with pytest.raises(ValueError):
        export_dataframe(df, out, format="xml")


def test_engine_export_facade(engine, coll, spark, tmp_path):
    out = str(tmp_path / "out_facade")
    assert engine.export(*coll, out, format="json") == 20
    assert spark.read.json(out).count() == 20
