"""Bucketed co-located join must read with ZERO exchanges, and must
produce the same rows as the plain shuffled join."""

from __future__ import annotations

import pytest

from aiotcvectordb_spark.plans import audit
from aiotcvectordb_spark.sources import bucketed


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label"
    ).withColumnRenamed("vec_id", "doc_id")
    bucketed.write_bucketed(docs, "b_docs", key="doc_id", buckets=8)
    bucketed.write_bucketed(emb, "b_emb", key="doc_id", buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_emb")


@pytest.fixture()
def no_broadcast(spark):
    """Force a sort-merge join: tiny test tables would otherwise take a
    broadcast join, which ignores bucketing. At real scale both sides
    exceed the broadcast threshold and the SMJ path is what runs."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, warehouse, no_broadcast):
    out = bucketed.colocated_join(spark, "b_docs", "b_emb", "doc_id")
    plan = audit.executed_plan(out)
    assert audit.count_shuffles(out) == 0, plan
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, warehouse):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumnRenamed(
        "vec_id", "doc_id"
    )
    plain = {
        (r.doc_id, r.label)
        for r in docs.join(emb, "doc_id").select("doc_id", "label").collect()
    }
    got = {
        (r.doc_id, r.label)
        for r in bucketed.colocated_join(spark, "b_docs", "b_emb", "doc_id")
        .select("doc_id", "label")
        .collect()
    }
    assert got == plain


def test_bucketed_groupby_skips_shuffle(spark, warehouse, no_broadcast):
    """Aggregation on the bucket key also reuses the bucketing."""
    from pyspark.sql import functions as F

    df = spark.table("b_docs").groupBy("doc_id").agg(F.count("*").alias("n"))
    assert audit.count_shuffles(df) == 0, audit.executed_plan(df)
