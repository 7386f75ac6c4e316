"""SQL table-function top-k (Python UDTF) vs the exact engine path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aiotcvectordb_spark.functions.topk_udtf import (
    knn_topk_sql,
    register_topk_udtf,
)
from aiotcvectordb_spark.functions.vector import (
    metric_score,
    register_sql_functions,
    score_is_better_desc,
)

QUERY = [0.1 * i - 0.4 for i in range(8)]


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    register_sql_functions(spark)
    register_topk_udtf(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # Pad/trim to the real dim so the fixture works at any SF.
    dim = len(emb.select("embedding").first()[0])
    q = (QUERY * (dim // len(QUERY) + 1))[:dim]
    emb.createOrReplaceTempView("emb_udtf")
    return q


def _expected(spark, metric, q, k=10, where=None):
    df = spark.table("emb_udtf")
    if where:
        df = df.filter(where)
    qcol = F.array(*[F.lit(float(v)) for v in q])
    scored = (
        df.withColumn("qv", qcol)
        .select(
            F.col("vec_id").alias("id"),
            metric_score(metric, "cast(embedding as array<double>)", "qv").alias(
                "score"
            ),
        )
    )
    asc = not score_is_better_desc(metric)
    return scored.orderBy(
        F.col("score").asc() if asc else F.col("score").desc(), F.col("id").asc()
    ).limit(k)


@pytest.mark.parametrize("metric", ["COSINE", "IP", "L2"])
def test_udtf_matches_exact_topk(spark, views, metric):
    q = views
    sql = knn_topk_sql("emb_udtf", q, metric=metric, k=10, parts=8)
    got = [(r.id, pytest.approx(r.score, abs=1e-9)) for r in spark.sql(sql).collect()]
    exp = [(r.id, r.score) for r in _expected(spark, metric, q).collect()]
    assert [g[0] for g in got] == [e[0] for e in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert gs == es


def test_udtf_respects_where_clause(spark, views):
    q = views
    sql = knn_topk_sql("emb_udtf", q, metric="COSINE", k=5, where="label = 1")
    rows = spark.sql(sql).collect()
    assert 0 < len(rows) <= 5
    exp = _expected(spark, "COSINE", q, k=5, where="label = 1").collect()
    assert [r.id for r in rows] == [r.id for r in exp]


def test_udtf_tie_break_by_id(spark, views):
    """Equal scores order by id ascending — deterministic across runs."""
    spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(20)], "id: long, v: array<double>"
    ).createOrReplaceTempView("tied_udtf")
    sql = knn_topk_sql(
        "tied_udtf", [1.0, 0.0], vector_col="v", id_col="id", metric="IP", k=7,
        parts=4,
    )
    rows = spark.sql(sql).collect()
    assert [r.id for r in rows] == list(range(7))
    assert all(r.score == 1.0 for r in rows)


def test_udtf_output_schema_follows_id_type(spark, views):
    """analyze() propagates a STRING id through the table function."""
    spark.createDataFrame(
        [(f"doc-{i}", [float(i), 1.0]) for i in range(9)],
        "id: string, v: array<double>",
    ).createOrReplaceTempView("strid_udtf")
    sql = knn_topk_sql(
        "strid_udtf", [1.0, 0.0], vector_col="v", id_col="id", metric="IP", k=3,
        parts=2,
    )
    out = spark.sql(sql)
    assert dict(out.dtypes)["id"] == "string"
    assert [r.id for r in out.collect()] == ["doc-8", "doc-7", "doc-6"]


# ---------------------------------------------------------------- hypothesis

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

vecs_st = st.lists(
    st.lists(
        st.integers(min_value=-8, max_value=8).map(lambda i: i / 4.0),
        min_size=3, max_size=3,
    ),
    min_size=1, max_size=25,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=vecs_st,
    k=st.integers(min_value=1, max_value=6),
    parts=st.integers(min_value=1, max_value=5),
    metric=st.sampled_from(["IP", "L2"]),
)
def test_udtf_topk_equals_bruteforce(spark, views, vecs, k, parts, metric):
    """For random integer-grid vectors (exact doubles — no float
    ambiguity), any k and any partition count, the two-phase UDTF
    selection equals the brute-force (score, id) order."""
    rows = [(i, v) for i, v in enumerate(vecs)]
    spark.createDataFrame(rows, "id: long, v: array<double>").createOrReplaceTempView(
        "hyp_udtf"
    )
    q = [1.0, -0.5, 0.25]
    sql = knn_topk_sql(
        "hyp_udtf", q, vector_col="v", id_col="id", metric=metric, k=k, parts=parts
    )
    got = [r.id for r in spark.sql(sql).collect()]

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    if metric == "IP":
        scored = sorted(rows, key=lambda r: (-dot(r[1], q), r[0]))
    else:
        scored = sorted(
            rows, key=lambda r: (sum((x - y) ** 2 for x, y in zip(r[1], q)), r[0])
        )
    assert got == [r[0] for r in scored[:k]]


def test_udtf_null_ids_and_zero_k(spark, views):
    """NULL ids/scores are skipped (no worker crash on tie comparison);
    k=0 yields an empty result instead of an IndexError."""
    spark.createDataFrame(
        [(None, [1.0, 0.0]), (1, [1.0, 0.0]), (2, None), (3, [0.5, 0.0])],
        "id: long, v: array<double>",
    ).createOrReplaceTempView("nulls_udtf")
    sql = knn_topk_sql(
        "nulls_udtf", [1.0, 0.0], vector_col="v", id_col="id", metric="IP",
        k=3, parts=2,
    )
    assert [r.id for r in spark.sql(sql).collect()] == [1, 3]
    sql0 = knn_topk_sql(
        "nulls_udtf", [1.0, 0.0], vector_col="v", id_col="id", metric="IP",
        k=0, parts=2,
    )
    assert spark.sql(sql0).collect() == []
