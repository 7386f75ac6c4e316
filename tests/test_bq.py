"""Binary-quantization ANN: sign-bit Hamming prefilter + exact rescore."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _exact_top10(spark, qseed):
    from aiotcvectordb_spark import queries as Q
    from aiotcvectordb_spark.operators import knn

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return [
        r.vec_id
        for r in knn.knn_search(
            emb,
            [Q.qvec(qseed)],
            vector_col="embedding",
            id_col="vec_id",
            metric="COSINE",
            limit=10,
            round_digits=6,
        ).collect()
    ]


def test_bq_recall_and_determinism(spark):
    from aiotcvectordb_spark import queries as Q

    rows = Q.q_ann_bq_cosine(spark, SF_DIR).collect()
    again = Q.q_ann_bq_cosine(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_idx, []).append(r.vec_id)
    assert set(by_q) == {0, 1}
    assert all(len(v) == 10 for v in by_q.values())

    exact0 = _exact_top10(spark, 1.0)
    exact1 = _exact_top10(spark, -1.0)
    r0 = len(set(by_q[0]) & set(exact0)) / 10
    r1 = len(set(by_q[1]) & set(exact1)) / 10
    # 64-bit sign sketch + 5x oversample + exact rescore: recall@10
    # should be well above chance on the small fixture
    assert r0 >= 0.5, (r0, by_q[0], exact0)
    assert r1 >= 0.5, (r1, by_q[1], exact1)


def test_bq_scores_are_exact_cosine(spark):
    """Every returned score equals the exact cosine of that pair (the
    rescore stage is exact; only the candidate set is approximate)."""
    from aiotcvectordb_spark import queries as Q
    from aiotcvectordb_spark.operators import knn

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {
        (r.query_idx, r.vec_id): r.score
        for r in knn.knn_search(
            emb,
            [Q.qvec(1.0), Q.qvec(-1.0)],
            vector_col="embedding",
            id_col="vec_id",
            metric="COSINE",
            limit=10_000,
            round_digits=6,
        ).collect()
    }
    for r in Q.q_ann_bq_cosine(spark, SF_DIR).collect():
        assert abs(exact[(r.query_idx, r.vec_id)] - r.score) < 1e-9


def test_sq8_recall_and_determinism(spark):
    """SQ8 (256-level grid) is a much finer sketch than the sign bit,
    so its candidate set should essentially contain the exact top-10."""
    from aiotcvectordb_spark import queries as Q

    rows = Q.q_ann_sq8_cosine(spark, SF_DIR).collect()
    again = Q.q_ann_sq8_cosine(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_idx, []).append(r.vec_id)
    assert set(by_q) == {0, 1}
    assert all(len(v) == 10 for v in by_q.values())

    exact0 = _exact_top10(spark, 1.0)
    exact1 = _exact_top10(spark, -1.0)
    r0 = len(set(by_q[0]) & set(exact0)) / 10
    r1 = len(set(by_q[1]) & set(exact1)) / 10
    assert r0 >= 0.9, (r0, by_q[0], exact0)
    assert r1 >= 0.9, (r1, by_q[1], exact1)


def test_sq8_scores_are_exact_cosine(spark):
    from aiotcvectordb_spark import queries as Q
    from aiotcvectordb_spark.operators import knn

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {
        (r.query_idx, r.vec_id): r.score
        for r in knn.knn_search(
            emb,
            [Q.qvec(1.0), Q.qvec(-1.0)],
            vector_col="embedding",
            id_col="vec_id",
            metric="COSINE",
            limit=10_000,
            round_digits=6,
        ).collect()
    }
    for r in Q.q_ann_sq8_cosine(spark, SF_DIR).collect():
        assert abs(exact[(r.query_idx, r.vec_id)] - r.score) < 1e-9
