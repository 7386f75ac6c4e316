"""Property tests for the dedup / text-analysis / relational query batch.

The DuckDB oracle (tools/parity_check.py, driver CORRECTNESS) is the
ground-truth check; these tests assert the semantic invariants that an
oracle hash cannot express — LSH-banding losslessness, IVF recall, and
chunk-expansion neighborhood structure.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aiotcvectordb_spark import queries as Q


def test_simhash_banding_is_lossless(spark, sf_dir):
    """4 bands x 4 bits: every pair at hamming <= 3 must share a band
    (pigeonhole), so the banded op equals brute force exactly."""
    fp = Q.q_simhash_fingerprint(spark, sf_dir)
    a = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    brute = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.expr("bit_count(sa ^ sb)").cast("int"))
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )
    banded = Q.q_simhash_near_dup(spark, sf_dir)
    sb_ = {tuple(r) for r in brute.collect()}
    sbd = {tuple(r) for r in banded.collect()}
    assert sbd == sb_
    assert len(sbd) > 0


def test_ivf_recall_vs_exact(spark, sf_dir):
    from aiotcvectordb_spark.operators import knn

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    flat = knn.knn_search(
        emb, [Q.qvec(1.0)], vector_col="embedding", id_col="vec_id",
        metric="COSINE", limit=10, round_digits=6,
    )
    exact_ids = {r.vec_id for r in flat.collect()}
    approx_ids = {r.vec_id for r in Q.q_ann_ivf_cosine(spark, sf_dir).collect()}
    recall = len(exact_ids & approx_ids) / len(exact_ids)
    assert recall >= 0.7, f"IVF recall@10 {recall}"


def test_chunk_expand_structure(spark, sf_dir):
    out = Q.q_chunk_expand(spark, sf_dir).collect()
    assert out
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.chunk_pos] = r.is_hit
    for doc, chunks in by_doc.items():
        hits = [p for p, is_hit in chunks.items() if is_hit]
        assert hits, f"doc {doc} expanded without any hit chunk"
        for p in chunks:
            assert any(abs(p - h) <= 1 for h in hits), (
                f"doc {doc} chunk {p} not adjacent to any hit"
            )


def test_token_count_positive(spark, sf_dir):
    rows = Q.q_token_count(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.bpe_tokens >= r.ws_tokens  # punctuation splits add tokens


def test_hybrid_weighted_shape(spark, sf_dir):
    rows = Q.q_hybrid_weighted(spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_relational_suite_runs(spark, sf_dir):
    for name in (
        "join_pruned_dims",
        "window_running",
        "rollup_agg",
        "semi_anti_join",
        "set_ops",
    ):
        df = Q.QUERIES[name](spark, sf_dir)
        assert df.count() >= 0, name


def test_rollup_has_grand_total(spark, sf_dir):
    rows = Q.q_rollup_agg(spark, sf_dir).collect()
    grand = [r for r in rows if r.r_name is None and r.n_name is None]
    assert len(grand) == 1
    assert grand[0].n_customers == sum(
        r.n_customers for r in rows if r.r_name is not None and r.n_name is not None
    )
