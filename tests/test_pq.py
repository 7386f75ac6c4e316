"""Product quantization: code shape/determinism, ADC ranking sanity,
and rescored recall vs the exact kNN operator."""

from __future__ import annotations

import numpy as np

from aiotcvectordb_spark.operators import knn, pq


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_codes_shape_and_determinism(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    model = pq.train_pq(emb, m=8, nbits=4)
    assert model.codebooks.shape == (8, 16, 8)
    a = {r.vec_id: tuple(r.codes) for r in pq.encode_pq(emb, model).collect()}
    b = {
        r.vec_id: tuple(r.codes)
        for r in pq.encode_pq(emb.repartition(5), model).collect()
    }
    assert a == b  # partitioning must not change codes
    assert len(a) == emb.count()
    for codes in a.values():
        assert len(codes) == 8
        assert all(0 <= c < 16 for c in codes)


def test_self_query_is_near_top_adc(spark, sf_dir):
    """Querying with an indexed vector: pure ADC must place that vector
    in the top handful (quantization noise can break exact-top-1)."""
    emb = _emb(spark, sf_dir)
    model = pq.train_pq(emb, m=8, nbits=4)
    codes = pq.encode_pq(emb, model)
    probe = emb.orderBy("vec_id").limit(3).collect()
    out = pq.search_pq(
        codes, model, [list(r.embedding) for r in probe], k=5
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_idx, set()).add(r.vec_id)
    for qi, r in enumerate(probe):
        assert r.vec_id in by_q[qi], f"self vector missing from ADC top-5 (q{qi})"


def test_rescored_recall_vs_exact(spark, sf_dir):
    """ADC fetch + exact cosine rescore must recover most of the true
    top-10 — the IVF-PQ refine contract."""
    emb = _emb(spark, sf_dir)
    probe = [list(r.embedding) for r in emb.orderBy("vec_id").limit(4).collect()]
    exact = knn.knn_search(
        emb, probe, vector_col="embedding", id_col="vec_id",
        metric="COSINE", limit=10, round_digits=6,
    )
    truth = {}
    for r in exact.collect():
        truth.setdefault(r.query_idx, set()).add(r.vec_id)

    model = pq.train_pq(emb, m=8, nbits=5)
    codes = pq.encode_pq(emb, model)
    got = pq.search_pq(
        codes, model, probe, k=10, rescore=emb, rescore_k=60
    )
    mine = {}
    for r in got.collect():
        mine.setdefault(r.query_idx, set()).add(r.vec_id)
    recalls = [
        len(mine.get(qi, set()) & truth[qi]) / len(truth[qi]) for qi in truth
    ]
    assert np.mean(recalls) >= 0.8, f"mean recall {np.mean(recalls)}: {recalls}"


def test_engine_ivf_pq_index(spark, sf_dir, engine):
    """The reference's IVF_PQ index type end to end: create collection,
    build, search through the engine; recall vs the engine's own exact
    FLAT scan; filter queries fall back to exact cell-pruned search."""
    from aiotcvectordb_spark.catalog import IndexField

    db = "db_pq"
    engine.create_database(db)
    engine.create_collection(
        db, "emb",
        indexes=[
            IndexField(name="vec_id", kind="primary_key", field_type="uint64"),
            IndexField(
                name="embedding", kind="vector", field_type="vector",
                metric_type="COSINE", index_type="IVF_PQ", dimension=64,
                params={"nlist": 8, "M": 8, "nbits": 5},
            ),
        ],
    )
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    engine.store.write(emb, db, "emb")
    engine.rebuild_index(db, "emb")
    meta = engine.catalog.get_collection(db, "emb")
    assert "pq" in meta.ann_state and meta.ann_state["pq"]["m"] == 8

    probe = [list(r.embedding) for r in emb.orderBy("vec_id").limit(3).collect()]
    exact = engine.search_df(
        db, "emb", probe, limit=10, round_digits=6,
        metric="COSINE", params={"nprobe": 8},  # all cells = exact
    )
    # IVF_PQ path: broad probe so recall degradation comes only from
    # the ADC candidate stage (rescore is exact)
    got = engine.search_df(db, "emb", probe, limit=10, params={"nprobe": 6})
    truth, mine = {}, {}
    for r in exact.collect():
        truth.setdefault(r.query_idx, set()).add(r.vec_id)
    for r in got.collect():
        mine.setdefault(r.query_idx, set()).add(r.vec_id)
    recalls = [
        len(mine.get(qi, set()) & truth[qi]) / len(truth[qi]) for qi in truth
    ]
    assert np.mean(recalls) >= 0.7, f"mean recall {np.mean(recalls)}: {recalls}"
    # each query found itself with cosine ~1.0 at rank 1
    for r in got.collect():
        if r.rank == 1:
            assert r.score >= 0.999

    # a filtered search must not lose rows to the approximation: it
    # falls back to the exact cell-pruned scan
    filtered = engine.search_df(
        db, "emb", probe[:1], limit=5, filter="vec_id < 100",
    )
    assert filtered.count() > 0
    engine.drop_collection(db, "emb")


def test_full_rescore_equals_exact(spark, sf_dir):
    """With rescore_k >= corpus size the ADC stage cannot drop a true
    neighbor, so PQ search must return EXACTLY the exact-kNN result
    (same ids, same scores, same ranks) — the approximation lives only
    in candidate selection, never in scoring."""
    emb = _emb(spark, sf_dir)
    n = emb.count()
    probe = [list(r.embedding) for r in emb.orderBy("vec_id").limit(2).collect()]
    exact = {
        (r.query_idx, r.rank): (r.vec_id, r.score)
        for r in knn.knn_search(
            emb, probe, vector_col="embedding", id_col="vec_id",
            metric="COSINE", limit=10, round_digits=6,
        ).collect()
    }
    model = pq.train_pq(emb, m=8, nbits=4)
    codes = pq.encode_pq(emb, model)
    got = {
        (r.query_idx, r.rank): (r.vec_id, r.score)
        for r in pq.search_pq(
            codes, model, probe, k=10, rescore=emb, rescore_k=n,
        ).collect()
    }
    assert got == exact


def test_engine_ivf_sq8_index(spark, sf_dir, engine):
    """IVF_SQ8: scalar-quantized approximate ranking (pure Catalyst,
    no Python workers) + exact rescore, through the engine."""
    from aiotcvectordb_spark.catalog import IndexField

    db = "db_sq8"
    engine.create_database(db)
    engine.create_collection(
        db, "emb",
        indexes=[
            IndexField(name="vec_id", kind="primary_key", field_type="uint64"),
            IndexField(
                name="embedding", kind="vector", field_type="vector",
                metric_type="COSINE", index_type="IVF_SQ8", dimension=64,
                params={"nlist": 8},
            ),
        ],
    )
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    engine.store.write(emb, db, "emb")
    engine.rebuild_index(db, "emb")
    meta = engine.catalog.get_collection(db, "emb")
    assert "sq8" in meta.ann_state and len(meta.ann_state["sq8"]["lo"]) == 64

    probe = [list(r.embedding) for r in emb.orderBy("vec_id").limit(2).collect()]
    exact = engine.search_df(
        db, "emb", probe, limit=10, round_digits=6, params={"nprobe": 8},
    )
    got = engine.search_df(db, "emb", probe, limit=10, params={"nprobe": 6})
    truth, mine = {}, {}
    for r in exact.collect():
        truth.setdefault(r.query_idx, set()).add(r.vec_id)
    for r in got.collect():
        mine.setdefault(r.query_idx, set()).add(r.vec_id)
    recalls = [
        len(mine.get(qi, set()) & truth[qi]) / len(truth[qi]) for qi in truth
    ]
    # SQ8 error is tiny (8-bit grid) — recall should be near-perfect at
    # matching probe breadth
    assert np.mean(recalls) >= 0.85, f"mean recall {np.mean(recalls)}: {recalls}"
    for r in got.collect():
        if r.rank == 1:
            assert r.score >= 0.999
    engine.drop_collection(db, "emb")


def test_sq8_quantization_error_bounded(spark, sf_dir):
    """Dequantized vectors stay within half a grid step per dimension."""
    from aiotcvectordb_spark.operators import ann

    emb = _emb(spark, sf_dir).limit(100)
    rows = [np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()]
    mat = np.stack(rows)
    lo, hi = mat.min(0), mat.max(0)
    span = np.where(hi - lo > 0, hi - lo, 1.0)
    codes = np.round((mat - lo) * 255.0 / span)
    deq = lo + codes * span / 255.0
    assert np.abs(deq - mat).max() <= (span / 255.0 / 2 + 1e-12).max()
    # and the SQL expression agrees with numpy for the first row
    df = emb.limit(1)
    got = df.select(
        ann.sq8_quantize_expr("embedding", lo.tolist(), hi.tolist()).alias("c")
    ).first().c
    # numpy rounds half-to-even, Spark half-up: allow the one-step
    # disagreement on exact .5 boundaries, nothing more
    assert max(abs(int(g) - int(x)) for g, x in zip(got, codes[0])) <= 1
    assert sum(int(g) != int(x) for g, x in zip(got, codes[0])) <= 2


def test_compression_ratio_documented():
    """The point of PQ: m code indices replace dim floats."""
    # dim 64 float32 = 256 bytes; m=8 codes at <=8 bits = 8 bytes -> 32x
    assert 64 * 4 / 8 == 32.0


def test_frozen_pq_fixed_matches_production_encode_and_exact_topk(spark, sf_dir):
    """The fixed-PQ query's SQL struct-min encode must agree with the
    production numpy argmin encode (operators/pq.encode_pq) under the
    frozen codebooks wherever the rounded distances are untied, and the
    oversample-then-rescore output must rank its survivors exactly like
    flat exact search restricted to the same candidate set."""
    import numpy as np

    from aiotcvectordb_spark import queries as Q
    from aiotcvectordb_spark.operators.pq import PQModel, encode_pq
    from aiotcvectordb_spark.operators.pq_frozen import (
        FROZEN_PQ_CODEBOOKS,
        FROZEN_PQ_DSUB,
        FROZEN_PQ_M,
    )

    emb = Q.load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    model = PQModel(
        codebooks=np.asarray(FROZEN_PQ_CODEBOOKS, dtype=np.float64),
        dim=FROZEN_PQ_M * FROZEN_PQ_DSUB,
        normalize=True,
    )
    prod = {r.vec_id: list(r.codes) for r in encode_pq(emb, model).collect()}

    # replicate the SQL encode in numpy WITH the rounding + lowest-code
    # tie rule, to compare where production (unrounded argmin) agrees
    vecs = {r.vec_id: np.asarray(r.embedding, np.float64) for r in emb.collect()}
    books = np.asarray(FROZEN_PQ_CODEBOOKS, np.float64)
    agree = disagree = 0
    for vid, v in vecs.items():
        n = np.linalg.norm(v)
        ne = v / (n if n else 1.0)
        for j in range(FROZEN_PQ_M):
            sub = ne[j * FROZEN_PQ_DSUB:(j + 1) * FROZEN_PQ_DSUB]
            d2 = np.round(((books[j] - sub) ** 2).sum(axis=1), 6)
            best = int(np.lexsort((np.arange(len(d2)), d2))[0])
            if best == prod[vid][j]:
                agree += 1
            else:
                # legitimate only when rounding created a tie band
                assert abs(d2[best] - d2[prod[vid][j]]) <= 1e-6
                disagree += 1
    assert agree > disagree * 50  # overwhelmingly identical

    out = Q.QUERIES["ann_pq_cosine_fixed"](spark, sf_dir).collect()
    assert {r.query_idx for r in out} == {0, 1}
    for qi in (0, 1):
        rows = sorted((r for r in out if r.query_idx == qi),
                      key=lambda r: r.rank)
        assert len(rows) == 10
        # exact-rescore ordering: scores non-increasing, ties by vec_id
        for a, b in zip(rows, rows[1:]):
            assert (a.score, -a.vec_id) >= (b.score, -b.vec_id)
