

def test_frozen_lsh_prunes_and_recalls(spark, sf_dir):
    """The fixed-plane LSH twin must do a REAL prune (bucket-union
    candidates well under the corpus) while keeping useful recall@10
    vs exact L2 — the driver hash witnesses the prune, this pins that
    the prune is neither a no-op nor garbage."""
    import numpy as np

    from aiotcvectordb_spark import queries as Q
    from aiotcvectordb_spark.operators.lsh_frozen import (
        FROZEN_LSH_BUCKET_LEN,
        FROZEN_LSH_PLANES,
    )

    emb = {
        r.vec_id: np.asarray(r.embedding, np.float64)
        for r in Q.load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    planes = np.asarray(FROZEN_LSH_PLANES)
    ids = sorted(emb)
    M = np.stack([emb[i] for i in ids])
    B = np.floor(np.round(M @ planes.T, 6) / FROZEN_LSH_BUCKET_LEN)

    out = Q.QUERIES["ann_lsh_l2_fixed"](spark, sf_dir).collect()
    got = {}
    for r in out:
        got.setdefault(r.query_idx, []).append((r.rank, r.vec_id, r.score))
    for qi, qv in enumerate(Q.FLAGSHIP_VECTORS):
        q = np.asarray(qv)
        qb = np.floor(np.round(planes @ q, 6) / FROZEN_LSH_BUCKET_LEN)
        cand_mask = np.any(B == qb, axis=1)
        n_cand = int(cand_mask.sum())
        assert 0 < n_cand < len(ids)  # a real prune, not empty/no-op
        # the query's rows must equal exact-L2 top-10 over the candidates
        d = np.linalg.norm(M - q, axis=1)
        cand_ids = [ids[i] for i in np.where(cand_mask)[0]]
        want = sorted(
            cand_ids, key=lambda v: (round(d[ids.index(v)], 6), v)
        )[:10]
        have = [v for _, v, _ in sorted(got[qi])]
        assert have == want
        # recall@10 vs unrestricted exact: useful, not vacuous
        exact = [ids[i] for i in np.argsort(d)[:10]]
        assert len(set(have) & set(exact)) >= 5
