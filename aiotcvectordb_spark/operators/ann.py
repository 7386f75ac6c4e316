"""Approximate vector indexes — IVF (KMeans) and LSH.

The reference exposes FLAT/HNSW/IVF index types with search knobs
``ef`` (HNSW) and ``nprobe`` (IVF) (reference stub.py:609-612). HNSW is a
per-query graph walk — not a Spark-shaped algorithm — so, as planned in
SURVEY §1.5, the approximate path is:

- IVF: an index-build job fits MLlib KMeans(nlist) on the vectors, writes
  the collection partitioned by ``cluster_id``; a query assigns each
  query vector to its ``nprobe`` nearest centroids and scans only those
  partitions (partition pruning — the Spark analog of an inverted file).
- LSH (HNSW stand-in): MLlib BucketedRandomProjectionLSH for L2 /
  random-hyperplane signatures for COSINE; approximate recall, exact
  rerank of the bucket candidates.

Accuracy contract: recall@k vs the exact FLAT oracle (approximate ops
cannot be hash-equal) — tests assert recall >= 0.9 at nprobe ~ nlist/4.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aiotcvectordb_spark.operators import knn


def build_ivf(engine, meta) -> None:
    """Index-build job: KMeans centroids + partitioned rewrite.

    Stores centroids in the catalog (small — nlist × dim floats) and
    rewrites the collection parquet partitioned by cluster_id so that
    nprobe searches prune partitions at scan time.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vix = meta.vector_index()
    nlist = int(vix.params.get("nlist", 16)) if vix else 16
    vec_col = meta.vector_field or "vector"
    df = engine.store.read(engine.spark, meta.database, meta.name)
    if "cluster_id" in df.columns:
        df = df.drop("cluster_id")
    ml_df = df.withColumn("__features", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(k=nlist, seed=42, featuresCol="__features", predictionCol="cluster_id")
    model = km.fit(ml_df)
    clustered = model.transform(ml_df).drop("__features")
    engine.store.write(
        clustered, meta.database, meta.name, partition_by=["cluster_id"]
    )
    meta.ann_state["ivf"] = {
        "nlist": nlist,
        "centroids": [[float(x) for x in c] for c in model.clusterCenters()],
    }
    if (vix.index_type or "").upper() == "IVF_PQ":
        _build_pq_sidecar(engine, meta, vix)
    elif (vix.index_type or "").upper() == "IVF_SQ8":
        _build_sq8_state(engine, meta, vix)
    engine.catalog.put_collection(meta, replace=True)


def _pq_sidecar_name(meta) -> str:
    return f"{meta.name}__pqcodes"


def _build_pq_sidecar(engine, meta, vix) -> None:
    """IVF_PQ: train codebooks on a bounded sample, encode every row,
    and write the (id, codes) table partitioned by the SAME cluster_id
    layout as the main collection — an ADC search reads only the probed
    cells' code bytes (reference IVF_PQ index type; the vendor server
    quantizes inside its inverted lists the same way). The raw vectors
    stay in the main table for the exact rescore."""
    from aiotcvectordb_spark.operators import pq

    m = int(vix.params.get("M", vix.params.get("m", 8)))
    nbits = int(vix.params.get("nbits", 5))
    metric = (vix.metric_type or "COSINE").upper()
    vec_col = meta.vector_field or "vector"
    df = engine.store.read(engine.spark, meta.database, meta.name)
    model = pq.train_pq(
        df, vector_col=vec_col, m=m, nbits=nbits,
        normalize=metric != "L2",
    )
    codes = pq.encode_pq(
        df, model, id_col=meta.primary_key, vector_col=vec_col
    ).join(df.select(meta.primary_key, "cluster_id"), meta.primary_key)
    engine.store.write(
        codes, meta.database, _pq_sidecar_name(meta),
        partition_by=["cluster_id"],
    )
    meta.ann_state["pq"] = model.to_state() | {"m": m, "nbits": nbits}


def _build_sq8_state(engine, meta, vix) -> None:
    """IVF_SQ8 (reference index type: 8-bit scalar-quantized inverted
    lists): per-dimension [min, max] over the collection define a
    uniform 256-level grid; codes are ``round((x - lo) * 255 / span)``.
    Unlike PQ this needs NO sidecar table and NO Python workers — the
    quantization grid is tiny catalog state (2 x dim floats) and both
    encode and approximate scoring are pure Catalyst expressions, so
    the whole search stays inside whole-stage codegen. 4x less vector
    I/O than float32 when the store materializes codes; here the grid
    powers the JVM-side approximate scorer over the probed cells."""
    vec_col = meta.vector_field or "vector"
    df = engine.store.read(engine.spark, meta.database, meta.name)
    dim = int(vix.dimension or 0) or len(
        df.select(vec_col).first()[0]
    )
    aggs = []
    for i in range(dim):
        x = F.expr(f"cast({vec_col}[{i}] as double)")
        aggs += [F.min(x).alias(f"lo{i}"), F.max(x).alias(f"hi{i}")]
    row = df.agg(*aggs).first()
    lo = [float(row[f"lo{i}"]) for i in range(dim)]
    hi = [float(row[f"hi{i}"]) for i in range(dim)]
    meta.ann_state["sq8"] = {"lo": lo, "hi": hi, "dim": dim}


def sq8_quantize_expr(vec_col: str, lo: Sequence[float], hi: Sequence[float]):
    """codes[i] = round((x_i - lo_i) * 255 / span_i) as an int array —
    pure SQL, codegen'd; constant dims (span 0) quantize to 0."""
    parts = []
    for i, (lo_i, hi_i) in enumerate(zip(lo, hi)):
        span = hi_i - lo_i
        if span <= 0:
            parts.append("0")
        else:
            parts.append(
                f"cast(round((cast({vec_col}[{i}] as double) - {lo_i!r}) * 255.0 / {span!r}) as int)"
            )
    return F.expr(f"array({', '.join(parts)})")


def sq8_dequant_exprs(
    vec_col: str,
    lo: Sequence[float],
    hi: Sequence[float],
) -> list[str]:
    """The per-dimension SQ8 dequantized-value SQL fragments
    (``lo + round((x - lo) * 255 / span) * span / 255`` with the
    span<=0 guard) — query-independent, so a multi-query caller can
    project them ONCE per row and score every query against the same
    dequantized values (r12 optimization: the dequant work used to be
    re-evaluated per query inside each score expression)."""
    out = []
    for i in range(len(lo)):
        lo_i, hi_i = lo[i], hi[i]
        span = hi_i - lo_i
        if span <= 0:
            out.append(repr(lo_i))
        else:
            out.append(
                f"({lo_i!r} + round((cast({vec_col}[{i}] as double) - {lo_i!r})"
                f" * 255.0 / {span!r}) * {span!r} / 255.0)"
            )
    return out


def sq8_score_expr_from(
    deq: Sequence[str],
    query: Sequence[float],
    metric: str,
):
    """Metric score built over precomputed dequantized-value fragments
    ``deq`` (SQL strings — column refs or the inline exprs from
    ``sq8_dequant_exprs``). Term construction, association order, and
    the zero-norm guard are exactly the original single-expression
    form's, so scores are bit-identical however ``deq`` is routed."""
    terms_dot, terms_l2, norm_v = [], [], []
    for i, qi in enumerate(query):
        d = deq[i]
        terms_dot.append(f"({d} * {float(qi)!r})")
        terms_l2.append(f"power({d} - {float(qi)!r}, 2)")
        norm_v.append(f"power({d}, 2)")
    metric_u = metric.upper()
    if metric_u == "IP":
        return F.expr(" + ".join(terms_dot))
    if metric_u == "L2":
        return F.expr(f"sqrt({' + '.join(terms_l2)})")
    qn = sum(float(x) * float(x) for x in query) ** 0.5 or 1.0
    # greatest-floor: a zero vector dequantizes to zero norm and must
    # score 0.0, not abort the scan with ANSI DIVIDE_BY_ZERO
    return F.expr(
        f"({' + '.join(terms_dot)}) / "
        f"(greatest(sqrt({' + '.join(norm_v)}), cast(1e-12 as double)) * {qn!r})"
    )


def sq8_dequant_score_expr(
    vec_col: str,
    query: Sequence[float],
    lo: Sequence[float],
    hi: Sequence[float],
    metric: str,
):
    """Approximate metric score of a STORED vector against a query,
    computed through the SQ8 grid: quantize -> dequantize -> unrolled
    dot/L2 against query literals. One Catalyst expression per query —
    models the quantization error the index would serve, while staying
    entirely JVM-side."""
    return sq8_score_expr_from(
        sq8_dequant_exprs(vec_col, lo, hi), query, metric
    )


def ivf_sq8_search(
    engine,
    meta,
    df: DataFrame,
    vectors: Sequence[Sequence[float]],
    *,
    metric: str = "COSINE",
    nprobe: int | None = None,
    limit: int = 10,
    rescore_k: int | None = None,
    round_digits: int | None = 6,
) -> DataFrame:
    """IVF_SQ8 search: prune to the probed cells, rank candidates with
    the quantized-grid approximate score (pure codegen, no Python), then
    exact-rescore the top ``rescore_k`` per query in the true metric."""
    from pyspark.sql import Window

    from aiotcvectordb_spark.functions.vector import (
        metric_score_fixed,
        score_is_better_desc,
    )

    state = meta.ann_state["ivf"]
    sq = meta.ann_state["sq8"]
    lo, hi = sq["lo"], sq["hi"]
    vec_col = meta.vector_field or "vector"
    id_col = meta.primary_key
    probe_ids = probe_cells(state["centroids"], vectors, nprobe)
    pruned = df.filter(F.col("cluster_id").isin(probe_ids))
    fetch = rescore_k or max(4 * limit, 50)
    desc = score_is_better_desc(metric)
    per_q = []
    for qi, v in enumerate(vectors):
        approx = sq8_dequant_score_expr(vec_col, v, lo, hi, metric)
        ordered = pruned.select(
            F.lit(qi).alias("query_idx"), id_col, approx.alias("__approx")
        ).orderBy(
            F.col("__approx").desc() if desc else F.col("__approx").asc(),
            F.col(id_col).asc(),
        ).limit(fetch)
        per_q.append(ordered)
    cand = per_q[0]
    for nxt in per_q[1:]:
        cand = cand.unionByName(nxt)
    dim = sq["dim"]
    qdf = df.sparkSession.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vectors)],
        "query_idx int, __qv array<double>",
    )
    scored = (
        cand.join(df.select(id_col, vec_col), id_col)
        .join(F.broadcast(qdf), "query_idx")
        .withColumn(
            "score", metric_score_fixed(metric.upper(), vec_col, "__qv", dim)
        )
    )
    if round_digits is not None:
        scored = scored.withColumn("score", F.round("score", round_digits))
    w = Window.partitionBy("query_idx").orderBy(
        F.col("score").desc() if desc else F.col("score").asc(),
        F.col(id_col).asc(),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= limit)
        .select("query_idx", id_col, "score", "rank")
    )


def ivf_pq_search(
    engine,
    meta,
    df: DataFrame,
    vectors: Sequence[Sequence[float]],
    *,
    metric: str = "COSINE",
    nprobe: int | None = None,
    limit: int = 10,
    rescore_k: int | None = None,
    **kw,
) -> DataFrame:
    """IVF_PQ search: probe cells against the centroids, ADC-score the
    probed cells' CODE BYTES (sidecar table, same partition pruning as
    ivf_search), exact-rescore the survivors against the raw vectors of
    those cells. I/O = nprobe/nlist of the code bytes (~32x smaller
    than the vectors) plus rescore_k raw rows per query."""
    from aiotcvectordb_spark.operators import pq

    state = meta.ann_state["ivf"]
    model = pq.PQModel.from_state(meta.ann_state["pq"])
    probe_ids = probe_cells(state["centroids"], vectors, nprobe)
    codes = engine.store.read(
        engine.spark, meta.database, _pq_sidecar_name(meta)
    ).filter(F.col("cluster_id").isin(probe_ids))
    pruned = df.filter(F.col("cluster_id").isin(probe_ids))
    out = pq.search_pq(
        codes,
        model,
        [[float(x) for x in v] for v in vectors],
        id_col=meta.primary_key,
        k=limit,
        rescore=pruned,
        rescore_k=rescore_k or max(4 * limit, 50),
        vector_col=meta.vector_field or "vector",
        metric=metric,
        **kw,
    )
    return out


def assign_clusters(
    df: DataFrame, centroids: Sequence[Sequence[float]], *, vector_col: str
) -> DataFrame:
    """Assign each row to its nearest centroid WITHOUT refitting KMeans —
    the incremental-maintenance half of the IVF index: streamed/upserted
    rows get a cluster_id from the existing centroids, so partition
    pruning keeps working between rebuilds (reference ``build_index``
    deferral, stub.py:456-458). Arrow-batched; centroids are
    closure-captured (nlist x dim floats — small by construction)."""
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql import types as T

    cents = np.asarray(centroids, dtype=np.float64)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("cluster_id", T.IntegerType(), True)]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vector_col]]
            )
            d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            pdf = pdf.copy()
            pdf["cluster_id"] = d.argmin(axis=1).astype("int32")
            yield pdf

    return df.mapInPandas(assign, schema=out_schema)


def probe_cells(
    centroids: Sequence[Sequence[float]],
    vectors: Sequence[Sequence[float]],
    nprobe: int | None,
) -> list[int]:
    """The IVF probing policy, shared by batch search and the streaming
    serving loop: union of each query's ``nprobe`` nearest cells by L2
    distance to the centroids (None -> nlist/4)."""
    cents = np.asarray(centroids, dtype=np.float64)
    nlist = len(cents)
    nprobe = min(nprobe or max(1, nlist // 4), nlist)
    cells: set[int] = set()
    for v in vectors:
        q = np.asarray(v, dtype=np.float64)
        d = ((cents - q) ** 2).sum(axis=1)
        cells.update(int(i) for i in np.argsort(d)[:nprobe])
    return sorted(cells)


def ivf_search(
    engine,
    meta,
    df: DataFrame,
    vectors: Sequence[Sequence[float]],
    *,
    metric: str = "COSINE",
    nprobe: int | None = None,
    **kw,
) -> DataFrame:
    """Assign each query to its nprobe nearest centroids; scan only those
    clusters. The cluster_id IN (...) predicate prunes parquet partitions
    (the directory layout from build_ivf), so I/O scales with
    nprobe/nlist, not the collection size."""
    state = meta.ann_state["ivf"]
    probe_ids = probe_cells(state["centroids"], vectors, nprobe)
    pruned = df.filter(F.col("cluster_id").isin(probe_ids))
    out = knn.knn_search(
        pruned,
        vectors,
        vector_col=meta.vector_field or "vector",
        id_col=meta.primary_key,
        metric=metric,
        **kw,
    )
    return out.drop("cluster_id")


def lsh_search(
    df: DataFrame,
    vectors: Sequence[Sequence[float]],
    *,
    vector_col: str = "vector",
    id_col: str = "id",
    limit: int = 10,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    round_digits: int | None = None,
) -> DataFrame:
    """L2 approximate kNN via MLlib BucketedRandomProjectionLSH
    (the HNSW stand-in). Returns (query_idx, id, score, rank) with
    score = L2 distance (lower better). ``round_digits`` rounds the
    ranked score (cross-engine-stable ordering — same contract as
    knn_search); Note: there is
    NO reachable exact limit via ``bucket_length`` — floor(proj/L)
    still splits rows into buckets 0 and -1 by projection sign, so
    candidates can be lost no matter how large L is (verified
    empirically); LSH correctness is therefore recall-bounded, not
    hash-provable, unlike IVF (nprobe=nlist) and PQ (full rescore)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    ml_df = df.withColumn(
        "__features", array_to_vector(F.col(vector_col).cast("array<double>"))
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="__features",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(ml_df)
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vectors)],
        "query_idx int, __qvec array<double>",
    ).withColumn("__features", array_to_vector("__qvec"))
    joined = model.approxSimilarityJoin(ml_df, qdf, float("inf"), distCol="score")
    flat = joined.select(
        F.col("datasetB.query_idx").alias("query_idx"),
        F.col(f"datasetA.{id_col}").alias(id_col),
        F.col("score"),
    )
    if round_digits is not None:
        flat = flat.withColumn("score", F.round("score", round_digits))
    w = Window.partitionBy("query_idx").orderBy(
        F.col("score").asc(), F.col(id_col).asc()
    )
    return flat.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= limit
    )


def ef_to_lsh_params(ef: int) -> tuple[int, int]:
    """Map the reference's HNSW ``ef`` search-breadth knob
    (reference stub.py:611) onto the LSH stand-in's two breadth levers:
    more hash tables (more bucket unions -> more candidates) and a larger
    candidate pool to rescore. Monotone: larger ef can only add
    candidates, so recall@k is non-decreasing in ef."""
    ef = max(1, int(ef))
    num_hash_tables = max(1, min(32, ef // 4))
    pool = ef
    return num_hash_tables, pool


def hnsw_search(
    df: DataFrame,
    vectors: Sequence[Sequence[float]],
    *,
    vector_col: str = "vector",
    id_col: str = "id",
    metric: str = "L2",
    limit: int = 10,
    ef: int = 64,
    bucket_length: float = 0.5,
    **kw,
) -> DataFrame:
    """HNSW-semantics search on the LSH stand-in: ef controls candidate
    breadth (ef_to_lsh_params), candidates are exactly rescored in the
    collection metric, top-``limit`` returned.

    COSINE/IP are served by running the L2 LSH over unit-normalized
    vectors (on the unit sphere L2 rank order == cosine rank order),
    then rescoring candidates with the true metric — so the returned
    ``score`` is the metric score, like the exact path.
    """
    from aiotcvectordb_spark.functions.vector import (
        metric_score_fixed,
        score_is_better_desc,
    )
    from pyspark.sql import Window
    from pyspark.sql import types as T

    num_hash_tables, pool = ef_to_lsh_params(ef)
    pool = max(pool, limit)
    metric_u = metric.upper()
    dim = len(vectors[0])

    if metric_u == "L2":
        lsh_df = df
        lsh_vectors = [[float(x) for x in v] for v in vectors]
    else:
        # unit-normalize both sides for the candidate stage
        # zero-norm floor: 0/1e-12 = a zero unit vector (hashable),
        # never an ANSI DIVIDE_BY_ZERO abort
        norm = (
            f"greatest(sqrt(aggregate(transform({vector_col}, v -> cast(v as double) * "
            "cast(v as double)), cast(0 as double), (a, b) -> a + b)), cast(1e-12 as double))"
        )
        lsh_df = df.withColumn(
            "__lsh_vec",
            F.expr(f"transform({vector_col}, v -> cast(v as double) / {norm})"),
        )
        def _unit(v):
            import math
            n = math.sqrt(sum(float(x) * float(x) for x in v)) or 1.0
            return [float(x) / n for x in v]
        lsh_vectors = [_unit(v) for v in vectors]

    cands = lsh_search(
        lsh_df,
        lsh_vectors,
        vector_col="__lsh_vec" if metric_u != "L2" else vector_col,
        id_col=id_col,
        limit=pool,
        bucket_length=bucket_length,
        num_hash_tables=num_hash_tables,
    ).select("query_idx", id_col)

    # exact rescore of the candidate pool in the true metric
    qdf = df.sparkSession.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vectors)],
        T.StructType(
            [
                T.StructField("query_idx", T.IntegerType(), False),
                T.StructField("__qvec", T.ArrayType(T.DoubleType()), False),
            ]
        ),
    )
    rescored = (
        cands.join(df.select(id_col, vector_col), id_col)
        .join(F.broadcast(qdf), "query_idx")
        .withColumn(
            "score", metric_score_fixed(metric_u, vector_col, "__qvec", dim)
        )
        .drop("__qvec", vector_col)
    )
    order = [
        F.col("score").desc() if score_is_better_desc(metric_u) else F.col("score").asc(),
        F.col(id_col).asc(),
    ]
    w = Window.partitionBy("query_idx").orderBy(*order)
    return rescored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= limit
    )
