"""Driver-facing query registry: Spark implementation + DuckDB oracle SQL.

Every entry corresponds to an operator from SURVEY.md §2 (or a
north-star LLM-pipeline extension). Each Spark callable takes
``(spark, sf_dir)`` and returns a DataFrame whose columns/aliases match
the oracle SQL exactly; the driver hash-compares them at sf0.01.

Float determinism contract: every computed score is rounded to
``ROUND_DIGITS`` decimals on BOTH sides, and every top-k orders by the
rounded score with an id tiebreak — so cross-engine last-bit float
differences can't flip rows in or out of a result.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aiotcvectordb_spark.engine import (
    delete_rows,
    update_dataframe,
    upsert_dataframes,
)
from aiotcvectordb_spark.operators import fulltext, hybrid, knn
from aiotcvectordb_spark.functions import sparse as sparse_fn
from aiotcvectordb_spark.partitioning import ensure_min_partitions
from aiotcvectordb_spark.payloadstore import payload_table

ROUND_DIGITS = 6
DIM = 64


# DataFrame handle cache: the testdata tables are immutable, so the
# resolved scan (schema from the parquet footer) can be reused across
# queries in one session. Without this every registry query pays the
# footer read + analysis again — a fixed driver-side tax that dominates
# sub-second queries. Keyed by (applicationId, startTime) — a stable
# identity that a new SparkContext can never reuse (unlike id(), which
# CPython recycles after GC) — and purged on context change, so entries
# for dead contexts neither leak nor get served stale.
_LOAD_CACHE: dict[tuple[str, int, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # events.ts has shipped as parquet TIMESTAMP(NANOS) (reads as BIGINT
    # epoch-nanos under nanosAsLong — without the flag a vanilla session
    # fails the scan with PARQUET_TYPE_ILLEGAL) and as TIMESTAMP(MICROS)
    # (reads as TIMESTAMP_NTZ). Normalize to BIGINT epoch-nanos, the
    # engine's canonical event-time representation; UTC session tz makes
    # the NTZ->epoch conversion match DuckDB's epoch_ns(naive ts).
    from aiotcvectordb_spark.sources.event_time import normalize_event_time

    sc = spark.sparkContext
    ctx = (sc.applicationId, sc.startTime)
    key = ctx + (sf_dir, table)
    hit = _LOAD_CACHE.get(key)
    if hit is not None:
        return hit
    # drop handles bound to any previous (now-dead) context
    for k in [k for k in _LOAD_CACHE if k[:2] != ctx]:
        del _LOAD_CACHE[k]
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = normalize_event_time(spark.read.parquet(f"{sf_dir}/{table}.parquet"))
    _LOAD_CACHE[key] = df
    return df


def qvec(seed: float, dim: int = DIM) -> list[float]:
    """Deterministic query vector, rounded so the Spark literal and the
    SQL literal are the identical doubles."""
    return [round(math.sin(0.1 * i + seed), 6) for i in range(dim)]


def _sql_vec(v: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in v) + "]::DOUBLE[]"


def _sql_queries_cte(vectors: list[list[float]]) -> str:
    rows = ", ".join(f"({i}, {_sql_vec(v)})" for i, v in enumerate(vectors))
    return f"queries(query_idx, qv) AS (VALUES {rows})"


_COS_SQL = (
    "COALESCE(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv) / "
    "NULLIF(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) "
    "* sqrt(list_dot_product(q.qv, q.qv)), 0), 0.0)"
)
_IP_SQL = "list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)"
_L2_SQL = (
    "sqrt(list_dot_product("
    "list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), q.qv), p -> p[1] - p[2]), "
    "list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), q.qv), p -> p[1] - p[2])))"
)

# DuckDB tokenizer identical to sparse_fn.tokens_col
_TOKS_SQL = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"
)

# DuckDB tokenizer identical to sparse_fn.bm25_tokens_col (CJK-aware:
# latin words as-is, CJK runs as overlapping character bigrams; equal to
# _TOKS_SQL on pure-ASCII text). range(1, greatest(len, 2)) mirrors
# sequence(1, greatest(len - 1, 1)): 1..len-1 for len>=2, [1] for len=1.
# Mirrors the Spark side's ASCII fast path (CASE on CJK presence) so
# both engines execute equivalent branch structures.


def _duck_bm25_toks_sql(col: str) -> str:
    cjk_full = (
        "flatten(list_transform("
        f"regexp_extract_all(lower({col}), '{sparse_fn.SEGMENT_RE}'), "
        f"s -> CASE WHEN regexp_matches(s, '^[{sparse_fn.CJK_RANGES}]') "
        "THEN list_transform(range(1, greatest(length(s), 2)), i -> substr(s, i, 2)) "
        "ELSE [s] END))"
    )
    ascii_fast = (
        f"list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), t -> t <> '')"
    )
    return (
        f"CASE WHEN regexp_matches({col}, '[{sparse_fn.CJK_RANGES}]') "
        f"THEN {cjk_full} ELSE {ascii_fast} END"
    )


_BM25_TOKS_SQL = _duck_bm25_toks_sql("text")

# "word character" class for quality ratios: ascii alnum + space + the
# CJK scripts the tokenizer handles — identical semantics in Java regex
# (Spark) and RE2 (DuckDB), both character-class literals
_WORDCHAR_CLASS = f"[a-z0-9 {sparse_fn.CJK_RANGES}]"


def _knn_oracle(
    vectors: list[list[float]],
    metric_sql: str,
    *,
    desc: bool,
    limit: int,
    where: str = "",
    radius_sql: str = "",
    extra_cols: str = ", e.label",
) -> str:
    direction = "DESC" if desc else "ASC"
    return f"""
WITH {_sql_queries_cte(vectors)},
scored AS (
  SELECT q.query_idx, e.vec_id{extra_cols}, {metric_sql} AS s
  FROM embeddings e CROSS JOIN queries q
  {where}
){radius_sql and f", filtered AS (SELECT * FROM scored WHERE {radius_sql})" or ""}
SELECT query_idx, vec_id, round(s, {ROUND_DIGITS}) AS score,
       CAST(row_number() OVER (PARTITION BY query_idx
            ORDER BY round(s, {ROUND_DIGITS}) {direction}, vec_id) AS INT) AS rank
       {extra_cols.replace('e.', '')}
FROM {radius_sql and "filtered" or "scored"}
QUALIFY rank <= {limit}
ORDER BY query_idx, rank
"""


# --------------------------------------------------------------------------
# §2.5 vector search (ops 28-31)
# --------------------------------------------------------------------------

FLAGSHIP_VECTORS = [qvec(1.0), qvec(2.0)]


def q_search_flat_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 28, FLAT COSINE: batch-of-2 filtered exact kNN top-10."""
    df = load(spark, sf_dir, "embeddings")
    return knn.knn_search(
        df,
        FLAGSHIP_VECTORS,
        vector_col="embedding",
        id_col="vec_id",
        metric="COSINE",
        limit=10,
        filter="label IN (1, 2)",
        output_fields=["label"],
        round_digits=ROUND_DIGITS,
    ).select("query_idx", "vec_id", "score", "rank", "label")


ORACLE_SEARCH_FLAT_COSINE = _knn_oracle(
    FLAGSHIP_VECTORS, _COS_SQL, desc=True, limit=10,
    where="WHERE e.label IN (1, 2)",
)


def q_search_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped (diversify-by-field) vector search (r9,
    operators/knn.grouped_knn_search): for each query, the top-5
    LABELS ranked by their best-matching vector, one representative
    per label — the group_by search mode that keeps a result page
    from being k near-duplicates of one document. The per-group
    representative is a lexicographic struct-min aggregate (map-side
    partials reduce each scan task to <= Q x labels rows before the
    keyed shuffle — never a corpus-wide window); the group ranking
    window then sees <= labels rows per query."""
    df = load(spark, sf_dir, "embeddings")
    return knn.grouped_knn_search(
        df,
        FLAGSHIP_VECTORS,
        vector_col="embedding",
        id_col="vec_id",
        group_col="label",
        metric="COSINE",
        groups=5,
        round_digits=ROUND_DIGITS,
    )


ORACLE_SEARCH_GROUPED = f"""
WITH {_sql_queries_cte(FLAGSHIP_VECTORS)},
scored AS (
  SELECT q.query_idx, e.label, e.vec_id, round({_COS_SQL}, {ROUND_DIGITS}) AS s
  FROM embeddings e CROSS JOIN queries q
),
rep AS (
  SELECT query_idx, label, vec_id, s
  FROM scored
  QUALIFY row_number() OVER (PARTITION BY query_idx, label
          ORDER BY s DESC, vec_id) = 1
)
SELECT query_idx, label, vec_id, s AS score,
       CAST(row_number() OVER (PARTITION BY query_idx
            ORDER BY s DESC, label) AS INT) AS group_rank
FROM rep
QUALIFY group_rank <= 5
"""


_N_BIN_BYTES = DIM // 8


def _binarize_spark_expr(vec: str) -> str:
    """Sign-bit pack: byte_j's bit k = (vec[8j+k] > 0) — dim floats to
    dim/8 bytes, pure SQL."""
    bytes_ = []
    for j in range(_N_BIN_BYTES):
        bits = " + ".join(
            f"(case when cast({vec}[{8 * j + k}] as double) > 0 then {1 << k} else 0 end)"
            for k in range(8)
        )
        bytes_.append(f"({bits})")
    return f"array({', '.join(bytes_)})"


def _binarize_py(v: list[float]) -> list[float]:
    out = []
    for j in range(len(v) // 8):
        b = 0
        for k in range(8):
            if v[8 * j + k] > 0:
                b |= 1 << k
        out.append(float(b))
    return out


def q_search_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIN_FLAT (vendor index type for binary vectors): embeddings are
    sign-bit packed to dim/8 bytes (the classic random-hyperplane-style
    binary sketch) and ranked by HAMMING distance — popcount of the
    per-byte XOR, fully inside whole-stage codegen
    (functions/vector.hamming_score_fixed). 32x less vector I/O than
    float32 at 100 TB, and the distance is integral so the oracle hash
    is exact."""
    emb = load(spark, sf_dir, "embeddings")
    bin_df = emb.select(
        "vec_id", F.expr(_binarize_spark_expr("embedding")).alias("bvec")
    )
    qb = [_binarize_py(qvec(1.0)), _binarize_py(qvec(-1.0))]
    return knn.knn_search(
        bin_df,
        qb,
        vector_col="bvec",
        id_col="vec_id",
        metric="HAMMING",
        limit=10,
        round_digits=ROUND_DIGITS,
    ).select("query_idx", "vec_id", "score", "rank")


def _bin_byte_sql(j: int) -> str:
    bits = " + ".join(
        f"(CASE WHEN CAST(e.embedding[{8 * j + k + 1}] AS DOUBLE) > 0 THEN {1 << k} ELSE 0 END)"
        for k in range(8)
    )
    return f"({bits})"


ORACLE_SEARCH_BINARY_HAMMING = f"""
WITH queries(query_idx, qv) AS (VALUES {", ".join(
    f"({i}, [{', '.join(str(int(b)) for b in v)}]::INT[])"
    for i, v in enumerate([_binarize_py(qvec(1.0)), _binarize_py(qvec(-1.0))])
)}),
scored AS (
  SELECT q.query_idx, e.vec_id,
         CAST({" + ".join(f"bit_count(xor({_bin_byte_sql(j)}, q.qv[{j + 1}]))" for j in range(_N_BIN_BYTES))} AS DOUBLE) AS s
  FROM embeddings e CROSS JOIN queries q
)
SELECT query_idx, vec_id, round(s, {ROUND_DIGITS}) AS score,
       CAST(row_number() OVER (PARTITION BY query_idx
            ORDER BY round(s, {ROUND_DIGITS}) ASC, vec_id) AS INT) AS rank
FROM scored
QUALIFY rank <= 10
ORDER BY query_idx, rank
"""


def q_search_flat_cosine_local_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 28 via the bounded-shuffle scale path: identical semantics to
    `search_flat_cosine` but ``strategy="local_topk"`` — a per-partition
    numpy top-k (mapInPandas) emits <= partitions x Q x k rows into the
    final window instead of N x Q, the plan that survives a 1000-executor
    100 TB scan (knn.py _local_topk_candidates). Driver-checked against
    the SAME oracle so the scale path is hash-verified every round."""
    df = load(spark, sf_dir, "embeddings")
    return knn.knn_search(
        df,
        FLAGSHIP_VECTORS,
        vector_col="embedding",
        id_col="vec_id",
        metric="COSINE",
        limit=10,
        filter="label IN (1, 2)",
        output_fields=["label"],
        round_digits=ROUND_DIGITS,
        strategy="local_topk",
    ).select("query_idx", "vec_id", "score", "rank", "label")

def q_search_udtf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 28 via the SQL table-function surface: the same exact COSINE
    top-10 as `search_flat_cosine`, but expressed as ONE SQL statement
    through the `topk_by_score` Python UDTF (two-phase bounded-shuffle
    selection — k per hash partition, then a single-partition merge of
    parts*k survivors). Scores are rounded before selection so the
    (score, id) rank order is engine-exact."""
    from aiotcvectordb_spark.functions.topk_udtf import (
        knn_topk_sql,
        register_topk_udtf,
    )
    from aiotcvectordb_spark.functions.vector import register_sql_functions

    register_sql_functions(spark)
    register_topk_udtf(spark)
    load(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings_for_udtf")
    sql = knn_topk_sql(
        "embeddings_for_udtf",
        qvec(1.0),
        metric="COSINE",
        k=10,
        parts=32,
        round_digits=ROUND_DIGITS,
    )
    return spark.sql(sql).select(F.col("id").alias("vec_id"), "score")


ORACLE_SEARCH_UDTF_TOPK = f"""
WITH q AS (SELECT {_sql_vec(qvec(1.0))} AS qv),
scored AS (
  SELECT e.vec_id, round({_COS_SQL}, {ROUND_DIGITS}) AS score
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, score FROM scored ORDER BY score DESC, vec_id LIMIT 10
"""


_L2_VECTORS = [qvec(3.0)]


def q_search_flat_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "embeddings")
    return knn.knn_search(
        df,
        _L2_VECTORS,
        vector_col="embedding",
        id_col="vec_id",
        metric="L2",
        limit=5,
        output_fields=["label"],
        round_digits=ROUND_DIGITS,
    ).select("query_idx", "vec_id", "score", "rank", "label")


ORACLE_SEARCH_FLAT_L2 = _knn_oracle(_L2_VECTORS, _L2_SQL, desc=False, limit=5)

_IP_VECTORS = [qvec(4.0)]


def q_search_flat_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "embeddings")
    return knn.knn_search(
        df,
        _IP_VECTORS,
        vector_col="embedding",
        id_col="vec_id",
        metric="IP",
        limit=5,
        filter="label = 0",
        output_fields=["label"],
        round_digits=ROUND_DIGITS,
    ).select("query_idx", "vec_id", "score", "rank", "label")


ORACLE_SEARCH_FLAT_IP = _knn_oracle(
    _IP_VECTORS, _IP_SQL, desc=True, limit=5, where="WHERE e.label = 0"
)

_RADIUS_VECTORS = [qvec(5.0)]
_RADIUS = 0.05


def q_search_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 31: radius threshold (COSINE: keep score >= r) + top-k."""
    df = load(spark, sf_dir, "embeddings")
    return knn.knn_search(
        df,
        _RADIUS_VECTORS,
        vector_col="embedding",
        id_col="vec_id",
        metric="COSINE",
        limit=100,
        radius=_RADIUS,
        output_fields=["label"],
        round_digits=ROUND_DIGITS,
    ).select("query_idx", "vec_id", "score", "rank", "label")


ORACLE_SEARCH_RADIUS = _knn_oracle(
    _RADIUS_VECTORS, _COS_SQL, desc=True, limit=100,
    radius_sql=f"s >= {_RADIUS}",
)

_BYID_IDS = [7, 11]


def q_search_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 29: query vectors looked up from stored rows; top-1 is self."""
    df = load(spark, sf_dir, "embeddings")
    return knn.search_by_id(
        df,
        _BYID_IDS,
        vector_col="embedding",
        id_col="vec_id",
        metric="COSINE",
        limit=5,
        output_fields=["label"],
        round_digits=ROUND_DIGITS,
    ).select("query_idx", "vec_id", "score", "rank", "label")


ORACLE_SEARCH_BY_ID = f"""
WITH queries AS (
  SELECT 0 AS query_idx, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {_BYID_IDS[0]}
  UNION ALL
  SELECT 1, CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = {_BYID_IDS[1]}
),
scored AS (
  SELECT q.query_idx, e.vec_id, e.label, {_COS_SQL} AS s
  FROM embeddings e CROSS JOIN queries q
)
SELECT query_idx, vec_id, round(s, {ROUND_DIGITS}) AS score,
       CAST(row_number() OVER (PARTITION BY query_idx
            ORDER BY round(s, {ROUND_DIGITS}) DESC, vec_id) AS INT) AS rank, label
FROM scored QUALIFY rank <= 5 ORDER BY query_idx, rank
"""


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity join (north star): for each probe (vec_id < 3), its
    top-3 cosine neighbors among label = 0 rows."""
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    cands = emb.filter("label = 0")
    return (
        knn.knn_join(
            probes,
            cands,
            left_vec="embedding",
            right_vec="embedding",
            left_id="query_id",
            right_id="vec_id",
            metric="COSINE",
            k=3,
            round_digits=ROUND_DIGITS,
            dim=DIM,
        )
        .select(
            "query_id", "vec_id", "score",
            F.col("rank").cast("int").alias("rank"), "label",
        )
    )


ORACLE_KNN_JOIN = f"""
WITH probes AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                FROM embeddings WHERE vec_id < 3),
scored AS (
  SELECT p.query_id, e.vec_id, e.label,
         COALESCE(list_dot_product(CAST(e.embedding AS DOUBLE[]), p.qv)
         / NULLIF(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(p.qv, p.qv)), 0), 0.0) AS s
  FROM embeddings e CROSS JOIN probes p WHERE e.label = 0
)
SELECT query_id, vec_id, round(s, {ROUND_DIGITS}) AS score,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY round(s, {ROUND_DIGITS}) DESC, vec_id) AS INT) AS rank, label
FROM scored QUALIFY rank <= 3 ORDER BY query_id, rank
"""


# --------------------------------------------------------------------------
# §2.3 filtered reads (ops 23-27)
# --------------------------------------------------------------------------


# events.ts is TIMESTAMP(NANOS) in parquet; Spark (nanosAsLong) sees a
# long of epoch-nanoseconds, DuckDB sees a timestamp — both sides surface
# it as exact integer epoch-seconds.
_TS_EPOCH_SPARK = "CAST(ts DIV 1000000000 AS BIGINT)"
_TS_EPOCH_SQL = "epoch_ns(ts) // 1000000000"


def q_query_filter_sort_paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ops 23/26/27: filter -> sort (asc, id tiebreak) -> offset/limit ->
    project. Timestamps surfaced as epoch seconds for engine parity."""
    df = load(spark, sf_dir, "events")
    return (
        df.filter("event_type = 'click' AND value > 10")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .offset(20)
        .limit(50)
        .select(
            "event_id",
            F.expr(_TS_EPOCH_SPARK).alias("ts_epoch"),
            "user_id",
            "value",
        )
    )


ORACLE_QUERY_FILTER_SORT_PAGINATE = f"""
SELECT event_id, {_TS_EPOCH_SQL} AS ts_epoch, user_id, value
FROM events
WHERE event_type = 'click' AND value > 10
ORDER BY ts, event_id LIMIT 50 OFFSET 20
"""

_QUERY_IDS = [1, 5, 9, 42, 137, 4242]


def q_query_by_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 23: fetch by document_ids with projection."""
    df = load(spark, sf_dir, "events")
    return (
        df.filter(F.col("event_id").isin(_QUERY_IDS))
        .orderBy("event_id")
        .select("event_id", "event_type", "value")
    )


ORACLE_QUERY_BY_IDS = f"""
SELECT event_id, event_type, value FROM events
WHERE event_id IN ({", ".join(map(str, _QUERY_IDS))}) ORDER BY event_id
"""


def q_count_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 24: count with filter."""
    df = load(spark, sf_dir, "lineitem")
    return df.filter("l_discount > 0.05 AND l_quantity < 25").agg(
        F.count("*").alias("n")
    )


ORACLE_COUNT_FILTER = """
SELECT count(*) AS n FROM lineitem WHERE l_discount > 0.05 AND l_quantity < 25
"""


def q_query_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 25: output_fields=[] -> only the id column comes back."""
    df = load(spark, sf_dir, "documents")
    return df.orderBy("doc_id").limit(20).select("doc_id")


ORACLE_QUERY_PROJECTION = "SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20"


_TTL_CUTOFF = 1705708800  # 2024-01-20 00:00:00 UTC


def q_ttl_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 22: TTL read-time predicate — rows past the time field survive."""
    df = load(spark, sf_dir, "events")
    return (
        df.filter(F.expr(_TS_EPOCH_SPARK) > _TTL_CUTOFF)
        .select("event_id", F.expr(_TS_EPOCH_SPARK).alias("ts_epoch"))
    )


ORACLE_TTL_FILTER = f"""
SELECT event_id, {_TS_EPOCH_SQL} AS ts_epoch
FROM events WHERE {_TS_EPOCH_SQL} > {_TTL_CUTOFF}
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-scalar-field access: JSON props column (schemaless docs)."""
    df = load(spark, sf_dir, "events")
    return (
        df.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        )
        .filter("k_val >= 50")
    )


ORACLE_JSON_EXTRACT = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
"""


# --------------------------------------------------------------------------
# §2.2 writes as pure transforms (ops 19-21)
# --------------------------------------------------------------------------


def _upsert_batch(spark: SparkSession) -> DataFrame:
    rows = [
        (i, f"updated doc {i}", "en", "upsert", len(f"updated doc {i}"))
        for i in range(10)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 19: insert-or-replace — survivors (anti-join on pk) + new batch."""
    old = load(spark, sf_dir, "documents")
    return upsert_dataframes(old, _upsert_batch(spark), "doc_id").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


ORACLE_UPSERT_MERGE = """
WITH new AS (
  SELECT CAST(i AS BIGINT) AS doc_id, 'updated doc ' || i AS text,
         'en' AS lang, 'upsert' AS source,
         CAST(length('updated doc ' || i) AS BIGINT) AS n_chars
  FROM range(10) r(i)
)
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM new)
UNION ALL
SELECT doc_id, text, lang, source, n_chars FROM new
"""


def q_update_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 20: partial update by filter — lang := 'unk' where source matches."""
    df = load(spark, sf_dir, "documents")
    updated = update_dataframe(
        df, F.col("source").isin("src0", "src1"), {"lang": "unk"}
    )
    return updated.select("doc_id", "lang", "source")


ORACLE_UPDATE_CONDITIONAL = """
SELECT doc_id,
       CASE WHEN source IN ('src0', 'src1') THEN 'unk' ELSE lang END AS lang,
       source
FROM documents
"""


def q_delete_filter_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 21: delete by filter with limit — victims chosen deterministically
    by pk order; returns the remaining rows."""
    df = load(spark, sf_dir, "events")
    remaining, _ = delete_rows(
        df, F.col("event_type") == "view", "event_id", limit=100
    )
    return remaining.select("event_id", "event_type")


ORACLE_DELETE_FILTER_LIMIT = """
SELECT event_id, event_type FROM events
WHERE event_id NOT IN (
  SELECT event_id FROM events WHERE event_type = 'view'
  ORDER BY event_id LIMIT 100
)
"""


# --------------------------------------------------------------------------
# §2.5 sparse / full-text (ops 33-34) and hybrid (op 32)
# --------------------------------------------------------------------------

_FT_QUERY = "spark join window"


# Persisted sparse index per (session, dataset) — the engine analog of
# the reference's PREBUILT SparseIndex (rebuild_index, stub.py:828-858):
# queries hit the index; only the first query per corpus pays the build.
# At cluster scale this persist becomes a bucketed-by-term_id parquet
# table written by the index job.
_SPARSE_INDEX_CACHE: dict[tuple[str, str], DataFrame] = {}


def sparse_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SPARSE_INDEX_CACHE:
        df = ensure_min_partitions(load(spark, sf_dir, "documents"))
        postings, _ = sparse_fn.build_postings(df, id_col="doc_id", text_col="text")
        _SPARSE_INDEX_CACHE[key] = postings.persist()
    return _SPARSE_INDEX_CACHE[key]


def q_fulltext_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 33: BM25 full-text search, top-10."""
    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    return fulltext.fulltext_search_df(
        df,
        _FT_QUERY,
        id_col="doc_id",
        text_col="text",
        limit=10,
        round_digits=ROUND_DIGITS,
        postings=sparse_index(spark, sf_dir),
    ).select("doc_id", "score", F.col("rank").cast("int").alias("rank"))


def _bm25_base_cte(relation: str = "documents") -> str:
    """CTE chain computing terms/stats/dfreq for the BM25 corpus model.

    Uses the CJK-aware tokenizer (_BM25_TOKS_SQL) to mirror
    sparse_fn.build_postings exactly."""
    return f"""
toks AS (SELECT doc_id, {_BM25_TOKS_SQL} AS ts FROM {relation}),
terms AS (
  SELECT doc_id, len(ts) AS dl, t.token AS token, count(*) AS tf
  FROM toks, unnest(ts) AS t(token)
  GROUP BY doc_id, len(ts), t.token
),
stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl
  FROM (SELECT doc_id, any_value(dl) AS dl FROM terms GROUP BY doc_id)
),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM terms GROUP BY token)"""


def _bm25_oracle_cte(relation: str = "documents", query_text: str = _FT_QUERY) -> str:
    """Full BM25 CTE chain computing scored(doc_id, s) for query_text."""
    qvals = ", ".join(
        f"('{t}')" for t in sorted(set(sparse_fn._TOKENS_FOR_QUERY(query_text)))
    )
    return f"""{_bm25_base_cte(relation)},
qterms(token) AS (VALUES {qvals}),
scored AS (
  SELECT terms.doc_id,
         sum(
           ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           * (terms.tf * (1.2 + 1)) /
             (terms.tf + 1.2 * (1 - 0.75 + 0.75 * terms.dl / stats.avgdl))
         ) AS s
  FROM terms
  JOIN dfreq USING (token)
  JOIN qterms USING (token)
  CROSS JOIN stats
  GROUP BY terms.doc_id
)"""


ORACLE_FULLTEXT_BM25 = f"""
WITH {_bm25_oracle_cte()}
SELECT doc_id, round(s, {ROUND_DIGITS}) AS score,
       CAST(row_number() OVER (ORDER BY round(s, {ROUND_DIGITS}) DESC, doc_id) AS INT) AS rank
FROM scored QUALIFY rank <= 10 ORDER BY rank
"""


_PHRASE_QUERY = "value table part"


def _phrase_count_col(toks: list[str], text_col: str = "text"):
    """Occurrences of the token phrase in ``text_col``'s CJK-aware
    token stream, as ONE scan-projection expression: the phrase occurs
    at token i iff the separator-joined stream contains
    sep·t1·sep·...·sep·tm·sep starting at i's separator, and a
    ZERO-WIDTH lookahead advances one char per attempt so OVERLAPPING
    occurrences ('a a' in 'a a a a' = 3) each count. One regexp_count
    over ONE array_join = the tokenizer is evaluated exactly once per
    row. (The first cut was an aggregate()-HOF sliding slice-equality
    fold referencing the token column from inside the lambda —
    CollapseProject inlined the tokenizer INTO the lambda body,
    re-running regexp_extract_all once per window position: 92× the
    runtime at the 100× probe. Single-reference formulations are the
    rule for expensive projections consumed by higher-order
    functions.)"""
    sep = "\x1f"
    needle = sep + sep.join(toks) + sep
    stream = F.concat(
        F.lit(sep),
        F.array_join(sparse_fn.bm25_tokens_col(text_col), sep),
        F.lit(sep),
    )
    return F.regexp_count(stream, F.lit("(?=\\Q" + needle + "\\E)")).cast(
        "int"
    )


def q_fulltext_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-PHRASE full-text search (r9) — the adjacency-match mode
    BM25's bag-of-terms scoring cannot express: a document matches iff
    the query's tokens appear CONSECUTIVELY in its (CJK-aware) token
    stream, ranked by occurrence count. The counter is ONE map-only
    zero-width-lookahead ``regexp_count`` over the separator-joined
    ``bm25_tokens_col`` stream — a single-pass scan-projection
    expression (overlapping occurrences each count), so an ad-hoc
    phrase costs exactly one corpus
    scan with zero shuffle before the 10-row top-k. (With a persisted
    POSITIONAL postings index the same semantics become an m-way
    (doc, pos + i) equi-join — the serving-scale form; the scan form
    is the right plan when the phrase is ad hoc and the corpus is
    fresh.) Deterministic (phrase_count DESC, doc_id ASC) ranking."""
    cnt = _phrase_count_col(sparse_fn._TOKENS_FOR_QUERY(_PHRASE_QUERY))
    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    hits = (
        df.select("doc_id", cnt.alias("phrase_count"))
        .filter("phrase_count > 0")
        .orderBy(F.col("phrase_count").desc(), F.col("doc_id").asc())
        .limit(10)
    )
    w = Window.orderBy(F.col("phrase_count").desc(), F.col("doc_id").asc())
    return hits.withColumn("rank", F.row_number().over(w).cast("int"))


def _phrase_oracle() -> str:
    toks = sparse_fn._TOKENS_FOR_QUERY(_PHRASE_QUERY)
    m = len(toks)
    lit = "[" + ", ".join("'" + t.replace("'", "''") + "'" for t in toks) + "]"
    return f"""
WITH toks AS (SELECT doc_id, {_BM25_TOKS_SQL} AS ts FROM documents),
hits AS (
  SELECT doc_id,
         CAST(length(list_filter(range(1, greatest(len(ts) - {m} + 1, 1) + 1),
              i -> ts[i:i+{m - 1}] = {lit})) AS INTEGER) AS phrase_count
  FROM toks
)
SELECT doc_id, phrase_count,
       CAST(row_number() OVER (ORDER BY phrase_count DESC, doc_id) AS INT) AS rank
FROM hits
WHERE phrase_count > 0
QUALIFY rank <= 10
ORDER BY rank
"""


ORACLE_FULLTEXT_PHRASE = _phrase_oracle()

# Chinese-language fixture corpus for the CJK full-text path. The
# reference's flagship text test searches Chinese ("苹果" must rank the
# apple doc first — tests/test_documents/test_documents_search_text.py:
# 20-33, jieba-backed encoder); our CJK bigram tokenizer must do the
# same. Inline corpus so the query is self-contained and the DuckDB
# oracle sees byte-identical data via a VALUES CTE.
CJK_CORPUS: list[tuple[str, str]] = [
    ("c_apple", "苹果很好吃，我每天都吃一个大苹果"),
    ("c_banana", "香蕉是黄色的水果，猴子最爱吃香蕉"),
    ("c_grape", "葡萄可以用来酿酒，紫色的葡萄很甜"),
    ("c_mixed", "水果店里有苹果、香蕉和葡萄，还有 apple juice"),
    ("c_tech", "apple 手机和电脑都很贵，但是质量不错"),
    ("c_en", "the quick brown fox jumps over the lazy dog"),
    ("c_short", "茶"),
    ("c_punct", "！！！？？？"),
]
_CJK_QUERY = "苹果"


def q_fulltext_bm25_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 33 on a Chinese corpus: BM25 full-text search with the CJK
    bigram tokenizer, top-5. Proves the sparse path handles the
    reference's home-turf language end-to-end (build_postings →
    fulltext_search_df, nothing special-cased)."""
    df = spark.createDataFrame(CJK_CORPUS, ["doc_id", "text"]).repartition(4)
    return fulltext.fulltext_search_df(
        df,
        _CJK_QUERY,
        id_col="doc_id",
        text_col="text",
        limit=5,
        round_digits=ROUND_DIGITS,
    ).select("doc_id", "score", F.col("rank").cast("int").alias("rank"))


def _cjk_oracle() -> str:
    corpus_vals = ",\n  ".join(
        "('" + i + "', '" + t.replace("'", "''") + "')" for i, t in CJK_CORPUS
    )
    return f"""
WITH corpus(doc_id, text) AS (VALUES
  {corpus_vals}
),
{_bm25_oracle_cte("corpus", _CJK_QUERY)}
SELECT doc_id, round(s, {ROUND_DIGITS}) AS score,
       CAST(row_number() OVER (ORDER BY round(s, {ROUND_DIGITS}) DESC, doc_id) AS INT) AS rank
FROM scored QUALIFY rank <= 5 ORDER BY rank
"""


ORACLE_FULLTEXT_BM25_CJK = _cjk_oracle()

_CJK_PHRASE = "大苹果"


def q_fulltext_phrase_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search on the Chinese corpus (r9): the phrase
    tokenizes to overlapping character BIGRAMS (大苹果 → [大苹, 苹果]),
    and bigram ADJACENCY in the document's token stream approximates
    character-substring containment — so the same separator-joined
    lookahead counter that serves latin phrases serves Chinese with
    zero special-casing (the fulltext_bm25_cjk precedent: one
    tokenizer, every lane). Known edge (r10, advisor): the token
    stream carries no segment-boundary sentinel, so a phrase's bigrams
    can chain across two ADJACENT CJK segments — '大苹, 苹果' yields
    [大苹, 苹果] and matches 大苹果 though the substring never appears
    in one segment; both engines share the behavior (parity holds) and
    tests/test_search_text_fulltext_hybrid.py pins the edge
    explicitly. Inline VALUES corpus, so the DuckDB twin sees
    byte-identical data."""
    toks = sparse_fn._TOKENS_FOR_QUERY(_CJK_PHRASE)
    df = spark.createDataFrame(CJK_CORPUS, ["doc_id", "text"]).repartition(4)
    hits = (
        df.select("doc_id", _phrase_count_col(toks).alias("phrase_count"))
        .filter("phrase_count > 0")
        .orderBy(F.col("phrase_count").desc(), F.col("doc_id").asc())
        .limit(5)
    )
    w = Window.orderBy(F.col("phrase_count").desc(), F.col("doc_id").asc())
    return hits.withColumn("rank", F.row_number().over(w).cast("int"))


def _cjk_phrase_oracle() -> str:
    toks = sparse_fn._TOKENS_FOR_QUERY(_CJK_PHRASE)
    m = len(toks)
    lit = "[" + ", ".join("'" + t.replace("'", "''") + "'" for t in toks) + "]"
    corpus_vals = ",\n  ".join(
        "('" + i + "', '" + t.replace("'", "''") + "')" for i, t in CJK_CORPUS
    )
    return f"""
WITH corpus(doc_id, text) AS (VALUES
  {corpus_vals}
),
toks AS (SELECT doc_id, {_duck_bm25_toks_sql("text")} AS ts FROM corpus),
hits AS (
  SELECT doc_id,
         CAST(length(list_filter(range(1, greatest(len(ts) - {m} + 1, 1) + 1),
              i -> ts[i:i+{m - 1}] = {lit})) AS INTEGER) AS phrase_count
  FROM toks
)
SELECT doc_id, phrase_count,
       CAST(row_number() OVER (ORDER BY phrase_count DESC, doc_id) AS INT) AS rank
FROM hits
WHERE phrase_count > 0
QUALIFY rank <= 5
ORDER BY rank
"""


ORACLE_FULLTEXT_PHRASE_CJK = _cjk_phrase_oracle()

_HYBRID_VEC = [qvec(3.5)]


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 32: dense + sparse legs fused with RRF(k=60), top-10."""
    docs = ensure_min_partitions(load(spark, sf_dir, "documents"))
    emb = load(spark, sf_dir, "embeddings")
    base = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "embedding"
    )
    return hybrid.hybrid_search_df(
        base,
        ann_vectors=_HYBRID_VEC,
        match_text=_FT_QUERY,
        id_col="doc_id",
        vector_col="embedding",
        text_col="text",
        metric="COSINE",
        rerank={"type": "rrf", "k": 60},
        limit=10,
        fetch_k=40,
        round_digits=ROUND_DIGITS,
        postings=sparse_index(spark, sf_dir),
    ).select(
        "query_idx", "doc_id", "score", F.col("rank").cast("int").alias("rank")
    )


ORACLE_HYBRID_RRF = f"""
WITH base AS (
  SELECT d.doc_id, d.text, e.embedding
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
{_sql_queries_cte(_HYBRID_VEC)},
dense_scored AS (
  SELECT e.doc_id,
         round(COALESCE(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
           / NULLIF(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(q.qv, q.qv)), 0), 0.0), {ROUND_DIGITS}) AS s
  FROM base e CROSS JOIN queries q
),
dense AS (
  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rank
  FROM dense_scored QUALIFY rank <= 40
),
{_bm25_oracle_cte("base")},
sparse AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(s, {ROUND_DIGITS}) DESC, doc_id) AS rank
  FROM scored QUALIFY rank <= 40
),
contribs AS (
  SELECT doc_id, 1.0 / (60 + rank) AS c FROM dense
  UNION ALL
  SELECT doc_id, 1.0 / (60 + rank) AS c FROM sparse
),
fused AS (SELECT doc_id, sum(c) AS s FROM contribs GROUP BY doc_id)
SELECT 0 AS query_idx, doc_id, round(s, {ROUND_DIGITS}) AS score,
       CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
FROM fused QUALIFY rank <= 10 ORDER BY rank
"""


def q_sparse_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 34: BM25 sparse-vector encoding — per-doc term count and weight
    mass of the encoded sparse_vector."""
    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    postings, _ = sparse_fn.build_postings(df, id_col="doc_id", text_col="text")
    return (
        postings.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.round(F.sum("weight"), ROUND_DIGITS).alias("weight_sum"),
        )
        .select("doc_id", "n_terms", "weight_sum")
    )


ORACLE_SPARSE_ENCODE = f"""
WITH {_bm25_base_cte()},
weights AS (
  SELECT terms.doc_id,
         ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
         * (terms.tf * (1.2 + 1)) /
           (terms.tf + 1.2 * (1 - 0.75 + 0.75 * terms.dl / stats.avgdl)) AS w
  FROM terms JOIN dfreq USING (token) CROSS JOIN stats
)
SELECT doc_id, count(*) AS n_terms, round(sum(w), {ROUND_DIGITS}) AS weight_sum
FROM weights GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# North-star: dedup / text analysis (documents table)
# --------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized text, keep min id."""
    df = load(spark, sf_dir, "documents")
    return (
        df.withColumn("fp", F.md5(F.lower(F.col("text"))))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_dups"))
        .select("doc_id", "fp", "n_dups")
    )


ORACLE_DEDUP_EXACT = """
SELECT min(doc_id) AS doc_id, md5(lower(text)) AS fp, count(*) AS n_dups
FROM documents GROUP BY md5(lower(text))
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over the normalized token stream.
    CJK-aware (r4): the bigram tokenizer keeps Chinese/Japanese/Korean
    content in the stream — with the ASCII tokenizer every all-CJK doc
    collapsed to md5(''), one giant false dup group. ASCII corpora hash
    identically to before (the tokenizers agree on ASCII)."""
    df = load(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", sparse_fn.bm25_tokens_col("text"))
        ).alias("fp"),
    )


ORACLE_DOC_FINGERPRINT = f"""
SELECT doc_id,
       md5(COALESCE(array_to_string({_BM25_TOKS_SQL}, ' '), '')) AS fp
FROM documents
"""

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token count, char len, punct ratio, stopword ratio."""
    df = load(spark, sf_dir, "documents")
    stop_list = ", ".join(f"'{w}'" for w in _STOPWORDS)
    toks_sql = sparse_fn.bm25_tokens_sql("text")  # CJK-aware (r4)
    toks = sparse_fn.bm25_tokens_col("text")
    return df.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("len_chars"),
        # "word characters" include CJK (r4): with the ASCII-only class
        # every Chinese doc scored alnum_ratio ~0 and the curation
        # quality gate (>= 0.6) dropped the whole corpus
        F.round(
            (
                F.length("text")
                - F.length(
                    F.regexp_replace(
                        F.lower("text"), _WORDCHAR_CLASS, ""
                    )
                )
            )
            # NULLIF guard: a zero-length or zero-token doc must score
            # NULL, not abort the whole scan with DIVIDE_BY_ZERO under
            # ANSI mode — at 100 TB one empty doc would kill the job
            / F.nullif(F.length("text"), F.lit(0)),
            ROUND_DIGITS,
        ).alias("alnum_ratio"),
        F.round(
            F.expr(f"size(filter({toks_sql}, t -> t IN ({stop_list})))")
            / F.nullif(F.size(toks), F.lit(0)),
            ROUND_DIGITS,
        ).alias("stopword_ratio"),
    )


ORACLE_TEXT_QUALITY = f"""
SELECT doc_id,
       CAST(len({_BM25_TOKS_SQL}) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS len_chars,
       round((length(text) - length(regexp_replace(lower(text), '{_WORDCHAR_CLASS}', '', 'g')))
             * 1.0 / NULLIF(length(text), 0), {ROUND_DIGITS}) AS alnum_ratio,
       round(len(list_filter({_BM25_TOKS_SQL},
                 t -> list_contains([{", ".join(f"'{w}'" for w in _STOPWORDS)}], t)))
             * 1.0 / NULLIF(len({_BM25_TOKS_SQL}), 0), {ROUND_DIGITS}) AS stopword_ratio
FROM documents
"""

_LANG_WORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "data", "table"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "une", "pas"),
}


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals for corpus filtering (the Gopher-rule family):
    duplicate-3-gram fraction, duplicate-token fraction, and mean token
    length per document. High n-gram duplication is the strongest
    boilerplate/spam signal a curation pipeline has. All array
    expressions in one projection — fuses into the scan stage, exact
    integer arithmetic until the final division."""
    df = load(spark, sf_dir, "documents")
    toks_sql = sparse_fn.bm25_tokens_sql("text")  # CJK-aware (r4)
    # Materialize tokens and shingles as columns FIRST: higher-order
    # functions are CodegenFallback and evaluate their whole lambda
    # subtree per element, so inlining the regex split into the shingle
    # lambda would re-tokenize the document once per shingle (O(n^2)).
    toked = df.select("doc_id", F.expr(toks_sql).alias("toks")).filter(
        F.expr("size(toks) >= 3")
    )
    shingled = toked.withColumn(
        "sh",
        F.expr(
            "transform(sequence(1, size(toks) - 2), "
            "i -> concat_ws(' ', slice(toks, i, 3)))"
        ),
    )
    return shingled.select(
        "doc_id",
        F.round(
            1 - F.expr("size(array_distinct(sh))") / F.expr("size(sh)"),
            ROUND_DIGITS,
        ).alias("dup_3gram_frac"),
        F.round(
            1 - F.expr("size(array_distinct(toks))") / F.expr("size(toks)"),
            ROUND_DIGITS,
        ).alias("dup_token_frac"),
        F.round(
            F.expr("aggregate(toks, 0L, (a, t) -> a + length(t))")
            / F.expr("size(toks)"),
            ROUND_DIGITS,
        ).alias("mean_token_len"),
    )


ORACLE_DOC_REPETITION = f"""
WITH t AS (
  SELECT doc_id, {_BM25_TOKS_SQL} AS toks FROM documents
),
s AS (
  SELECT doc_id, toks,
         list_transform(range(1, len(toks) - 1),
                        i -> array_to_string(toks[i:i+2], ' ')) AS sh
  FROM t WHERE len(toks) >= 3
)
SELECT doc_id,
       round(1 - len(list_distinct(sh)) * 1.0 / len(sh), {ROUND_DIGITS})
         AS dup_3gram_frac,
       round(1 - len(list_distinct(toks)) * 1.0 / len(toks), {ROUND_DIGITS})
         AS dup_token_frac,
       round(list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks),
             {ROUND_DIGITS}) AS mean_token_len
FROM s
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-hit argmax over per-language lists
    (deterministic priority en > de > fr > unknown on ties)."""
    df = load(spark, sf_dir, "documents")
    hits = {}
    for lg, words in _LANG_WORDS.items():
        wl = ", ".join(f"'{w}'" for w in words)
        hits[lg] = F.expr(
            f"size(filter(filter(split(lower(text), '[^a-z0-9]+'), t -> t != ''),"
            f" t -> t IN ({wl})))"
        )
    pred = (
        F.when((hits["en"] >= hits["de"]) & (hits["en"] >= hits["fr"]) & (hits["en"] > 0), "en")
        .when((hits["de"] >= hits["fr"]) & (hits["de"] > 0), "de")
        .when(hits["fr"] > 0, "fr")
        .otherwise("unknown")
    )
    return df.select("doc_id", pred.alias("pred_lang"))


def _lang_hits_sql(lg: str) -> str:
    wl = ", ".join(f"'{w}'" for w in _LANG_WORDS[lg])
    return f"len(list_filter({_TOKS_SQL}, t -> list_contains([{wl}], t)))"


ORACLE_LANG_ID = f"""
SELECT doc_id,
  CASE
    WHEN {_lang_hits_sql("en")} >= {_lang_hits_sql("de")}
     AND {_lang_hits_sql("en")} >= {_lang_hits_sql("fr")}
     AND {_lang_hits_sql("en")} > 0 THEN 'en'
    WHEN {_lang_hits_sql("de")} >= {_lang_hits_sql("fr")}
     AND {_lang_hits_sql("de")} > 0 THEN 'de'
    WHEN {_lang_hits_sql("fr")} > 0 THEN 'fr'
    ELSE 'unknown'
  END AS pred_lang
FROM documents
"""


# Script classes for CJK language ID: kana is unique to Japanese,
# hangul to Korean; Han alone (no kana) reads as Chinese — the standard
# segmentation-free script heuristic. Ranges match the BM25 tokenizer's
# CJK classes (sparse_fn.CJK_RANGES) minus the split into scripts.
_KANA_CLASS = "぀-ヿ"
_HANGUL_CLASS = "가-힯"
_HAN_CLASS = "㐀-䶿一-鿿"

# Mixed-script fixture corpus: the documents tables are European-only,
# so the CJK branch needs its own rows; inline keeps the query
# self-contained and byte-identical for the DuckDB oracle.
CJK_LANG_CORPUS: list[tuple[str, str]] = [
    ("l_zh", "今天天气很好我们去公园散步"),
    ("l_ja", "今日はいい天気ですね公園へ行きましょう"),
    ("l_ko", "오늘 날씨가 좋아서 공원에 갑니다"),
    ("l_en", "the weather is lovely today let us walk"),
    ("l_mixed", "天気 weather 날씨"),  # kana-free han + hangul + latin: ja loses, ko wins
    ("l_zh_en", "spark 引擎 很快"),
    ("l_empty", "..."),
]


def q_lang_id_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script-ratio language ID for CJK corpora: kana ⇒ ja, else
    hangul ⇒ ko, else Han ⇒ zh, else latin-stopword fallback en/other.
    Pure JVM regexp counts (codegen'd) — the same class of heuristic as
    q_lang_id, extended to the scripts the reference's jieba-based text
    stack targets."""
    df = spark.createDataFrame(CJK_LANG_CORPUS, ["doc_id", "text"]).repartition(4)
    kana = F.size(F.regexp_extract_all("text", F.lit(f"[{_KANA_CLASS}]"), F.lit(0)))
    hangul = F.size(F.regexp_extract_all("text", F.lit(f"[{_HANGUL_CLASS}]"), F.lit(0)))
    han = F.size(F.regexp_extract_all("text", F.lit(f"[{_HAN_CLASS}]"), F.lit(0)))
    latin = F.size(F.regexp_extract_all("text", F.lit("[a-zA-Z]"), F.lit(0)))
    pred = (
        F.when(kana > 0, "ja")
        .when(hangul > 0, "ko")
        .when(han > 0, "zh")
        .when(latin > 0, "en")
        .otherwise("unknown")
    )
    return df.select(
        "doc_id",
        pred.alias("pred_lang"),
        kana.alias("n_kana"),
        hangul.alias("n_hangul"),
        han.alias("n_han"),
    )


ORACLE_LANG_ID_CJK = f"""
WITH corpus(doc_id, text) AS (VALUES
  {", ".join("('" + i + "', '" + t + "')" for i, t in CJK_LANG_CORPUS)}
),
counted AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[{_KANA_CLASS}]')) AS n_kana,
         len(regexp_extract_all(text, '[{_HANGUL_CLASS}]')) AS n_hangul,
         len(regexp_extract_all(text, '[{_HAN_CLASS}]')) AS n_han,
         len(regexp_extract_all(text, '[a-zA-Z]')) AS n_latin
  FROM corpus
)
SELECT doc_id,
  CASE WHEN n_kana > 0 THEN 'ja'
       WHEN n_hangul > 0 THEN 'ko'
       WHEN n_han > 0 THEN 'zh'
       WHEN n_latin > 0 THEN 'en'
       ELSE 'unknown' END AS pred_lang,
  CAST(n_kana AS INTEGER) AS n_kana,
  CAST(n_hangul AS INTEGER) AS n_hangul,
  CAST(n_han AS INTEGER) AS n_han
FROM counted
"""

_N_MINHASH = 4


def _portable_hash_expr(s: str) -> str:
    """Spark SQL: first 60 bits of md5 as BIGINT (portable across engines)."""
    return f"cast(conv(substring(md5({s}), 1, 15), 16, 10) as bigint)"


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash over 3-token shingles, {_N_MINHASH} hash functions drawn
    from TWO md5 digests per shingle: d1 = md5(s), d2 = md5('#' || s),
    and each 128-bit digest yields two independent 60-bit windows
    (hex chars 1-15 and 17-31). md5 cost is proportional to invocations
    x input length, so deriving the 4-function family from 2 digests
    halves the dominant cost vs hashing ``s || '#j'`` 4 times — and the
    windowed extraction is a cheap fixed-width substring on a 32-char
    string. Docs need >= 3 tokens."""
    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    # Materialize the token array FIRST (one evaluation per row):
    # higher-order lambdas are CodegenFallback and re-evaluate their
    # whole subtree per element, so an inline tokenizer inside the
    # shingle lambda re-tokenizes the doc once per shingle — O(n^2),
    # catastrophic with the (bigger) CJK-aware expression.
    toked = df.select(
        "doc_id", sparse_fn.bm25_tokens_col("text").alias("__toks")
    ).filter(F.expr("size(__toks) >= 3"))
    shingles = (
        "transform(sequence(1, size(__toks) - 2), "
        "i -> concat_ws(' ', slice(__toks, i, 3)))"
    )
    # Materialize the two digest arrays ONCE (separate select), then
    # derive all 4 minhashes by windowing — inlining md5 into each mh
    # expression would recompute the digests per hash function.
    digs = (
        toked.select("doc_id", F.expr(shingles).alias("sh"))
        .select(
            "doc_id",
            F.expr("transform(sh, s -> md5(s))").alias("d1"),
            F.expr("transform(sh, s -> md5(concat('#', s)))").alias("d2"),
        )
    )

    def _win(arr: str, pos: int) -> str:
        return (
            f"array_min(transform({arr}, d -> "
            f"cast(conv(substring(d, {pos}, 15), 16, 10) as bigint)))"
        )

    return digs.select(
        "doc_id",
        F.expr(_win("d1", 1)).alias("mh0"),
        F.expr(_win("d1", 17)).alias("mh1"),
        F.expr(_win("d2", 1)).alias("mh2"),
        F.expr(_win("d2", 17)).alias("mh3"),
    )


def _oracle_mh_windows(digests_cte: str = "dig") -> str:
    """DuckDB SELECT-list fragment matching the 2-digest/4-window family."""
    wins = [("d1", 1, 0), ("d1", 17, 1), ("d2", 1, 2), ("d2", 17, 3)]
    return ", ".join(
        f"list_min(list_transform({arr}, d -> ('0x' || substr(d, {pos}, 15))::BIGINT)) AS mh{j}"
        for arr, pos, j in wins
    )


ORACLE_MINHASH_SIGNATURES = f"""
WITH toks AS (
  SELECT doc_id, {_BM25_TOKS_SQL} AS ts FROM documents
  WHERE len({_BM25_TOKS_SQL}) >= 3
),
sh AS (
  SELECT doc_id,
         list_transform(range(1, len(ts) - 1),
                        i -> array_to_string(ts[i:i+2], ' ')) AS shingles
  FROM toks
),
dig AS (
  SELECT doc_id,
         list_transform(shingles, s -> md5(s)) AS d1,
         list_transform(shingles, s -> md5('#' || s)) AS d2
  FROM sh
)
SELECT doc_id, {_oracle_mh_windows()}
FROM dig
"""


def q_minhash_lsh_candidates(
    spark: SparkSession, sf_dir: str, *, max_bucket_size: int | None = None
) -> DataFrame:
    """MinHash-LSH candidate pairs: docs agreeing on any of the
    {_N_MINHASH} bands. Scalable shape: explode signatures to
    (band, band_hash) bucket keys, ONE groupBy shuffle on the bucket key,
    then emit all in-bucket pairs with a nested-transform combination
    expression — signatures are computed once and there is no self-join
    (the per-band self-join variant recomputes the md5 signature pipeline
    2x per band and shuffles 2x{_N_MINHASH} times). Skewed buckets (a
    band hash shared by B docs) cost B^2/2 pairs in one task — the
    tools/scale_probe.py 10x run shows candidate volume is what grows on
    a duplicate-heavy corpus. ``max_bucket_size`` is the 100 TB guard:
    drop buckets larger than the cap (boilerplate shingles, not real
    near-dups), bounding per-task pair expansion at cap^2/2. Default
    None = exact banding semantics (what the oracle checks)."""
    sig = q_minhash_signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("band"), F.col(f"mh{j}").alias("h"))
                    for j in range(_N_MINHASH)
                ]
            )
        ).alias("bh"),
    ).select("doc_id", "bh.band", "bh.h")
    buckets = (
        bands.groupBy("band", "h")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("ds") <= max_bucket_size)
    combos = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds) - i - 1), "
        "y -> struct(x AS doc_a, y AS doc_b))))"
    )
    return (
        buckets.select(F.explode(combos).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


ORACLE_MINHASH_LSH_CANDIDATES = f"""
WITH sigs AS ({ORACLE_MINHASH_SIGNATURES})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM sigs a JOIN sigs b
  ON a.doc_id < b.doc_id
 AND ({" OR ".join(f"a.mh{j} = b.mh{j}" for j in range(_N_MINHASH))})
"""


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup GROUP resolution: connected components over the
    MinHash-LSH candidate graph (iterative distributed min-label
    propagation, `operators/components.py`). Upgrades pair-level
    candidates to one representative per transitive duplicate cluster —
    what a 100 TB dedup actually keeps. The iteration is Spark-side
    (joins + groupBy, lineage-checkpointed); the oracle replays it as a
    DuckDB recursive CTE, so even this iterative operator is
    hash-checked end-to-end."""
    from aiotcvectordb_spark.operators.components import connected_components

    pairs = q_minhash_lsh_candidates(spark, sf_dir)
    return (
        connected_components(pairs, "doc_a", "doc_b")
        .select(F.col("node").alias("doc_id"), "component")
    )


ORACLE_DEDUP_COMPONENTS = f"""
WITH RECURSIVE cand AS MATERIALIZED ({ORACLE_MINHASH_LSH_CANDIDATES}),
edges AS MATERIALIZED (
  -- MATERIALIZED is load-bearing: without it DuckDB re-evaluates the
  -- whole minhash candidate pipeline on EVERY recursion round
  -- (measured 9s -> 0.2s at sf0.01)
  SELECT doc_a AS a, doc_b AS b FROM cand
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM cand
),
reach(node, r) AS (
  SELECT DISTINCT a AS node, a AS r FROM edges
  UNION
  SELECT e.a AS node, reach.r AS r
  FROM reach JOIN edges e ON e.b = reach.node
)
SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node
"""


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard near-dup pairs (threshold 0.9): explode distinct
    tokens, equi-join on token, count intersections, Jaccard filter.
    (The MinHash op above is the approximation of exactly this; at 100 TB
    you run minhash-LSH first and verify candidates with this.)"""
    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    toks = df.select(
        "doc_id",
        F.array_distinct(sparse_fn.bm25_tokens_col("text")).alias("ts"),
    )
    e = toks.select("doc_id", F.explode("ts").alias("token"))
    sizes = e.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = e.select(F.col("doc_id").alias("doc_a"), "token")
    b = e.select(F.col("doc_id").alias("doc_b"), "token")
    common = (
        a.join(b, "token")
        .filter("doc_a < doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("c") / (F.col("na") + F.col("nb") - F.col("c")), ROUND_DIGITS),
        )
        .filter("jaccard >= 0.9")
        .select("doc_a", "doc_b", "jaccard")
    )


ORACLE_NGRAM_JACCARD_PAIRS = f"""
WITH toks AS (
  SELECT doc_id, list_distinct({_BM25_TOKS_SQL}) AS ts FROM documents
),
e AS (SELECT doc_id, t.token FROM toks, unnest(ts) AS t(token)),
sizes AS (SELECT doc_id, count(*) AS n FROM e GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM e a JOIN e b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(c * 1.0 / (sa.n + sb.n - c), {ROUND_DIGITS}) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(c * 1.0 / (sa.n + sb.n - c), {ROUND_DIGITS}) >= 0.9
"""

_NEARDUP_THRESHOLD = 0.45


# Above this row count the router switches to the IVF-bucketed path.
# r5: default moved from 250k (the r3/r4 broadcast-bytes bound) to the
# MEASURED wall-clock crossover — with BLAS-per-cell pair scoring the
# IVF path already beats the exact broadcast matmul at 20k rows
# (2.6 s vs 6 s at 20k; 21.5 s vs 201 s at 200k on the x100 fixture),
# so routing exact any higher buys nothing but quadratic cost. 20k
# also keeps the tiny-corpus regime (sf0.1 = 2k rows, where IVF's
# k-means floor dominates) on the exact plan. Env-overridable so tests
# (and operators who want bit-exact output further up) can move the
# knee without code changes.
_NEARDUP_EXACT_MAX_ROWS_ENV = "SPARK_GRAFT_NEARDUP_EXACT_MAX_ROWS"
_NEARDUP_EXACT_MAX_ROWS_DEFAULT = 20_000


def _neardup_exact_max_rows() -> int:
    import os

    return int(
        os.environ.get(_NEARDUP_EXACT_MAX_ROWS_ENV, _NEARDUP_EXACT_MAX_ROWS_DEFAULT)
    )


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs above a threshold — EXACT plan,
    always (broadcast-matmul prefilter + bit-exact rescore).

    This is the hash-oracled registry entry, so it must execute the
    same plan at every scale/env the driver might run it under — a
    silent switch to the approximate path would make the oracle check
    vouch for a plan that didn't run (ADVICE r3). The scale-routed
    entry point is ``q_embedding_near_dup_auto`` (rows-only), which
    picks this plan or the IVF-bucketed one by corpus size.

    r5 guard (ADVICE r4): any caller still invoking THIS key above the
    exact-path knee gets a fail-fast ValueError naming the auto router,
    never a silent O(N^2) broadcast plan — the quadratic path is
    unreachable at scale by construction from every entry point."""
    emb = load(spark, sf_dir, "embeddings")
    n_rows = emb.count()  # metadata-only parquet count
    # Fixed 250k safety bound (the r3/r4 broadcast-bytes budget: 128 MB
    # ride-along matrix at 64d), deliberately NOT the router's
    # env-tunable knee — this entry is exact-only at every scale/env by
    # contract, so lowering the routing knee must not change it; only a
    # corpus that genuinely breaks the broadcast budget fails fast.
    cap = max(_neardup_exact_max_rows(), 250_000)
    if n_rows > cap:
        raise ValueError(
            f"embedding_near_dup is the EXACT O(N^2)-prefilter plan, "
            f"capped at {cap} rows (corpus has {n_rows}); use "
            "embedding_near_dup_auto (scale-routed) or raise "
            "SPARK_GRAFT_NEARDUP_EXACT_MAX_ROWS explicitly"
        )
    return _embedding_near_dup_exact(spark, sf_dir, n_rows)


def q_embedding_near_dup_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs — scale-routed entry point.

    ONE entry point, two physical plans, chosen by corpus size so the
    O(N^2)/full-matrix-broadcast plan cannot be invoked on 100 TB by
    accident:

    - ``n <= SPARK_GRAFT_NEARDUP_EXACT_MAX_ROWS`` (default 20k — the
      measured wall-clock crossover vs the BLAS-celled IVF path, r5):
      the exact broadcast-matmul prefilter (``q_embedding_near_dup``)
      — bit-exact.
    - above: the IVF-bucketed path (``q_embedding_near_dup_ivf``) with
      multi-probe assignment — bounded shuffles, nothing broadcast or
      collected; same output schema and the same exact rescore on
      candidates, approximate only in candidate generation.

    The row count is a parquet-metadata-only job, so routing costs no
    data scan. Registered rows-only: which plan runs is env/scale-
    dependent by design, so it cannot carry a value-hash oracle."""
    emb = load(spark, sf_dir, "embeddings")
    n_rows = emb.count()  # metadata-only parquet count
    if n_rows > _neardup_exact_max_rows():
        return q_embedding_near_dup_ivf(spark, sf_dir, nprobe=4)
    return _embedding_near_dup_exact(spark, sf_dir, n_rows)


def _embedding_near_dup_exact(
    spark: SparkSession, sf_dir: str, n_rows: int
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (the broadcast-scale plan).

    Two-stage exact plan (no O(N^2) row materialization in the JVM):

    1. *Prefilter*: rows are grouped into score blocks and the full
       matrix rides alongside as one JVM-broadcast row (broadcast
       nested-loop join — nothing is collected to the driver);
       ``mapInPandas`` computes each cosine block-matmul on executors and
       emits only candidate pairs with score >= threshold - 1e-6. The
       margin (1e-6) exceeds worst-case float64 summation-order
       divergence (~1e-13) by 7 orders of magnitude, so the prefilter is
       lossless — no pair that the exact scorer would keep is dropped.
    2. *Exact rescore*: the surviving ~1e2 pairs join back to the table
       and are scored with the fixed-dim unrolled SQL expression, whose
       left-to-right accumulation order is bit-identical to the DuckDB
       oracle's ``list_dot_product``.

    At 100 TB the broadcast side no longer fits; the scale path is
    minhash/LSH candidates (above) or IVF bucketing, then this same
    exact rescore on candidates only.
    """
    from aiotcvectordb_spark.functions.vector import (
        dot_score_fixed,
        vector_norm_fixed,
    )

    emb = load(spark, sf_dir, "embeddings")
    margin = float(_NEARDUP_THRESHOLD) - 1e-6

    # Executor-side block matmul: rows are grouped into score blocks, the
    # full matrix rides in as ONE broadcast row (JVM broadcast nested-loop
    # join — a single copy per executor, never materialized on the
    # driver), and each mapInPandas task computes its block x matrix
    # score slab with numpy, emitting only above-margin candidate pairs.
    # Nothing is collected; per-task memory is O(N*dim + block*N).
    # Vectors cross the JVM->Arrow->numpy boundary FLATTENED (one flat
    # double array per row, reshaped once in numpy) — shipping each
    # embedding as its own nested array costs a per-vector Python
    # conversion that measured ~4x the whole matmul at sf0.1.
    ids_emb = ensure_min_partitions(emb.select("vec_id", "embedding"))
    mat_row = ids_emb.agg(
        F.collect_list(F.struct("vec_id", "embedding")).alias("__m")
    ).select(
        F.expr("transform(__m, x -> x.vec_id)").alias("__mat_ids"),
        F.expr(
            "flatten(transform(__m, x -> cast(x.embedding as array<double>)))"
        ).alias("__mat_flat"),
    )
    # Adaptive block count: every block task pays one deserialization of
    # the full broadcast matrix, so blocks should exist only when the
    # block x matrix matmul is big enough to amortize that (4k rows per
    # block). At sf0.1 (2k vectors) that's ONE task doing a trivial
    # matmul; at 100k vectors it's ~25 parallel slabs.
    n_blocks = min(32, max(1, n_rows // 4096 + 1))
    blocks = (
        ids_emb.groupBy(F.pmod(F.col("vec_id"), F.lit(n_blocks)).alias("__blk"))
        .agg(F.collect_list(F.struct("vec_id", "embedding")).alias("__r"))
        .select(
            F.expr("transform(__r, x -> x.vec_id)").alias("__blk_ids"),
            F.expr(
                "flatten(transform(__r, x -> cast(x.embedding as array<double>)))"
            ).alias("__blk_flat"),
        )
        .crossJoin(F.broadcast(mat_row))
    )

    def emit_pairs(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            cols = [
                pdf["__blk_ids"], pdf["__blk_flat"], pdf["__mat_ids"], pdf["__mat_flat"]
            ]
            for rbids, rbflat, rmids, rmflat in zip(*cols):
                bids = np.asarray(rbids, dtype=np.int64)
                mids = np.asarray(rmids, dtype=np.int64)
                # reshape to the EXPLICIT dim: a null/ragged embedding
                # must raise here, not silently shift every subsequent
                # row's vector (which would yield wrong pairs)
                bmat = np.asarray(rbflat, dtype=np.float64).reshape(len(bids), DIM)
                mmat = np.asarray(rmflat, dtype=np.float64).reshape(len(mids), DIM)
                # 1e-12 floor (the cell scorer's convention): a zero
                # vector scores 0.0 instead of NaN-poisoning the block
                bunit = bmat / np.maximum(
                    np.linalg.norm(bmat, axis=1, keepdims=True), 1e-12
                )
                munit = mmat / np.maximum(
                    np.linalg.norm(mmat, axis=1, keepdims=True), 1e-12
                )
                # Chunk the block rows so the score slab stays bounded
                # (<=2^25 floats ~ 256 MB) no matter how large N grows —
                # an unchunked block x N matmul is O(N^2/32) memory and
                # OOM-killed the JVM at the 100x probe.
                chunk = max(1, (1 << 25) // max(1, len(mids)))
                for c0 in range(0, len(bids), chunk):
                    cb = bunit[c0 : c0 + chunk]
                    cids = bids[c0 : c0 + chunk]
                    s = cb @ munit.T
                    keep = (s >= margin) & (mids[None, :] > cids[:, None])
                    ii, jj = np.nonzero(keep)
                    if len(ii):
                        yield pd.DataFrame(
                            {"vec_a": cids[ii], "vec_b": mids[jj]}
                        )

    cand = blocks.mapInPandas(emit_pairs, "vec_a long, vec_b long")

    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        vector_norm_fixed("embedding", DIM).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        vector_norm_fixed("embedding", DIM).alias("nb"),
    )
    # rescore joins broadcast only the OUTPUT-DRIVEN sides: cand (the
    # ~1e2 surviving pairs) into a's scan, then that still-tiny result
    # into b's scan — the full table is never broadcast
    return (
        b.join(F.broadcast(a.join(F.broadcast(cand), "vec_a")), "vec_b")
        .withColumn(
            "score",
            F.round(dot_score_fixed("ea", "eb", DIM) / (F.col("na") * F.col("nb")), ROUND_DIGITS),
        )
        .filter(F.col("score") >= _NEARDUP_THRESHOLD)
        .select("vec_a", "vec_b", "score")
    )


# Target rows per IVF cell (on the ASSIGNMENT table, i.e. after the
# nprobe expansion). Σcell² work is (nprobe·N)²/nlist, so holding cell
# size constant — nlist ∝ N — is what keeps candidate volume linear in
# N. Assignment ladder (r5 — the 4096 hard cap is gone):
#   nlist ≤ 32        Catalyst literal-expression centroid distance
#                     (codegen-bounded)
#   32 < nlist ≤ 8192 flat Arrow matmul against driver-side sampled
#                     k-means centroids (k-means cost = sample × nlist,
#                     bounded by the sample, not N)
#   nlist > 8192      two-level IMI cells: cell = (c1, c2) from TWO
#                     independent K=⌈√nlist⌉ codebooks over the
#                     embedding halves — K² cells from 2K driver-
#                     trainable centroids, so nlist ∝ N holds to ~16.7M
#                     cells (K capped 4096) ≈ 1.6e10 assignment rows at
#                     2000/cell without the codebook fit ever growing
#                     with N. This is the 100 TB shape.
_IVF_NEARDUP_CELL_ROWS = 2000
_IVF_NEARDUP_FLAT_MAX_NLIST = 8192
_IVF_NEARDUP_IMI_MAX_K = 4096


def _sampled_spherical_kmeans(
    emb: DataFrame, k: int, *, sample_rows: int = 100_000, iters: int = 6
):
    """Driver-side seeded spherical k-means on a BOUNDED unit-vector
    sample (the PQ-codebook training pattern — the driver never sees
    more than ``sample_rows`` rows regardless of table size). Returns
    an (k, dim) float64 centroid matrix. Chunked matmuls keep the
    distance temporaries flat for large k."""
    import numpy as np

    n = emb.count()
    frac = min(1.0, sample_rows / max(n, 1))
    sample = (
        emb.sample(fraction=frac, seed=7).limit(sample_rows).collect()
        if frac < 1.0
        else emb.collect()
    )
    X = np.asarray([r["embedding"] for r in sample], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    k = max(2, min(k, len(X) // 4 or 2))
    rng = np.random.default_rng(42)
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    chunk = 16384
    for _ in range(iters):
        assign = np.empty(len(X), dtype=np.int64)
        for s0 in range(0, len(X), chunk):
            sl = slice(s0, s0 + chunk)
            assign[sl] = np.argmax(X[sl] @ C.T, axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                c = X[m].mean(axis=0)
                nc = np.linalg.norm(c)
                if nc > 1e-12:
                    C[j] = c / nc
    return C


def q_embedding_near_dup_ivf(
    spark: SparkSession, sf_dir: str, *, nlist: int | None = None, nprobe: int = 2
) -> DataFrame:
    """The 100 TB path for embedding near-dup: IVF bucketing instead of
    the broadcast matmul. Spherical KMeans(nlist) on unit vectors;
    each vector is assigned to its ``nprobe`` nearest centroids
    (multi-probe — catches pairs straddling a cell boundary); candidate
    pairs are an equi-join on the cell id (vec_a < vec_b), then the
    same exact cosine rescore as the exact operator. Cost is
    sum(cell^2) not N^2, and every stage is a bounded shuffle — nothing
    unbounded is broadcast or collected.

    nlist scales with the corpus (cells of ~2000
    assignment rows, r4) so candidate volume stays LINEAR in N: small
    corpora keep the MLlib fit + pure-Catalyst literal-expression
    assignment (plan-audited, codegen-bounded); above 32 cells the
    centroids come from driver-side sampled spherical k-means (bounded
    sample — the PQ training pattern) and assignment is an Arrow
    mapInPandas matmul against the tiny broadcast centroid matrix;
    above the 8192 flat cap (r5) cells become two-level IMI products
    (``_embedding_near_dup_imi``) — K² cells from 2K driver-trainable
    subspace codebooks, so nlist ∝ N holds to ~16.7M cells without the
    codebook fit ever growing with N. Rows-only (iterative KMeans has
    no SQL oracle); recall vs the exact operator is asserted in pytest
    for ALL assignment paths."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from aiotcvectordb_spark.functions.vector import (
        dot_score_fixed,
        vector_norm_fixed,
    )

    emb = load(spark, sf_dir, "embeddings")
    if nlist is None:
        n_rows = emb.count()  # parquet-metadata count
        nlist = max(
            16,
            min(
                n_rows * nprobe // _IVF_NEARDUP_CELL_ROWS,
                _IVF_NEARDUP_IMI_MAX_K**2,
            ),
        )
    if nlist > _IVF_NEARDUP_FLAT_MAX_NLIST:
        return _embedding_near_dup_imi(spark, emb, nlist=nlist, nprobe=nprobe)
    if nlist > 32:
        return _embedding_near_dup_ivf_arrow(
            spark, emb, nlist=nlist, nprobe=nprobe
        )
    unit = (
        "transform(embedding, x -> cast(x as double) / "
        "greatest(sqrt(aggregate(transform(embedding, v -> cast(v as double) * cast(v as double)), "
        "cast(0 as double), (a, b) -> a + b)), cast(1e-12 as double)))"
    )
    # Materialize the unit vector ONCE as a column: inlining the
    # normalization transform into each of the nlist centroid-distance
    # expressions multiplies the expression tree (and the task binary /
    # codegen unit) by nlist — measured as the dominant cost at small
    # SF, and pure waste at any scale.
    unit_df = emb.select("vec_id", "embedding", F.expr(unit).alias("__u"))
    # Persist the feature column for the duration of the fit: MLlib's
    # iterative KMeans re-reads its input every iteration (plus the
    # k-means|| init passes), and without this each pass re-runs the
    # normalize+vectorize chain from the parquet scan. (k-means|| init
    # is kept: random init measurably drops multi-probe recall on the
    # small-SF fixtures.)
    ml_df = unit_df.withColumn("__features", array_to_vector(F.col("__u"))).persist()
    try:
        model = KMeans(
            k=nlist, seed=42, maxIter=5,
            featuresCol="__features", predictionCol="__c",
        ).fit(ml_df)
    finally:
        ml_df.unpersist()
    cents = np.asarray(model.clusterCenters(), dtype=np.float64)
    # nprobe nearest centroids per vector, JVM-side: squared distance of
    # the UNIT vector to each centroid as an array expression, then the
    # argmin indices. Centroids are tiny (nlist x dim literals).
    udists = F.array(
        *[
            F.expr(
                f"aggregate(zip_with(__u, "
                f"array({', '.join(repr(float(c)) for c in cents[j])}), "
                "(a, b) -> (a - b) * (a - b)), cast(0 as double), (acc, x) -> acc + x)"
            )
            for j in range(len(cents))
        ]
    )
    assigned = (
        unit_df.select("vec_id", "embedding", udists.alias("__d"))
        .select(
            "vec_id",
            "embedding",
            F.expr(
                f"slice(array_sort(transform(__d, (d, j) -> struct(d, j))), 1, {nprobe})"
            ).alias("__near"),
        )
        .select("vec_id", "embedding", F.explode("__near.j").alias("cell"))
    )
    return _neardup_pairs_from_cells(assigned)


def _neardup_pairs_from_cells(assigned: DataFrame) -> DataFrame:
    """(vec_id, embedding, cell) → exact-rescored near-dup pairs,
    shared by all assignment paths (flat Arrow and IMI).

    r5 rewrite: per-cell BLAS instead of a per-pair JVM expression.
    The previous cell self-join evaluated the unrolled 64-term cosine
    chain INSIDE the SortMergeJoin condition (and again in the
    projection) — ~7 µs per candidate pair, measured as the wall-clock
    dominator at the 300x probe. One ``applyInPandas`` per cell now
    computes the whole cell's cosine matrix as a chunked numpy matmul
    (~35 ns per pair, S-chunks capped ~32 MB so a skewed cell degrades
    to more chunks, not an OOM). Same shuffle shape — one exchange on
    cell — with ~200x less CPU per candidate; BLAS inside cells,
    shuffles between, which is the constant you want at 100 TB."""
    import numpy as np

    thr = _NEARDUP_THRESHOLD
    schema = "vec_a long, vec_b long, score double"

    def pairs(pdf):
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "score": []})
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        X = np.asarray(list(pdf["embedding"]), dtype=np.float64)[order]
        norms = np.maximum(np.linalg.norm(X, axis=1), 1e-12)
        out_a, out_b, out_s = [], [], []
        chunk = max(1, (1 << 22) // n)  # S-chunk ≈ 32 MB of float64
        scale = 10.0 ** ROUND_DIGITS
        for s0 in range(0, n - 1, chunk):
            s1 = min(s0 + chunk, n - 1)
            # match the exact path's arithmetic (r5 advice): raw dot,
            # THEN divide by the norm product — not normalize-then-dot
            # — and round HALF_UP like Spark/DuckDB ROUND, not numpy's
            # banker's rounding, so threshold-boundary pairs agree
            # between the IVF and exact operators
            S = (X[s0:s1] @ X.T) / np.outer(norms[s0:s1], norms)
            S = np.sign(S) * np.floor(np.abs(S) * scale + 0.5) / scale
            for r in range(s1 - s0):
                row = S[r, s0 + r + 1 :]
                hit = np.nonzero(row >= thr)[0]
                if len(hit):
                    out_a.append(np.full(len(hit), ids[s0 + r]))
                    out_b.append(ids[s0 + r + 1 + hit])
                    out_s.append(row[hit])
        if not out_a:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "score": []})
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a),
                "vec_b": np.concatenate(out_b),
                "score": np.concatenate(out_s),
            }
        )

    return (
        assigned.groupBy("cell")
        .applyInPandas(pairs, schema=schema)
        .select(
            F.col("vec_a").cast("long").alias("vec_a"),
            F.col("vec_b").cast("long").alias("vec_b"),
            "score",
        )
        .distinct()
    )


def _embedding_near_dup_ivf_arrow(
    spark: SparkSession, emb: DataFrame, *, nlist: int, nprobe: int
) -> DataFrame:
    """Scale-path IVF assignment: centroids from driver-side SAMPLED
    spherical k-means (bounded collect), cell assignment as one Arrow
    mapInPandas matmul per batch against the ~nlist x dim float64
    centroid matrix (a few MB in the task closure — never the data).
    The literal-expression path stops scaling past ~32 cells (codegen
    unit grows with nlist); numpy is indifferent to nlist, so cells
    keep constant SIZE as the corpus grows and candidate volume stays
    linear."""
    import numpy as np

    C = _sampled_spherical_kmeans(emb.select("vec_id", "embedding"), nlist)
    n_probe = min(nprobe, len(C))
    id_type = dict(emb.dtypes)["vec_id"]
    emb_type = dict(emb.dtypes)["embedding"]
    schema = f"vec_id {id_type}, embedding {emb_type}, cell int"

    def assign(batches):
        import pandas as pd

        CT = C.T  # (dim, k)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(list(pdf["embedding"]), dtype=np.float64)
            U = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            S = U @ CT  # (batch, k) cosine to each centroid
            top = np.argpartition(-S, n_probe - 1, axis=1)[:, :n_probe]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy().repeat(n_probe),
                    "embedding": [e for e in pdf["embedding"] for _ in range(n_probe)],
                    "cell": top.astype(np.int32).ravel(),
                }
            )

    assigned = emb.select("vec_id", "embedding").mapInPandas(assign, schema=schema)
    return _neardup_pairs_from_cells(assigned)


def _sampled_subspace_kmeans(
    X, k: int, *, iters: int = 6, seed: int = 42
):
    """Plain (euclidean) Lloyd's on an in-memory subvector sample —
    seeded and chunked like ``_sampled_spherical_kmeans``. Subvectors
    of unit vectors are NOT unit, so the spherical update is wrong
    here; assignment uses min-L2 == max(dot − ‖c‖²/2)."""
    import numpy as np

    k = max(2, min(k, len(X) // 4 or 2))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    chunk = 16384
    for _ in range(iters):
        half = 0.5 * (C * C).sum(axis=1)  # (k,)
        assign = np.empty(len(X), dtype=np.int64)
        for s0 in range(0, len(X), chunk):
            sl = slice(s0, s0 + chunk)
            assign[sl] = np.argmax(X[sl] @ C.T - half, axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def _embedding_near_dup_imi(
    spark: SparkSession, emb: DataFrame, *, nlist: int, nprobe: int
) -> DataFrame:
    """Beyond-flat-cap IVF: two-level inverted multi-index cells
    (IMI — Babenko & Lempitsky, "The Inverted Multi-Index", CVPR
    2012). The coarse quantizer is the PRODUCT of two independent
    K=⌈√nlist⌉ codebooks over the embedding halves, so K² cells come
    from 2K driver-trainable centroids: the codebook fit stays bounded
    by the SAMPLE no matter how big the corpus (K caps at 4096 → 16.7M
    cells), which is what lets nlist ∝ N — constant cell size, linear
    candidate volume — hold at 100 TB instead of stopping at a flat
    cap. Multi-probe ranks the top-nprobe (c1, c2) pairs by combined
    subspace distance over the nprobe×nprobe candidate grid. Same
    bucket-join + exact rescore as every other path."""
    import numpy as np

    sample_rows = 100_000
    n = emb.count()
    frac = min(1.0, sample_rows / max(n, 1))
    sample = (
        emb.select("embedding").sample(fraction=frac, seed=7)
        .limit(sample_rows).collect()
        if frac < 1.0
        else emb.select("embedding").collect()
    )
    X = np.asarray([r["embedding"] for r in sample], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    d2 = X.shape[1] // 2
    K = min(_IVF_NEARDUP_IMI_MAX_K, int(np.ceil(np.sqrt(nlist))))
    C1 = _sampled_subspace_kmeans(X[:, :d2], K, seed=42)
    C2 = _sampled_subspace_kmeans(X[:, d2:], K, seed=43)
    K1, K2 = len(C1), len(C2)

    id_type = dict(emb.dtypes)["vec_id"]
    emb_type = dict(emb.dtypes)["embedding"]
    schema = f"vec_id {id_type}, embedding {emb_type}, cell bigint"
    t = min(nprobe, K1, K2)  # per-half probe width
    # r5 advice: with a tiny training sample K1/K2 can be clamped so
    # far that t*t < nprobe — argpartition's kth would go out of range.
    # The product grid only has t*t cells; probe at most that many.
    nprobe = min(nprobe, t * t)

    def assign(batches):
        import pandas as pd

        h1 = 0.5 * (C1 * C1).sum(axis=1)
        h2 = 0.5 * (C2 * C2).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            Xb = np.asarray(list(pdf["embedding"]), dtype=np.float64)
            U = Xb / np.maximum(
                np.linalg.norm(Xb, axis=1, keepdims=True), 1e-12
            )
            S1 = U[:, :d2] @ C1.T - h1  # −L2²/2 + const per row
            S2 = U[:, d2:] @ C2.T - h2
            b = len(U)
            top1 = np.argpartition(-S1, t - 1, axis=1)[:, :t]
            top2 = np.argpartition(-S2, t - 1, axis=1)[:, :t]
            s1 = np.take_along_axis(S1, top1, 1)
            s2 = np.take_along_axis(S2, top2, 1)
            comb = (s1[:, :, None] + s2[:, None, :]).reshape(b, t * t)
            sel = np.argpartition(-comb, nprobe - 1, axis=1)[:, :nprobe]
            i1 = np.take_along_axis(top1, sel // t, 1)
            i2 = np.take_along_axis(top2, sel % t, 1)
            cells = (i1.astype(np.int64) * K2 + i2).ravel()
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy().repeat(nprobe),
                    "embedding": [
                        e for e in pdf["embedding"] for _ in range(nprobe)
                    ],
                    "cell": cells,
                }
            )

    assigned = emb.select("vec_id", "embedding").mapInPandas(assign, schema=schema)
    return _neardup_pairs_from_cells(assigned)


ORACLE_EMBEDDING_NEAR_DUP = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(COALESCE(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
         / NULLIF(sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))), 0), 0.0),
         {ROUND_DIGITS}) AS score
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(COALESCE(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
         / NULLIF(sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))), 0), 0.0),
         {ROUND_DIGITS}) >= {_NEARDUP_THRESHOLD}
"""


# SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means cells, pairwise
# cosine WITHIN a cell only, keep per duplicate group the example least
# similar to its centroid. The oracled entry uses DRIVER-FIXED
# deterministic centroids so cell assignment + prune are pure SQL on both
# engines; the 100 TB path swaps in trained cells (the
# embedding_near_dup_ivf machinery: nlist ∝ N, IMI above the flat cap).
_SEMDEDUP_K = 8
_SEMDEDUP_TAU = _NEARDUP_THRESHOLD
_SEMDEDUP_CENTROIDS = [qvec(10.0 + i) for i in range(_SEMDEDUP_K)]
_SEMDEDUP_FIXED_MAX_ROWS_ENV = "SPARK_GRAFT_SEMDEDUP_FIXED_MAX_ROWS"
_SEMDEDUP_FIXED_MAX_ROWS_DEFAULT = 100_000


def _semdedup_fixed_max_rows() -> int:
    import os

    return int(
        os.environ.get(
            _SEMDEDUP_FIXED_MAX_ROWS_ENV, _SEMDEDUP_FIXED_MAX_ROWS_DEFAULT
        )
    )


# AQE partition pin for the in-cell self-join (r10, promoting the r9
# BASELINE.md finding from prose to code): AQE's advisory coalescing
# sizes a post-shuffle stage by its input shuffle BYTES, and the
# in-cell self-join's input is tiny while its OUTPUT is quadratic per
# cell — at the 50k-row probe AQE collapsed the stage to ~7 tasks.
# Above this row threshold both join sides get an explicit
# repartition(K, cell). What actually protects the stage is the
# shuffle ORIGIN, not the count: under a sort-merge join,
# EnsureRequirements rewrites the user count to
# spark.sql.shuffle.partitions (measured: 8 -> 32 on local[32]), but
# the REPARTITION_BY_NUM origin survives and such exchanges are
# EXEMPT from AQE coalescing — the stage keeps the full conf-level
# task count instead of the ~7 byte-sized tasks. Pinned in
# tests/test_plan_audit.py.
_SEMDEDUP_PIN_MIN_ROWS_ENV = "SPARK_GRAFT_SEMDEDUP_PIN_MIN_ROWS"
_SEMDEDUP_PIN_MIN_ROWS_DEFAULT = 20_000


def _semdedup_pin_min_rows() -> int:
    import os

    return int(
        os.environ.get(
            _SEMDEDUP_PIN_MIN_ROWS_ENV, _SEMDEDUP_PIN_MIN_ROWS_DEFAULT
        )
    )


def _assign_fixed_cells(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, embedding, cell, ccos): assign every embedding to its
    argmax ROUNDED-cosine cell (lowest cell id on ties) — THE
    deterministic fixed-centroid assignment rule, extracted r10
    (review) so the round-before-argmax and tie-break rules cannot
    drift apart across their call sites: ``semantic_dedup``,
    ``incremental_semantic_dedup``, and the oracled IVF plan
    ``ann_ivf_cosine_fixed`` all share this one implementation (each
    DuckDB twin mirrors it with the identical QUALIFY row_number
    clause)."""
    from aiotcvectordb_spark.functions.vector import cosine_score_fixed

    w = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("cell").asc()
    )
    return (
        emb.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "embedding",
            "cell",
            F.round(
                cosine_score_fixed("embedding", "cvec", DIM), ROUND_DIGITS
            ).alias("ccos"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )


def q_semantic_dedup(
    spark: SparkSession, sf_dir: str, *, _known_rows: int | None = None
) -> DataFrame:
    """SemDeDup semantic deduplication, ORACLED (r8).

    Published semantics, made deterministic: (1) every embedding is
    assigned to its max-cosine cell (ties → lowest cell id; cosines
    rounded to ROUND_DIGITS so Spark and DuckDB agree bit-for-bit);
    (2) within a cell, x is a ``semantic_dup`` iff some same-cell y
    with cos(x, y) >= tau PRECEDES it in SemDeDup's keep order —
    centroid-cosine ASC (the paper keeps the example LEAST similar to
    the centroid), vec_id ASC as the tie-break. Survivors = one
    representative per semantic group.

    Scale shape: one broadcast of K centroid literals (nested-loop
    against the scan, argmax via a vec_id-keyed window), then ONE
    cell-keyed self-equi-join — sum(cell²) pairwise work, never N²;
    the unrolled fixed-dim cosine stays in whole-stage codegen. At
    100 TB: centroids come from the bounded-sample spherical-kmeans
    trainer and nlist grows ∝ N (cells of ~2k rows), exactly the
    embedding_near_dup_ivf assignment machinery — this entry pins the
    celled prune SEMANTICS under a driver hash with fixed centroids
    (an iterative fit is not SQL-expressible).

    Fail-fast cap (r8, the embedding_near_dup precedent): with K fixed
    the in-cell join grows N²/K, so any caller invoking THIS oracled
    entry above the knee gets a ValueError naming the scale router —
    the quadratic plan is unreachable at scale from every entry point,
    and the driver hash always vouches for the plan that actually
    ran."""
    from aiotcvectordb_spark.functions.vector import cosine_score_fixed

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # the scale router (semantic_dedup_auto) has already counted the
    # frame to pick this plan — reuse its count instead of a second
    # parquet-metadata job (r9, advisor)
    n_rows = emb.count() if _known_rows is None else _known_rows
    cap = max(_semdedup_fixed_max_rows(), _SEMDEDUP_FIXED_MAX_ROWS_DEFAULT)
    if n_rows > cap:
        raise ValueError(
            f"semantic_dedup is the FIXED-{_SEMDEDUP_K}-cell oracled plan "
            f"(in-cell join grows N²/K), capped at {cap} rows (corpus has "
            f"{n_rows}); use semantic_dedup_auto (scale-routed) or raise "
            f"{_SEMDEDUP_FIXED_MAX_ROWS_ENV} explicitly"
        )
    cents = spark.createDataFrame(
        list(enumerate(_SEMDEDUP_CENTROIDS)), "cell int, cvec array<double>"
    )
    assigned = _assign_fixed_cells(emb, cents)
    a = assigned.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        "cell",
        F.col("ccos").alias("a_ccos"),
    )
    b = assigned.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_emb"),
        "cell",
        F.col("ccos").alias("b_ccos"),
    )
    if n_rows > _semdedup_pin_min_rows():
        # quadratic-output self-join: pin one task per cell so AQE's
        # byte-based coalescing cannot collapse the stage (see
        # _SEMDEDUP_PIN_MIN_ROWS_DEFAULT comment)
        a = a.repartition(_SEMDEDUP_K, "cell")
        b = b.repartition(_SEMDEDUP_K, "cell")
    dominated = (
        a.join(b, "cell")
        .filter(
            (F.col("a_ccos") < F.col("b_ccos"))
            | (
                (F.col("a_ccos") == F.col("b_ccos"))
                & (F.col("a_id") < F.col("b_id"))
            )
        )
        .filter(
            F.round(cosine_score_fixed("a_emb", "b_emb", DIM), ROUND_DIGITS)
            >= F.lit(_SEMDEDUP_TAU)
        )
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.select("vec_id", "cell", "ccos")
        .join(dominated.withColumn("dup", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            "ccos",
            F.coalesce("dup", F.lit(False)).alias("semantic_dup"),
        )
    )


def _semdedup_cents_sql() -> str:
    rows = ", ".join(
        f"({i}, {_sql_vec(v)})" for i, v in enumerate(_SEMDEDUP_CENTROIDS)
    )
    return f"cents(cell, cvec) AS (VALUES {rows})"


_SEMDEDUP_PAIR_COS = (
    "round(COALESCE(list_dot_product(a.emb, b.emb) / "
    "NULLIF(sqrt(list_dot_product(a.emb, a.emb)) * "
    "sqrt(list_dot_product(b.emb, b.emb)), 0), 0.0), "
    f"{ROUND_DIGITS})"
)

ORACLE_SEMANTIC_DEDUP = f"""
WITH {_semdedup_cents_sql()},
scored AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb, c.cell,
         round(COALESCE(list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cvec)
           / NULLIF(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(c.cvec, c.cvec)), 0), 0.0),
           {ROUND_DIGITS}) AS ccos
  FROM embeddings e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id, emb, cell, ccos FROM scored
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell) = 1
),
dominated AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b ON a.cell = b.cell
   AND (a.ccos < b.ccos OR (a.ccos = b.ccos AND a.vec_id < b.vec_id))
  WHERE {_SEMDEDUP_PAIR_COS} >= {_SEMDEDUP_TAU}
)
SELECT s.vec_id, s.cell, s.ccos,
       (d.vec_id IS NOT NULL) AS semantic_dup
FROM assigned s LEFT JOIN dominated d USING (vec_id)
"""


def _semantic_dedup_trained(
    spark: SparkSession, emb: DataFrame, *, nlist: int
) -> DataFrame:
    """Trained-cell SemDeDup: driver-side SAMPLED spherical k-means
    (bounded collect — the PQ training pattern), hard max-cosine
    assignment as one Arrow matmul per batch, then the per-cell BLAS
    domination prune. Both kernels live in ``operators/semdedup.py``
    and are SHARED with the streaming ingest twin
    (streaming/semdedup.py) — batch == stream by construction."""
    from aiotcvectordb_spark.operators.semdedup import (
        assign_cells,
        prune_cells,
    )

    C = _sampled_spherical_kmeans(emb.select("vec_id", "embedding"), nlist)
    return prune_cells(
        assign_cells(emb.select("vec_id", "embedding"), C), _SEMDEDUP_TAU
    )


def q_incremental_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup of a NEW batch against a STANDING corpus — the
    SemDeDup member of the incremental family (minhash →
    ``incremental_dedup``, substrings → ``incremental_substring_dedup``,
    embeddings → here), and the batch twin of
    ``streaming/semdedup.py``'s per-epoch semantics: a batch embedding
    (vec_id >= _INCR_SPLIT) is a ``semantic_dup`` iff ANY standing same-cell
    member reaches cosine tau (earlier arrivals dominate regardless of
    centroid cosine — first-arrival-wins), or a batch-mate that precedes
    it in the keep order (ccos ASC, vec_id ASC) does. Equality with the
    streaming sink's epoch-1 flags is pinned in
    tests/test_stream_semdedup.py.

    Plan: the fixed-centroid assignment of ``semantic_dedup`` on both
    sides, then batch-side rows join standing members on the CELL id
    only — O(batch × touched-cell membership), no corpus × corpus.
    ORACLED as of r9 (ORACLE_INCREMENTAL_SEMANTIC_DEDUP — written in
    r8, registration deferred one round for rotation slack).
    Shares ``semantic_dedup``'s fail-fast cap:
    with K fixed the standing cells grow N/K, so at serving scale the
    stored member index + trained cells (streaming/semdedup.py,
    semantic_dedup_auto) replace this oracle-checkable recompute."""
    from aiotcvectordb_spark.functions.vector import cosine_score_fixed

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_rows = emb.count()  # parquet-metadata count
    cap = max(_semdedup_fixed_max_rows(), _SEMDEDUP_FIXED_MAX_ROWS_DEFAULT)
    if n_rows > cap:
        raise ValueError(
            f"incremental_semantic_dedup recomputes fixed-{_SEMDEDUP_K}-cell "
            f"standing membership (grows N/K per cell), capped at {cap} rows "
            f"(corpus has {n_rows}); at scale use the streaming member index "
            f"(streaming/semdedup.py) or semantic_dedup_auto, or raise "
            f"{_SEMDEDUP_FIXED_MAX_ROWS_ENV} explicitly"
        )
    cents = spark.createDataFrame(
        list(enumerate(_SEMDEDUP_CENTROIDS)), "cell int, cvec array<double>"
    )
    assigned = _assign_fixed_cells(emb, cents)
    batch = assigned.filter(F.col("vec_id") >= _INCR_SPLIT)
    standing = assigned.filter(F.col("vec_id") < _INCR_SPLIT)
    b = batch.select(
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("b_emb"),
        "cell",
        F.col("ccos").alias("b_ccos"),
    )
    s = standing.select(
        F.col("embedding").alias("s_emb"), "cell"
    )
    if n_rows > _semdedup_pin_min_rows():
        # same AQE coalescing hazard as semantic_dedup's self-join:
        # both cell-keyed joins' outputs grow batch x cell-members
        # while their input bytes stay small — pin the shuffle origin
        b = b.repartition(_SEMDEDUP_K, "cell")
        s = s.repartition(_SEMDEDUP_K, "cell")
    pair_bs = F.round(cosine_score_fixed("s_emb", "b_emb", DIM), ROUND_DIGITS)
    hit_standing = (
        b.join(s, "cell")
        .filter(pair_bs >= F.lit(_SEMDEDUP_TAU))
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
    )
    a = batch.select(
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        "cell",
        F.col("ccos").alias("a_ccos"),
    )
    if n_rows > _semdedup_pin_min_rows():
        a = a.repartition(_SEMDEDUP_K, "cell")
    pair_ab = F.round(cosine_score_fixed("a_emb", "b_emb", DIM), ROUND_DIGITS)
    hit_batch = (
        a.join(b, "cell")
        .filter(
            (F.col("a_ccos") < F.col("b_ccos"))
            | (
                (F.col("a_ccos") == F.col("b_ccos"))
                & (F.col("a_id") < F.col("b_id"))
            )
        )
        .filter(pair_ab >= F.lit(_SEMDEDUP_TAU))
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
    )
    dominated = hit_standing.union(hit_batch).distinct()
    return (
        batch.select("vec_id", "cell", "ccos")
        .join(dominated.withColumn("dup", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            "ccos",
            F.coalesce("dup", F.lit(False)).alias("semantic_dup"),
        )
    )





def q_semantic_dedup_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup, scale-routed (the ``embedding_near_dup_auto``
    pattern): ONE entry point, two physical plans picked by corpus
    size so fixed-K cells (whose in-cell join grows N²/K) cannot be
    invoked on 100 TB by accident.

    - small (n ≤ K·cell_rows): the oracled fixed-centroid plan
      (``semantic_dedup``) — hash-checkable, bit-deterministic;
    - large: nlist = n / ~2000 trained cells (bounded-sample spherical
      k-means), Arrow matmul hard assignment, per-cell BLAS prune —
      cell size stays CONSTANT as N grows, so total prune work is
      linear in N. Rows-only by design (an iterative fit has no SQL
      oracle); the trained path's keep semantics are pinned against
      the oracled plan in pytest on constructed corpora."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_rows = emb.count()  # parquet-metadata count
    if n_rows <= _SEMDEDUP_K * _IVF_NEARDUP_CELL_ROWS:
        return q_semantic_dedup(spark, sf_dir, _known_rows=n_rows)
    nlist = max(
        2, min(n_rows // _IVF_NEARDUP_CELL_ROWS, _IVF_NEARDUP_FLAT_MAX_NLIST)
    )
    return _semantic_dedup_trained(spark, emb, nlist=nlist)


# --------------------------------------------------------------------------
# Internal relational primitives (SURVEY §2.7) exercised as queries
# --------------------------------------------------------------------------


def q_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k window — THE core search primitive, shown on
    relational data: top-3 orders per customer by totalprice."""
    df = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        df.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter("rn <= 3")
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


ORACLE_GROUP_TOPK = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
FROM orders QUALIFY rn <= 3
"""


def q_group_topk_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKEW-SAFE physical plan for the same logical top-k
    (partitioning.salted_group_topk): phase 1 ranks within
    (key, salt-of-row-hash) so a hot key spreads over 16 tasks and each
    keeps only its local top-3; phase 2 ranks the <= 16x3 survivors per
    key. Shares ORACLE_GROUP_TOPK verbatim — the driver hash proves the
    salted two-phase output is identical to the plain window."""
    from aiotcvectordb_spark.partitioning import salted_group_topk

    df = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return salted_group_topk(
        df,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    ).withColumn("rn", F.col("rn").cast("int"))


def q_agg_groupby_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-aggregated groupBy (map-side combine): pricing summary."""
    df = load(spark, sf_dir, "lineitem")
    return (
        df.filter("l_shipdate <= timestamp '1998-09-02 00:00:00'")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 3).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 3).alias("sum_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 3
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), ROUND_DIGITS).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_AGG_GROUPBY_STATS = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 3) AS sum_qty,
       round(sum(l_extendedprice), 3) AS sum_price,
       round(sum(l_extendedprice * (1 - l_discount)), 3) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# SimHash dedup (north star)
# --------------------------------------------------------------------------

# 60 bits: the full width of the portable md5-prefix hash (and the
# widest signed-safe fingerprint — bit 63 would flip the bigint sign).
_SIMHASH_BITS = 60


# Packed-counter aggregation: 3 per-bit counters per 64-bit sum, 21 bits
# each — sound while a document stays under 2^21 (~2M) tokens, far above
# any real training document.
_SIMHASH_FIELD_BITS = 21
_SIMHASH_FIELDS_PER_LONG = 3


def q_simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint: per-token portable 60-bit hash; each of the
    {_SIMHASH_BITS} fingerprint bits is the sign of the tf-weighted sum
    of that bit over the doc's terms. One explode + two groupBy shuffles,
    all JVM expressions.

    Instead of 60 conditional sums, the per-bit counters are PACKED three
    to a long with 21-bit fields (`c_j = sum(bit_j(h) * tf)` is
    non-negative, so fields never borrow; no carry can cross a field
    while per-doc token mass < 2^21). That cuts the aggregation to 21
    sum buffers — ~35% faster wall-clock and a third of the agg-buffer
    footprint at scale. Bit j of the fingerprint is then
    `2*c_j > T` (T = total tf), integer-identical to `sign(sum(+-tf))`
    in the 60-sum formulation the DuckDB oracle still uses."""
    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    # Aggregate to (doc, token, tf) FIRST: tokens repeat ~2.3x within
    # docs, so hashing distinct terms (not occurrences) cuts the md5
    # string work and the conditional sum input by that factor.
    terms = (
        df.select("doc_id", F.explode(sparse_fn.bm25_tokens_col("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", F.expr(_portable_hash_expr("token")))
    )
    fb, fpl = _SIMHASH_FIELD_BITS, _SIMHASH_FIELDS_PER_LONG
    n_longs = (_SIMHASH_BITS + fpl - 1) // fpl
    packed = [
        F.sum(
            F.expr(
                " + ".join(
                    f"shiftleft(((h >> {g * fpl + k}) & 1) * tf, {k * fb})"
                    for k in range(fpl)
                    if g * fpl + k < _SIMHASH_BITS
                )
            )
        ).alias(f"p{g}")
        for g in range(n_longs)
    ]
    sums = terms.groupBy("doc_id").agg(F.sum("tf").alias("T"), *packed)
    mask = (1 << fb) - 1
    fp = None
    for j in range(_SIMHASH_BITS):
        g, k = divmod(j, fpl)
        c = F.expr(f"(p{g} >> {k * fb}) & {mask}")
        term = F.when(c * 2 > F.col("T"), F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    # Fail LOUDLY if a doc's token mass reaches the 21-bit field bound —
    # past it the packed counters would carry into the neighbor field and
    # silently corrupt fingerprints.
    guarded = F.expr(
        f"CASE WHEN T < {1 << fb} THEN fp_ ELSE "
        f"CAST(raise_error('simhash: document token mass >= 2^{fb} "
        f"overflows the packed counters') AS BIGINT) END"
    )
    return sums.withColumn("fp_", fp.cast("long")).select(
        "doc_id", guarded.alias("simhash")
    )


def _simhash_oracle_cte() -> str:
    sum_cols = ", ".join(
        f"sum(tf * (CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END)) AS s{j}"
        for j in range(_SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_SIMHASH_BITS)
    )
    return f"""
terms AS (
  SELECT doc_id, t.token AS token, count(*) AS tf
  FROM (SELECT doc_id, {_BM25_TOKS_SQL} AS ts FROM documents), unnest(ts) AS t(token)
  GROUP BY doc_id, t.token
),
hashed AS (
  SELECT doc_id, tf, ('0x' || substr(md5(token), 1, 15))::BIGINT AS h FROM terms
),
sums AS (SELECT doc_id, {sum_cols} FROM hashed GROUP BY doc_id),
fp AS (SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM sums)"""


ORACLE_SIMHASH_FINGERPRINT = f"""
WITH {_simhash_oracle_cte()}
SELECT doc_id, simhash FROM fp
"""

_SIMHASH_MAX_HD = 3
_SIMHASH_BANDS = 4


def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with hamming distance <= {_SIMHASH_MAX_HD}.

    Banding is LOSSLESS here: {_SIMHASH_BITS} bits in {_SIMHASH_BANDS}
    bands — by pigeonhole, <= {_SIMHASH_MAX_HD} differing bits can touch
    at most {_SIMHASH_MAX_HD} bands, so every qualifying pair shares at
    least one full band and lands in a common bucket. 15-bit bands give
    32k bucket values per band, so buckets stay small and the in-bucket
    pair expansion is near-linear. Same bucket-combination shape as the
    minhash op (one shuffle, no self-join), then exact hamming
    verification via bit_count(xor)."""
    width = _SIMHASH_BITS // _SIMHASH_BANDS
    fp = q_simhash_fingerprint(spark, sf_dir)
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.expr(
                            f"(simhash >> {j * width}) & {(1 << width) - 1}"
                        ).alias("bh"),
                    )
                    for j in range(_SIMHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.band", "b.bh")
    buckets = (
        bands.groupBy("band", "bh")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("doc_id"), F.col("simhash")))
            ).alias("ds")
        )
        .filter(F.size("ds") >= 2)
    )
    combos = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds) - i - 1), "
        "y -> struct(x.doc_id AS doc_a, x.simhash AS sa, "
        "y.doc_id AS doc_b, y.simhash AS sb))))"
    )
    return (
        buckets.select(F.explode(combos).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.sa", "p.sb")
        .distinct()
        .withColumn("hamming", F.expr("bit_count(sa ^ sb)").cast("int"))
        .filter(F.col("hamming") <= _SIMHASH_MAX_HD)
        .select("doc_a", "doc_b", "hamming")
    )


ORACLE_SIMHASH_NEAR_DUP = f"""
WITH {_simhash_oracle_cte()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SIMHASH_MAX_HD}
"""


# --------------------------------------------------------------------------
# Token counting (north star)
# --------------------------------------------------------------------------

_BPE_ISH_RE = r"[a-z0-9]+|[^a-z0-9\s]"


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens and a BPE-ish regex token count
    (alnum runs; every other non-space char its own token)."""
    df = load(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        F.expr(
            "size(filter(split(text, '\\\\s+'), t -> t != ''))"
        ).cast("long").alias("ws_tokens"),
        F.regexp_count(F.lower(F.col("text")), F.lit(_BPE_ISH_RE))
        .cast("long")
        .alias("bpe_tokens"),
    )


ORACLE_TOKEN_COUNT = rf"""
SELECT doc_id,
       CAST(len(list_filter(regexp_split_to_array(text, '\s+'), t -> t != '')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{_BPE_ISH_RE}')) AS BIGINT) AS bpe_tokens
FROM documents
"""


# --------------------------------------------------------------------------
# Hybrid weighted fusion (op 32, WeightedRerank)
# --------------------------------------------------------------------------

_HYBRID_WEIGHTS = (0.7, 0.3)


def q_hybrid_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 32 WeightedRerank: per-leg min-max normalization over the
    fetched top-40, then weighted sum (reference stub.py:759)."""
    docs = ensure_min_partitions(load(spark, sf_dir, "documents"))
    emb = load(spark, sf_dir, "embeddings")
    base = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "text", "embedding"
    )
    return hybrid.hybrid_search_df(
        base,
        ann_vectors=_HYBRID_VEC,
        match_text=_FT_QUERY,
        id_col="doc_id",
        vector_col="embedding",
        text_col="text",
        metric="COSINE",
        rerank={"type": "weighted", "weights": list(_HYBRID_WEIGHTS)},
        limit=10,
        fetch_k=40,
        round_digits=ROUND_DIGITS,
        postings=sparse_index(spark, sf_dir),
    ).select(
        "query_idx", "doc_id", "score", F.col("rank").cast("int").alias("rank")
    )


ORACLE_HYBRID_WEIGHTED = f"""
WITH base AS (
  SELECT d.doc_id, d.text, e.embedding
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
{_sql_queries_cte(_HYBRID_VEC)},
dense_scored AS (
  SELECT e.doc_id,
         round(COALESCE(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
           / NULLIF(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(q.qv, q.qv)), 0), 0.0), {ROUND_DIGITS}) AS s
  FROM base e CROSS JOIN queries q
),
dense AS (
  SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id) AS rank
  FROM dense_scored QUALIFY rank <= 40
),
dnorm AS (
  SELECT doc_id,
         {_HYBRID_WEIGHTS[0]} * (CASE WHEN max(s) OVER () > min(s) OVER ()
           THEN (s - min(s) OVER ()) / (max(s) OVER () - min(s) OVER ())
           ELSE 1.0 END) AS c
  FROM dense
),
{_bm25_oracle_cte("base")},
sparse AS (
  SELECT doc_id, round(s, {ROUND_DIGITS}) AS s,
         row_number() OVER (ORDER BY round(s, {ROUND_DIGITS}) DESC, doc_id) AS rank
  FROM scored QUALIFY rank <= 40
),
snorm AS (
  SELECT doc_id,
         {_HYBRID_WEIGHTS[1]} * (CASE WHEN max(s) OVER () > min(s) OVER ()
           THEN (s - min(s) OVER ()) / (max(s) OVER () - min(s) OVER ())
           ELSE 1.0 END) AS c
  FROM sparse
),
contribs AS (SELECT doc_id, c FROM dnorm UNION ALL SELECT doc_id, c FROM snorm),
fused AS (SELECT doc_id, sum(c) AS s FROM contribs GROUP BY doc_id)
SELECT 0 AS query_idx, doc_id, round(s, {ROUND_DIGITS}) AS score,
       CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
FROM fused QUALIFY rank <= 10 ORDER BY rank
"""


# --------------------------------------------------------------------------
# Chunk split + expand (ops 38/39/43 semantics on relational testdata)
# --------------------------------------------------------------------------

_CHUNK_TOKENS = 5
_CHUNK_HIT_TOKEN = "data"


def q_chunk_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunk pipeline semantics (reference collection_view.py:144-171
    expand_chunk): split every document into {_CHUNK_TOKENS}-token
    chunks, mark chunks containing the probe token as hits, and return
    each hit expanded with its +-1 neighboring chunks."""
    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    # tokens materialized once per row (lambda bodies re-evaluate their
    # subtree per element — see q_minhash_signatures)
    toked = df.select(
        "doc_id", sparse_fn.bm25_tokens_col("text").alias("__toks")
    ).filter(F.expr("size(__toks) > 0"))
    n_chunks = f"cast(ceil(size(__toks) / {_CHUNK_TOKENS}.0) as int)"
    chunk_arr = (
        f"transform(sequence(0, {n_chunks} - 1), "
        f"i -> concat_ws(' ', slice(__toks, i * {_CHUNK_TOKENS} + 1, {_CHUNK_TOKENS})))"
    )
    chunks = toked.select(
        "doc_id", F.posexplode(F.expr(chunk_arr)).alias("chunk_pos", "chunk_text")
    )
    hits = chunks.filter(
        F.array_contains(F.split("chunk_text", " "), _CHUNK_HIT_TOKEN)
    ).select(F.col("doc_id").alias("h_doc"), F.col("chunk_pos").alias("h_pos"))
    return (
        chunks.join(
            F.broadcast(hits),
            (F.col("doc_id") == F.col("h_doc"))
            & (F.abs(F.col("chunk_pos") - F.col("h_pos")) <= 1),
        )
        .groupBy("doc_id", "chunk_pos", "chunk_text")
        .agg(F.expr("bool_or(chunk_pos = h_pos)").alias("is_hit"))
    )


ORACLE_CHUNK_EXPAND = f"""
WITH toks AS (
  SELECT doc_id, {_BM25_TOKS_SQL} AS ts FROM documents WHERE len({_BM25_TOKS_SQL}) > 0
),
chunks AS (
  SELECT doc_id, CAST(r.i AS INT) AS chunk_pos,
         array_to_string(ts[r.i * {_CHUNK_TOKENS} + 1 : r.i * {_CHUNK_TOKENS} + {_CHUNK_TOKENS}], ' ') AS chunk_text
  FROM toks, unnest(range(0, CAST(ceil(len(ts) / {_CHUNK_TOKENS}.0) AS BIGINT))) AS r(i)
),
hits AS (
  SELECT doc_id AS h_doc, chunk_pos AS h_pos FROM chunks
  WHERE list_contains(str_split(chunk_text, ' '), '{_CHUNK_HIT_TOKEN}')
)
SELECT c.doc_id, c.chunk_pos, c.chunk_text,
       bool_or(c.chunk_pos = h.h_pos) AS is_hit
FROM chunks c JOIN hits h
  ON c.doc_id = h.h_doc AND abs(c.chunk_pos - h.h_pos) <= 1
GROUP BY c.doc_id, c.chunk_pos, c.chunk_text
"""


# --------------------------------------------------------------------------
# Relational coverage (SURVEY §2.7): joins, windows, rollup, set ops.
# Money sums use DECIMAL so aggregation order cannot perturb the hash.
# --------------------------------------------------------------------------


def q_join_pruned_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with broadcast dims + pushed-down filters (TPC-H Q5
    shape): revenue per nation for one region and year. region/nation
    are broadcast; the orders date filter and region filter reach the
    parquet scans."""
    region = load(spark, sf_dir, "region").filter("r_name = 'ASIA'")
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        "o_orderdate >= timestamp '1996-01-01 00:00:00' AND "
        "o_orderdate < timestamp '1997-01-01 00:00:00'"
    )
    lineitem = load(spark, sf_dir, "lineitem")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            # DECIMAL accumulation is order-independent (exact), so the
            # hash can't be perturbed by partial-agg ordering; the final
            # DOUBLE cast is deterministic for a given decimal value.
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .select("n_name", "revenue", "n_items")
    )


ORACLE_JOIN_PRUNED_DIMS = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions: per-customer running order total (unbounded
    preceding) and previous order price via lag."""
    orders = load(spark, sf_dir, "orders").filter("o_custkey < 200")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        price.cast("double").alias("price"),
        F.sum(price).over(w).cast("double").alias("running_total"),
        F.lag(price, 1).over(w).cast("double").alias("prev_price"),
    )


ORACLE_WINDOW_RUNNING = """
SELECT o_custkey, o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS running_total,
       CAST(lag(CAST(o_totalprice AS DECIMAL(18,2)), 1)
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS prev_price
FROM orders WHERE o_custkey < 200
"""


def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: ROLLUP(region, nation) over customer balances —
    region subtotals and a grand total alongside leaf groups."""
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("acctbal_sum"),
        )
        .select("r_name", "n_name", "n_customers", "acctbal_sum")
    )


ORACLE_ROLLUP_AGG = """
SELECT r_name, n_name, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth beyond running totals: dense_rank,
    percent_rank, ntile, first/last value over bounded frames."""
    orders = load(spark, sf_dir, "orders").filter("o_custkey < 100")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(w).cast("int").alias("drank"),
        F.round(F.percent_rank().over(w), ROUND_DIGITS).alias("prank"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.first(price).over(frame).cast("double").alias("first_price"),
        F.max(price).over(frame).cast("double").alias("max_so_far"),
    )


ORACLE_WINDOW_FUNCS = """
SELECT o_custkey, o_orderkey,
       CAST(dense_rank() OVER w AS INT) AS drank,
       round(percent_rank() OVER w, 6) AS prank,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       CAST(first_value(CAST(o_totalprice AS DECIMAL(18,2))) OVER
            (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS first_price,
       CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) OVER
            (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS max_so_far
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function breadth (string/date/math) — the function library
    the reference's filter grammar lacks (SURVEY §2.7) but any analytics
    engine needs; all JVM built-ins inside whole-stage codegen."""
    parts = load(spark, sf_dir, "part").filter("p_partkey < 1000")
    orders = load(spark, sf_dir, "orders").filter("o_orderkey < 2000")
    strings = parts.select(
        F.col("p_partkey").alias("key"),
        F.upper(F.substring("p_brand", 1, 7)).alias("brand_code"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_extract("p_name", r"([a-z]{6,})", 1).alias("first_longword"),
        F.concat_ws("|", "p_type", "p_brand").alias("type_brand"),
        F.lit(None).cast("string").alias("order_month"),
        F.lit(None).cast("long").alias("days_to_end"),
        F.round(F.log10(F.col("p_retailprice").cast("double") + 1.0), ROUND_DIGITS)
        .alias("log_price"),
        # portable bucket hash: md5 prefix, not engine-specific murmur
        F.expr("conv(substring(md5(p_name), 1, 4), 16, 10) % 100")
        .cast("int").alias("name_bucket"),
    )
    dates = orders.select(
        F.col("o_orderkey").alias("key"),
        F.lit(None).cast("string").alias("brand_code"),
        F.lit(None).cast("long").alias("name_len"),
        F.lit(None).cast("string").alias("first_longword"),
        F.lit(None).cast("string").alias("type_brand"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").cast("string")
        .alias("order_month"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate"))
        .cast("long").alias("days_to_end"),
        F.lit(None).cast("double").alias("log_price"),
        F.lit(None).cast("int").alias("name_bucket"),
    )
    return strings.unionByName(dates)


ORACLE_SCALAR_FUNCS = """
SELECT p_partkey AS key,
       upper(substr(p_brand, 1, 7)) AS brand_code,
       CAST(length(p_name) AS BIGINT) AS name_len,
       coalesce(regexp_extract(p_name, '([a-z]{6,})', 1), '') AS first_longword,
       concat_ws('|', p_type, p_brand) AS type_brand,
       CAST(NULL AS VARCHAR) AS order_month,
       CAST(NULL AS BIGINT) AS days_to_end,
       round(log10(CAST(p_retailprice AS DOUBLE) + 1.0), 6) AS log_price,
       CAST(('0x' || substr(md5(p_name), 1, 4))::BIGINT % 100 AS INT) AS name_bucket
FROM part WHERE p_partkey < 1000
UNION ALL
SELECT o_orderkey AS key,
       NULL, NULL, NULL, NULL,
       CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS order_month,
       CAST(datediff('day', o_orderdate, DATE '1998-12-31') AS BIGINT) AS days_to_end,
       NULL, NULL
FROM orders WHERE o_orderkey < 2000
"""


def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: CUBE(o_orderstatus, o_orderpriority) with
    grouping() flags distinguishing subtotal rows from genuine NULLs."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("price_sum"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "n_orders", "price_sum",
            "g_status", "g_prio",
        )
    )


ORACLE_CUBE_AGG = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(grouping(o_orderpriority) AS INT) AS g_prio
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p95 / max) of event value
    per event_type — the distribution-profiling aggregate a training
    pipeline runs over quality scores. Exact `percentile` matches
    DuckDB's quantile_cont bit-for-bit after rounding; at 100 TB swap in
    approx_percentile (t-digest) and verify by tolerance instead."""
    events = ensure_min_partitions(load(spark, sf_dir, "events"))
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), ROUND_DIGITS).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), ROUND_DIGITS).alias("p95"),
            F.round(F.max("value"), ROUND_DIGITS).alias("vmax"),
            F.count("*").alias("n"),
        )
        .select("event_type", "p50", "p95", "vmax", "n")
    )


ORACLE_PERCENTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(max(value), 6) AS vmax,
       count(*) AS n
FROM events
GROUP BY event_type
"""


def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti joins: customers that have orders but no
    returned lineitem (the delete/upsert rewrite primitives, ops 19/21,
    exercised as a query)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    returned = (
        lineitem.filter("l_returnflag = 'R'")
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select("o_custkey")
        .distinct()
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .join(returned, customer.c_custkey == returned.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


ORACLE_SEMI_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  AND NOT EXISTS (
    SELECT 1 FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_custkey = c_custkey AND l_returnflag = 'R'
  )
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customers ordering in both 1996 and 1997
    (INTERSECT), minus those with any open order (EXCEPT)."""
    orders = load(spark, sf_dir, "orders")
    y96 = orders.filter("year(o_orderdate) = 1996").select(
        F.col("o_custkey").alias("custkey")
    )
    y97 = orders.filter("year(o_orderdate) = 1997").select(
        F.col("o_custkey").alias("custkey")
    )
    open_ = orders.filter("o_orderstatus = 'O'").select(
        F.col("o_custkey").alias("custkey")
    )
    return y96.intersect(y97).subtract(open_)


ORACLE_SET_OPS = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1997
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
"""


# --------------------------------------------------------------------------
# Streaming-shaped windowed aggregation (batch mode of the shared op)
# --------------------------------------------------------------------------


def q_event_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type — the exact transformation
    ``streaming.sink.windowed_event_counts`` runs under Structured
    Streaming with a watermark (equivalence proven in tests); here in
    batch mode for the oracle check."""
    from aiotcvectordb_spark.streaming.sink import windowed_event_counts

    events = ensure_min_partitions(load(spark, sf_dir, "events"))
    return windowed_event_counts(events, window="1 hour")


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bound histogram of order totals: 20 equal-width bins over
    [0, 600000), out-of-range clamped to the edge bins. Binning is one
    integer expression inside the scan projection; the aggregate ships
    20 groups through the shuffle. (Fixed literal bounds — a two-pass
    min/max version would be data-dependent but equally oracle-safe.)"""
    df = load(spark, sf_dir, "orders")
    bin_ = F.expr(
        "least(greatest(cast(floor(o_totalprice / 30000.0) as int), 0), 19)"
    )
    return (
        df.groupBy(bin_.alias("bin"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("price_sum"),
        )
        .withColumn("bin_low", (F.col("bin") * 30000.0))
    )


ORACLE_PRICE_HISTOGRAM = """
SELECT bin, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
       bin * 30000.0 AS bin_low
FROM (
  SELECT o_totalprice,
         least(greatest(CAST(floor(o_totalprice / 30000.0) AS INT), 0), 19) AS bin
  FROM orders
)
GROUP BY bin
"""


def q_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour long, 15-minute slide): every event lands
    in exactly 4 overlapping windows. `F.window(duration, slide)` is the
    one Spark op; the oracle replays the overlap by exploding each event
    into its 4 window starts. Same one-shuffle partial-agg shape as the
    tumbling variant — the 4x row amplification happens inside the
    window expression, before map-side combine."""
    events = ensure_min_partitions(load(spark, sf_dir, "events"))
    with_ts = events.withColumn(
        "__event_time", F.expr("cast(ts div 1000000000 as timestamp)")
    )
    return (
        with_ts.groupBy(
            F.window("__event_time", "1 hour", "15 minutes"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").cast("long").alias("win_start"),
            "event_type",
            "n_events",
        )
    )


ORACLE_SLIDING_WINDOW_AGG = """
SELECT CAST(epoch(time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))) AS BIGINT)
         - k * 900 AS win_start,
       event_type,
       count(*) AS n_events
FROM events CROSS JOIN (SELECT unnest(range(4)) AS k)
GROUP BY 1, 2
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward, inclusive): for each purchase event, the
    most recent click at-or-before it by the same user. Implemented as
    a one-shuffle union + carry-forward window (operators/asof.py), not
    a range join."""
    from aiotcvectordb_spark.operators.asof import asof_join

    # microsecond precision on both sides: DuckDB TIMESTAMP is micros,
    # so full-nanos values could never hash-match the oracle
    events = ensure_min_partitions(load(spark, sf_dir, "events"))
    left = events.filter("event_type = 'purchase'").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.expr("ts div 1000").alias("ts_us"),
    )
    right = events.filter("event_type = 'click'").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.expr("ts div 1000").alias("ts_us"),
        F.expr("ts div 1000").alias("click_ts_us"),
    )
    return asof_join(
        left,
        right,
        on="ts_us",
        by="user_id",
        tiebreak="click_id",
        right_cols=["click_id", "click_ts_us"],
    ).withColumnRenamed("ts_us", "purchase_ts_us")


ORACLE_ASOF_JOIN = """
WITH l AS (
  SELECT user_id, event_id AS purchase_id, epoch_ns(ts) // 1000 AS ts_us
  FROM events WHERE event_type = 'purchase'
), r0 AS (
  SELECT user_id, event_id AS click_id, epoch_ns(ts) // 1000 AS ts_us
  FROM events WHERE event_type = 'click'
), r AS (  -- same tie rule as the operator: max tiebreak per (by, on)
  SELECT user_id, ts_us, max(click_id) AS click_id
  FROM r0 GROUP BY user_id, ts_us
)
SELECT l.user_id, l.purchase_id, l.ts_us AS purchase_ts_us,
       r.click_id, r.ts_us AS click_ts_us
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
"""


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range (interval) join: every click by the same user within
    30 min before each purchase. The same transformation runs as a
    watermarked stream-stream join (streaming/joins.py; equivalence in
    pytest)."""
    from aiotcvectordb_spark.streaming.joins import purchases_with_recent_clicks

    events = ensure_min_partitions(load(spark, sf_dir, "events"))
    return purchases_with_recent_clicks(
        events.filter("event_type = 'purchase'"),
        events.filter("event_type = 'click'"),
        window_s=1800,
    )


ORACLE_INTERVAL_JOIN = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, epoch_ns(ts) // 1000000000 AS p_sec
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, epoch_ns(ts) // 1000000000 AS c_sec
  FROM events WHERE event_type = 'click'
)
SELECT p.user_id, p.purchase_id, c.click_id, p.p_sec - c.c_sec AS gap_s
FROM p JOIN c ON p.user_id = c.user_id
AND c.c_sec BETWEEN p.p_sec - 1800 AND p.p_sec
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based per-user sessionization (30-min inactivity gap) — the
    batch strategy of ``streaming.session.sessionize_batch``; streaming
    equivalence via native session_window is proven in pytest."""
    from aiotcvectordb_spark.streaming.session import sessionize_batch

    events = ensure_min_partitions(load(spark, sf_dir, "events"))
    return sessionize_batch(events, gap="30 minutes")


def q_sessionize_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME gap sessionization through the ``sessionize_by_gap``
    SQL table function (functions/session_udtf.py) — one shuffle on the
    user key, O(1) UDTF state per group — aggregated to the identical
    output shape as ``sessionize`` and hash-checked against the same
    DuckDB oracle, proving the SQL surface matches the programmatic
    one."""
    from aiotcvectordb_spark.functions.session_udtf import (
        register_sessionize_udtf,
        sessionize_sql,
    )

    register_sessionize_udtf(spark)
    events = ensure_min_partitions(load(spark, sf_dir, "events"))
    events.selectExpr(
        "user_id",
        "event_id",
        "ts div 1000000000 AS ts_sec",
        "value",
    ).createOrReplaceTempView("events_for_sessionize")
    inner = sessionize_sql("events_for_sessionize", gap_seconds=1800)
    return spark.sql(
        f"""
        SELECT user_id,
               min(ts_sec) AS session_start,
               max(ts_sec) AS session_end,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS value_sum
        FROM ({inner})
        GROUP BY user_id, session_no
        """
    )


# epoch_ns // 1e9 floors exactly like Spark's `ts div 1000000000`
# (CAST(epoch(ts) AS BIGINT) would ROUND fractional seconds).
ORACLE_SESSIONIZE = """
WITH e AS (
  SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS ts_sec, value
  FROM events
), lagged AS (
  SELECT *, lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS prev_sec
  FROM e
), numbered AS (
  SELECT *, sum(CASE WHEN prev_sec IS NULL OR ts_sec - prev_sec >= 1800
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_no
  FROM lagged
)
SELECT user_id,
       min(ts_sec) AS session_start,
       max(ts_sec) AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS value_sum
FROM numbered
GROUP BY user_id, session_no
"""


ORACLE_EVENT_WINDOW_AGG = """
SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))) AS BIGINT) AS win_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Multimodal binary columns (op 45 generalized)
# --------------------------------------------------------------------------


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload plumbing (reference get_image_url,
    collection_view.py:425-435, generalized): opaque binary column +
    typed metadata; oracle checks byte length and payload digest."""
    from aiotcvectordb_spark.operators import multimodal

    df = load(spark, sf_dir, "documents")
    media = multimodal.with_binary_payload(df, text_col="text")
    return media.select(
        "doc_id",
        "media_type",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


ORACLE_MULTIMODAL_META = """
SELECT doc_id,
       'application/octet-stream' AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5  -- DuckDB md5(VARCHAR) hashes the UTF-8
                                 -- bytes == Spark md5(payload)
FROM documents
"""


def q_image_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec end to end, oracle-checked: documents are
    encoded into genuine PNG payloads (stdlib zlib codec, 16-px-wide
    grayscale of the UTF-8 text bytes — operators/multimodal.py
    ``with_png_payload``), then ``probe_media`` parses the ACTUAL PNG
    headers back out of the bytes. Because the encoding is
    deterministic, the probed dimensions are a pure function of the
    text length, so DuckDB can predict them without a codec — hashing
    the real encode→probe round trip against SQL."""
    from aiotcvectordb_spark.operators import multimodal

    media = payload_table(
        spark, sf_dir, "png", 1,
        lambda: multimodal.with_png_payload(
            load(spark, sf_dir, "documents"), text_col="text"
        ),
    )
    return multimodal.probe_media(media).select(
        "doc_id", "format", "width", "height", "bit_depth", "channels"
    )


ORACLE_IMAGE_PROBE = """
SELECT doc_id,
       'png' AS format,
       CAST(16 AS INTEGER) AS width,
       CAST(ceil(greatest(octet_length(encode(text)), 1) / 16.0) AS INTEGER)
         AS height,
       CAST(8 AS INTEGER) AS bit_depth,
       CAST(1 AS INTEGER) AS channels
FROM documents
"""


def q_jpeg_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG codec end to end, oracle-checked: each
    document's UTF-8 bytes become a block-constant grayscale image
    (4 blocks wide, pixel value ``2*(byte%128)``) encoded as a genuine
    Annex-K-table baseline JPEG (numpy FDCT + Huffman,
    ``operators/jpegcodec.encode_jpeg_gray``); a second shuffle-free
    mapInPandas stage DECODES the stream (real Huffman decode, dequant,
    IDCT) and measures dimensions + mean pixel. Block-constant images
    with EVEN level-shift offsets quantize exactly under the standard
    table (DC-only energy, step 16 divides 8·2k), so the decoded pixels
    equal the source values and DuckDB recomputes the features from the
    bytes — hashing the full lossy-codec machinery on its lossless
    subspace."""
    from aiotcvectordb_spark.operators import multimodal as MM

    jp = payload_table(
        spark, sf_dir, "jpeg_base", 1,
        lambda: MM.with_jpeg_payload(
            ensure_min_partitions(load(spark, sf_dir, "documents")),
            text_col="text",
        ),
    )
    return MM.jpeg_features(jp).select(
        "doc_id",
        "f_width",
        "f_height",
        F.round("px_mean", ROUND_DIGITS).alias("px_mean"),
    )


def q_jpeg_progressive_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE JPEG (SOF2) round trip, oracle-checked: the same
    block-constant images as jpeg_probe, but encoded as four-scan
    progressive streams (DC first Al=1, DC refine, AC first, AC refine
    — T.81 Annex G successive approximation) and decoded through the
    progressive scan machinery. Successive approximation is lossless
    across its scans, so the SAME SQL oracle as jpeg_probe hash-checks
    the progressive decoder end to end."""
    from aiotcvectordb_spark.operators import multimodal as MM

    jp = payload_table(
        spark, sf_dir, "jpeg_prog", 1,
        lambda: MM.with_jpeg_payload(
            ensure_min_partitions(load(spark, sf_dir, "documents")),
            text_col="text", progressive=True,
        ),
    )
    return MM.jpeg_features(jp).select(
        "doc_id",
        "f_width",
        "f_height",
        F.round("px_mean", ROUND_DIGITS).alias("px_mean"),
    )


# Byte-exact like ORACLE_AUDIO_PROBE: expand code points to UTF-8
# bytes in SQL; empty text falls back to the codec's single
# byte-64 (value-128) block.
ORACLE_JPEG_PROBE = """
WITH ch AS (
  SELECT doc_id, ascii(c) AS cp
  FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS c
    FROM documents WHERE length(text) > 0
  )
),
b AS (
  SELECT doc_id, unnest(
    CASE WHEN cp < 128 THEN [cp]
         WHEN cp < 2048 THEN [192 + cp // 64, 128 + cp % 64]
         WHEN cp < 65536 THEN [224 + cp // 4096, 128 + (cp // 64) % 64,
                               128 + cp % 64]
         ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64,
               128 + (cp // 64) % 64, 128 + cp % 64] END) AS byte
  FROM ch
),
agg AS (
  SELECT doc_id, count(*) AS nb, sum(2 * (byte % 128)) AS s
  FROM b GROUP BY doc_id
),
dims AS (
  SELECT d.doc_id,
         coalesce(agg.nb, 1) AS nb,
         coalesce(agg.s, 128) AS s,
         CAST(ceil(coalesce(agg.nb, 1) / 4.0) AS BIGINT) AS rows_
  FROM documents d LEFT JOIN agg USING (doc_id)
)
SELECT doc_id,
       CAST(32 AS INTEGER) AS f_width,
       CAST(rows_ * 8 AS INTEGER) AS f_height,
       round((64 * s + 8192 * (4 * rows_ - nb)) / (256.0 * rows_), 6)
         AS px_mean
FROM dims
"""


# --------------------------------------------------------------------------
# Rows-only queries (no SQL oracle: embedding model / MLlib approx index)
# --------------------------------------------------------------------------


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-subword token counting: train a BPE vocabulary on the
    corpus (operators/bpe.py — the corpus collapses once to the word-
    frequency table; each round is a JVM pair-count aggregate + a
    driver-side metadata collect of the merge batch + a map-side
    rewrite of only the touched words), then tokenize every document
    with the broadcast merge ranks. Rows-only (iterative training has
    no SQL oracle); equality with classic sequential BPE, lossless
    round trip, and determinism are asserted in tests/test_bpe.py."""
    from aiotcvectordb_spark.operators import bpe

    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    merges = bpe.bpe_train(df, num_merges=48, batch_merges=16)
    return bpe.bpe_encode(df, merges).select("doc_id", "n_tokens")


# FROZEN merge table (r10): the output of bpe_train(num_merges=48,
# batch_merges=16) on the sf0.01 documents corpus — the exact artifact
# save_merges/load_merges (operators/bpe.py:236-253) persists, inlined
# as driver-fixed literals so the APPLY lane is closed-form on both
# engines (the semantic_dedup fixed-centroid precedent; training stays
# rows-only). Rank = list position.
_BPE_FROZEN_MERGES: list[tuple[str, str]] = [
    ('e', 'r'), ('n', '</w>'), ('o', 'w'), ('s', 't'), ('l', 'u'),
    ('p', 'a'), ('c', 'h'), ('f', 'i'), ('e', '</w>'), ('o', 'r'),
    ('m', 'er'), ('a', 't'), ('i', 'n'), ('s', 'h'), ('c', 'u'),
    ('fi', 'l'), ('ow', '</w>'), ('pa', 'r'), ('i', 'n</w>'),
    ('j', 'o'), ('a', 'sh'), ('at', 'ch'), ('s', 'c'), ('cu', 'st'),
    ('lu', 'm'), ('fil', 't'), ('l', 'l'), ('g', 'e</w>'),
    ('d', 'er'), ('v', 'e'), ('u', 'p'), ('a', '</w>'),
    ('jo', 'in</w>'), ('h', 'ash'), ('r', 'ow</w>'), ('b', 'atch'),
    ('c', 'o'), ('lum', 'n</w>'), ('filt', 'er'), ('s', 'm'),
    ('mer', 'ge</w>'), ('or', 'der'), ('in', 'e</w>'), ('d', 'at'),
    ('g', 'g'), ('e', 'y'), ('par', 'k'), ('t', '</w>'),
]


def q_bpe_token_count_frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenization with a FROZEN merge table (r10) — the apply
    lane of ``bpe_token_count``, oracle-able end-to-end: the trained
    merge list is inlined as driver-fixed literals (the persisted
    save_merges artifact, provenance in _BPE_FROZEN_MERGES), and the
    greedy merge loop — at each step merge the LEFTMOST occurrence of
    the LOWEST-rank adjacent pair, repeat until no learned pair
    remains — is replayed in DuckDB as a recursive CTE over the
    distinct-word table (the mmr_rerank precedent for iterative
    state). One-occurrence-at-a-time with (rank, leftmost) selection
    is provably equal to classic merge-all-occurrences BPE: merging
    pair p only creates pairs containing p's OUTPUT symbol, and any
    learned pair containing it necessarily has a higher rank than p (its merge
    postdates p's at train time), so p stays minimal until exhausted.

    Scale shape: tokenization is shuffle-free mapInPandas with a
    per-batch distinct-word cache (operators/bpe.py:181); per-doc
    token counts are exact. The oracle folds per-WORD token counts
    over the (doc, word, count) table so the recursive work is
    O(distinct words x merges), not O(corpus)."""
    from aiotcvectordb_spark.operators import bpe

    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    return bpe.bpe_encode(df, _BPE_FROZEN_MERGES).select(
        "doc_id", "n_tokens"
    )


def _bpe_frozen_oracle() -> str:
    items = ", ".join(
        f"'{a}' || chr(31) || '{b}'" for a, b in _BPE_FROZEN_MERGES
    )
    pair = "syms[i] || chr(31) || syms[i+1]"
    return f"""
WITH RECURSIVE
ml AS (SELECT [{items}] AS m),
words0 AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{sparse_fn.BPE_PRETOKEN_RE}')) AS word
  FROM documents
),
wc AS (SELECT doc_id, word, count(*) AS k FROM words0 GROUP BY doc_id, word),
dw AS (SELECT DISTINCT word FROM words0),
steps(word, syms, n) AS (
  SELECT word, list_append(string_split(word, ''), '</w>'), 0 FROM dw
  UNION ALL
  SELECT word,
         syms[1:CAST(key % 1000000 AS INT)-1]
           || [syms[CAST(key % 1000000 AS INT)] || syms[CAST(key % 1000000 AS INT)+1]]
           || syms[CAST(key % 1000000 AS INT)+2:],
         n + 1
  FROM (
    SELECT word, syms, n,
           CAST(list_aggregate(list_transform(range(1, len(syms)),
                i -> CASE WHEN list_position(m, {pair}) = 0
                          THEN 1000000000000
                          ELSE list_position(m, {pair}) * 1000000 + i END),
                'min') AS BIGINT) AS key
    FROM steps, ml
  )
  WHERE key < 1000000000000
),
final AS (
  SELECT word, len(syms) AS t FROM steps
  QUALIFY row_number() OVER (PARTITION BY word ORDER BY n DESC) = 1
)
SELECT d.doc_id, CAST(COALESCE(sum(w.k * f.t), 0) AS INT) AS n_tokens
FROM documents d
LEFT JOIN wc w ON w.doc_id = d.doc_id
LEFT JOIN final f ON f.word = w.word
GROUP BY d.doc_id
"""


# Prepared for the r11 promotion (this round's 50-slot driver batch is
# fully booked by the 47 aged rows + 3 r10 promotions): registered
# rows-only now, and the oracle is ALREADY pinned against the Spark
# output in tests/test_bpe.py::test_bpe_frozen_oracle_parity, so the
# ORACLES registration is a zero-risk one-liner next round.
ORACLE_BPE_TOKEN_COUNT_FROZEN = _bpe_frozen_oracle()


def q_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable sketch aggregates — the 100 TB profiling path where
    exact distinct/percentile would shuffle every value: per-event-type
    HLL distinct users (DataSketches, mergeable across partitions and
    re-aggregable via hll_union_agg) and t-digest-style approximate
    percentiles. Rows-only driver check; accuracy-vs-exact tolerances
    asserted in pytest (sketch internals are engine-specific, so no
    cross-engine hash can exist)."""
    events = ensure_min_partitions(load(spark, sf_dir, "events"))
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("users_sketch"),
        F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.95)), 10000)
        .alias("value_q"),
        F.count("*").alias("n"),
    )
    return per_type.select(
        "event_type",
        F.hll_sketch_estimate("users_sketch").alias("approx_users"),
        F.col("value_q")[0].alias("approx_p50"),
        F.col("value_q")[1].alias("approx_p95"),
        "n",
    )


_MMF_WIDTH = 16  # PNG width for the multimodal_features fixture images


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode by default (upgraded r4 from the deterministic fake):
    each document's UTF-8 bytes become a real zlib-compressed grayscale
    PNG (``with_png_payload``), then ``decode_features(mode="real")``
    inflates + defilters the actual pixels and emits a normalized
    luminance histogram. Pixels are the text bytes zero-padded to the
    image grid, so DuckDB can recompute the histogram from the bytes —
    the full PNG codec round trip is hash-checked. n_bytes (the PNG
    payload size) is dropped from the oracled projection: compressed
    length is not SQL-expressible.

    r5: the 8-bucket histogram is posexploded to scalar
    (doc_id, bucket, ratio) rows — the driver canonicalizer pandas-sorts
    every projected column and crashes on array cells (unhashable list),
    so oracled projections must be scalar-only (enforced registry-wide
    by test_registry_consistency.py)."""
    from aiotcvectordb_spark.operators import multimodal

    # no 32-way widening: each Python worker pays pandas/numpy import on
    # spawn, which dominates tiny inputs; real corpora arrive multi-split.
    media = payload_table(
        spark, sf_dir, f"png_w{_MMF_WIDTH}", 1,
        lambda: multimodal.with_png_payload(
            load(spark, sf_dir, "documents"),
            text_col="text", width=_MMF_WIDTH,
        ),
        min_partitions=False,
    )
    feats = multimodal.decode_features(media, id_col="doc_id", mode="real")
    return feats.select(
        "doc_id", F.posexplode("features").alias("bucket", "ratio")
    ).select(
        "doc_id",
        F.col("bucket").cast("int").alias("bucket"),
        F.round("ratio", ROUND_DIGITS).alias("ratio"),
    )


# Recompute the luminance histogram straight from the UTF-8 bytes: the
# PNG pixels are exactly those bytes zero-padded to ceil(nb/16)x16
# (min one row), bucket = px * 8 // 256, ratio = count / (h*16).
ORACLE_MULTIMODAL_FEATURES = f"""
WITH ch AS (
  SELECT doc_id, ascii(c) AS cp
  FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS c
    FROM documents WHERE length(text) > 0
  )
),
b AS (
  SELECT doc_id, unnest(
    CASE WHEN cp < 128 THEN [cp]
         WHEN cp < 2048 THEN [192 + cp // 64, 128 + cp % 64]
         WHEN cp < 65536 THEN [224 + cp // 4096, 128 + (cp // 64) % 64,
                               128 + cp % 64]
         ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64,
               128 + (cp // 64) % 64, 128 + cp % 64] END) AS byte
  FROM ch
),
counts AS (
  SELECT doc_id, byte * 8 // 256 AS bk, count(*) AS c
  FROM b GROUP BY doc_id, byte * 8 // 256
),
dims AS (
  SELECT d.doc_id,
         coalesce(nb.nb, 0) AS nb,
         greatest(1, CAST(ceil(coalesce(nb.nb, 0) / {_MMF_WIDTH}.0) AS BIGINT))
           AS h
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS nb FROM b GROUP BY doc_id) nb
    USING (doc_id)
),
grid AS (
  SELECT dims.doc_id, dims.nb, dims.h, r.range AS bk
  FROM dims CROSS JOIN range(8) r
),
filled AS (
  SELECT g.doc_id, g.bk,
         coalesce(c.c, 0)
           + CASE WHEN g.bk = 0 THEN g.h * {_MMF_WIDTH} - g.nb ELSE 0 END AS c,
         g.h * {_MMF_WIDTH} AS total
  FROM grid g LEFT JOIN counts c ON g.doc_id = c.doc_id AND g.bk = c.bk
)
SELECT doc_id,
       CAST(bk AS INTEGER) AS bucket,
       round(c / CAST(total AS DOUBLE), {ROUND_DIGITS}) AS ratio
FROM filled
"""


def q_audio_mp3_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MPEG-1 Layer III round trip (r5): the text-derived waveform
    is MP3-encoded (real polyphase analysis + MDCT + Huffman codebook 1,
    operators/mp3codec.encode_mp3; odd ids carry a FULL Layer I stream
    instead, so the layer-dispatching decode runs distributed) and a
    second shuffle-free mapInPandas stage decodes — side info,
    requantization, alias reduction, IMDCT, synthesis filterbank — and
    computes features on the reconstructed PCM. Rows-only by nature
    (the lossy subband cascade is not SQL-expressible); pytest pins the
    codec (±20 Hz sine frequency, <25% RMS drift, real-world container
    parse, tampered-codebook rejection — tests/test_mp3codec.py).
    Honest subset per the mp3codec module docstring: ISO Table B.7
    codebooks beyond 0/1/count1-B and the Table B.3 synthesis window
    are NOT reproduced."""
    from aiotcvectordb_spark.operators import mp3codec as M3

    mp3 = payload_table(
        spark, sf_dir, "mp3_mixed", 1,
        lambda: M3.with_mp3_payload(
            ensure_min_partitions(load(spark, sf_dir, "documents")),
            mix_layer1=True,
        ),
    )
    return M3.mp3_features(mp3).select(
        "doc_id",
        "n_frames",
        "duration_ms",
        F.round("rms", ROUND_DIGITS).alias("rms"),
    )


def q_audio_mp3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``audio_mp3_probe``'s METADATA route (r11, verdict item: route
    metadata-only consumers to the header-probe path): real mixed
    Layer I/III streams, features from ``mp3_meta`` — a frame-sync
    header walk, NO requantization/IMDCT/synthesis — so the cost is
    encode + a few bytes per frame instead of CPU-linear decode.

    r12 witness upgrade (verdict item: known-answer → recomputed
    geometry): ``vary_geometry`` rotates the waveform length per
    document — ``1152 * (1 + id % 5)`` samples on the Layer III lane,
    ``384 * (2 + id % 9)`` on Layer I — so the DuckDB oracle must
    RECOMPUTE n_frames and duration from doc_id arithmetic per row
    (duration = round(n_frames * spf * 1000 / 44100); no value lands
    on a .5 tie because 49 ∤ n and 147 ∤ n for these frame counts).
    An end-to-end encode->header-parse witness under the driver hash,
    now with per-row geometry."""
    from aiotcvectordb_spark.operators import mp3codec as M3

    mp3 = payload_table(
        spark, sf_dir, "mp3_mixed_varied", 1,
        lambda: M3.with_mp3_payload(
            ensure_min_partitions(load(spark, sf_dir, "documents")),
            mix_layer1=True, vary_geometry=True,
        ),
    )
    return M3.mp3_meta(mp3)


ORACLE_AUDIO_MP3_META = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 3 END AS INTEGER)
         AS layer,
       CAST(CASE WHEN doc_id % 2 = 1 THEN 2 + doc_id % 9
                 ELSE 1 + doc_id % 5 END AS INTEGER) AS n_frames,
       44100 AS sample_rate,
       CAST(CASE WHEN doc_id % 2 = 1 THEN 448 ELSE 128 END AS INTEGER)
         AS bitrate_kbps,
       CAST(round((CASE WHEN doc_id % 2 = 1
                        THEN 384 * (2 + doc_id % 9)
                        ELSE 1152 * (1 + doc_id % 5) END)
                  * 1000.0 / 44100) AS BIGINT) AS duration_ms
FROM documents
"""


def q_jpeg_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``jpeg_progressive_probe``'s METADATA route (r11): the same real
    SOF2 progressive streams, but features come from
    ``multimodal.probe_media`` — a marker-segment walk reading SOF
    dimensions, NO Huffman decode / dequant / IDCT. ORACLED: the
    parsed dimensions must equal the encoder's block geometry —
    r12 witness upgrade (known-answer → recomputed geometry):
    ``vary_width`` rotates the grid to ``2 + doc_id % 7`` blocks per
    document, so the oracle RECOMPUTES width and height from doc_id +
    text arithmetic per row instead of selecting a fixture-wide
    constant. An encode->header-parse witness that costs header bytes
    per image instead of entropy-decode CPU. At 100 TB,
    dimension/orientation audits run HERE; only pixel consumers pay
    ``jpeg_features``."""
    from aiotcvectordb_spark.operators import multimodal

    media = payload_table(
        spark, sf_dir, "jpeg_prog_varied", 1,
        lambda: multimodal.with_jpeg_payload(
            ensure_min_partitions(load(spark, sf_dir, "documents")),
            progressive=True, vary_width=True,
        ),
    )
    return multimodal.probe_media(media).select(
        "doc_id",
        "format",
        "width",
        "height",
        "bit_depth",
        "channels",
    )


ORACLE_JPEG_META = """
SELECT doc_id,
       'jpeg' AS format,
       CAST((2 + doc_id % 7) * 8 AS INTEGER) AS width,
       CAST(8 * ceil(greatest(octet_length(encode(text)), 1)
                     / CAST(2 + doc_id % 7 AS DOUBLE)) AS INTEGER)
         AS height,
       8 AS bit_depth,
       1 AS channels
FROM documents
"""


def q_audio_adpcm_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``audio_adpcm_probe``'s METADATA route (r12, verdict item #3 —
    the last codec lane without a driver witness): the same real
    IMA-ADPCM RIFF/WAVE payloads, features from ``wav_meta`` — a
    chunk-walk over the fmt / fact / data chunk FIELDS
    (``audiocodec.probe_wav_header``), never the nibble stream — so
    duration/geometry audits cost ~50 header bytes per file while
    ``audio_adpcm_probe`` pays the full predictor state machine.

    ORACLED with RECOMPUTED geometry: every field is closed-form from
    the encoder's block structure (block_align 256 → 505 samples per
    mono block; one sample per UTF-8 byte, empty text → 1 sample;
    fact n_samples; n_blocks = ceil(n/505); duration = n*1000 // 8000)
    so DuckDB derives all of them per row from the text itself — an
    encode→header-parse witness for the ADPCM container under the
    driver hash."""
    from aiotcvectordb_spark.operators import multimodal as MM

    wav = payload_table(
        spark, sf_dir, "wav_adpcm", 1,
        lambda: MM.with_wav_payload(
            ensure_min_partitions(load(spark, sf_dir, "documents")),
            n_samples=None, codec="adpcm",
        ),
    )
    return MM.wav_meta(wav)


ORACLE_AUDIO_ADPCM_META = """
WITH n AS (
  SELECT doc_id,
         greatest(octet_length(encode(text)), 1) AS ns
  FROM documents
)
SELECT doc_id,
       17 AS format_tag,
       8000 AS sample_rate,
       256 AS block_align,
       505 AS samples_per_block,
       CAST(ns AS BIGINT) AS n_samples,
       CAST(ceil(ns / 505.0) AS INTEGER) AS n_blocks,
       CAST(ns * 1000 // 8000 AS BIGINT) AS duration_ms
FROM n
"""


_PDF_LINES_PER_PAGE = 20


def q_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PDF parser round trip, oracle-checked (r5): each document's
    text becomes a genuine multi-page FlateDecode PDF
    (``operators/pdfcodec.build_pdf`` — proper xref/trailer, UTF-16BE
    hex strings so CJK survives, one page per 20 lines), then a second
    shuffle-free mapInPandas stage runs the stdlib ISO 32000-1
    extractor (object scan + ObjStm, zlib inflate, Tj/TJ/'/" text
    operators, Root->Pages->Kids page walk). r6: ``mix_modes`` rotates
    the writer per document across font modes simple / Type0+ToUnicode
    CMap / Encoding-Differences and stream filters Flate / LZW, so the
    CMap machinery, glyph-name resolution, and the LZW codec all run
    distributed under this same oracle. Extracted text must equal
    the input text EXACTLY and n_pages = ceil(lines/20) — DuckDB
    predicts both from the raw text, so the driver hash-checks the
    whole parser: the RAG upload path's PDF ingestion (reference
    collection_view.py:342-423 ParsingProcess) is verified end to end,
    not just unit-tested."""
    from aiotcvectordb_spark.operators import pdfcodec

    pdfs = payload_table(
        spark, sf_dir, "pdf", 1,
        lambda: pdfcodec.with_pdf_payload(
            ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
                F.length("text") > 0
            ),
            lines_per_page=_PDF_LINES_PER_PAGE, mix_modes=True,
        ),
    )
    return pdfcodec.extract_text_df(
        pdfs, prime_kdf=pdfcodec.v5_policy_kdf_pairs()
    ).select("doc_id", "text", "n_pages")


ORACLE_PDF_EXTRACT = f"""
SELECT doc_id,
       text,
       CAST(ceil(((length(text) - length(replace(text, chr(10), ''))) + 1)
                 / {_PDF_LINES_PER_PAGE}.0) AS INTEGER) AS n_pages
FROM (SELECT doc_id,
             translate(
                 replace(replace(text, chr(13) || chr(10), chr(10)),
                         chr(13), chr(10)),
                 chr(0) || chr(1) || chr(2) || chr(3) || chr(4) || chr(5) ||
                       chr(6) || chr(7) || chr(8) || chr(11) || chr(12) || chr(14) ||
                       chr(15) || chr(16) || chr(17) || chr(18) || chr(19) || chr(20) ||
                       chr(21) || chr(22) || chr(23) || chr(24) || chr(25) || chr(26) ||
                       chr(27) || chr(28) || chr(29) || chr(30) || chr(31),
                 '') AS text
      FROM documents
      WHERE length(text) > 0) upload_canon
"""


def q_doc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL binary Word (.doc) parser round trip, oracle-checked (r6):
    each document's text becomes a genuine [MS-CFB] compound file with
    WordDocument + 0Table streams and a multi-piece [MS-DOC] piece
    table (``operators/cfbdoc.build_doc`` — FIB, Clx/Pcdt/PlcPcd,
    compressed cp1252 and UTF-16LE pieces alternating per id, mini
    stream for small docs and FAT chains for large ones), then a
    second shuffle-free mapInPandas stage runs the stdlib CFB reader +
    piece-table extractor. Word stores paragraph marks as CR, so the
    oracle predicts extraction as the CR->LF mapping with the final
    paragraph mark stripped — DuckDB hash-checks the whole container
    and text machinery. Covers the last common enterprise ingest
    format the upload path (reference collection_view.py:342-423)
    rejected."""
    from aiotcvectordb_spark.operators import cfbdoc

    docs = payload_table(
        spark, sf_dir, "doc", 1,
        lambda: cfbdoc.with_doc_payload(
            ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
                F.length("text") > 0
            )
        ),
    )
    return cfbdoc.extract_text_df(docs).select("doc_id", "text")


ORACLE_DOC_EXTRACT = """
SELECT doc_id,
       rtrim(replace(text, chr(13), chr(10)), chr(10)) AS text
FROM (SELECT doc_id,
             translate(
                 replace(replace(text, chr(13) || chr(10), chr(10)),
                         chr(13), chr(10)),
                 chr(0) || chr(1) || chr(2) || chr(3) || chr(4) || chr(5) ||
                       chr(6) || chr(7) || chr(8) || chr(11) || chr(12) || chr(14) ||
                       chr(15) || chr(16) || chr(17) || chr(18) || chr(19) || chr(20) ||
                       chr(21) || chr(22) || chr(23) || chr(24) || chr(25) || chr(26) ||
                       chr(27) || chr(28) || chr(29) || chr(30) || chr(31),
                 '') AS text
      FROM documents
      WHERE length(text) > 0) upload_canon
"""


def q_ppt_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL binary PowerPoint (.ppt) parser round trip, oracle-checked
    (r6): each document's text becomes a genuine [MS-PPT] record tree
    (Document > SlideListWithText containers with TextBytesAtom/
    TextCharsAtom alternating per id) inside a real [MS-CFB] container
    (``operators/olebin.build_ppt``), then a second shuffle-free
    mapInPandas stage follows the spec's reading order — CurrentUserAtom
    → UserEditAtom chain → merged PersistDirectoryAtoms →
    SlidePersistAtom slide ordering ([MS-PPT] 2.1.2). Every third deck
    is written as an INCREMENTAL SAVE carrying a superseded edit whose
    stale text is physically present in the stream; the oracle predicts
    only the live edit, so any stream-order leak of superseded content
    hash-mismatches. DuckDB predicts the extraction exactly (edge
    newlines trimmed), hash-checking the record walker, the persist
    machinery, and both character widths."""
    import zlib

    from aiotcvectordb_spark.operators import olebin

    df = ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )

    def variant(i, _t):
        if zlib.crc32(str(i).encode("utf-8")) % 3 == 0:
            return {"stale_text": f"superseded edit of {i}\nstale bullet"}
        return {}

    decks = payload_table(
        spark, sf_dir, "ppt", 1,
        lambda: olebin.with_office_payload(
            df, olebin.build_ppt, variant_fn=variant
        ),
    )
    return olebin.extract_office_text_df(decks, olebin.parse_ppt).select(
        "doc_id", "text"
    )


ORACLE_PPT_EXTRACT = """
SELECT doc_id, trim(text, chr(10)) AS text
FROM (SELECT doc_id,
             translate(
                 replace(replace(text, chr(13) || chr(10), chr(10)),
                         chr(13), chr(10)),
                 chr(0) || chr(1) || chr(2) || chr(3) || chr(4) || chr(5) ||
                       chr(6) || chr(7) || chr(8) || chr(11) || chr(12) || chr(14) ||
                       chr(15) || chr(16) || chr(17) || chr(18) || chr(19) || chr(20) ||
                       chr(21) || chr(22) || chr(23) || chr(24) || chr(25) || chr(26) ||
                       chr(27) || chr(28) || chr(29) || chr(30) || chr(31),
                 '') AS text
      FROM documents
      WHERE length(text) > 0) upload_canon
"""


def q_xls_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL binary Excel (.xls, BIFF8) parser round trip,
    oracle-checked (r6): each document's text becomes a genuine BIFF8
    Workbook stream — workbook-globals substream carrying the SST
    shared-string table (both narrow cp1252 and wide UTF-16LE entries
    by content), a worksheet substream of LabelSst cells (lines = rows,
    tabs = cells) — inside a real [MS-CFB] container
    (``operators/olebin.build_xls``); a second shuffle-free mapInPandas
    stage parses the records back to tab/newline text. Every second
    workbook is written with a 256-byte record cap so its SST spans
    Continue records ([MS-XLS] 2.4.58/2.5.293) — splits between
    strings and mid-character-array with fresh option bytes — putting
    the spanning reader on the oracled path. r7: an independent half
    of the corpus (crc of id+'f') is written with ``formula_cells`` —
    eligible cells become Formula records carrying CACHED results
    ([MS-XLS] 2.4.127: cached-string Formula + String record pairs,
    cached-number FormulaValues), the record shapes real workbooks
    are full of, so the cached-result reader is driver-hash-proven.
    DuckDB predicts the extraction exactly, hash-checking the record
    scan, SST decoding (single-record and Continue-spanning), formula
    caches, and row/cell assembly."""
    import zlib

    from aiotcvectordb_spark.operators import olebin

    df = ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )

    def variant(i, _t):
        kw = {}
        if zlib.crc32(str(i).encode("utf-8")) % 2 == 0:
            kw["sst_max_body"] = 256
        if zlib.crc32((str(i) + "f").encode("utf-8")) % 2 == 0:
            kw["formula_cells"] = True
        return kw

    books = payload_table(
        spark, sf_dir, "xls", 1,
        lambda: olebin.with_office_payload(
            df, olebin.build_xls, variant_fn=variant
        ),
    )
    return olebin.extract_office_text_df(books, olebin.parse_xls).select(
        "doc_id", "text"
    )


ORACLE_XLS_EXTRACT = """
SELECT doc_id, trim(text, chr(10)) AS text
FROM (SELECT doc_id,
             translate(
                 replace(replace(text, chr(13) || chr(10), chr(10)),
                         chr(13), chr(10)),
                 chr(0) || chr(1) || chr(2) || chr(3) || chr(4) || chr(5) ||
                       chr(6) || chr(7) || chr(8) || chr(11) || chr(12) || chr(14) ||
                       chr(15) || chr(16) || chr(17) || chr(18) || chr(19) || chr(20) ||
                       chr(21) || chr(22) || chr(23) || chr(24) || chr(25) || chr(26) ||
                       chr(27) || chr(28) || chr(29) || chr(30) || chr(31),
                 '') AS text
      FROM documents
      WHERE length(text) > 0) upload_canon
"""


def q_docx_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OOXML .docx parser round trip, oracle-checked (r6): each
    document becomes a genuine ECMA-376 package
    (``operators/officeparse.build_docx`` — word/document.xml
    paragraphs with preserved tabs), parsed back by the stdlib
    zipfile+etree extractor. Documents whose md5(doc_id) starts 0-4
    additionally carry a REAL footnotes part (including Word's
    separator/continuationSeparator stubs the extractor must skip) and
    a header part; the oracle predicts the documented
    body -> footnote -> header reading order, so stub-skipping and
    part ordering are driver-hash-checked, not just unit-tested.
    r7 rotates two more writer-emission modes in so the reader's
    break/tab paths are hash-proven too: md5 5-7 docs store each
    paragraph's first space as an explicit ``<w:br/>`` (read back as
    a newline), md5 8-a docs carry their second space as a real
    ``<w:tab/>`` run. Shuffle-free mapInPandas both ways — the 100 TB
    codec shape."""
    import hashlib

    from aiotcvectordb_spark.operators import officeparse, olebin

    df = ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )

    def variant(i, _t):
        h = hashlib.md5(str(i).encode("utf-8")).hexdigest()[0]
        if h in "01234":
            return {
                "footnote": f"Footnote for {i}",
                "header": f"Header of {i}",
            }
        if h in "567":
            return {"br_first_space": True}
        if h in "89a":
            return {"tabify": True}
        return {}

    def tabify_line(line: str) -> str:
        i = line.find(" ")
        j = line.find(" ", i + 1) if i >= 0 else -1
        return line if j < 0 else line[:j] + "\t" + line[j + 1 :]

    def builder(t, **kw):
        # Canonical form (r7): build from edge-trimmed text, so the
        # builder, the parser (which keeps interior empty paragraphs
        # but edge-strips the final join), and the oracle agree for
        # texts ENDING in newlines too — previously the oracle trimmed
        # the body before appending 'Footnote/Header' while the parser
        # kept the trailing empty paragraph between body and notes.
        t = t.strip("\n")
        if kw.pop("tabify", False):
            t = "\n".join(tabify_line(ln) for ln in t.split("\n"))
        return officeparse.build_docx(t, **kw)

    docs = payload_table(
        spark, sf_dir, "docx", 1,
        lambda: olebin.with_office_payload(
            df, builder, alternate=False, variant_fn=variant
        ),
    )
    return olebin.extract_office_text_df(docs, officeparse.parse_docx).select(
        "doc_id", "text"
    )


ORACLE_DOCX_EXTRACT = """
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN
                 ('0','1','2','3','4')
            THEN trim(trim(text, chr(10)) || chr(10) ||
                 'Footnote for ' || CAST(doc_id AS VARCHAR) || chr(10) ||
                 'Header of ' || CAST(doc_id AS VARCHAR), chr(10))
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN
                 ('5','6','7')
            THEN trim(array_to_string(list_transform(
                   string_split(trim(text, chr(10)), chr(10)),
                   l -> regexp_replace(l, ' ', chr(10))), chr(10)), chr(10))
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN
                 ('8','9','a')
            THEN array_to_string(list_transform(
                   string_split(trim(text, chr(10)), chr(10)),
                   l -> regexp_replace(l, '^([^ ]* [^ ]*) ', '\\1' || chr(9))),
                 chr(10))
            ELSE trim(text, chr(10)) END AS text
FROM (SELECT doc_id,
             translate(
                 replace(replace(text, chr(13) || chr(10), chr(10)),
                         chr(13), chr(10)),
                 chr(0) || chr(1) || chr(2) || chr(3) || chr(4) || chr(5) ||
                       chr(6) || chr(7) || chr(8) || chr(11) || chr(12) || chr(14) ||
                       chr(15) || chr(16) || chr(17) || chr(18) || chr(19) || chr(20) ||
                       chr(21) || chr(22) || chr(23) || chr(24) || chr(25) || chr(26) ||
                       chr(27) || chr(28) || chr(29) || chr(30) || chr(31),
                 '') AS text
      FROM documents
      WHERE length(text) > 0) upload_canon
"""


def q_pptx_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OOXML .pptx parser round trip, oracle-checked (r6): each
    document becomes a real presentation package
    (``operators/officeparse.build_pptx`` — ppt/slides/slideN.xml with
    <a:p> paragraphs), parsed back slide-by-slide in numeric order.
    r7: documents with md5(doc_id) starting 0-4 carry a real SPEAKER
    NOTES part (ppt/notesSlides/notesSlide1.xml); the extractor
    appends notes after the deck body in the documented slides ->
    notes order, so the notes path — the prose-heavy content a RAG
    upload actually wants from real decks — is driver-hash-proven.
    Shuffle-free mapInPandas both ways."""
    import hashlib

    from aiotcvectordb_spark.operators import officeparse, olebin

    df = ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )

    def variant(i, _t):
        if hashlib.md5(str(i).encode("utf-8")).hexdigest()[0] in "01234":
            return {"notes": f"Notes for {i}"}
        return {}

    decks = payload_table(
        spark, sf_dir, "pptx", 1,
        lambda: olebin.with_office_payload(
            df, officeparse.build_pptx, alternate=False, variant_fn=variant
        ),
    )
    return olebin.extract_office_text_df(decks, officeparse.parse_pptx).select(
        "doc_id", "text"
    )


ORACLE_PPTX_EXTRACT = """
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN
                 ('0','1','2','3','4')
            THEN trim(trim(text, chr(10)) || chr(10) || chr(10) ||
                 'Notes for ' || CAST(doc_id AS VARCHAR), chr(10))
            ELSE trim(text, chr(10)) END AS text
FROM (SELECT doc_id,
             translate(
                 replace(replace(text, chr(13) || chr(10), chr(10)),
                         chr(13), chr(10)),
                 chr(0) || chr(1) || chr(2) || chr(3) || chr(4) || chr(5) ||
                       chr(6) || chr(7) || chr(8) || chr(11) || chr(12) || chr(14) ||
                       chr(15) || chr(16) || chr(17) || chr(18) || chr(19) || chr(20) ||
                       chr(21) || chr(22) || chr(23) || chr(24) || chr(25) || chr(26) ||
                       chr(27) || chr(28) || chr(29) || chr(30) || chr(31),
                 '') AS text
      FROM documents
      WHERE length(text) > 0) upload_canon
"""


def q_xlsx_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OOXML .xlsx parser round trip, oracle-checked (r6): each
    document becomes a real workbook package
    (``operators/officeparse.build_xlsx`` — lines as rows, tabs as
    cells, encodings rotating number / inlineStr / sharedStrings so
    all three cell-decode paths run under the oracle), parsed back to
    tab/newline text. r7: documents with md5(doc_id) starting 0-7
    split their first two spaces into row breaks and are written as a
    THREE-worksheet workbook (contiguous row chunks, one shared-string
    table spanning all sheets), so the reader's multi-sheet walk and
    cross-sheet SST indexing are driver-hash-proven. Shuffle-free
    mapInPandas both ways."""
    import hashlib

    from aiotcvectordb_spark.operators import officeparse, olebin

    df = ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )

    def variant(i, _t):
        if hashlib.md5(str(i).encode("utf-8")).hexdigest()[0] in "01234567":
            return {"multisheet": True}
        return {}

    def builder(t, **kw):
        if kw.pop("multisheet", False):
            # first two spaces become row breaks -> three rows, one
            # per worksheet (trailing sheets empty for short texts)
            return officeparse.build_xlsx(
                t.replace(" ", "\n", 2), sheets=3, **kw
            )
        return officeparse.build_xlsx(t, **kw)

    books = payload_table(
        spark, sf_dir, "xlsx", 1,
        lambda: olebin.with_office_payload(
            df, builder, alternate=False, variant_fn=variant
        ),
    )
    return olebin.extract_office_text_df(books, officeparse.parse_xlsx).select(
        "doc_id", "text"
    )


ORACLE_XLSX_EXTRACT = """
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN
                 ('0','1','2','3','4','5','6','7')
            THEN trim(regexp_replace(regexp_replace(text, ' ', chr(10)),
                                     ' ', chr(10)), chr(10))
            ELSE trim(text, chr(10)) END AS text
FROM (SELECT doc_id,
             translate(
                 replace(replace(text, chr(13) || chr(10), chr(10)),
                         chr(13), chr(10)),
                 chr(0) || chr(1) || chr(2) || chr(3) || chr(4) || chr(5) ||
                       chr(6) || chr(7) || chr(8) || chr(11) || chr(12) || chr(14) ||
                       chr(15) || chr(16) || chr(17) || chr(18) || chr(19) || chr(20) ||
                       chr(21) || chr(22) || chr(23) || chr(24) || chr(25) || chr(26) ||
                       chr(27) || chr(28) || chr(29) || chr(30) || chr(31),
                 '') AS text
      FROM documents
      WHERE length(text) > 0) upload_canon
"""


def q_rtf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RTF parser round trip, oracle-checked (r6): each document
    becomes a real RTF token stream (``operators/rtfepub.build_rtf`` —
    escaped braces/backslashes, ``\\uN?`` Unicode escapes, an
    ``{\\info}`` metadata block and a starred ``{\\*\\wgrffmtfilter}``
    ignorable destination in EVERY payload), then the control-word
    walker extracts the text back — so group skipping, escape
    decoding, and destination handling are driver-hash-checked.
    Shuffle-free mapInPandas both ways."""
    from aiotcvectordb_spark.operators import olebin, rtfepub

    df = ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )

    import re as _re

    def builder(t):
        # Canonical form (r7): pre-apply the parser's own
        # canonicalization (collapse 3+ newlines, strip edge
        # newline/space) so builder, parser, and oracle agree for ALL
        # texts — the oracle previously predicted only the edge trim,
        # diverging from the parser's interior collapse on texts with
        # blank-line runs.
        c = _re.sub(r"\n{3,}", "\n\n", t).strip("\n ")
        return rtfepub.build_rtf(c).encode("utf-8")

    def parser(b):
        return rtfepub.parse_rtf(bytes(b).decode("utf-8", "replace"))

    docs = payload_table(
        spark, sf_dir, "rtf", 1,
        lambda: olebin.with_office_payload(df, builder, alternate=False),
    )
    return olebin.extract_office_text_df(docs, parser).select(
        "doc_id", "text"
    )


ORACLE_RTF_EXTRACT = r"""
SELECT doc_id,
       trim(regexp_replace(text, '\n{3,}', chr(10) || chr(10), 'g'),
            chr(10) || ' ') AS text
FROM (SELECT doc_id,
             translate(
                 replace(replace(text, chr(13) || chr(10), chr(10)),
                         chr(13), chr(10)),
                 chr(0) || chr(1) || chr(2) || chr(3) || chr(4) || chr(5) ||
                       chr(6) || chr(7) || chr(8) || chr(11) || chr(12) || chr(14) ||
                       chr(15) || chr(16) || chr(17) || chr(18) || chr(19) || chr(20) ||
                       chr(21) || chr(22) || chr(23) || chr(24) || chr(25) || chr(26) ||
                       chr(27) || chr(28) || chr(29) || chr(30) || chr(31),
                 '') AS text
      FROM documents
      WHERE length(text) > 0) upload_canon
"""


def q_epub_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPUB parser round trip, oracle-checked (r6): each document
    becomes a real OCF/OPF package (``operators/rtfepub.build_epub`` —
    container.xml, manifest + spine, XHTML chapters), then the spine
    walk + HTML tag-stripper extract the text back. Shuffle-free
    mapInPandas both ways."""
    from aiotcvectordb_spark.operators import olebin, rtfepub

    df = ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )

    import re as _re

    def builder(t):
        # Canonical form (r7): pre-apply the HTML stripper's own
        # whitespace canonicalization (space/tab runs collapse to one
        # space, per-line edge trim, empty lines dropped) so builder,
        # parser, and oracle agree for ALL text shapes — not just the
        # single-spaced corpus the driver hashes.
        lines = (
            _re.sub(r"[ \t]+", " ", ln).strip(" ") for ln in t.split("\n")
        )
        return rtfepub.build_epub("\n".join(ln for ln in lines if ln))

    docs = payload_table(
        spark, sf_dir, "epub", 1,
        lambda: olebin.with_office_payload(df, builder, alternate=False),
    )
    return olebin.extract_office_text_df(docs, rtfepub.parse_epub).select(
        "doc_id", "text"
    )


ORACLE_EPUB_EXTRACT = """
SELECT doc_id,
       COALESCE(array_to_string(
         list_filter(
           list_transform(string_split(text, chr(10)),
             l -> trim(regexp_replace(l, '[ ' || chr(9) || ']+', ' ', 'g'),
                       ' ')),
           x -> x <> ''),
         chr(10)), '') AS text
FROM (SELECT doc_id,
             translate(
                 replace(replace(text, chr(13) || chr(10), chr(10)),
                         chr(13), chr(10)),
                 chr(0) || chr(1) || chr(2) || chr(3) || chr(4) || chr(5) ||
                       chr(6) || chr(7) || chr(8) || chr(11) || chr(12) || chr(14) ||
                       chr(15) || chr(16) || chr(17) || chr(18) || chr(19) || chr(20) ||
                       chr(21) || chr(22) || chr(23) || chr(24) || chr(25) || chr(26) ||
                       chr(27) || chr(28) || chr(29) || chr(30) || chr(31),
                 '') AS text
      FROM documents
      WHERE length(text) > 0) upload_canon
"""


def q_ann_pq_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized kNN (operators/pq.py): 32x-compressed codes
    scored with an ADC lookup table, then exact cosine rescore of the
    survivors — the compressed-domain 100 TB path where even streaming
    the raw float vectors is the bottleneck. Codebooks train on a
    BOUNDED driver-side sample (deterministic seeded Lloyd's); encode
    and search stay distributed. Rows-only (k-means codebooks have no
    SQL oracle); recall vs exact FLAT asserted in tests/test_pq.py."""
    from aiotcvectordb_spark.operators import pq

    emb = load(spark, sf_dir, "embeddings")
    model = pq.train_pq(emb, m=8, nbits=5)
    codes = pq.encode_pq(emb, model)
    return pq.search_pq(
        codes, model, [qvec(1.0), qvec(-1.0)], k=10,
        rescore=emb, rescore_k=60, round_digits=ROUND_DIGITS,
    )


_SBT_QUERY_TEXT = "spark join window aggregation data"


def _hash_embed_feats(tok_col: str, dim: int):
    """(bucket, sign) Catalyst expressions of the deterministic hash
    embedder (functions/embedding._embed_one): bucket = big-endian
    first-4-md5-bytes mod dim, sign = +1/-1 from bit 0 of md5 byte 4.
    Pure JVM expressions (md5/conv/substring) — whole-stage codegen,
    no Python in the loop."""
    md5 = F.md5(F.col(tok_col))
    bucket = F.pmod(
        F.conv(F.substring(md5, 1, 8), 16, 10).cast("bigint"), F.lit(dim)
    )
    sign = F.when(
        F.conv(F.substring(md5, 9, 2), 16, 10).cast("int") % 2 == 1,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    return bucket, sign


def _sbt_tokens_sql(col: str) -> str:
    """Spark SQL token array matching functions/embedding._tokens —
    the dense hash embedder's tokenizer — including its CJK lane (r9):
    lower → split on non-(letter|digit) runs (``[^\\p{L}\\p{N}]+``, the
    Java-property twin of Python's ``[\\W_]+`` under re.UNICODE), then
    each token's CJK runs become overlapping character bigrams (single
    CJK char stays itself) while non-CJK spans pass through whole.
    Pure-ASCII documents take a plain-split fast path gated on a
    one-regex ASCII test — identical output (ASCII alnum ⊂ \\p{L}\\p{N}),
    one cheap pass instead of the per-token re-segmentation."""
    cjk = sparse_fn.CJK_RANGES
    seg = (
        f"CASE WHEN s rlike '^[{cjk}]' "
        "THEN transform(sequence(1, greatest(length(s) - 1, 1)), "
        "i -> substring(s, i, 2)) ELSE array(s) END"
    )
    full = (
        "flatten(transform("
        f"filter(split(lower({col}), '[^\\\\p{{L}}\\\\p{{N}}]+'), "
        "t -> t != ''), "
        f"t -> flatten(transform("
        f"regexp_extract_all(t, '[{cjk}]+|[^{cjk}]+', 0), s -> {seg}))))"
    )
    fast = f"filter(split(lower({col}), '[\\\\W_]+'), t -> t != '')"
    return (
        f"CASE WHEN {col} rlike '[^\\\\x00-\\\\x7F]' THEN {full} "
        f"ELSE {fast} END"
    )


def _hash_embed_sparse(df: DataFrame, id_col: str, text_col: str, dim: int):
    """(dvec, dnorm): per-id signed bucket counts and L2 norms of the
    hash embedding — the SPARSE form of embed_udf's dense vectors
    (equality with functions/embedding._embed_one is pinned in
    tests/test_search_text_fulltext_hybrid.py, ASCII and CJK). One
    explode + one (id, bucket) aggregate; both shuffles are keyed by
    the data. r9: tokenizes through _sbt_tokens_sql, which carries the
    dense embedder's CJK-bigram lane — previously the Java-ASCII
    ``\\W`` split silently dropped every CJK token."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.expr(_sbt_tokens_sql(text_col))).alias("tok"),
    ).filter(F.col("tok") != "")
    bucket, sign = _hash_embed_feats("tok", dim)
    dvec = (
        toks.select(id_col, bucket.alias("bucket"), sign.alias("sign"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("sign").alias("dv"))
    )
    dnorm = dvec.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("dv") * F.col("dv"))).alias("dn")
    )
    return dvec, dnorm


def q_search_by_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op 30 (reference collection.py:263-314, search_by_text): the
    engine embeds the query text server-side and runs kNN against the
    collection's embedded documents (ai-mode). ORACLED as of r8: the
    deterministic hash embedder is expressed as Catalyst SQL
    (md5-bucket folding — the dsir_weights featurizer pattern), so
    DuckDB independently re-derives BOTH the document vectors and the
    query vector from raw text and the driver hash check covers the
    embedder itself, not just the kNN. Cosine over the sparse signed
    bucket counts equals cosine of embed_udf's dense vectors (same
    hash, same signs; parity with the pandas-UDF path pinned in
    pytest). r9: the SQL tokenizer carries the dense embedder's CJK
    lane (unicode word split + CJK character bigrams, both twins —
    _sbt_tokens_sql / _sbt_duck_tokens_sql), so CJK corpora — the
    reference encoder's home turf — embed identically to
    functions/embedding._embed_one instead of silently dropping every
    CJK token to the Java-ASCII \\W split. Scale shape: explode →
    (doc, bucket) aggregate → ≤dim-row broadcast of the query vector →
    per-doc dot/norm → global top-10 via TakeOrderedAndProject (never
    a full sort)."""
    docs = load(spark, sf_dir, "documents")
    dvec, dnorm = _hash_embed_sparse(docs, "doc_id", "text", DIM)
    qdf = spark.createDataFrame([(0, _SBT_QUERY_TEXT)], "qid int, text string")
    qvec_df, qnorm_df = _hash_embed_sparse(qdf, "qid", "text", DIM)
    qn = F.broadcast(qnorm_df.select(F.col("dn").alias("qn")))
    dot = (
        dvec.join(F.broadcast(qvec_df.select("bucket", F.col("dv").alias("qv"))), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("dv") * F.col("qv")).alias("dp"))
    )
    scored = (
        dnorm.join(dot, "doc_id", "left")
        .crossJoin(qn)
        .select(
            "doc_id",
            F.round(
                F.coalesce(F.col("dp"), F.lit(0.0))
                / F.greatest(F.col("dn") * F.col("qn"), F.lit(1e-12)),
                ROUND_DIGITS,
            ).alias("score"),
        )
    )
    top = scored.orderBy(F.col("score").desc(), "doc_id").limit(10)
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return top.select(
        "doc_id", "score", F.row_number().over(w).cast("int").alias("rank")
    )


def _sbt_duck_tokens_sql(col: str) -> str:
    """DuckDB (RE2) twin of _sbt_tokens_sql: same unicode word split
    (``[^\\p{{L}}\\p{{N}}]+`` — RE2 property classes), same CJK-bigram
    re-segmentation, same ASCII fast path."""
    cjk = sparse_fn.CJK_RANGES
    seg = (
        f"CASE WHEN regexp_matches(s, '^[{cjk}]') "
        "THEN list_transform(range(1, greatest(length(s), 2)), "
        "i -> substr(s, i, 2)) ELSE [s] END"
    )
    full = (
        "flatten(list_transform("
        f"list_filter(regexp_split_to_array(lower({col}), "
        "'[^\\p{L}\\p{N}]+'), t -> t <> ''), "
        "t -> flatten(list_transform("
        f"regexp_extract_all(t, '[{cjk}]+|[^{cjk}]+'), s -> {seg}))))"
    )
    fast = (
        f"list_filter(regexp_split_to_array(lower({col}), '[\\W_]+'), "
        "t -> t <> '')"
    )
    return (
        f"CASE WHEN regexp_matches({col}, '[^\\x00-\\x7f]') THEN {full} "
        f"ELSE {fast} END"
    )


def _sbt_embed_cte(src: str, id_col: str) -> str:
    """DuckDB twin of _hash_embed_sparse over ``src`` (id_col, text) —
    CJK-bigram lane included (r9), matching _sbt_tokens_sql."""
    return f"""
  SELECT {id_col},
         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % {DIM} AS bucket,
         SUM(CASE WHEN CAST(('0x' || substr(md5(tok), 9, 2)) AS BIGINT) % 2 = 1
                  THEN 1.0 ELSE -1.0 END) AS dv
  FROM (SELECT {id_col},
               unnest({_sbt_duck_tokens_sql('text')}) AS tok
        FROM {src}) t
  WHERE tok != ''
  GROUP BY {id_col}, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % {DIM}
"""


ORACLE_SEARCH_BY_TEXT = f"""
WITH dvec AS ({_sbt_embed_cte("documents", "doc_id")}),
dnorm AS (SELECT doc_id, sqrt(SUM(dv * dv)) AS dn FROM dvec GROUP BY doc_id),
qsrc(qid, text) AS (VALUES (0, '{_SBT_QUERY_TEXT}')),
qvec AS ({_sbt_embed_cte("qsrc", "qid")}),
qnorm AS (SELECT sqrt(SUM(dv * dv)) AS qn FROM qvec),
dot AS (
  SELECT d.doc_id, SUM(d.dv * q.dv) AS dp
  FROM dvec d JOIN qvec q USING (bucket) GROUP BY d.doc_id
),
scored AS (
  SELECT n.doc_id,
         round(COALESCE(dot.dp, 0) /
               GREATEST(n.dn * (SELECT qn FROM qnorm), 1e-12),
               {ROUND_DIGITS}) AS score
  FROM dnorm n LEFT JOIN dot USING (doc_id)
)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
FROM scored
ORDER BY score DESC, doc_id
LIMIT 10
"""


def q_ann_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate kNN (reference index type IVF, nprobe knob,
    stub.py:609-612): KMeans(nlist=16) centroids, probe the 4 nearest
    cells, exact cosine rerank inside them. No SQL oracle (iterative
    KMeans); recall vs exact FLAT is asserted in pytest."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # no widening here: the KMeans fit runs ~maxIter jobs, and on a tiny
    # table 32-task scheduling overhead per iteration dominates; the
    # exact rerank below is the only scan-heavy stage.
    # COSINE metric -> cluster the UNIT-normalized vectors (spherical
    # k-means approximation): L2 on unit vectors is monotone in cosine.
    df = load(spark, sf_dir, "embeddings")
    unit = (
        "transform(embedding, x -> cast(x as double) / "
        "greatest(sqrt(aggregate(transform(embedding, v -> cast(v as double) * cast(v as double)), "
        "cast(0 as double), (a, b) -> a + b)), cast(1e-12 as double)))"
    )
    ml_df = df.withColumn("__features", array_to_vector(F.expr(unit)))
    model = KMeans(
        k=16, seed=42, maxIter=8, featuresCol="__features", predictionCol="cluster_id"
    ).fit(ml_df)
    clustered = model.transform(ml_df).drop("__features")

    import numpy as np

    q = np.asarray(qvec(1.0), dtype=np.float64)
    q = q / np.linalg.norm(q)
    cents = np.asarray(
        [c for c in model.clusterCenters()], dtype=np.float64
    )
    d = ((cents - q) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d)[:8]]
    pruned = clustered.filter(F.col("cluster_id").isin(probe))
    return knn.knn_search(
        pruned,
        [qvec(1.0)],
        vector_col="embedding",
        id_col="vec_id",
        metric="COSINE",
        limit=10,
        round_digits=ROUND_DIGITS,
    ).select("query_idx", "vec_id", "score", "rank")


def q_ann_ivf_fullprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF driven to its exact limit: ``nprobe = nlist``, so cell
    pruning removes nothing and the result must be BIT-IDENTICAL to
    flat exact kNN — shares ORACLE_SEARCH_FLAT_COSINE verbatim. This
    hash-proves the IVF *machinery* (cluster assignment, probe set,
    cell-pruned rescan, exact rerank): any row lost or rescored wrong
    by the plumbing breaks the hash. Centroid quality is irrelevant at
    full probe, so the fit is a cheap 2-iteration KMeans(k=8)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    df = load(spark, sf_dir, "embeddings")
    ml_df = df.withColumn(
        "__features",
        array_to_vector(F.col("embedding").cast("array<double>")),
    )
    model = KMeans(
        k=8, seed=42, maxIter=2,
        featuresCol="__features", predictionCol="cluster_id",
    ).fit(ml_df)
    clustered = model.transform(ml_df).drop("__features")
    # nprobe = nlist: probe EVERY cell. The isin predicate is the same
    # pruning expression the partial-probe path uses — here it must be
    # a no-op filter, which is exactly what the shared oracle checks.
    all_cells = list(range(8))
    pruned = clustered.filter(F.col("cluster_id").isin(all_cells))
    return knn.knn_search(
        pruned,
        FLAGSHIP_VECTORS,
        vector_col="embedding",
        id_col="vec_id",
        metric="COSINE",
        limit=10,
        filter="label IN (1, 2)",
        output_fields=["label"],
        round_digits=ROUND_DIGITS,
    ).select("query_idx", "vec_id", "score", "rank", "label")


def q_ann_pq_fullrescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ driven to its exact limit: ``rescore_k = |filtered corpus|``,
    so the ADC candidate stage cannot drop a true neighbor and the
    exact-cosine rescore ranks every row — the result must be
    BIT-IDENTICAL to flat exact kNN (shares ORACLE_SEARCH_FLAT_COSINE
    verbatim). Hash-proves the PQ plumbing end-to-end: train → encode →
    broadcast-LUT ADC → bounded shuffle → exact rescore. The label
    filter runs BEFORE encoding (filtered ANN = prefilter + index scan,
    reference stub.py:609 filter param)."""
    from aiotcvectordb_spark.operators import pq

    emb = load(spark, sf_dir, "embeddings")
    flt = emb.filter("label IN (1, 2)")
    n = flt.count()
    model = pq.train_pq(flt, m=8, nbits=4)
    codes = pq.encode_pq(flt, model)
    hits = pq.search_pq(
        codes, model, FLAGSHIP_VECTORS, k=10,
        rescore=flt, rescore_k=n, round_digits=ROUND_DIGITS,
    )
    # project label back on: broadcast the TINY result side (queries x k
    # rows) against the big table — one scan, no shuffle of emb
    return (
        emb.select("vec_id", "label")
        .join(F.broadcast(hits), "vec_id")
        .select("query_idx", "vec_id", "score", "rank", "label")
    )


def q_ann_lsh_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate kNN via MLlib LSH (HNSW stand-in). No SQL oracle
    (randomized hash planes); recall vs exact is asserted in pytest."""
    from aiotcvectordb_spark.operators import ann

    df = load(spark, sf_dir, "embeddings")
    return ann.lsh_search(
        df,
        [qvec(1.0)],
        vector_col="embedding",
        id_col="vec_id",
        limit=10,
    ).select("query_idx", "vec_id", "score", "rank")


def q_ann_lsh_l2_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-prune ANN with FROZEN projection planes, ORACLED
    (r11) — completes the index-family witness set: every quantized /
    hashed index's candidate-selection machinery now has a driver-hash
    row (BQ/SQ8 r9, IVF r10, PQ r11, LSH here; the MLlib
    ``ann_lsh_l2`` lane stays recall-tested, its planes are engine
    RNG). Datar-et-al bucketed random projections: bucket_t(v) =
    floor(round(v · p_t, ROUND_DIGITS) / L) over four fixed tables
    (``operators/lsh_frozen.py``), OR-amplified as a UNION of four
    bucket equi-joins (keyed broadcast joins, never a nested-loop),
    candidate dedup, exact-L2 rescore of the bucket union, top-10.
    Rounding BEFORE floor pins bucket boundaries cross-engine; the
    hash covers rows every table legitimately drops (L=3.0 — the
    ``FROZEN_LSH_BUCKET_LEN`` in ``lsh_frozen.py`` — prunes ~25-50%
    of the fixture corpus per query; recall vs exact pinned in
    tests/test_ann.py).

    Scale shape: bucket ids are scan-projection folds (the index
    build — stored bucket-partitioned at serving scale); query-time
    work is Q x T one-row broadcast joins, a (query, vec) distinct,
    and the exact rescore of only the bucket-union candidates."""
    from aiotcvectordb_spark.functions.vector import l2_score
    from aiotcvectordb_spark.operators.lsh_frozen import (
        FROZEN_LSH_BUCKET_LEN,
        FROZEN_LSH_PLANES,
        FROZEN_LSH_TABLES,
    )

    def _bucket_expr(vcol: str, plane: list[float]) -> str:
        lits = ", ".join(f"{v:.17e}" for v in plane)
        return (
            f"cast(floor(round(aggregate(zip_with(transform({vcol}, "
            f"x -> cast(x as double)), array({lits}), (x, y) -> x * y), "
            f"0D, (a, v) -> a + v), {ROUND_DIGITS}) / "
            f"{FROZEN_LSH_BUCKET_LEN!r}D) as long)"
        )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    for t, plane in enumerate(FROZEN_LSH_PLANES):
        emb = emb.withColumn(f"__b{t}", F.expr(_bucket_expr("embedding", plane)))
    qdf = spark.createDataFrame(
        list(enumerate(FLAGSHIP_VECTORS)), "query_idx int, qv array<double>"
    )
    for t, plane in enumerate(FROZEN_LSH_PLANES):
        qdf = qdf.withColumn(f"__qb{t}", F.expr(_bucket_expr("qv", plane)))

    cand = None
    for t in range(FROZEN_LSH_TABLES):
        side = qdf.select(
            "query_idx", "qv", F.col(f"__qb{t}").alias(f"__b{t}")
        )
        hit = emb.join(F.broadcast(side), f"__b{t}").select(
            "query_idx", "qv", "vec_id", "embedding"
        )
        cand = hit if cand is None else cand.unionByName(hit)
    cand = cand.dropDuplicates(["query_idx", "vec_id"])

    w = Window.partitionBy("query_idx").orderBy(
        F.col("score").asc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn(
            "score", F.round(l2_score("embedding", "qv"), ROUND_DIGITS)
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter("rank <= 10")
        .select("query_idx", "vec_id", "score", "rank")
    )


def _lsh_fixed_oracle() -> str:
    from aiotcvectordb_spark.operators.lsh_frozen import (
        FROZEN_LSH_BUCKET_LEN,
        FROZEN_LSH_PLANES,
        FROZEN_LSH_TABLES,
    )

    plane_rows = ", ".join(
        f"({t}, {_sql_vec(p)})" for t, p in enumerate(FROZEN_LSH_PLANES)
    )
    bucket = (
        "CAST(floor(round(list_dot_product({v}, p.pvec), "
        f"{ROUND_DIGITS}) / {FROZEN_LSH_BUCKET_LEN!r}) AS BIGINT)"
    )
    return f"""
WITH planes(tbl, pvec) AS (VALUES {plane_rows}),
{_sql_queries_cte(FLAGSHIP_VECTORS)},
eb AS (
  SELECT e.vec_id, p.tbl,
         {bucket.format(v="CAST(e.embedding AS DOUBLE[])")} AS b
  FROM embeddings e CROSS JOIN planes p
),
qb AS (
  SELECT q.query_idx, p.tbl, {bucket.format(v="q.qv")} AS b
  FROM queries q CROSS JOIN planes p
),
cand AS (
  SELECT DISTINCT qb.query_idx, eb.vec_id
  FROM eb JOIN qb ON eb.tbl = qb.tbl AND eb.b = qb.b
),
rescored AS (
  SELECT c.query_idx, c.vec_id,
         round({_L2_SQL}, {ROUND_DIGITS}) AS score
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN queries q ON q.query_idx = c.query_idx
)
SELECT query_idx, vec_id, score, CAST(rank AS INT) AS rank FROM (
  SELECT r.*, row_number() OVER (PARTITION BY query_idx
                                 ORDER BY score ASC, vec_id ASC) AS rank
  FROM rescored r
) WHERE rank <= 10
"""


ORACLE_ANN_LSH_L2_FIXED = _lsh_fixed_oracle()


# --------------------------------------------------------------------------
# §2.7 relational breadth: grouping sets / pivot / unpivot / TPC-H shapes
# --------------------------------------------------------------------------


def q_grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit non-hierarchical GROUPING SETS (beyond ROLLUP/CUBE):
    ((priority, status), (priority), (status)) over orders, with
    grouping() flags. One pass — Spark expands the sets into a single
    Expand + partial/final aggregate, no per-set rescans."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [
                ["o_orderpriority", "o_orderstatus"],
                ["o_orderpriority"],
                ["o_orderstatus"],
            ],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("price_sum"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
        )
        .select(
            "o_orderpriority", "o_orderstatus", "n_orders", "price_sum",
            "g_prio", "g_status",
        )
    )


ORACLE_GROUPING_SETS_AGG = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
       CAST(grouping(o_orderpriority) AS INT) AS g_prio,
       CAST(grouping(o_orderstatus) AS INT) AS g_status
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), (o_orderstatus))
"""


def q_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: quantity by linestatus (rows) x returnflag (columns).
    Explicit pivot values keep it one pass (no distinct-values job) and
    a fixed output schema — the 100 TB-safe form."""
    lineitem = load(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
        .select("l_linestatus", "A", "N", "R")
    )


ORACLE_PIVOT_WIDE = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "A",
       CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "N",
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "R"
FROM lineitem
GROUP BY l_linestatus
"""


def q_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long): per-status urgent/high price masses
    melted into (o_orderstatus, priority_class, price_sum) rows."""
    orders = load(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    wide = orders.groupBy("o_orderstatus").agg(
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", price))
        .cast("double")
        .alias("urgent"),
        F.sum(F.when(F.col("o_orderpriority") == "2-HIGH", price))
        .cast("double")
        .alias("high"),
    )
    return wide.unpivot(
        ["o_orderstatus"], ["urgent", "high"], "priority_class", "price_sum"
    )


ORACLE_UNPIVOT_LONG = """
WITH wide AS (
  SELECT o_orderstatus,
         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS urgent,
         CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS high
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, 'urgent' AS priority_class, urgent AS price_sum FROM wide
UNION ALL
SELECT o_orderstatus, 'high' AS priority_class, high AS price_sum FROM wide
"""


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: lineitem pricing summary with a shipdate
    pushdown filter. Pure map-side partial aggregation into 4 groups —
    the scan dominates and scales linearly; no join, ~no shuffle."""
    lineitem = load(spark, sf_dir, "lineitem").filter(
        "l_shipdate <= timestamp '1997-09-01 00:00:00'"
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    # charge multiplies THREE doubles — engines disagree in the last bits
    # (association/FMA), so do the arithmetic in exact decimal instead:
    # (12,2)*(4,2)*(4,2) stays well inside 38 digits on both engines.
    charge = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (1 - F.col("l_discount")).cast("decimal(4,2)")
        * (1 + F.col("l_tax")).cast("decimal(4,2)")
    )
    n = F.count("*")
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(F.sum(qty).cast("double") / n, ROUND_DIGITS).alias("avg_qty"),
            F.round(F.sum(price).cast("double") / n, ROUND_DIGITS).alias("avg_price"),
            n.alias("count_order"),
        )
        .select(
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "count_order",
        )
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l_discount AS DECIMAL(4,2))
                * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1997-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped orders by revenue. Date filters
    push to both scans; the orderkey aggregation reuses the join's hash
    partitioning (no extra shuffle); top-10 is a TakeOrdered, not a full
    sort."""
    cutoff = "timestamp '1996-06-15 00:00:00'"
    orders = load(spark, sf_dir, "orders").filter(f"o_orderdate < {cutoff}")
    lineitem = load(spark, sf_dir, "lineitem").filter(f"l_shipdate > {cutoff}")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_orderdate", "o_orderpriority", "revenue")
    )


ORACLE_TOP_REVENUE_ORDERS = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate < TIMESTAMP '1996-06-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-06-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders priced above 1.5x their
    customer's average. Catalyst decorrelates it into one aggregate +
    one join (no per-row re-execution) — the plan a hand-written
    join/agg would produce, written declaratively. Decimal avg keeps
    both engines exact."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("__orders_cs")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM __orders_cs o
        WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) >
              (SELECT 1.5 * (CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                             / count(*))
               FROM __orders_cs o2 WHERE o2.o_custkey = o.o_custkey)
        """
    )


def q_time_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: hourly 'purchase' counts over the table's
    full hour range, with EMPTY hours materialized as zero rows
    (sequence + explode of the hour spine, broadcast left join of the
    sparse counts). The resample/gap-fill primitive of monitoring and
    feature pipelines — the spine is computed from one aggregate row,
    never collected to the driver."""
    ev = load(spark, sf_dir, "events").select(
        F.expr("(ts div 1000000000) div 3600 * 3600").alias("hour_s"),
        "event_type",
    )
    bounds = ev.agg(
        F.min("hour_s").alias("lo"), F.max("hour_s").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, 3600)")).alias("hour_s")
    )
    counts = (
        ev.filter("event_type = 'purchase'")
        .groupBy("hour_s")
        .agg(F.count("*").alias("n"))
    )
    return (
        spine.join(counts, "hour_s", "left")
        .select("hour_s", F.coalesce("n", F.lit(0)).alias("n_purchases"))
    )


ORACLE_TIME_GAP_FILL = """
WITH ev AS (
  SELECT (epoch_ns(ts) // 1000000000) // 3600 * 3600 AS hour_s, event_type
  FROM events
),
bounds AS (SELECT min(hour_s) AS lo, max(hour_s) AS hi FROM ev),
spine AS (
  SELECT unnest(generate_series(lo, hi, 3600)) AS hour_s FROM bounds
),
counts AS (
  SELECT hour_s, count(*) AS n FROM ev WHERE event_type = 'purchase' GROUP BY hour_s
)
SELECT s.hour_s, coalesce(c.n, 0) AS n_purchases
FROM spine s LEFT JOIN counts c USING (hour_s)
"""


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis (view -> click -> purchase): per-user first-time
    of each step via conditional min aggregation (one shuffle on
    user_id), then ordered-step counts. The min-based ordering
    definition is deterministic — no window needed, pure partial-agg
    friendly."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000000000").alias("sec")
    )
    steps = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("sec"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("sec"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("sec"))).alias(
            "t_purchase"
        ),
    )
    return steps.agg(
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("n_view"),
        F.count(
            F.when(
                F.col("t_view").isNotNull()
                & F.col("t_click").isNotNull()
                & (F.col("t_view") < F.col("t_click")),
                1,
            )
        ).alias("n_view_click"),
        F.count(
            F.when(
                F.col("t_view").isNotNull()
                & F.col("t_click").isNotNull()
                & F.col("t_purchase").isNotNull()
                & (F.col("t_view") < F.col("t_click"))
                & (F.col("t_click") < F.col("t_purchase")),
                1,
            )
        ).alias("n_full_funnel"),
    )


ORACLE_FUNNEL_STEPS = """
WITH steps AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) // 1000000000 END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN epoch_ns(ts) // 1000000000 END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) // 1000000000 END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT count(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
       count(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
                   AND t_view < t_click THEN 1 END) AS n_view_click,
       count(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
                   AND t_purchase IS NOT NULL AND t_view < t_click
                   AND t_click < t_purchase THEN 1 END) AS n_full_funnel
FROM steps
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week; for each
    (cohort_week, week_offset), how many distinct users were active.
    Two aggregations plus one equi-join on user_id — the standard
    retention matrix, all hash-partitioned, no windows."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("(ts div 1000000000) div 604800").alias("week")
    )
    activity = ev.distinct()
    cohort = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


ORACLE_RETENTION_COHORTS = """
WITH activity AS (
  SELECT DISTINCT user_id, (epoch_ns(ts) // 1000000000) // 604800 AS week
  FROM events
),
cohort AS (SELECT user_id, min(week) AS cohort_week FROM activity GROUP BY user_id)
SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
       count(DISTINCT a.user_id) AS n_users
FROM activity a JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""


def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (an actually-occurring value, vs the
    interpolated `percentiles` query): p25/p50/p90 of event value per
    type via percentile_disc WITHIN GROUP. Discrete selection has no
    float interpolation, so it's exactly comparable across engines."""
    load(spark, sf_dir, "events").createOrReplaceTempView("__events_pd")
    return spark.sql(
        """
        SELECT event_type,
               round(percentile_disc(0.25) WITHIN GROUP (ORDER BY value), 6) AS p25,
               round(percentile_disc(0.5) WITHIN GROUP (ORDER BY value), 6) AS p50,
               round(percentile_disc(0.9) WITHIN GROUP (ORDER BY value), 6) AS p90
        FROM __events_pd
        GROUP BY event_type
        """
    )


ORACLE_PERCENTILE_DISC = """
SELECT event_type,
       round(quantile_disc(value, 0.25), 6) AS p25,
       round(quantile_disc(value, 0.5), 6) AS p50,
       round(quantile_disc(value, 0.9), 6) AS p90
FROM events
GROUP BY event_type
"""


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items sketch: top-20 corpus tokens via ``approx_top_k``
    (mergeable space-saving sketch — one pass, fixed memory, partial
    aggregation; the vocabulary-profiling op of a corpus pipeline). No
    SQL oracle: the sketch's boundary ties are engine-specific; the
    pytest asserts every reported count equals the exact count and the
    cutoff dominates the exact 20th count."""
    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    toks = df.select(F.explode(sparse_fn.bm25_tokens_col("text")).alias("token"))
    sketch = toks.select(
        F.expr("approx_top_k(token, 20)").alias("tk")
    ).select(F.explode("tk").alias("e"))
    return (
        sketch.select(F.col("e.item").alias("token"), F.col("e.count").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
    )


def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates beyond sums: Pearson correlation and
    population covariance of quantity vs extended price per returnflag
    (single-pass co-moment aggregation on both engines)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            # explicit Pearson: covar / (sx * sy) with a NULLIF guard —
            # the built-in corr() divides by the stddevs internally and
            # ANSI-aborts the whole job on a zero-variance group
            # (constant quantity within a flag); NULL is the defined
            # value there, and the oracle uses the identical formula
            F.round(
                F.covar_pop("l_quantity", "l_extendedprice")
                / F.nullif(
                    F.stddev_pop("l_quantity")
                    * F.stddev_pop("l_extendedprice"),
                    F.lit(0.0),
                ),
                ROUND_DIGITS,
            ).alias("qty_price_corr"),
            F.round(
                F.covar_pop("l_quantity", "l_extendedprice"), ROUND_DIGITS
            ).alias("qty_price_covar"),
            F.round(F.stddev_pop("l_quantity"), ROUND_DIGITS).alias("qty_stddev"),
            F.count("*").alias("n"),
        )
        .select("l_returnflag", "qty_price_corr", "qty_price_covar", "qty_stddev", "n")
    )


ORACLE_CORR_STATS = """
SELECT l_returnflag,
       round(covar_pop(l_quantity, l_extendedprice)
             / NULLIF(stddev_pop(l_quantity) * stddev_pop(l_extendedprice),
                      0), 6) AS qty_price_corr,
       round(covar_pop(l_quantity, l_extendedprice), 6) AS qty_price_covar,
       round(stddev_pop(l_quantity), 6) AS qty_stddev,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers: standardize event values against
    their type's mean/stddev (two-pass: tiny stats aggregate broadcast
    back onto the full scan) and keep |z| > 3 — the
    anomaly/outlier-filter pattern of data-quality pipelines. Stats use
    sum/count arithmetic identical on both engines (population variance
    via E[x^2] - E[x]^2) so the flag is deterministic."""
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.sum("value").alias("s1"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
        F.count("*").alias("n"),
    )
    mean = F.col("s1") / F.col("n")
    # clamp: floating cancellation can leave var at -1e-12 for a
    # near-constant group (sqrt would be NaN here, an ERROR in DuckDB)
    var = F.greatest(
        F.col("s2") / F.col("n") - mean * mean, F.lit(0.0)
    )
    stats = stats.select(
        "event_type", mean.alias("mu"), F.sqrt(var).alias("sigma")
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        # NULLIF: a constant group has sigma 0 and NO outliers by
        # definition — without the guard ANSI mode aborts the whole
        # job with DIVIDE_BY_ZERO on the first degenerate group
        .withColumn(
            "z",
            F.round(
                (F.col("value") - F.col("mu"))
                / F.nullif(F.col("sigma"), F.lit(0.0)),
                6,
            ),
        )
        .filter("abs(z) > 3")
        .select("event_id", "event_type", F.round("value", 6).alias("value"), "z")
    )


ORACLE_ZSCORE_OUTLIERS = """
WITH stats AS (
  SELECT event_type, sum(value) AS s1, sum(value * value) AS s2, count(*) AS n
  FROM events GROUP BY event_type
),
ms AS (
  SELECT event_type, s1 / n AS mu,
         sqrt(GREATEST(s2 / n - (s1 / n) * (s1 / n), 0)) AS sigma
  FROM stats
)
SELECT event_id, event_type, round(value, 6) AS value,
       round((value - mu) / NULLIF(sigma, 0), 6) AS z
FROM events JOIN ms USING (event_type)
WHERE abs(round((value - mu) / NULLIF(sigma, 0), 6)) > 3
"""


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): for each event,
    how many events of the same type arrived in the preceding 10
    minutes (inclusive). Complements the ROWS frames in window_funcs —
    RANGE frames are the sliding-window primitive for irregular time
    series."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.expr("ts div 1000000000").alias("sec"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("sec")
        .rangeBetween(-600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "event_type",
        "sec",
        F.count("*").over(w).alias("n_last_10m"),
    )


ORACLE_WINDOW_RANGE_FRAME = """
SELECT event_id, event_type, epoch_ns(ts) // 1000000000 AS sec,
       count(*) OVER (
         PARTITION BY event_type ORDER BY epoch_ns(ts) // 1000000000
         RANGE BETWEEN 600 PRECEDING AND CURRENT ROW
       ) AS n_last_10m
FROM events
"""


def q_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations by
    year. Two independent broadcast nation lookups (supplier side and
    customer side), big fact joins hash-partitioned on their keys, then
    a 4-group aggregate — the multi-dimension star join pattern."""
    n1, n2 = "NATION_1", "NATION_2"
    nation = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(n1, n2)
    )
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    supp_n = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    cust_n = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        lineitem.join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(supp_n), supplier.s_nationkey == F.col("s_nkey"))
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(cust_n), customer.c_nationkey == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(vol).cast("double").alias("revenue"))
        .select("supp_nation", "cust_nation", "l_year", "revenue")
    )


ORACLE_NATION_VOLUME_SHIPPING = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


def q_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share of a part type inside a
    region, by order year. The deepest star join in the suite — lineitem
    at the center, part/supplier/orders/customer spokes, two nation
    lookups plus a region gate. Nation/region are broadcast; part and
    the fact joins stay hash-partitioned so AQE can pick broadcast at
    small SF and shuffle-hash at 100 TB. The share is a ratio of two
    decimal-exact sums divided once in double, so the result is
    bit-stable across engines and partitionings."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "MEDIUM")
    supplier = load(spark, sf_dir, "supplier")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    lineitem = load(spark, sf_dir, "lineitem")
    cust_n = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("c_nkey"))
    supp_n = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(supp_n), supplier.s_nationkey == F.col("s_nkey"))
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(cust_n), customer.c_nationkey == F.col("c_nkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .select("o_year", "mkt_share")
    )


def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a quarter that had at least one
    late-shipped line, counted by priority. The correlated EXISTS is a
    LEFT SEMI join — lineitem is never widened into the output, the
    shuffle carries only (orderkey, shipdate), and the date filter
    prunes the orders scan before the join."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    lineitem = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            lineitem,
            (orders.o_orderkey == lineitem.l_orderkey)
            & (lineitem.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


ORACLE_ORDER_PRIORITY_CHECK = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed how many
    (non-urgent) orders, including zero. LEFT OUTER join on custkey;
    the per-customer count REUSES the join's hash partitioning (no
    exchange between join and first aggregate), and the second
    aggregate's input is one row per customer-count — tiny."""
    customer = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


ORACLE_CUSTOMER_DISTRIBUTION = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


ORACLE_NATIONAL_MARKET_SHARE = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
       AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND p_type = 'MEDIUM'
  AND year(o_orderdate) IN (1995, 1996)
GROUP BY 1
"""


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue from promo parts.
    The shipdate filter prunes the lineitem scan BEFORE the part join;
    the single-group ratio divides two decimal-exact sums once in
    double (bit-stable cross-engine)."""
    lineitem = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue")
        )
    )


ORACLE_PROMO_REVENUE = """
SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
       AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


def q_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    quarter. Fact joins hash-partitioned on their keys, nation broadcast,
    aggregation reuses the custkey partitioning, TakeOrderedAndProject
    top-20 instead of a global sort."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    lineitem = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = load(spark, sf_dir, "nation")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(vol).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


ORACLE_RETURNED_ITEM_REVENUE = """
SELECT c_custkey, c_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       c_acctbal, n_name
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where supplier and customer
    share the nation, within one region and year. The s_nationkey =
    c_nationkey constraint rides on the supplier join (no extra
    shuffle); region/nation broadcast."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1996
    )
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nat = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            supplier,
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(vol).cast("double").alias("revenue"))
    )


ORACLE_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND year(o_orderdate) = 1996
GROUP BY n_name
"""


def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-sum, the canonical predicate
    pushdown probe — every filter reaches the parquet reader, one
    partial-aggregated single group, zero joins."""
    lineitem = load(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )


ORACLE_FORECAST_REVENUE_CHANGE = """
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders below 20% of a part's
    average quantity, for one brand. The per-part average is a tiny
    aggregate joined back onto the filtered fact — Catalyst decorrelates
    the classic correlated subquery into exactly this plan."""
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    lineitem = load(spark, sf_dir, "lineitem")
    # Only brand parts survive the final inner join, so compute the
    # per-part average over the brand's lineitems only (broadcast
    # semi-join gate) — identical result, ~brand-selectivity smaller
    # aggregation and shuffle.
    brand_items = lineitem.join(
        F.broadcast(part.select("p_partkey")),
        lineitem.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    avg_qty = (
        brand_items.groupBy("l_partkey")
        .agg(
            (
                F.lit(0.2)
                * (
                    F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                    / F.count("*")
                )
            ).alias("qty_threshold")
        )
    )
    return (
        brand_items.join(F.broadcast(part), brand_items.l_partkey == part.p_partkey)
        .join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


ORACLE_SMALL_QUANTITY_REVENUE = """
WITH avg_qty AS (
  SELECT l_partkey,
         0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
           AS qty_threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avg_qty USING (l_partkey)
WHERE p_brand = 'Brand#1' AND l_quantity < qty_threshold
"""


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose single orders exceed a quantity
    threshold — groupBy-HAVING on the fact, then enrich the few
    surviving orders with customer data (the second join's left side is
    tiny after the HAVING gate)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").alias("o_orderdate"),
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


ORACLE_LARGE_VOLUME_CUSTOMERS = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING total_qty > 150
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --------------------------------------------------------------------------
# North-star: training-data preparation (clean / split / sample)
# --------------------------------------------------------------------------


# PII patterns shared by the Spark query and the DuckDB oracle — kept
# to the regex subset where Java regex and RE2 agree (no lookaround,
# no \b ambiguity across engines).
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
_PII_IPV4 = "([0-9]{1,3}[.]){3}[0-9]{1,3}"
_PII_PHONE = "[+][0-9][0-9() -]{7,}[0-9]"


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — a mandatory pass before LLM training data ships:
    emails, IPv4 addresses, and international-format phone numbers are
    replaced with typed placeholder tags, with per-kind match counts for
    the compliance audit trail. Pure JVM regexp (three chained
    regexp_replace + three regexp_count) fused into the scan projection:
    no UDF, no shuffle, scales as a map-only pass over any corpus."""
    df = load(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _PII_EMAIL, "<EMAIL>"),
            _PII_IPV4,
            "<IP>",
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    return df.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        F.regexp_count(F.col("text"), F.lit(_PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(_PII_IPV4)).cast("long").alias("n_ips"),
        F.regexp_count(F.col("text"), F.lit(_PII_PHONE)).cast("long").alias("n_phones"),
    )


ORACLE_PII_SCRUB = f"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_IPV4}', '<IP>', 'g'),
         '{_PII_PHONE}', '<PHONE>', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PII_IPV4}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phones
FROM documents
"""


def q_benchmark_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — drop training docs that overlap the
    eval set (the step every serious pretraining pipeline runs so the
    model isn't graded on memorized data). The 'benchmark' here is the
    deterministic held-out slice doc_id % 5 == 0; contamination = any
    shared 8-token shingle. Shape: shingle-explode both sides, ONE
    equi-join on the shingle hash (no pairwise doc comparison), distinct
    doc ids out — the same bounded-join pattern as MinHash-LSH, so it
    scales to a 100 TB corpus against a fixed benchmark suite."""
    from aiotcvectordb_spark.pipelines import (
        DECONTAM_SHINGLE_N,
        token_shingles,
    )

    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    # shared shingle kernel (r10): one implementation across the batch
    # queries, the incremental query, and the streaming sink
    shingled = token_shingles(df, DECONTAM_SHINGLE_N)
    bench = shingled.filter(F.col("doc_id") % 5 == 0).select("shingle").distinct()
    train = shingled.filter(F.col("doc_id") % 5 != 0)
    contaminated = (
        train.join(bench, "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_shared_shingles"))
    )
    return contaminated


# canonical shingle width lives in pipelines (shared with
# streaming/decontam.py); interpolated into all three decontaminate
# oracles below so tuning it can never silently desync query from
# oracle (DuckDB 1-indexed inclusive slice: width n = ts[i:i+(n-1)],
# last start = len - (n-2) with range()'s exclusive end)
from aiotcvectordb_spark.pipelines import (  # noqa: E402
    DECONTAM_SHINGLE_N as _DECONTAM_N,
)

ORACLE_BENCHMARK_DECONTAMINATE = f"""
WITH toks AS (
  SELECT doc_id, {_BM25_TOKS_SQL} AS ts FROM documents
  WHERE len({_BM25_TOKS_SQL}) >= {_DECONTAM_N}
),
shingled AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ts) - {_DECONTAM_N - 2}),
                        i -> array_to_string(ts[i:i+{_DECONTAM_N - 1}], ' '))) AS shingle
  FROM toks
),
bench AS (SELECT DISTINCT shingle FROM shingled WHERE doc_id % 5 = 0)
SELECT s.doc_id, count(DISTINCT s.shingle) AS n_shared_shingles
FROM shingled s JOIN bench b USING (shingle)
WHERE s.doc_id % 5 <> 0
GROUP BY s.doc_id
"""


# canonical value lives in pipelines (shared with streaming/decontam.py
# so batch, incremental, and streaming twins cannot silently diverge)
from aiotcvectordb_spark.pipelines import (  # noqa: E402
    DECONTAM_FRACTION_CUT as _DECONTAM_FRACTION_CUT,
)


def q_decontaminate_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded benchmark decontamination (r9) — the published
    overlap-FRACTION rule (PaLM, Chowdhery et al. 2022, Appendix:
    a training example is contaminated when >= 70% of its 8-gram
    shingles are seen in the eval suite), complementing
    ``benchmark_decontaminate``'s any-collision count (the GPT-3
    Appendix-C shape). Same deterministic held-out slice
    (doc_id % 5 == 0) as the benchmark; every train doc with enough
    tokens to shingle gets an EXPLICIT decision row: distinct-shingle
    total, shared count, overlap fraction, contaminated flag.

    Scale shape: identical bounded equi-join as the collision rule —
    shingle-explode, ONE join against the distinct benchmark shingle
    set, two per-doc distinct aggregates; no pairwise doc comparison,
    so the corpus side scales linearly against a fixed benchmark
    suite."""
    from aiotcvectordb_spark.pipelines import (
        DECONTAM_SHINGLE_N,
        token_shingles,
    )

    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    # shared shingle kernel (r10): one implementation across the batch
    # queries, the incremental query, and the streaming sink
    shingled = token_shingles(df, DECONTAM_SHINGLE_N)
    bench = (
        shingled.filter(F.col("doc_id") % 5 == 0)
        .select("shingle")
        .distinct()
    )
    train = shingled.filter(F.col("doc_id") % 5 != 0)
    totals = train.groupBy("doc_id").agg(
        F.countDistinct("shingle").alias("n_shingles")
    )
    shared = (
        train.join(bench, "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_shared"))
    )
    frac = F.round(
        F.col("n_shared") * F.lit(1.0) / F.col("n_shingles"), ROUND_DIGITS
    )
    return (
        totals.join(shared, "doc_id", "left")
        .withColumn("n_shared", F.coalesce("n_shared", F.lit(0)))
        .select(
            "doc_id",
            "n_shingles",
            "n_shared",
            frac.alias("overlap_fraction"),
            (frac >= F.lit(_DECONTAM_FRACTION_CUT)).alias("contaminated"),
        )
    )


ORACLE_DECONTAMINATE_FRACTION = f"""
WITH toks AS (
  SELECT doc_id, {_BM25_TOKS_SQL} AS ts FROM documents
  WHERE len({_BM25_TOKS_SQL}) >= {_DECONTAM_N}
),
shingled AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ts) - {_DECONTAM_N - 2}),
                        i -> array_to_string(ts[i:i+{_DECONTAM_N - 1}], ' '))) AS shingle
  FROM toks
),
bench AS (SELECT DISTINCT shingle FROM shingled WHERE doc_id % 5 = 0),
totals AS (
  SELECT doc_id, count(DISTINCT shingle) AS n_shingles
  FROM shingled WHERE doc_id % 5 <> 0 GROUP BY doc_id
),
shared AS (
  SELECT s.doc_id, count(DISTINCT s.shingle) AS n_shared
  FROM shingled s JOIN bench b USING (shingle)
  WHERE s.doc_id % 5 <> 0 GROUP BY s.doc_id
)
SELECT t.doc_id, CAST(t.n_shingles AS BIGINT) AS n_shingles,
       CAST(COALESCE(sh.n_shared, 0) AS BIGINT) AS n_shared,
       round(COALESCE(sh.n_shared, 0) * 1.0 / t.n_shingles, {ROUND_DIGITS})
         AS overlap_fraction,
       round(COALESCE(sh.n_shared, 0) * 1.0 / t.n_shingles, {ROUND_DIGITS})
         >= {_DECONTAM_FRACTION_CUT} AS contaminated
FROM totals t LEFT JOIN shared sh USING (doc_id)
"""


def q_incremental_decontaminate_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``decontaminate_fraction``'s continuous-crawl twin (r10) — score
    ONLY the newest slice (train docs with doc_id >= floor(max_id *
    9/10), the incremental_gram_novelty slice rule) against the FULL
    eval-suite shingle set (doc_id % 5 == 0 over the whole corpus —
    the benchmark is global and fixed, not sliced), without rescoring
    old train docs per crawl. Because the contamination rule is
    strictly per-doc-vs-benchmark (no train-train interaction), batch
    rows equal the full batch query restricted to the slice (pinned
    in pytest) while touching O(eval suite + batch): the scan filter
    keeps ONLY bench-or-batch docs before tokenization, so arriving
    crawls never re-shingle the standing train corpus.

    Every batch train doc gets an EXPLICIT decision row — a sub-8-token
    doc surfaces as (n_shingles=0, overlap_fraction NULL,
    contaminated false) instead of vanishing (the r8
    qualitygate/novelty decision-log rule; the full batch query emits
    shingled docs only, so the restriction equality is over its
    support). At serving scale the eval-suite side is the stored
    membership shingle index maintained by the streaming ingest twin
    (streaming/decontam.py, whose epoch-1 rows are pinned equal to
    this query); here it is recomputed from the table so the
    composition stays oracle-checkable (the incremental_gram_novelty
    precedent)."""
    from aiotcvectordb_spark.pipelines import (
        DECONTAM_SHINGLE_N,
        token_shingles,
    )

    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    mx = df.agg(F.max("doc_id")).first()[0]  # bounded: ONE scalar
    if mx is None:
        # empty documents table: match the oracle's empty frame instead
        # of raising int(None) (r10 advisor: engine-asymmetric failure)
        return spark.createDataFrame(
            [],
            "doc_id long, n_shingles long, n_shared long, "
            "overlap_fraction double, contaminated boolean",
        )
    cutoff = int(mx) * 9 // 10
    is_bench = F.col("doc_id") % 5 == 0
    # incremental scan shape: shingle ONLY the eval suite + the batch
    relevant = df.filter(is_bench | (F.col("doc_id") >= cutoff))
    shingled = token_shingles(relevant, DECONTAM_SHINGLE_N)
    bench = shingled.filter(F.col("doc_id") % 5 == 0).select("shingle").distinct()
    bt = shingled.filter(
        (F.col("doc_id") % 5 != 0) & (F.col("doc_id") >= cutoff)
    )
    totals = bt.groupBy("doc_id").agg(
        F.countDistinct("shingle").alias("n_shingles")
    )
    shared = (
        bt.join(bench, "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_shared"))
    )
    spine = df.filter(
        (F.col("doc_id") >= cutoff) & (F.col("doc_id") % 5 != 0)
    ).select("doc_id")
    base = (
        spine.join(totals, "doc_id", "left")
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
        )
    )
    frac = F.when(
        F.col("n_shingles") > 0,
        F.round(F.col("n_shared") / F.col("n_shingles"), ROUND_DIGITS),
    )
    return base.select(
        "doc_id",
        "n_shingles",
        "n_shared",
        frac.alias("overlap_fraction"),
        F.coalesce(frac >= F.lit(_DECONTAM_FRACTION_CUT), F.lit(False)).alias(
            "contaminated"
        ),
    )


ORACLE_INCREMENTAL_DECONTAMINATE_FRACTION = f"""
WITH cut AS (SELECT max(doc_id) * 9 // 10 AS c FROM documents),
relevant AS (
  SELECT d.doc_id, d.text FROM documents d, cut
  WHERE d.doc_id % 5 = 0 OR d.doc_id >= cut.c
),
toks AS (
  SELECT doc_id, {_BM25_TOKS_SQL} AS ts FROM relevant
  WHERE len({_BM25_TOKS_SQL}) >= {_DECONTAM_N}
),
shingled AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ts) - {_DECONTAM_N - 2}),
                        i -> array_to_string(ts[i:i+{_DECONTAM_N - 1}], ' '))) AS shingle
  FROM toks
),
bench AS (SELECT DISTINCT shingle FROM shingled WHERE doc_id % 5 = 0),
bt AS (
  SELECT s.* FROM shingled s, cut
  WHERE s.doc_id % 5 <> 0 AND s.doc_id >= cut.c
),
totals AS (
  SELECT doc_id, count(DISTINCT shingle) AS n_shingles FROM bt GROUP BY doc_id
),
shared AS (
  SELECT b.doc_id, count(DISTINCT b.shingle) AS n_shared
  FROM bt b JOIN bench USING (shingle) GROUP BY b.doc_id
),
spine AS (
  SELECT d.doc_id FROM documents d, cut
  WHERE d.doc_id >= cut.c AND d.doc_id % 5 <> 0
)
SELECT sp.doc_id,
       CAST(COALESCE(t.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(COALESCE(sh.n_shared, 0) AS BIGINT) AS n_shared,
       CASE WHEN t.n_shingles > 0
            THEN round(COALESCE(sh.n_shared, 0) * 1.0 / t.n_shingles,
                       {ROUND_DIGITS}) END AS overlap_fraction,
       COALESCE(CASE WHEN t.n_shingles > 0
            THEN round(COALESCE(sh.n_shared, 0) * 1.0 / t.n_shingles,
                       {ROUND_DIGITS}) END >= {_DECONTAM_FRACTION_CUT},
            FALSE) AS contaminated
FROM spine sp
LEFT JOIN totals t USING (doc_id)
LEFT JOIN shared sh USING (doc_id)
"""


# gram width shared by the substring-dedup family and the novelty
# profile below (defined here because ORACLE_GRAM_NOVELTY interpolates
# it at module level, ahead of the substring-dedup section)
_SUBSTR_DEDUP_N = 8

# DuckDB twin of pipelines._PORTABLE_HASH (Spark: conv(substring(
# md5(s), 1, 15), 16, 10) — 60 bits of md5 as a BIGINT). Defined here,
# ahead of its first module-level f-string use (the hashed-portable
# substring-dedup oracle); shared with the curate/sampling oracles.
_CURATE_H60 = "('0x' || substr(md5({s}), 1, 15))::BIGINT"


def q_gram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY profile (r9) — the curation metric
    that measures how much of each document is first-seen content in
    corpus order: for every doc, the fraction of its DISTINCT word
    8-grams whose first owner (min doc_id across the corpus) is the
    doc itself. A recrawl or boilerplate-heavy slice shows novelty
    collapsing toward 0 long before exact/near dedup fires; data teams
    plot this against crawl date to decide where a snapshot stops
    paying for itself. Shares the ``_word_ngrams`` kernel with the
    substring-dedup family.

    Scale shape: dedupe (doc_id, gram), ONE gram-keyed min aggregate
    (map-side partial), one keyed equi-join back, one doc-keyed count
    — the same shuffle-volume class as ``substring_dedup``; at 100 TB
    the verbatim gram keys would swap for the xxhash64 pair exactly as
    in ``substring_dedup_hashed``. Every document gets an explicit
    decision row (docs shorter than 8 words report n_grams = 0 and a
    NULL novelty, not silence)."""
    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    grams = (
        _word_ngrams(df, _SUBSTR_DEDUP_N).select("doc_id", "gram").distinct()
    )
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        grams.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    spine = (
        df.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        )
    )
    return spine.withColumn(
        "novelty",
        F.when(
            F.col("n_grams") > 0,
            F.round(F.col("n_novel") / F.col("n_grams"), ROUND_DIGITS),
        ),
    )


ORACLE_GRAM_NOVELTY = f"""
WITH toks_arr AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[i:i+{_SUBSTR_DEDUP_N - 1}], ' ') AS gram
  FROM toks_arr,
       LATERAL unnest(generate_series(1, greatest(len(w) - {_SUBSTR_DEDUP_N - 1}, 0))) AS t(i)
),
first AS (SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram),
per_doc AS (
  SELECT g.doc_id, count(*) AS n_grams,
         sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM grams g JOIN first f USING (gram)
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(p.n_novel, 0) AS BIGINT) AS n_novel,
       CASE WHEN p.n_grams > 0
            THEN round(p.n_novel * 1.0 / p.n_grams, {ROUND_DIGITS}) END AS novelty
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


def q_incremental_gram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``gram_novelty``'s continuous-crawl twin (r9): score ONLY the
    newest slice (doc_id >= floor(max_id * 9 / 10) — the latest ~10% of
    corpus order) against the STANDING corpus's distinct-gram index,
    without rescoring old documents per crawl. A batch gram is novel
    iff it is absent from the standing index AND this doc is its first
    owner WITHIN the batch — which, because every standing id precedes
    every batch id, is exactly the full-corpus first-owner rule, so
    batch rows equal ``gram_novelty`` on the whole corpus restricted to
    the slice (pinned in pytest) while touching O(batch + collisions)
    instead of O(corpus).

    At serving scale the standing side is the stored seen-gram epoch
    index maintained by the streaming ingest twin
    (`streaming/novelty.py`, whose epoch-1 rows are pinned equal to
    this query); here it is recomputed from the table so the
    composition stays oracle-checkable (the
    incremental_substring_dedup precedent). Every batch doc gets an
    explicit decision row."""
    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    mx = df.agg(F.max("doc_id")).first()[0]  # bounded: ONE scalar
    if mx is None:
        # empty documents table: match the oracle's empty frame instead
        # of raising int(None) (r10 advisor: engine-asymmetric failure)
        return spark.createDataFrame(
            [], "doc_id long, n_grams long, n_novel long, novelty double"
        )
    cutoff = int(mx) * 9 // 10
    batch = df.filter(F.col("doc_id") >= cutoff)
    standing = df.filter(F.col("doc_id") < cutoff)
    bg = (
        _word_ngrams(batch, _SUBSTR_DEDUP_N).select("doc_id", "gram").distinct()
    )
    sidx = _word_ngrams(standing, _SUBSTR_DEDUP_N).select("gram").distinct()
    first_b = bg.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        bg.join(first_b, "gram")
        .join(sidx.withColumn("seen", F.lit(True)), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(
                    F.col("seen").isNull()
                    & (F.col("first_doc") == F.col("doc_id")),
                    1,
                ).otherwise(0)
            ).alias("n_novel"),
        )
    )
    spine = (
        batch.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        )
    )
    return spine.withColumn(
        "novelty",
        F.when(
            F.col("n_grams") > 0,
            F.round(F.col("n_novel") / F.col("n_grams"), ROUND_DIGITS),
        ),
    )


ORACLE_INCREMENTAL_GRAM_NOVELTY = f"""
WITH cut AS (SELECT max(doc_id) * 9 // 10 AS c FROM documents),
toks_arr AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[i:i+{_SUBSTR_DEDUP_N - 1}], ' ') AS gram
  FROM toks_arr,
       LATERAL unnest(generate_series(1, greatest(len(w) - {_SUBSTR_DEDUP_N - 1}, 0))) AS t(i)
),
bg AS (SELECT g.* FROM grams g, cut WHERE g.doc_id >= cut.c),
sidx AS (SELECT DISTINCT gram FROM grams g, cut WHERE g.doc_id < cut.c),
first_b AS (SELECT gram, min(doc_id) AS first_doc FROM bg GROUP BY gram),
per_doc AS (
  SELECT b.doc_id, count(*) AS n_grams,
         sum(CASE WHEN s.gram IS NULL AND f.first_doc = b.doc_id
                  THEN 1 ELSE 0 END) AS n_novel
  FROM bg b
  JOIN first_b f USING (gram)
  LEFT JOIN sidx s USING (gram)
  GROUP BY b.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(p.n_novel, 0) AS BIGINT) AS n_novel,
       CASE WHEN p.n_grams > 0
            THEN round(p.n_novel * 1.0 / p.n_grams, {ROUND_DIGITS}) END AS novelty
FROM documents d
CROSS JOIN cut
LEFT JOIN per_doc p ON p.doc_id = d.doc_id
WHERE d.doc_id >= cut.c
"""


def q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization for a training corpus: strip control chars,
    collapse whitespace runs, trim, lowercase — all JVM regexp
    expressions inside one projection (no UDF), so it fuses into the
    scan's codegen stage at any scale."""
    df = load(spark, sf_dir, "documents")
    cleaned = F.lower(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), "[\\x00-\\x1F\\x7F]", " "),
                "\\s{2,}",
                " ",
            )
        )
    )
    return df.select(
        "doc_id",
        cleaned.alias("clean_text"),
        F.length(cleaned).alias("clean_len"),
    )


_MIX_WEIGHTS = {"en": 0.4, "de": 0.15, "zh": 0.15, "es": 0.15, "fr": 0.15}
_MIX_BUDGET_FRAC = 0.3  # token budget as a fraction of corpus tokens
_MIX_SALTS = 16


def _mix_select(spark: SparkSession, sf_dir: str,
                weights: dict[str, float]) -> DataFrame:
    """Shared salted token-budget selection body of ``dataset_mix``
    and ``dataset_mix_temp`` — identical plan, parameterized only by
    the per-language weight map."""
    df = ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    toks = df.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.expr(_portable_hash_expr("cast(doc_id as string)")).alias("h"),
    )
    totals = toks.groupBy().agg(F.sum("n_tokens").alias("total"))
    wmap = F.create_map(
        *[
            x
            for lang, wt in sorted(weights.items())
            for x in (F.lit(lang), F.lit(wt))
        ]
    )
    salted = (
        toks.crossJoin(F.broadcast(totals))
        .withColumn("salt", F.col("h") % _MIX_SALTS)
        .withColumn(
            "quota",
            wmap[F.col("lang")]
            * F.col("total")
            * F.lit(_MIX_BUDGET_FRAC)
            / F.lit(_MIX_SALTS),
        )
    )
    win = (
        Window.partitionBy("lang", "salt")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sel = salted.withColumn("run", F.sum("n_tokens").over(win)).filter(
        (F.col("run") - F.col("n_tokens")) < F.col("quota")
    )
    return sel.select(
        "doc_id", "lang", F.col("n_tokens").cast("long").alias("n_tokens")
    )


def q_dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted dataset mixing — the 'data mixture' step of a
    training run: given per-language target weights and a total token
    budget (30% of the corpus here), pick documents per language until
    that language's token quota fills, deterministically. Scale shape:
    pass 1 is ONE tiny global aggregate (total tokens) broadcast back
    onto the scan; selection is hash-ordered greedy *within
    (lang, salt) buckets*, each owning quota/S tokens — the salted
    two-phase trick (cf. group_topk_salted) that keeps every window
    sort bounded to 1/S of a language, so a 90%-English corpus never
    funnels into one partition. Selection is a pure function of
    (doc_id, lang, n_tokens): stable under repartition and re-ingest,
    like dataset_split."""
    return _mix_select(spark, sf_dir, _MIX_WEIGHTS)


_MIX_TEMPERATURE = 2.0


def _temp_weights(weights: dict[str, float], T: float) -> dict[str, float]:
    """Temperature-scaled mixture weights w ∝ w^(1/T), renormalized —
    the standard pretraining mixture control (T>1 UPweights
    low-resource languages toward uniform; T=1 is the base mixture).
    Computed driver-side to full double precision; the Spark literals
    and the oracle's VALUES rows carry the identical repr() floats, so
    the greedy quota comparison is bit-equal on both engines."""
    raised = {k: v ** (1.0 / T) for k, v in weights.items()}
    z = sum(raised.values())
    return {k: v / z for k, v in raised.items()}


def q_dataset_mix_temp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dataset_mix`` with the TEMPERATURE knob (r7): weights are
    w^(1/T) renormalized (T=2 here — the up-sample-the-tail setting
    every multilingual pretraining recipe uses, cf. mT5/XLM-R), then
    the identical salted two-phase greedy selection runs. Same plan,
    same scale shape — one tiny broadcast aggregate, (lang, salt)
    bounded window sorts, deterministic under repartition."""
    return _mix_select(
        spark, sf_dir, _temp_weights(_MIX_WEIGHTS, _MIX_TEMPERATURE)
    )


def _mix_oracle_sql(weights: dict[str, float]) -> str:
    w_sql = ",".join(
        f"('{k}',{v!r})" for k, v in sorted(weights.items())
    )
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM documents WHERE length(text) > 0
), t AS (
  SELECT sum(n_tokens) AS total FROM toks
), w(lang, wt) AS (
  VALUES {w_sql}
), s AS (
  SELECT toks.*, h % {_MIX_SALTS} AS salt,
         CAST(wt AS DOUBLE) * total * {_MIX_BUDGET_FRAC} / {_MIX_SALTS} AS quota
  FROM toks JOIN w USING (lang) CROSS JOIN t
), r AS (
  SELECT *, sum(n_tokens) OVER (
      PARTITION BY lang, salt ORDER BY h, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM s
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
FROM r WHERE run - n_tokens < quota
"""


ORACLE_DATASET_MIX = _mix_oracle_sql(_MIX_WEIGHTS)
ORACLE_DATASET_MIX_TEMP = _mix_oracle_sql(
    _temp_weights(_MIX_WEIGHTS, _MIX_TEMPERATURE)
)


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated-substring removal (the Lee et al. 2022
    'Deduplicating Training Data' pass, word-granular): every token
    position covered by an N-gram that occurs more than once
    corpus-wide is cut, and the survivors reassemble in order. Unlike
    MinHash/SimHash (whole-doc near-dup) or line_dedup (exact repeated
    lines), this removes the *overlapping spans themselves* — copied
    passages inside otherwise-unique documents. Pipeline: tokens with
    positions; N-grams via a JVM transform over the token array (one
    slice+concat per position, no UDF); one groupBy(gram) with
    map-side partials to find duplicated grams; an inner equi-join
    back (output is just the duplicated occurrences — linear in the
    dup fraction); each hit explodes to its N covered positions
    (bounded xN); a LEFT ANTI join on (doc_id, pos) keeps the
    uncovered tokens; ordered reassembly per doc. Every stage is a
    bounded shuffle on a key that partitions with the data — no
    pairwise doc comparison anywhere, the shape that survives 100 TB."""
    n = _SUBSTR_DEDUP_N
    df = ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    grams = _word_ngrams(df, n)
    dup = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("gram")
    )
    covered = (
        grams.join(dup, "gram")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("i"), F.col("i") + n - 1)).alias("pos"),
        )
        .distinct()
    )
    tokens = df.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    kept = tokens.join(covered, ["doc_id", "pos"], "left_anti")
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("kept_tokens"),
    )


ORACLE_SUBSTRING_DEDUP = f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE length(text) > 0
), toks_arr AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM docs
), grams AS (
  SELECT doc_id, i,
         array_to_string(w[i:i+{_SUBSTR_DEDUP_N - 1}], ' ') AS gram
  FROM toks_arr,
       LATERAL unnest(generate_series(1, greatest(len(w) - {_SUBSTR_DEDUP_N - 1}, 0))) AS t(i)
), dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2
), covered AS (
  SELECT DISTINCT g.doc_id, c.pos
  FROM grams g JOIN dup USING (gram),
       LATERAL unnest(generate_series(g.i, g.i + {_SUBSTR_DEDUP_N - 1})) AS c(pos)
), tokens AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM docs
)
SELECT t.doc_id,
       string_agg(t.tok, ' ' ORDER BY t.pos) AS clean_text,
       CAST(count(*) AS BIGINT) AS kept_tokens
FROM tokens t
WHERE NOT EXISTS (
  SELECT 1 FROM covered c WHERE c.doc_id = t.doc_id AND c.pos = t.pos
)
GROUP BY t.doc_id
"""


def _word_ngrams(df: DataFrame, n: int) -> DataFrame:
    """Shared gram kernel — see pipelines.word_ngrams."""
    from aiotcvectordb_spark.pipelines import word_ngrams

    return word_ngrams(df, n)


def q_substring_dedup_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``substring_dedup`` with HASHED gram keys (r7) — the 100 TB
    shuffle-byte variant. The string query's one real scale cost is
    the dup-detection aggregate moving ≈ corpus-tokens × ~50-byte
    verbatim grams; here each gram is reduced in the scan projection
    to a 16-byte key pair (xxhash64(gram), xxhash64(gram || 0x01) —
    two 64-bit lanes DECORRELATED by a one-byte input suffix, not by
    independent hash seeds: both lanes use xxhash64's default seed,
    so treat the pair as one well-mixed 128-bit key, not two provably
    independent functions), cutting shuffle bytes ~3-6× while the plan
    stays identical: one hash aggregate, keyed equi-joins, LEFT ANTI
    keep, ordered reassembly.

    Collision math (under the standard assumption that xxhash64 mixes
    the suffixed inputs like independent uniform draws — heuristic for
    the suffix construction, not a seed-independence theorem): a false
    dup needs BOTH 64-bit lanes to collide on distinct grams — P ≈
    T²/2¹²⁹ pairwise over T corpus grams, i.e. ~6×10⁻¹³ expected
    false-covered positions at T = 2×10¹³ tokens (a 100 TB corpus); a
    single 64-bit key would already expect ~10⁷ false dups at that
    scale, hence the pair. Registry entry is
    rows-only (DuckDB has no xxhash64); bit-equality with the ORACLED
    string-exact query is pinned in
    tests/test_dedup_text_relational.py instead."""
    n = _SUBSTR_DEDUP_N
    df = ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    grams = _word_ngrams(df, n).select(
        "doc_id",
        "i",
        F.xxhash64("gram").alias("h1"),
        F.xxhash64(F.concat(F.col("gram"), F.lit("\x01"))).alias("h2"),
    )
    dup = (
        grams.groupBy("h1", "h2")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("h1", "h2")
    )
    covered = (
        grams.join(dup, ["h1", "h2"])
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("i"), F.col("i") + n - 1)).alias("pos"),
        )
        .distinct()
    )
    tokens = df.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    kept = tokens.join(covered, ["doc_id", "pos"], "left_anti")
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("kept_tokens"),
    )


def q_substring_dedup_hashed_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashed substring-dedup lane's ORACLED witness (r10): the
    IDENTICAL Lee-et-al plan as ``substring_dedup_hashed`` — gram keys
    reduced in the scan projection to a hash pair, ONE hash aggregate
    for corpus-wide duplicates, keyed equi-join back, bounded coverage
    explode, LEFT ANTI keep, ordered reassembly — but keyed on the
    PORTABLE md5-derived 60-bit hash (pipelines._PORTABLE_HASH, the
    twin ``stratified_sample_hash`` proved cross-engine) as a
    SPLIT-DIGEST pair — hex digits 1-15 and 16-30 of ONE md5 per gram
    (r11; the r10 two-md5 suffix pair hashed every gram twice for the
    same 2x60-bit key space) — so DuckDB reproduces the hashed plan
    END-TO-END and the driver hash vouches for the reduced-key
    machinery itself — the aggregate-on-hash, join-on-hash dataflow
    that the xxhash64 production lane runs at 100 TB (its keys being
    engine-native is the ONLY difference; bit-equality of the two
    hashed lanes and the string-exact lane is pinned in
    tests/test_dedup_text_relational.py). Collision math: a false dup
    needs both 60-bit digest halves to collide on distinct grams —
    P ≈ T²/2¹²¹ pairwise, the digest's 128 bits being well mixed."""
    from aiotcvectordb_spark import pipelines as P

    n = _SUBSTR_DEDUP_N
    df = ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    pair = P.gram_hash_pair("portable")
    grams = _word_ngrams(df, n).select(
        "doc_id",
        "i",
        pair[0].alias("h1"),
        pair[1].alias("h2"),
    )
    dup = (
        grams.groupBy("h1", "h2")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("h1", "h2")
    )
    covered = (
        grams.join(dup, ["h1", "h2"])
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("i"), F.col("i") + n - 1)).alias("pos"),
        )
        .distinct()
    )
    tokens = df.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    kept = tokens.join(covered, ["doc_id", "pos"], "left_anti")
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("kept_tokens"),
    )


ORACLE_SUBSTRING_DEDUP_HASHED_PORTABLE = f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE length(text) > 0
), toks_arr AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM docs
), grams0 AS (
  SELECT doc_id, i,
         array_to_string(w[i:i+{_SUBSTR_DEDUP_N - 1}], ' ') AS gram
  FROM toks_arr,
       LATERAL unnest(generate_series(1, greatest(len(w) - {_SUBSTR_DEDUP_N - 1}, 0))) AS t(i)
), grams AS (
  SELECT doc_id, i,
         {_CURATE_H60.format(s="gram")} AS h1,
         ('0x' || substr(md5(gram), 16, 15))::BIGINT AS h2
  FROM grams0
), dup AS (
  SELECT h1, h2 FROM grams GROUP BY h1, h2 HAVING count(*) >= 2
), covered AS (
  SELECT DISTINCT g.doc_id, c.pos
  FROM grams g JOIN dup USING (h1, h2),
       LATERAL unnest(generate_series(g.i, g.i + {_SUBSTR_DEDUP_N - 1})) AS c(pos)
), tokens AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM docs
)
SELECT t.doc_id,
       string_agg(t.tok, ' ' ORDER BY t.pos) AS clean_text,
       CAST(count(*) AS BIGINT) AS kept_tokens
FROM tokens t
WHERE NOT EXISTS (
  SELECT 1 FROM covered c WHERE c.doc_id = t.doc_id AND c.pos = t.pos
)
GROUP BY t.doc_id
"""


# 62 CJK codepoints standing in for [a-zA-Z0-9] when the fixture
# corpus is CJK-ified (the test corpus is pure-ASCII, so the CJK lane
# needs a constructed whitespace-free share — built identically in
# Spark and the DuckDB oracle via translate()).
_CJK_SRC = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
_CJK_DST = "".join(chr(0x4E00 + k) for k in range(len(_CJK_SRC)))
_SUBSTR_CJK_CHAR_N = 12


def q_substring_dedup_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LANG-ROUTED exact repeated-substring removal (r7) — closes the
    multilingual gap where space-tokenized substring dedup silently
    no-ops on CJK/whitespace-free documents (a CJK doc is ONE word
    token, so no 8-gram ever fires). Documents whose CJK character
    fraction exceeds ``pipelines.CJK_ROUTE_THRESHOLD`` route to a
    CHARACTER-n-gram lane (``pipelines.char_ngrams``, N=12 chars, the
    same reasoning that made BM25 char-bigram in functions/sparse.py);
    the rest keep the word lane. Each lane runs the identical Lee et
    al. pass — one gram aggregate for corpus-wide duplicates, bounded
    coverage explode, LEFT ANTI keep join, ordered reassembly — so the
    cost model is unchanged: keyed shuffles that partition with the
    data, no pairwise doc comparison, at any corpus scale. Because
    the test corpus is pure ASCII, docs with md5(doc_id) starting 0-7
    are deterministically CJK-ified (translate to U+4E00.. + space
    removal, mirrored in the oracle), so BOTH lanes and the router
    itself are driver-hash-checked."""
    from aiotcvectordb_spark import pipelines

    n_w, n_c = _SUBSTR_DEDUP_N, _SUBSTR_CJK_CHAR_N
    df = ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    cjkified = F.translate(F.col("text"), _CJK_SRC + " ", _CJK_DST)
    corpus = df.select(
        "doc_id",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
                *"01234567"
            ),
            cjkified,
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    routed = corpus.withColumn("__r", pipelines.cjk_ratio_col("text"))
    is_cjk = F.col("__r") >= pipelines.CJK_ROUTE_THRESHOLD
    word_docs = routed.filter(~is_cjk).select("doc_id", "text")
    char_docs = routed.filter(is_cjk).select("doc_id", "text")

    empty = spark.createDataFrame([], "gram string")
    # r11: BOTH lanes key the dup aggregate and coverage join on the
    # xxhash64 pair (the substring_dedup_hashed production keys) — the
    # char lane was the #2 standing cost and the worst dedup-family
    # 100x probe because a 12-char CJK gram shuffles ~36 UTF-8 bytes
    # per position as a string key; the pair is 16. Values are
    # unchanged (collision math in q_substring_dedup_hashed), so the
    # string-gram oracle below still hashes identically; the reduced-
    # key dataflow itself is driver-witnessed by the portable twin
    # substring_dedup_cjk_hashed.
    out_w, _ = pipelines.lane_cut(
        word_docs, _word_ngrams(word_docs, n_w), empty, n_w, " ",
        gram_keys="xxhash64",
    )
    out_c, _ = pipelines.lane_cut(
        char_docs, pipelines.char_ngrams(char_docs, n_c), empty, n_c, "",
        gram_keys="xxhash64",
    )
    return (
        out_w.withColumn("lane", F.lit("word"))
        .unionByName(out_c.withColumn("lane", F.lit("char")))
        .select(
            "doc_id",
            "lane",
            "clean_text",
            F.col("kept_tokens").cast("long").alias("kept_units"),
        )
    )


def q_substring_dedup_cjk_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashed CJK-routed lane's ORACLED witness (r11, the
    ``substring_dedup_hashed_portable`` pattern): the IDENTICAL
    lang-routed Lee-et-al plan as ``substring_dedup_cjk`` — CJK-share
    router, per-lane gram kernels, hash-pair-keyed dup aggregate,
    keyed coverage join, LEFT ANTI keep, ordered reassembly — keyed on
    the PORTABLE md5-60-bit pair (pipelines.gram_hash_pair
    "portable") so DuckDB reproduces the reduced-key dataflow
    END-TO-END and the driver hash vouches for the machinery the
    xxhash64 production lane runs at 100 TB. Bit-equality of the two
    hashed lanes and the string-keyed plan is pinned in
    tests/test_dedup_text_relational.py."""
    from aiotcvectordb_spark import pipelines

    n_w, n_c = _SUBSTR_DEDUP_N, _SUBSTR_CJK_CHAR_N
    df = ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    cjkified = F.translate(F.col("text"), _CJK_SRC + " ", _CJK_DST)
    corpus = df.select(
        "doc_id",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
                *"01234567"
            ),
            cjkified,
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    routed = corpus.withColumn("__r", pipelines.cjk_ratio_col("text"))
    is_cjk = F.col("__r") >= pipelines.CJK_ROUTE_THRESHOLD
    word_docs = routed.filter(~is_cjk).select("doc_id", "text")
    char_docs = routed.filter(is_cjk).select("doc_id", "text")

    empty = spark.createDataFrame([], "gram string")
    out_w, _ = pipelines.lane_cut(
        word_docs, _word_ngrams(word_docs, n_w), empty, n_w, " ",
        gram_keys="portable",
    )
    out_c, _ = pipelines.lane_cut(
        char_docs, pipelines.char_ngrams(char_docs, n_c), empty, n_c, "",
        gram_keys="portable",
    )
    return (
        out_w.withColumn("lane", F.lit("word"))
        .unionByName(out_c.withColumn("lane", F.lit("char")))
        .select(
            "doc_id",
            "lane",
            "clean_text",
            F.col("kept_tokens").cast("long").alias("kept_units"),
        )
    )


ORACLE_SUBSTRING_DEDUP_CJK_HASHED = f"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN
                   ('0','1','2','3','4','5','6','7')
              THEN translate(text, '{_CJK_SRC} ', '{_CJK_DST}')
              ELSE text END AS text
  FROM documents WHERE length(text) > 0
), routed AS (
  SELECT doc_id, text,
         CAST(length(regexp_replace(text, '[^぀-ヿ㐀-䶿一-鿿가-힯]', '', 'g'))
              AS DOUBLE) / greatest(length(text), 1) AS r
  FROM corpus
), word_docs AS (
  SELECT doc_id, text FROM routed WHERE r < 0.3
), char_docs AS (
  SELECT doc_id, text FROM routed WHERE r >= 0.3
), wgrams0 AS (
  SELECT doc_id, i,
         array_to_string(w[i:i+{_SUBSTR_DEDUP_N - 1}], ' ') AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM word_docs),
       LATERAL unnest(generate_series(1, greatest(len(w) - {_SUBSTR_DEDUP_N - 1}, 0))) AS t(i)
), wgrams AS (
  SELECT doc_id, i,
         {_CURATE_H60.format(s="gram")} AS h1,
         ('0x' || substr(md5(gram), 16, 15))::BIGINT AS h2
  FROM wgrams0
), wdup AS (
  SELECT h1, h2 FROM wgrams GROUP BY h1, h2 HAVING count(*) >= 2
), wcov AS (
  SELECT DISTINCT g.doc_id, c.pos
  FROM wgrams g JOIN wdup USING (h1, h2),
       LATERAL unnest(generate_series(g.i, g.i + {_SUBSTR_DEDUP_N - 1})) AS c(pos)
), wtok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS unit,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM word_docs
), wkept AS (
  SELECT t.doc_id, 'word' AS lane,
         string_agg(t.unit, ' ' ORDER BY t.pos) AS clean_text,
         CAST(count(*) AS BIGINT) AS kept_units
  FROM wtok t
  WHERE NOT EXISTS (
    SELECT 1 FROM wcov c WHERE c.doc_id = t.doc_id AND c.pos = t.pos
  )
  GROUP BY t.doc_id
), cgrams0 AS (
  SELECT doc_id, i, substr(text, i, {_SUBSTR_CJK_CHAR_N}) AS gram
  FROM char_docs,
       LATERAL unnest(generate_series(1, length(text) - {_SUBSTR_CJK_CHAR_N - 1})) AS t(i)
), cgrams AS (
  SELECT doc_id, i,
         {_CURATE_H60.format(s="gram")} AS h1,
         ('0x' || substr(md5(gram), 16, 15))::BIGINT AS h2
  FROM cgrams0
), cdup AS (
  SELECT h1, h2 FROM cgrams GROUP BY h1, h2 HAVING count(*) >= 2
), ccov AS (
  SELECT DISTINCT g.doc_id, c.pos
  FROM cgrams g JOIN cdup USING (h1, h2),
       LATERAL unnest(generate_series(g.i, g.i + {_SUBSTR_CJK_CHAR_N - 1})) AS c(pos)
), ctok AS (
  SELECT doc_id, j AS pos, substr(text, j, 1) AS unit
  FROM char_docs, LATERAL unnest(generate_series(1, length(text))) AS t(j)
), ckept AS (
  SELECT t.doc_id, 'char' AS lane,
         string_agg(t.unit, '' ORDER BY t.pos) AS clean_text,
         CAST(count(*) AS BIGINT) AS kept_units
  FROM ctok t
  WHERE NOT EXISTS (
    SELECT 1 FROM ccov c WHERE c.doc_id = t.doc_id AND c.pos = t.pos
  )
  GROUP BY t.doc_id
)
SELECT * FROM wkept UNION ALL SELECT * FROM ckept
"""


def q_incremental_substring_dedup_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lang-routed pass's continuous-ingest twin (r7) — composes
    ``incremental_substring_dedup``'s batch-vs-standing-index shape
    with ``substring_dedup_cjk``'s lane routing: a NEW batch
    (doc_id % 10 == 0 of the constructed mixed-script corpus) is
    cleaned against the standing corpus's PER-LANE distinct-gram
    indexes (word grams check the word index, char grams the char
    index — lanes can never cross-fire) plus within-batch repeats.
    Cost stays O(batch + index collisions); the corpus is never
    self-joined. All three compositions — routing, incremental index,
    streaming ingest — now run the same ``pipelines.lane_cut`` kernel,
    and this query puts the routing×incremental interaction under the
    DuckDB driver oracle (the streaming twin proves it only
    Spark-vs-Spark)."""
    from aiotcvectordb_spark import pipelines

    n_w, n_c = _SUBSTR_DEDUP_N, _SUBSTR_CJK_CHAR_N
    df = ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    cjkified = F.translate(F.col("text"), _CJK_SRC + " ", _CJK_DST)
    corpus = df.select(
        "doc_id",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
                *"01234567"
            ),
            cjkified,
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    routed = corpus.withColumn("__r", pipelines.cjk_ratio_col("text"))
    is_cjk = F.col("__r") >= pipelines.CJK_ROUTE_THRESHOLD
    is_batch = F.col("doc_id") % 10 == 0
    outs = []
    for name, cond, n, joiner, kernel in (
        ("word", ~is_cjk, n_w, " ", _word_ngrams),
        ("char", is_cjk, n_c, "", pipelines.char_ngrams),
    ):
        batch_docs = routed.filter(cond & is_batch).select("doc_id", "text")
        standing = routed.filter(cond & ~is_batch).select("doc_id", "text")
        prior = kernel(standing, n).select("gram").distinct()
        # r11: xxhash64-pair keys like the batch query — lane_cut hashes
        # the prior index internally, so the stored verbatim-gram index
        # format is unchanged (values identical modulo ~2^-128 collisions;
        # the string-gram oracle below still hashes identically)
        out, _ = pipelines.lane_cut(
            batch_docs, kernel(batch_docs, n), prior, n, joiner,
            gram_keys="xxhash64",
        )
        outs.append(out.withColumn("lane", F.lit(name)))
    return outs[0].unionByName(outs[1]).select(
        "doc_id",
        "lane",
        "clean_text",
        F.col("kept_tokens").cast("long").alias("kept_units"),
    )


ORACLE_INCREMENTAL_SUBSTRING_DEDUP_CJK = f"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN
                   ('0','1','2','3','4','5','6','7')
              THEN translate(text, '{_CJK_SRC} ', '{_CJK_DST}')
              ELSE text END AS text
  FROM documents WHERE length(text) > 0
), routed AS (
  SELECT doc_id, text,
         CAST(length(regexp_replace(text, '[^぀-ヿ㐀-䶿一-鿿가-힯]', '', 'g'))
              AS DOUBLE) / greatest(length(text), 1) AS r
  FROM corpus
), wb AS (
  SELECT doc_id, text FROM routed WHERE r < 0.3 AND doc_id % 10 = 0
), ws AS (
  SELECT doc_id, text FROM routed WHERE r < 0.3 AND doc_id % 10 <> 0
), cb AS (
  SELECT doc_id, text FROM routed WHERE r >= 0.3 AND doc_id % 10 = 0
), cs AS (
  SELECT doc_id, text FROM routed WHERE r >= 0.3 AND doc_id % 10 <> 0
), wbg AS (
  SELECT doc_id, i,
         array_to_string(w[i:i+{_SUBSTR_DEDUP_N - 1}], ' ') AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM wb),
       LATERAL unnest(generate_series(1, greatest(len(w) - {_SUBSTR_DEDUP_N - 1}, 0))) AS t(i)
), windex AS (
  SELECT DISTINCT array_to_string(w[i:i+{_SUBSTR_DEDUP_N - 1}], ' ') AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM ws),
       LATERAL unnest(generate_series(1, greatest(len(w) - {_SUBSTR_DEDUP_N - 1}, 0))) AS t(i)
), whot AS (
  SELECT gram FROM windex
  UNION
  SELECT gram FROM wbg GROUP BY gram HAVING count(*) >= 2
), wcov AS (
  SELECT DISTINCT g.doc_id, c.pos
  FROM wbg g JOIN whot USING (gram),
       LATERAL unnest(generate_series(g.i, g.i + {_SUBSTR_DEDUP_N - 1})) AS c(pos)
), wtok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS unit,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM wb
), wkept AS (
  SELECT t.doc_id, 'word' AS lane,
         string_agg(t.unit, ' ' ORDER BY t.pos) AS clean_text,
         CAST(count(*) AS BIGINT) AS kept_units
  FROM wtok t
  WHERE NOT EXISTS (
    SELECT 1 FROM wcov c WHERE c.doc_id = t.doc_id AND c.pos = t.pos
  )
  GROUP BY t.doc_id
), cbg AS (
  SELECT doc_id, i, substr(text, i, {_SUBSTR_CJK_CHAR_N}) AS gram
  FROM cb,
       LATERAL unnest(generate_series(1, length(text) - {_SUBSTR_CJK_CHAR_N - 1})) AS t(i)
), cindex AS (
  SELECT DISTINCT substr(text, i, {_SUBSTR_CJK_CHAR_N}) AS gram
  FROM cs,
       LATERAL unnest(generate_series(1, length(text) - {_SUBSTR_CJK_CHAR_N - 1})) AS t(i)
), chot AS (
  SELECT gram FROM cindex
  UNION
  SELECT gram FROM cbg GROUP BY gram HAVING count(*) >= 2
), ccov AS (
  SELECT DISTINCT g.doc_id, c.pos
  FROM cbg g JOIN chot USING (gram),
       LATERAL unnest(generate_series(g.i, g.i + {_SUBSTR_CJK_CHAR_N - 1})) AS c(pos)
), ctok AS (
  SELECT doc_id, j AS pos, substr(text, j, 1) AS unit
  FROM cb, LATERAL unnest(generate_series(1, length(text))) AS t(j)
), ckept AS (
  SELECT t.doc_id, 'char' AS lane,
         string_agg(t.unit, '' ORDER BY t.pos) AS clean_text,
         CAST(count(*) AS BIGINT) AS kept_units
  FROM ctok t
  WHERE NOT EXISTS (
    SELECT 1 FROM ccov c WHERE c.doc_id = t.doc_id AND c.pos = t.pos
  )
  GROUP BY t.doc_id
)
SELECT * FROM wkept UNION ALL SELECT * FROM ckept
"""


ORACLE_SUBSTRING_DEDUP_CJK = f"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN
                   ('0','1','2','3','4','5','6','7')
              THEN translate(text, '{_CJK_SRC} ', '{_CJK_DST}')
              ELSE text END AS text
  FROM documents WHERE length(text) > 0
), routed AS (
  SELECT doc_id, text,
         CAST(length(regexp_replace(text, '[^぀-ヿ㐀-䶿一-鿿가-힯]', '', 'g'))
              AS DOUBLE) / greatest(length(text), 1) AS r
  FROM corpus
), word_docs AS (
  SELECT doc_id, text FROM routed WHERE r < 0.3
), char_docs AS (
  SELECT doc_id, text FROM routed WHERE r >= 0.3
), wgrams AS (
  SELECT doc_id, i,
         array_to_string(w[i:i+{_SUBSTR_DEDUP_N - 1}], ' ') AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM word_docs),
       LATERAL unnest(generate_series(1, greatest(len(w) - {_SUBSTR_DEDUP_N - 1}, 0))) AS t(i)
), wdup AS (
  SELECT gram FROM wgrams GROUP BY gram HAVING count(*) >= 2
), wcov AS (
  SELECT DISTINCT g.doc_id, c.pos
  FROM wgrams g JOIN wdup USING (gram),
       LATERAL unnest(generate_series(g.i, g.i + {_SUBSTR_DEDUP_N - 1})) AS c(pos)
), wtok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS unit,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM word_docs
), wkept AS (
  SELECT t.doc_id, 'word' AS lane,
         string_agg(t.unit, ' ' ORDER BY t.pos) AS clean_text,
         CAST(count(*) AS BIGINT) AS kept_units
  FROM wtok t
  WHERE NOT EXISTS (
    SELECT 1 FROM wcov c WHERE c.doc_id = t.doc_id AND c.pos = t.pos
  )
  GROUP BY t.doc_id
), cgrams AS (
  SELECT doc_id, i, substr(text, i, {_SUBSTR_CJK_CHAR_N}) AS gram
  FROM char_docs,
       LATERAL unnest(generate_series(1, length(text) - {_SUBSTR_CJK_CHAR_N - 1})) AS t(i)
), cdup AS (
  SELECT gram FROM cgrams GROUP BY gram HAVING count(*) >= 2
), ccov AS (
  SELECT DISTINCT g.doc_id, c.pos
  FROM cgrams g JOIN cdup USING (gram),
       LATERAL unnest(generate_series(g.i, g.i + {_SUBSTR_CJK_CHAR_N - 1})) AS c(pos)
), ctok AS (
  SELECT doc_id, j AS pos, substr(text, j, 1) AS unit
  FROM char_docs, LATERAL unnest(generate_series(1, length(text))) AS t(j)
), ckept AS (
  SELECT t.doc_id, 'char' AS lane,
         string_agg(t.unit, '' ORDER BY t.pos) AS clean_text,
         CAST(count(*) AS BIGINT) AS kept_units
  FROM ctok t
  WHERE NOT EXISTS (
    SELECT 1 FROM ccov c WHERE c.doc_id = t.doc_id AND c.pos = t.pos
  )
  GROUP BY t.doc_id
)
SELECT * FROM wkept UNION ALL SELECT * FROM ckept
"""


def q_incremental_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """substring_dedup's continuous-ingest twin: clean a NEW batch
    (doc_id % 10 == 0) against a STANDING corpus (the rest) without
    ever rescanning corpus text pairwise. Batch positions are covered
    when their N-gram exists anywhere in the standing corpus's
    distinct-gram INDEX (at serving scale that index is a stored
    artifact maintained on ingest, exactly like streaming/neardup.py's
    LSH buckets — here it is recomputed from the table so the whole
    composition stays oracle-checkable) OR repeats within the batch
    itself. Cost is O(batch + index-collisions): one distinct over
    corpus grams, one batch gram count, one equi-join — the corpus is
    never joined against itself."""
    n = _SUBSTR_DEDUP_N
    df = ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    batch = df.filter(F.col("doc_id") % 10 == 0)
    corpus = df.filter(F.col("doc_id") % 10 != 0)
    bg = _word_ngrams(batch, n)
    corpus_index = _word_ngrams(corpus, n).select("gram").distinct()
    batch_dup = (
        bg.groupBy("gram")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("gram")
    )
    hot = corpus_index.union(batch_dup).distinct()
    covered = (
        bg.join(hot, "gram")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("i"), F.col("i") + n - 1)).alias("pos"),
        )
        .distinct()
    )
    tokens = batch.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    kept = tokens.join(covered, ["doc_id", "pos"], "left_anti")
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("kept_tokens"),
    )


ORACLE_INCREMENTAL_SUBSTRING_DEDUP = f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE length(text) > 0
), batch AS (
  SELECT * FROM docs WHERE doc_id % 10 = 0
), corpus AS (
  SELECT * FROM docs WHERE doc_id % 10 <> 0
), bg AS (
  SELECT doc_id, i, array_to_string(w[i:i+{_SUBSTR_DEDUP_N - 1}], ' ') AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM batch),
       LATERAL unnest(generate_series(1, greatest(len(w) - {_SUBSTR_DEDUP_N - 1}, 0))) AS t(i)
), corpus_index AS (
  SELECT DISTINCT array_to_string(w[i:i+{_SUBSTR_DEDUP_N - 1}], ' ') AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
       LATERAL unnest(generate_series(1, greatest(len(w) - {_SUBSTR_DEDUP_N - 1}, 0))) AS t(i)
), hot AS (
  SELECT gram FROM corpus_index
  UNION
  SELECT gram FROM bg GROUP BY gram HAVING count(*) >= 2
), covered AS (
  SELECT DISTINCT g.doc_id, c.pos
  FROM bg g JOIN hot USING (gram),
       LATERAL unnest(generate_series(g.i, g.i + {_SUBSTR_DEDUP_N - 1})) AS c(pos)
), tokens AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM batch
)
SELECT t.doc_id,
       string_agg(t.tok, ' ' ORDER BY t.pos) AS clean_text,
       CAST(count(*) AS BIGINT) AS kept_tokens
FROM tokens t
WHERE NOT EXISTS (
  SELECT 1 FROM covered c WHERE c.doc_id = t.doc_id AND c.pos = t.pos
)
GROUP BY t.doc_id
"""


_BOILER_HEADERS = [
    "Subscribe to our newsletter",
    "Follow us on social media",
    "Cookie policy: we use cookies",
    "Sign in to continue reading",
    "Advertisement",
]
_BOILER_FOOTERS = [
    "Copyright 2024 Example Corp",
    "All rights reserved",
    "Terms of service apply",
    "Back to top",
    "Contact us at example dot com",
]
_LINE_DEDUP_MIN_COUNT = 5


def _boiler_pages(df: DataFrame) -> DataFrame:
    """(doc_id, page): the synthetic web page for each document —
    header + text + footer, template keyed on md5(doc_id). Shared by
    the batch, incremental, and streaming line-dedup entries (and
    reproduced verbatim in their oracles) so all three clean the SAME
    page construction."""
    idx = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
        )
        - 1
    ) % 5
    hdr = F.element_at(F.array([F.lit(s) for s in _BOILER_HEADERS]), idx + 1)
    ftr = F.element_at(F.array([F.lit(s) for s in _BOILER_FOOTERS]), idx + 1)
    return df.select(
        "doc_id", F.concat_ws("\n", hdr, F.col("text"), ftr).alias("page")
    )


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style line-level boilerplate removal — the web-corpus
    cleaning pass that strips headers/footers/nav text repeated across
    pages while keeping each page's unique content. Pages are built
    from the documents table (header + text + footer, template keyed
    on md5(doc_id) — the same construction in the oracle), then:
    posexplode to (doc, pos, line) rows, one groupBy(norm) with
    map-side partial counts to find lines occurring >=
    _LINE_DEDUP_MIN_COUNT times corpus-wide, a LEFT ANTI equi-join
    against that (distinct-key, so no row amplification and no skew
    blowup on hot boilerplate lines), and ordered per-doc reassembly
    via array_sort(collect_list(struct(pos,line))) — two bounded
    shuffles total, linear in corpus size; the boilerplate side is
    count-thresholded so it stays tiny relative to the corpus at any
    scale."""
    df = ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    pages = _boiler_pages(df)
    lines = pages.select(
        "doc_id", F.posexplode(F.split("page", "\n")).alias("pos", "line")
    ).withColumn("norm", F.lower(F.trim("line")))
    boiler = (
        lines.groupBy("norm")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= _LINE_DEDUP_MIN_COUNT)
        .select("norm")
    )
    kept = lines.join(boiler, "norm", "left_anti")
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text"),
        F.count("*").alias("kept_lines"),
    )


_LD_HDRS = "[" + ",".join(f"'{s}'" for s in _BOILER_HEADERS) + "]"
_LD_FTRS = "[" + ",".join(f"'{s}'" for s in _BOILER_FOOTERS) + "]"

ORACLE_LINE_DEDUP = f"""
WITH paged AS (
  SELECT doc_id,
         list_extract({_LD_HDRS},
           ((strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 5) + 1)
         || chr(10) || text || chr(10) ||
         list_extract({_LD_FTRS},
           ((strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 5) + 1)
         AS page
  FROM documents WHERE length(text) > 0
), lines AS (
  SELECT doc_id, unnest(string_split(page, chr(10))) AS line,
         generate_subscripts(string_split(page, chr(10)), 1) AS pos
  FROM paged
), normed AS (
  SELECT doc_id, pos, line, lower(trim(line)) AS norm FROM lines
), boiler AS (
  SELECT norm FROM normed GROUP BY norm
  HAVING count(*) >= {_LINE_DEDUP_MIN_COUNT}
)
SELECT doc_id,
       string_agg(line, chr(10) ORDER BY pos) AS text,
       CAST(count(*) AS BIGINT) AS kept_lines
FROM normed WHERE norm NOT IN (SELECT norm FROM boiler)
GROUP BY doc_id
"""


def q_incremental_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """line_dedup's continuous-ingest twin (r9) — the last dedup family
    member without one (minhash / substring / semantic all have batch +
    incremental + streaming forms): clean a NEW batch of pages
    (doc_id % 10 == 0) against the STANDING corpus's line-count index
    without rescanning corpus pages per batch.

    A batch line is boilerplate iff its corpus-wide occurrence count —
    standing index count PLUS this batch's own count (self-inclusive,
    the ``incremental_substring_dedup`` rule) — reaches
    ``_LINE_DEDUP_MIN_COUNT``. Since standing + batch = corpus-wide,
    rows with kept_lines > 0 equal ``line_dedup`` on the full corpus
    restricted to batch docs (pinned in pytest); unlike the batch
    query, every batch doc gets an EXPLICIT row — a fully-boilerplate
    page surfaces as (text='', kept_lines=0) instead of silently
    vanishing from the decision log (the r8 qualitygate/dsir rule).

    Plan: one (norm → count) aggregate over each side, a count-join on
    the batch's distinct norms only, LEFT ANTI removal, per-doc ordered
    reassembly — O(batch + distinct-norm collisions); the standing side
    is never joined against itself. At serving scale the standing index
    is the stored SUMMED epoch log of ``streaming/linededup.py``
    (watermark-compacted, ``epochlog.compact_summed_index``); here it
    is recomputed from the table so the composition stays
    oracle-checkable, exactly the incremental_substring_dedup
    precedent."""
    df = ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    batch_pages = _boiler_pages(df.filter(F.col("doc_id") % 10 == 0))
    standing_pages = _boiler_pages(df.filter(F.col("doc_id") % 10 != 0))
    lines_b = batch_pages.select(
        "doc_id", F.posexplode(F.split("page", "\n")).alias("pos", "line")
    ).withColumn("norm", F.lower(F.trim("line")))
    standing_idx = (
        standing_pages.select(
            F.explode(F.split("page", "\n")).alias("line")
        )
        .select(F.lower(F.trim("line")).alias("norm"))
        .groupBy("norm")
        .agg(F.count("*").alias("sc"))
    )
    boiler = (
        lines_b.groupBy("norm")
        .agg(F.count("*").alias("bc"))
        .join(standing_idx, "norm", "left")
        .filter(
            F.col("bc") + F.coalesce(F.col("sc"), F.lit(0))
            >= _LINE_DEDUP_MIN_COUNT
        )
        .select("norm")
    )
    kept = lines_b.join(boiler, "norm", "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text"),
        F.count("*").alias("kept_lines"),
    )
    spine = batch_pages.select("doc_id")
    return spine.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("text", F.lit("")).alias("text"),
        F.coalesce("kept_lines", F.lit(0).cast("long")).alias("kept_lines"),
    )


ORACLE_INCREMENTAL_LINE_DEDUP = f"""
WITH paged AS (
  SELECT doc_id,
         list_extract({_LD_HDRS},
           ((strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 5) + 1)
         || chr(10) || text || chr(10) ||
         list_extract({_LD_FTRS},
           ((strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 5) + 1)
         AS page
  FROM documents WHERE length(text) > 0
), b AS (
  SELECT * FROM paged WHERE doc_id % 10 = 0
), s AS (
  SELECT * FROM paged WHERE doc_id % 10 <> 0
), lines_b AS (
  SELECT doc_id, unnest(string_split(page, chr(10))) AS line,
         generate_subscripts(string_split(page, chr(10)), 1) AS pos
  FROM b
), normed_b AS (
  SELECT doc_id, pos, line, lower(trim(line)) AS norm FROM lines_b
), sidx AS (
  SELECT lower(trim(l)) AS norm, count(*) AS sc
  FROM (SELECT unnest(string_split(page, chr(10))) AS l FROM s)
  GROUP BY 1
), boiler AS (
  SELECT bc.norm
  FROM (SELECT norm, count(*) AS bc FROM normed_b GROUP BY norm) bc
  LEFT JOIN sidx USING (norm)
  WHERE bc.bc + COALESCE(sidx.sc, 0) >= {_LINE_DEDUP_MIN_COUNT}
), agg AS (
  SELECT doc_id,
         string_agg(line, chr(10) ORDER BY pos) AS text,
         CAST(count(*) AS BIGINT) AS kept_lines
  FROM normed_b WHERE norm NOT IN (SELECT norm FROM boiler)
  GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(a.text, '') AS text,
       COALESCE(a.kept_lines, 0) AS kept_lines
FROM (SELECT DISTINCT doc_id FROM b) d LEFT JOIN agg a USING (doc_id)
"""


ORACLE_CLEAN_TEXT = r"""
SELECT doc_id,
       lower(trim(regexp_replace(
           regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'),
           '\s{2,}', ' ', 'g'))) AS clean_text,
       length(lower(trim(regexp_replace(
           regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'),
           '\s{2,}', ' ', 'g')))) AS clean_len
FROM documents
"""


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by portable hash of the
    document id (90/5/5). Hash-of-key splitting is the only scheme
    that stays stable under re-partitioning, re-ingestion, and
    engine changes — no RNG, no ordering dependence. Returns the
    per-language split counts (the audit a pipeline runs before
    training)."""
    df = load(spark, sf_dir, "documents")
    bucket = F.expr(
        f"pmod({_portable_hash_expr('cast(doc_id as string)')}, 100)"
    )
    split = (
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        df.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


ORACLE_DATASET_SPLIT = """
WITH b AS (
  SELECT lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
  FROM documents
)
SELECT lang,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs
FROM b
GROUP BY 1, 2
"""


def q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline (pipelines.curate: clean →
    quality gate → exact dedup → MinHash near-dedup → hash split) as an
    audit aggregate: docs per (split, keep). Every stage is
    deterministic (md5-based hashes, no RNG), so the WHOLE composition
    is oracle-checked end-to-end, not just the stages."""
    from aiotcvectordb_spark import pipelines as P

    # widen the single-row-group scan BEFORE the embarrassingly-parallel
    # shingle+minhash stage — without this the whole clean/hash chain
    # runs on one core (measured 6.7s -> ~2s at sf0.1 on local[32])
    cur = P.curate(ensure_min_partitions(load(spark, sf_dir, "documents")))
    return cur.groupBy("split", "keep").agg(F.count("*").alias("n_docs"))


_CURATE_CLEAN_SQL = (
    r"lower(trim(regexp_replace(regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'),"
    r" '\s{2,}', ' ', 'g')))"
)
_CURATE_TOKS_SQL = _duck_bm25_toks_sql("clean_text")

ORACLE_CURATE_CORPUS = f"""
WITH clean AS (
  SELECT doc_id, {_CURATE_CLEAN_SQL} AS clean_text FROM documents
),
qual AS (
  SELECT doc_id, clean_text,
         len({_CURATE_TOKS_SQL}) AS n_tokens,
         (length(clean_text) - length(regexp_replace(clean_text, '{_WORDCHAR_CLASS}', '', 'g')))
           / greatest(length(clean_text), 1) AS alnum_ratio
  FROM clean
),
flags AS (
  SELECT doc_id, clean_text, n_tokens,
         (n_tokens >= 3 AND alnum_ratio >= 0.6) AS quality_ok,
         doc_id = min(doc_id) OVER (PARTITION BY {_CURATE_H60.format(s="clean_text")})
           AS exact_keeper
  FROM qual
),
shingled AS (
  SELECT doc_id,
         list_transform(range(1, len({_CURATE_TOKS_SQL}) - 1),
                        i -> array_to_string({_CURATE_TOKS_SQL}[i:i+2], ' ')) AS sh
  FROM clean
  WHERE len({_CURATE_TOKS_SQL}) >= 3
),
cdig AS (
  SELECT doc_id,
         list_transform(sh, s -> md5(s)) AS d1,
         list_transform(sh, s -> md5('#' || s)) AS d2
  FROM shingled
),
sigs AS (
  SELECT doc_id, {_oracle_mh_windows()}
  FROM cdig
),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {j} AS band, mh{j} AS h FROM sigs" for j in range(4))}
),
bucketed AS (
  SELECT doc_id,
         min(doc_id) OVER (PARTITION BY band, h) AS bmin,
         count(*) OVER (PARTITION BY band, h) AS bsize
  FROM bands
),
dominated AS (
  SELECT DISTINCT doc_id FROM bucketed
  WHERE bsize BETWEEN 2 AND 64 AND doc_id > bmin
),
final AS (
  SELECT f.doc_id,
         CASE WHEN {_CURATE_H60.format(s="CAST(f.doc_id AS VARCHAR)")} % 100 < 90 THEN 'train'
              WHEN {_CURATE_H60.format(s="CAST(f.doc_id AS VARCHAR)")} % 100 < 95 THEN 'val'
              ELSE 'test' END AS split,
         (f.quality_ok AND f.exact_keeper AND d.doc_id IS NULL) AS keep
  FROM flags f LEFT JOIN dominated d USING (doc_id)
)
SELECT split, keep, count(*) AS n_docs FROM final GROUP BY split, keep
"""


# the corpus-calibrated rule gate of curate_corpus_v2: every Gopher
# flag except word-count/stop-words (the synthetic corpus is ~30-word
# synthetic prose — those two rules reject ALL of it, which would make
# the composition vacuous; production recalibrates thresholds per
# corpus) plus C4's page-level drops.
_V2_GATE_FLAGS = [
    "ok_mean_word_len", "ok_symbol_ratio", "ok_alpha_words",
    "ok_dup_lines", "ok_dup_paras", "ok_dup_line_chars",
    "ok_dup_para_chars", "ok_top_2gram", "ok_top_3gram", "ok_top_4gram",
    "ok_no_lorem", "ok_no_brace",
]


def q_curate_corpus_v2(
    spark: SparkSession, sf_dir: str, sem_flags: DataFrame | None = None
) -> DataFrame:
    """The r8-composed curation funnel — the round's new operators
    chained end-to-end and audited as stage survival counts:

    raw → RULE GATE (Gopher battery incl. the full repetition rules +
    C4 page drops, corpus-calibrated flag set `_V2_GATE_FLAGS`) →
    EXACT DEDUP (min-id per clean-text hash among gate survivors) →
    SEMANTIC DEDUP (SemDeDup keepers, corpus-wide cell model joined on
    the aligned embedding ids) → hash SPLIT of the final survivors.

    Built by COMPOSING the oracled registry queries themselves
    (q_gopher_quality_filter / q_c4_quality_filter / q_semantic_dedup)
    plus the shared pipeline stages — and the oracle nests those
    queries' own SQL, so the whole composition is hash-checked with
    zero re-implementation. Output is the funnel (stage_idx, stage,
    n_docs): 4 stage rows + one row per final split.

    Scale shape: ONE annotated per-doc frame (gate flag, exact-keeper
    window among gate survivors, semantic flag join, split bucket),
    then each doc EXPLODES into the stages it survives and one
    groupBy(stage) counts everything — the whole funnel is a single
    pass over the battery compute, not one recompute per stage row
    (the naive union-of-aggregates shape re-ran the Gopher battery
    once per funnel row)."""
    from aiotcvectordb_spark import pipelines as P

    docs = ensure_min_partitions(load(spark, sf_dir, "documents"))
    gop = q_gopher_quality_filter(spark, sf_dir)
    c4 = q_c4_quality_filter(spark, sf_dir).select(
        "doc_id", "ok_no_lorem", "ok_no_brace"
    )
    gate_cond = F.lit(True)
    for fl in _V2_GATE_FLAGS:
        gate_cond = gate_cond & F.col(fl)
    flagged = gop.join(c4, "doc_id").select(
        "doc_id", gate_cond.alias("gate")
    )
    clean = P.clean_stage(docs).select("doc_id", "clean_text")
    h = F.expr(P._PORTABLE_HASH.format(s="clean_text"))
    # exact keeper AMONG GATE SURVIVORS: min gate-surviving doc_id per
    # clean-text hash (one keyed window — non-survivors are NULL in
    # the min, so they never claim a group)
    w_h = Window.partitionBy(h)
    sem = (sem_flags if sem_flags is not None
           else q_semantic_dedup(spark, sf_dir))
    ann = (
        clean.join(flagged, "doc_id")
        .join(
            sem.select(F.col("vec_id").alias("doc_id"), "semantic_dup"),
            "doc_id",
            "left",  # a doc with no embedding row can't be a keeper
        )
        .withColumn(
            "exact_k",
            F.col("gate")
            & (
                F.min(F.when(F.col("gate"), F.col("doc_id"))).over(w_h)
                == F.col("doc_id")
            ),
        )
        .withColumn(
            "final",
            F.col("exact_k")
            & F.coalesce(~F.col("semantic_dup"), F.lit(False)),
        )
    )
    split_bucket = F.expr(
        f"pmod({P._PORTABLE_HASH.format(s='cast(doc_id as string)')}, 100)"
    )
    split = (
        F.when(split_bucket < 90, F.lit("train"))
        .when(split_bucket < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    memb = F.filter(
        F.array(
            F.struct(
                F.lit(0).alias("stage_idx"),
                F.lit("raw").alias("stage"),
                F.lit(True).alias("m"),
            ),
            F.struct(
                F.lit(1).alias("stage_idx"),
                F.lit("rule_gate").alias("stage"),
                F.col("gate").alias("m"),
            ),
            F.struct(
                F.lit(2).alias("stage_idx"),
                F.lit("exact_keeper").alias("stage"),
                F.col("exact_k").alias("m"),
            ),
            F.struct(
                F.lit(3).alias("stage_idx"),
                F.lit("semantic_keeper").alias("stage"),
                F.col("final").alias("m"),
            ),
            F.struct(
                F.lit(4).alias("stage_idx"),
                F.concat(F.lit("final_"), split).alias("stage"),
                F.col("final").alias("m"),
            ),
        ),
        lambda s: s["m"],
    )
    return (
        ann.select(F.explode(memb).alias("s"))
        .groupBy(
            F.col("s.stage_idx").alias("stage_idx"),
            F.col("s.stage").alias("stage"),
        )
        .agg(F.count("*").alias("n_docs"))
    )


def q_curate_corpus_v2_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same composed funnel with the SCALE-ROUTED semantic stage
    (``semantic_dedup_auto``): below the knee it runs the oracled
    fixed-centroid plan (identical output to ``curate_corpus_v2``);
    above it, trained nlist ∝ N cells keep the semantic prune linear,
    so the funnel survives 100 TB. Rows-only by design — which
    semantic plan runs is scale-dependent, so this entry cannot carry
    a value-hash oracle (the embedding_near_dup_auto precedent); the
    oracled ``curate_corpus_v2`` fail-fasts above the fixed-K cap
    instead of silently switching plans."""
    return q_curate_corpus_v2(
        spark, sf_dir, sem_flags=q_semantic_dedup_auto(spark, sf_dir)
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling by language (`sampleBy` — per-stratum
    Bernoulli with one seed): the rebalancing step of corpus curation.
    Engine-specific RNG, so no SQL oracle; the pytest property asserts
    per-stratum rates and determinism under the fixed seed."""
    df = load(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 1.0}
    sampled = df.sampleBy("lang", fractions=fractions, seed=42)
    return sampled.groupBy("lang").agg(F.count("*").alias("n_docs"))


_STRAT_RATES = {"en": 0.5, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 1.0}


def q_stratified_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic stratified sampling (r9) — the 100 TB form of
    ``stratified_sample``: membership is ``pmod(md5-hash(doc_id),
    10000) < rate_lang * 10000`` instead of an engine RNG, so the
    sample is REPRODUCIBLE across engines, runs, cluster sizes, and
    partitionings (re-running a curation pipeline must not silently
    reshuffle which documents trained). Pure map-side filter in the
    scan projection — no shuffle, no state; the per-stratum rate
    error is O(1/sqrt(stratum)) exactly like seeded Bernoulli. ORACLED
    on full membership (doc ids, not just counts) via the shared
    portable-hash twins (pipelines._PORTABLE_HASH / _CURATE_H60);
    unknown languages default to keep (rate 1.0) so new corpus slices
    fail open into the sample rather than silently vanishing."""
    from aiotcvectordb_spark import pipelines as P

    df = load(spark, sf_dir, "documents")
    bucket = F.expr(
        f"pmod({P._PORTABLE_HASH.format(s='cast(doc_id as string)')}, 10000)"
    )
    thr = F.lit(10000)
    for lang, rate in _STRAT_RATES.items():
        thr = F.when(F.col("lang") == lang, int(rate * 10000)).otherwise(thr)
    return df.filter(bucket < thr).select("doc_id", "lang")


ORACLE_STRATIFIED_SAMPLE_HASH = f"""
SELECT doc_id, lang FROM documents
WHERE {_CURATE_H60.format(s="CAST(doc_id AS VARCHAR)")} % 10000 <
      CASE {" ".join(f"WHEN lang = '{l}' THEN {int(r * 10000)}" for l, r in _STRAT_RATES.items())}
           ELSE 10000 END
"""


_WEIGHTED_SAMPLE_K = 200


def q_weighted_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic WEIGHTED sampling without replacement (r10,
    staged for r11 promotion) — Efraimidis & Spirakis 2006 ('Weighted
    random sampling with a reservoir'): drawing k items with
    probability proportional to weight w equals taking the top-k by
    key u^(1/w) with u ~ Uniform(0,1); here u derives from the
    portable md5 hash of the doc id, so the sample is REPRODUCIBLE
    across engines, runs, and partitionings — the weighted companion
    of ``stratified_sample_hash`` (rates per stratum there, weights
    per item here). Weight = n_chars: longer documents sampled
    proportionally more often, the standard proportional-to-size
    curation draw. Both engines rank on the LOG key ln(u)/w (the
    library form — monotone in u^(1/w), numerically spread where the
    power key saturates toward 1) rounded to ROUND_DIGITS, doc_id
    ascending on ties.

    Scale shape: one map-only scan projection computes the key; top-k
    is a per-partition TakeOrdered merge (orderBy+limit), never a
    global sort; the rank window sees k rows."""
    df = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = "((pmod(" + _portable_hash_expr(
        "cast(doc_id as string)"
    ) + ", 1000000) + 0.5) / 1000000.0)"
    key = F.round(
        F.expr(f"ln({u}) / cast(n_chars as double)"), ROUND_DIGITS
    )
    top = (
        df.select(
            "doc_id",
            "source",
            F.col("n_chars").alias("weight"),
            key.alias("key"),
        )
        .orderBy(F.col("key").desc(), F.col("doc_id").asc())
        .limit(_WEIGHTED_SAMPLE_K)
    )
    w = Window.orderBy(F.col("key").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


ORACLE_WEIGHTED_SAMPLE_HASH = f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars AS weight,
         round(ln(({_CURATE_H60.format(s="CAST(doc_id AS VARCHAR)")} % 1000000 + 0.5)
                  / 1000000.0) / CAST(n_chars AS DOUBLE), {ROUND_DIGITS}) AS key
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, source, weight, key,
       CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS INT) AS rank
FROM keyed
QUALIFY rank <= {_WEIGHTED_SAMPLE_K}
ORDER BY rank
"""


_WINNOW_K = 8  # char k-gram width (Schleimer et al.'s k: noise threshold)
_WINNOW_W = 4  # window width (guarantee threshold t = w + k - 1)


def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (r10, staged for r11
    promotion) — Schleimer, Wilkerson & Aiken 2003 ('Winnowing: Local
    Algorithms for Document Fingerprinting', the MOSS algorithm): hash
    every char k-gram, slide a w-hash window, and in each window
    select the minimal hash (RIGHTMOST position on ties); the distinct
    selections are the fingerprint, guaranteeing any shared substring
    of length >= w + k - 1 contributes a shared fingerprint while
    storing only ~2/(w+1) of the grams. The local-fingerprint
    complement of the whole-doc ``doc_fingerprint`` and the cut-based
    ``substring_dedup``: copy DETECTION with bounded storage.

    Everything is integer math on the portable 60-bit hash (no float
    anywhere): the window pick is ONE BIGINT min over a w-row frame of
    the encoded key h * 10^9 + (10^9 - 1 - pos) — h is 31 bits so the
    encoding tops out at ~2.1e18 < 2^63, and docs up to 1e9 chars fit
    the pos field — whose minimum is
    exactly (min hash, max pos) — the rightmost-min rule as a plain
    min. Output is the per-doc fingerprint summary (count + sum + min
    + max of selected hashes over n_grams) so the driver row stays
    doc-sized; the full (doc_id, pos, h) selection set is what a
    plagiarism index would store, pinned against a Python reference
    implementation in tests/test_staged_oracles.py.

    Scale shape: grams in the scan projection, ONE doc-keyed window
    (partitions with the data), map-side-combinable final aggregate —
    no self-join, no all-pairs."""
    sel = _winnow_selection(spark, sf_dir)
    return sel.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_selected"),
        F.sum("h").alias("fp_sum"),
        F.min("h").alias("fp_min"),
        F.max("h").alias("fp_max"),
    )


def _winnow_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct winnowing picks (doc_id, pos, h) — the stored
    fingerprint index; shared by the summary query and tests."""
    from aiotcvectordb_spark import pipelines

    k, w = _WINNOW_K, _WINNOW_W
    df = load(spark, sf_dir, "documents").filter(
        F.length("text") >= k + w - 1
    )
    grams = pipelines.char_ngrams(df, k)  # (doc_id, i, gram), 0-based i
    hashed = grams.select(
        "doc_id",
        F.col("i").alias("pos"),
        F.expr(
            f"pmod({_portable_hash_expr('gram')}, 2147483648)"
        ).alias("h"),
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, w - 1)
    )
    n_win = Window.partitionBy("doc_id")
    picks = (
        hashed.withColumn(
            "pick",
            F.min(
                F.col("h") * F.lit(1000000000).cast("long")
                + (F.lit(999999999) - F.col("pos"))
            ).over(win),
        )
        .withColumn("n_grams", F.count("*").over(n_win))
        # full windows only: starts 0 .. n_grams - w
        .filter(F.col("pos") <= F.col("n_grams") - w)
        .select(
            "doc_id",
            (F.lit(999999999) - F.col("pick") % 1000000000).cast("int").alias("pos"),
            F.expr("pick div 1000000000").cast("long").alias("h"),
        )
        .distinct()
    )
    return picks


ORACLE_WINNOW_FINGERPRINT = f"""
WITH docs AS (
  SELECT doc_id, text FROM documents
  WHERE length(text) >= {_WINNOW_K + _WINNOW_W - 1}
),
grams AS (
  SELECT doc_id, i - 1 AS pos,
         {_CURATE_H60.format(s=f"substr(text, i, {_WINNOW_K})")} % 2147483648 AS h
  FROM docs,
       LATERAL unnest(generate_series(1, length(text) - {_WINNOW_K - 1})) AS t(i)
),
winmin AS (
  SELECT doc_id, pos,
         min(h * 1000000000 + (999999999 - pos)) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS pick,
         count(*) OVER (PARTITION BY doc_id) AS n_grams
  FROM grams
),
picks AS (
  SELECT DISTINCT doc_id,
         CAST(999999999 - pick % 1000000000 AS INT) AS pos,
         pick // 1000000000 AS h
  FROM winmin WHERE pos <= n_grams - {_WINNOW_W}
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_selected,
       CAST(sum(h) AS BIGINT) AS fp_sum,
       CAST(min(h) AS BIGINT) AS fp_min,
       CAST(max(h) AS BIGINT) AS fp_max
FROM picks GROUP BY doc_id
"""


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (r10,
    staged for r11 promotion) — the information-density member of the
    quality battery: H = -sum((c/T) * ln(c/T)) over the doc's token
    counts, in NATS. Near-zero entropy flags degenerate repetition
    (one token dominating — spam, boilerplate, keyword stuffing) that
    length/ratio rules miss; entropy near ln(n_distinct) means a flat
    distribution. Complements ``doc_repetition`` (verbatim n-gram
    repeats) and the LM scores (corpus-level likelihood) with a
    document-local distributional measure.

    Plan: tokens in the scan projection, one (doc, token) count
    aggregate, one doc-keyed entropy fold with map-side partials —
    keyed shuffles only. The float sum is order-insensitive at
    ROUND_DIGITS (the unigram_logprob precedent)."""
    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    toks = df.select(
        "doc_id", F.explode(sparse_fn.bm25_tokens_col("text")).alias("tok")
    )
    counts = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("c") * F.log("c")).alias("__clogc"),
    )
    # H = ln(T) - (1/T) * sum(c ln c): one pass, no second join
    ent = F.round(
        F.log("n_tokens") - F.col("__clogc") / F.col("n_tokens"),
        ROUND_DIGITS,
    )
    return per_doc.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        ent.alias("entropy"),
    )


ORACLE_TOKEN_ENTROPY = f"""
WITH toks AS (
  SELECT doc_id, unnest({_BM25_TOKS_SQL}) AS tok FROM documents
),
counts AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
),
per_doc AS (
  SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct,
         sum(c * ln(c)) AS clogc
  FROM counts GROUP BY doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       round(ln(n_tokens) - clogc / n_tokens, {ROUND_DIGITS}) AS entropy
FROM per_doc
"""


# avg() is avoided on purpose: DuckDB's avg(DECIMAL) returns DOUBLE with
# engine-specific accumulation; exact decimal sum / int count keeps the
# threshold bit-identical across engines.
ORACLE_CORRELATED_SUBQUERY = """
SELECT o_orderkey, o_custkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
FROM orders o
WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) >
      (SELECT 1.5 * (CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     / count(*))
       FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
"""


# --------------------------------------------------------------------------
# Embedding-space extras: MMR diversified rerank, PCA reduction
# --------------------------------------------------------------------------


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified top-10 over an exact top-40 candidate fetch
    (operators/embeddings.mmr_rerank): greedy per-query selection runs
    in one applyInPandas group over <= fetch_k rows, so the iterative
    part is bounded and query-parallel. ORACLED as of r9 — the greedy
    loop IS SQL-expressible once the selection state is explicit: a
    DuckDB recursive CTE carries (selected set, per-candidate running
    max-similarity) and each recursion step re-derives the argmax of
    ``lam*rel - (1-lam)*max_sim`` over rounded cosines with the same
    first-max (ascending-id within equal relevance) tie rule the
    numpy kernel applies, so the driver hash covers all ten greedy
    steps of both queries end to end. Determinism + diversity
    additionally asserted in tests/test_embedding_ops.py."""
    from aiotcvectordb_spark.operators import embeddings as emb_ops

    df = load(spark, sf_dir, "embeddings")
    return emb_ops.mmr_rerank(
        df,
        [qvec(1.0), qvec(-1.0)],
        vector_col="embedding",
        id_col="vec_id",
        metric="COSINE",
        fetch_k=40,
        limit=10,
        lambda_mult=0.5,
        round_digits=ROUND_DIGITS,
    )


# The MMR oracle replays the greedy selection as a recursive CTE. State
# per (query, step): the selected candidate indexes and the running
# per-candidate max-similarity vector; the candidate pool (ids,
# relevances in (rel DESC, id ASC) order) and the flattened n x n
# rounded pairwise-cosine matrix are precomputed list columns. Every
# arithmetic step mirrors the numpy kernel on ALREADY-ROUNDED inputs
# (rel and sim rounded to ROUND_DIGITS in both engines; lam = 0.5
# halving is exact), so the argmax decisions are bit-identical and
# first-max tie-breaking (list_position vs np.argmax) agrees.
ORACLE_MMR_RERANK = f"""
WITH RECURSIVE {_sql_queries_cte([qvec(1.0), qvec(-1.0)])},
scored AS (
  SELECT q.query_idx, e.vec_id, round({_COS_SQL}, {ROUND_DIGITS}) AS rel,
         CAST(e.embedding AS DOUBLE[]) AS vec,
         row_number() OVER (PARTITION BY q.query_idx
             ORDER BY round({_COS_SQL}, {ROUND_DIGITS}) DESC, e.vec_id) AS rn
  FROM embeddings e CROSS JOIN queries q
  QUALIFY rn <= 40
),
pool AS (
  SELECT query_idx, count(*) AS n,
         list(vec_id ORDER BY rn) AS ids,
         list(rel ORDER BY rn) AS rels
  FROM scored GROUP BY query_idx
),
sims AS (
  SELECT a.query_idx,
         list(round(COALESCE(
             list_dot_product(a.vec, b.vec) /
             NULLIF(sqrt(list_dot_product(a.vec, a.vec)) *
                    sqrt(list_dot_product(b.vec, b.vec)), 0), 0.0),
             {ROUND_DIGITS})
           ORDER BY a.rn, b.rn) AS simflat
  FROM scored a JOIN scored b USING (query_idx)
  GROUP BY a.query_idx
),
mmr AS (
  SELECT p.query_idx, 0 AS step, CAST(NULL AS BIGINT) AS best,
         CAST(NULL AS DOUBLE) AS best_obj,
         CAST([] AS BIGINT[]) AS sel,
         list_transform(range(1, p.n + 1),
                        i -> CAST('-infinity' AS DOUBLE)) AS msim
  FROM pool p
  UNION ALL
  SELECT query_idx, step + 1, CAST(bi AS BIGINT), objs[bi],
         list_append(sel, CAST(bi AS BIGINT)),
         list_transform(range(1, n + 1),
                        i -> greatest(msim[i], simflat[(bi - 1) * n + i]))
  FROM (
    SELECT y.*, list_position(y.objs, list_aggregate(y.objs, 'max')) AS bi
    FROM (
      SELECT m.query_idx, m.step, m.sel, m.msim, p.n, p.rels, s.simflat,
             list_transform(range(1, p.n + 1), i ->
                 CASE WHEN list_contains(m.sel, i) THEN NULL
                      WHEN m.step = 0 THEN 0.5 * p.rels[i]
                      ELSE 0.5 * p.rels[i] - 0.5 * m.msim[i] END) AS objs
      FROM mmr m
      JOIN pool p USING (query_idx)
      JOIN sims s USING (query_idx)
      WHERE m.step < least(10, p.n)
    ) y
  ) z
)
SELECT m.query_idx,
       p.ids[m.best] AS vec_id,
       p.rels[m.best] AS relevance,
       round(m.best_obj, {ROUND_DIGITS}) AS mmr_score,
       CAST(m.step AS INT) AS mmr_rank
FROM mmr m JOIN pool p USING (query_idx)
WHERE m.step >= 1
ORDER BY query_idx, mmr_rank
"""


def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA reduction 64d -> 8d of the embeddings table via MLlib's
    distributed covariance path (one d x d tree-aggregate + map-only
    projection). Returns the sign-invariant projection norm per vector
    (principal axes are defined only up to sign, so norms are the
    stable scalar). Rows-only; variance/reconstruction properties in
    tests/test_embedding_ops.py."""
    from aiotcvectordb_spark.operators import embeddings as emb_ops

    df = load(spark, sf_dir, "embeddings")
    reduced, _ = emb_ops.pca_fit_transform(
        df, vector_col="embedding", id_col="vec_id", k=8
    )
    return reduced.select(
        "vec_id",
        F.round(
            F.sqrt(F.aggregate("reduced", F.lit(0.0), lambda a, x: a + x * x)),
            ROUND_DIGITS,
        ).alias("reduced_norm"),
    )


def q_embedding_pca_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``embedding_pca``'s frozen-basis ORACLED witness (r11, the
    classifier/BPE frozen pattern): one fitted 64x8 principal-component
    basis is pinned as literals (``operators/pca_frozen.py``,
    sign-canonicalized), and the PROJECTION pass — eight
    zip_with/aggregate dot products in the scan projection, whole-stage
    codegen, shuffle-free and linear in rows — is closed-form in DuckDB
    (list_dot_product against the same literal arrays) under the
    driver hash. The trained lane stays rows-only (MLlib's covariance
    tree-aggregate float order is partitioning-dependent); this row
    vouches for the map-only matmul dataflow any trained basis ships."""
    from aiotcvectordb_spark.functions import vector as vector_fn
    from aiotcvectordb_spark.operators.pca_frozen import FROZEN_PCA_BASIS

    df = load(spark, sf_dir, "embeddings")
    projections = [
        F.round(
            vector_fn.dot_score(
                "embedding",
                "array(" + ", ".join(f"{v:.17e}" for v in comp) + ")",
            ),
            ROUND_DIGITS,
        ).alias(f"pc{j + 1}")
        for j, comp in enumerate(FROZEN_PCA_BASIS)
    ]
    return df.select("vec_id", *projections)


def _pca_fixed_oracle() -> str:
    from aiotcvectordb_spark.operators.pca_frozen import FROZEN_PCA_BASIS

    cols = ",\n       ".join(
        "round(list_dot_product(CAST(embedding AS DOUBLE[]), ["
        + ", ".join(f"{v:.17e}" for v in comp)
        + f"]), {ROUND_DIGITS}) AS pc{j + 1}"
        for j, comp in enumerate(FROZEN_PCA_BASIS)
    )
    return f"SELECT vec_id,\n       {cols}\nFROM embeddings"


ORACLE_EMBEDDING_PCA_FIXED = _pca_fixed_oracle()


def q_audio_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec round trip, oracle-checked end to end: each
    document's bytes become an int16 waveform encoded as an actual
    RIFF/WAVE PCM16 file (operators/audiocodec.encode_wav — stdlib
    ``wave`` cross-validates it in tests), then a second mapInPandas
    stage DECODES the payload and computes n_samples / duration / RMS
    on the real samples. Both stages are Arrow-batched and
    shuffle-free (payloads stay on their producing partition); the
    waveform is a pure function of the text's UTF-8 BYTES, and the SQL
    oracle expands code points to those same bytes, so parity is exact
    for any unicode (and empty) text."""
    from aiotcvectordb_spark.operators import multimodal as MM

    wav = payload_table(
        spark, sf_dir, "wav_pcm", 1,
        lambda: MM.with_wav_payload(
            ensure_min_partitions(load(spark, sf_dir, "documents")),
            n_samples=None,
        ),
    )
    return MM.audio_features(wav).select(
        "doc_id",
        "n_samples",
        "duration_ms",
        F.round("rms", ROUND_DIGITS).alias("rms"),
    )


# Byte-exact oracle: the waveform is one sample per UTF-8 BYTE (not per
# character), so the SQL expands each code point to its UTF-8 byte
# sequence before aggregating — parity holds for any unicode text, not
# just the all-ASCII fixture. Empty text gets the codec's single zero
# sample via the LEFT JOIN fallback.
def q_audio_adpcm_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-audio round trip: the text-derived waveform is
    IMA-ADPCM-encoded (4:1 lossy, operators/audiocodec.encode_wav_adpcm)
    and a second shuffle-free mapInPandas stage decodes the nibble
    stream and computes features on the reconstructed samples.
    Rows-only by nature: the ADPCM predictor state machine is not
    SQL-expressible, so the driver checks rows/schema while pytest pins
    the codec (bit-exact decoder≡encoder-reconstruction, >20 dB SNR,
    malformed-stream ValueError contract — tests/test_audiocodec.py)."""
    from aiotcvectordb_spark.operators import multimodal as MM

    wav = payload_table(
        spark, sf_dir, "wav_adpcm", 1,
        lambda: MM.with_wav_payload(
            ensure_min_partitions(load(spark, sf_dir, "documents")),
            n_samples=None, codec="adpcm",
        ),
    )
    return MM.audio_features(wav).select(
        "doc_id",
        "n_samples",
        "duration_ms",
        F.round("rms", ROUND_DIGITS).alias("rms"),
    )


ORACLE_AUDIO_PROBE = """
WITH ch AS (
  SELECT doc_id, ascii(c) AS cp
  FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS c
    FROM documents WHERE length(text) > 0
  )
),
b AS (
  SELECT doc_id, unnest(
    CASE WHEN cp < 128 THEN [cp]
         WHEN cp < 2048 THEN [192 + cp // 64, 128 + cp % 64]
         WHEN cp < 65536 THEN [224 + cp // 4096, 128 + (cp // 64) % 64,
                               128 + cp % 64]
         ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64,
               128 + (cp // 64) % 64, 128 + cp % 64] END) AS byte
  FROM ch
),
agg AS (
  SELECT doc_id, count(*) AS n,
         sum(((byte - 128) / 128.0) * ((byte - 128) / 128.0)) AS ss
  FROM b GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(agg.n, 1) AS BIGINT) AS n_samples,
       CAST(coalesce(agg.n, 1) * 1000 // 8000 AS BIGINT) AS duration_ms,
       round(sqrt(coalesce(agg.ss, 0) / coalesce(agg.n, 1)), 6) AS rms
FROM documents d LEFT JOIN agg USING (doc_id)
"""


_MPNG_FRAMES = 4
_MPNG_WIDTH = 8
_MPNG_STRIDE = 2


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multi-frame extraction, oracle-checked end to end: each
    document becomes an MPNG container (4 length-prefixed PNG frames,
    frame j encoding the [j::4] byte-stride slice of the text —
    operators/multimodal.with_mpng_payload), then a second mapInPandas
    stage parses the container, samples every 2nd frame, and decodes
    each frame's REAL PNG header for its dimensions. Both stages
    shuffle-free; frame sizes are a pure function of the text length,
    so SQL recomputes them. Entropy-coded video stays honestly behind
    NotImplementedError."""
    from aiotcvectordb_spark.operators import multimodal as MM

    mpng = payload_table(
        spark, sf_dir, "mpng", 1,
        lambda: MM.with_mpng_payload(
            ensure_min_partitions(load(spark, sf_dir, "documents")),
            n_frames=_MPNG_FRAMES, width=_MPNG_WIDTH,
        ),
    )
    return MM.extract_frames(mpng, stride=_MPNG_STRIDE)


# L is the UTF-8 BYTE length (octet_length of the encoded text) — the
# Spark side strides over text.encode("utf-8"), so a character count
# would silently diverge on any non-ASCII document.
ORACLE_VIDEO_FRAMES = f"""
WITH frames AS (
  SELECT doc_id, octet_length(encode(text)) AS L, unnest(range({_MPNG_FRAMES})) AS j
  FROM documents
)
SELECT doc_id,
       CAST(j AS INTEGER) AS frame_idx,
       {_MPNG_WIDTH} AS f_width,
       CAST(CASE WHEN L > j THEN ((L - j - 1) // {_MPNG_FRAMES} + 1 + {_MPNG_WIDTH - 1}) // {_MPNG_WIDTH}
                 ELSE 1 END AS INTEGER) AS f_height
FROM frames
WHERE j % {_MPNG_STRIDE} = 0
"""


def q_video_mjpeg_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container metadata, oracled (r12, verdict item #4 —
    shrink the entropy-coded-video wall to inter-frame codecs): each
    document becomes a genuine MJPEG AVI — ``1 + id % 6`` real
    baseline-JPEG frames (the repo's own ITU-T T.81 encoder) at a
    per-doc ``2 + id % 5``-block width, boxed in a spec-shaped RIFF
    AVI (hdrl avih/strh/strf, movi 00dc chunks, idx1) by
    ``operators/avicodec.build_avi_mjpeg`` — then a second
    shuffle-free mapInPandas stage walks the container AND probes
    every frame's JPEG SOF marker (``parse_avi_mjpeg``): counted vs
    declared frame counts, bitstream-read dimensions, avih-clock
    duration. No pixel decode — the video member of the
    metadata-route family (mp3_meta / jpeg_meta / wav_meta). Every
    field is recomputed per row by DuckDB from doc_id + byte-count
    arithmetic. Reference ground: op 45 multimodal generalization
    (reference collection_view.py:425-435)."""
    from aiotcvectordb_spark.operators import avicodec

    avi = payload_table(
        spark, sf_dir, "mjpeg", 1,
        lambda: avicodec.with_mjpeg_payload(
            ensure_min_partitions(load(spark, sf_dir, "documents"))
        ),
    )
    return avicodec.mjpeg_meta(avi)


ORACLE_VIDEO_MJPEG_META = """
WITH n AS (
  SELECT doc_id, greatest(octet_length(encode(text)), 1) AS nb
  FROM documents
)
SELECT doc_id,
       CAST(1 + doc_id % 6 AS INTEGER) AS n_frames,
       CAST(1 + doc_id % 6 AS INTEGER) AS total_frames,
       CAST(1 + doc_id % 6 AS INTEGER) AS frames_probed,
       CAST((2 + doc_id % 5) * 8 AS INTEGER) AS width,
       CAST(8 * ceil(nb / CAST(2 + doc_id % 5 AS DOUBLE)) AS INTEGER)
         AS height,
       CAST((1 + doc_id % 6) * 100 AS BIGINT) AS duration_ms
FROM n
"""


def q_video_mjpeg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-DECODE MJPEG frame walk, oracled with ZERO float risk
    (r12): every '00dc' chunk of the real AVI payload is decoded by
    the repo's JPEG decoder (Huffman + dequant + IDCT) and emits the
    INTEGER pixel sum. The fixture's constant blocks make the Annex-K
    quantizer exact, and rolling the byte sequence per frame preserves
    the byte MULTISET, so every frame's px_sum is closed-form:
    ``64 * (sum(2*(b%128)) + 128 * pad_bytes)`` — DuckDB recomputes it
    from the text's UTF-8 bytes and the driver hash covers the whole
    entropy-decode + IDCT pipeline across frames. One doc → N frame
    rows; payloads never leave their producing partition."""
    from aiotcvectordb_spark.operators import avicodec

    avi = payload_table(
        spark, sf_dir, "mjpeg", 1,
        lambda: avicodec.with_mjpeg_payload(
            ensure_min_partitions(load(spark, sf_dir, "documents"))
        ),
    )
    return avicodec.mjpeg_frames(avi).select(
        "doc_id", "frame_idx", "f_width", "f_height", "px_sum"
    )


# UTF-8 byte expansion CTE (the ORACLE_AUDIO_PROBE pattern) so the
# byte-multiset pixel sum is exact for any unicode text; empty text is
# the encoder's single value-64 byte via the LEFT JOIN fallback.
ORACLE_VIDEO_MJPEG_FRAMES = """
WITH ch AS (
  SELECT doc_id, ascii(c) AS cp
  FROM (
    SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS c
    FROM documents WHERE length(text) > 0
  )
),
b AS (
  SELECT doc_id, unnest(
    CASE WHEN cp < 128 THEN [cp]
         WHEN cp < 2048 THEN [192 + cp // 64, 128 + cp % 64]
         WHEN cp < 65536 THEN [224 + cp // 4096, 128 + (cp // 64) % 64,
                               128 + cp % 64]
         ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64,
               128 + (cp // 64) % 64, 128 + cp % 64] END) AS byte
  FROM ch
),
agg AS (
  SELECT doc_id, count(*) AS nb, sum(2 * (byte % 128)) AS sb
  FROM b GROUP BY doc_id
),
geo AS (
  SELECT d.doc_id,
         2 + d.doc_id % 5 AS wide,
         1 + d.doc_id % 6 AS nf,
         coalesce(agg.nb, 1) AS nb,
         coalesce(agg.sb, 128) AS sb
  FROM documents d LEFT JOIN agg USING (doc_id)
),
g2 AS (
  SELECT doc_id, wide, nf, nb, sb,
         CAST(ceil(nb / CAST(wide AS DOUBLE)) AS BIGINT) AS nrows
  FROM geo
)
SELECT doc_id,
       CAST(j AS INTEGER) AS frame_idx,
       CAST(wide * 8 AS INTEGER) AS f_width,
       CAST(nrows * 8 AS INTEGER) AS f_height,
       CAST(64 * (sb + 128 * (nrows * wide - nb)) AS BIGINT) AS px_sum
FROM (SELECT *, unnest(range(6)) AS j FROM g2)
WHERE j < nf
"""


def q_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL animated-GIF codec round trip, oracle-checked (r6): each
    document's UTF-8 bytes become indexed 16x16 frames (one per 256
    bytes, capped at 6; first frame interlaced) written by
    ``operators/gifcodec.build_gif`` — genuine LSB-first LZW, palette,
    GIF89a block structure — then a second shuffle-free mapInPandas
    stage runs the full decoder (LZW, deinterlace, compositing) and
    emits per-frame geometry. Frame count and dimensions are pure
    functions of the byte length, so DuckDB predicts every row: the
    entropy-coded video path that was a NotImplementedError until r6
    is now driver-hash-checked."""
    from aiotcvectordb_spark.operators import gifcodec

    gifs = payload_table(
        spark, sf_dir, "gif", 1,
        lambda: gifcodec.with_gif_payload(
            ensure_min_partitions(load(spark, sf_dir, "documents")).filter(
                F.length("text") > 0
            )
        ),
    )
    return gifcodec.gif_frames(gifs).select(
        "doc_id", "frame_no", "f_width", "f_height"
    )


ORACLE_GIF_FRAMES = """
WITH f AS (
  SELECT doc_id, octet_length(encode(text)) AS L, unnest(range(6)) AS j
  FROM documents WHERE length(text) > 0
)
SELECT doc_id,
       CAST(j AS INTEGER) AS frame_no,
       16 AS f_width,
       16 AS f_height
FROM f
WHERE j < least(CAST(ceil(L / 256.0) AS BIGINT), 6)
"""


def q_ann_bq_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization ANN — the 1-bit member of the quantized
    index family (IVF_PQ = 8x codes + ADC, IVF_SQ8 = scalar int8, BQ =
    sign bits): vectors sign-packed to dim/8 bytes, ranked by the
    codegen Hamming popcount (32x less vector I/O than float32 — at
    100 TB the scan, not the math, is the bottleneck), oversampled 5x,
    then exact cosine rescore of the survivors so the top-k is
    float-accurate. ORACLED as of r9: unlike the TRAINED quantizers
    (PQ/IVF codebooks from iterative fits), every BQ stage is closed-
    form — sign-bit packing, integral Hamming popcount with (distance
    ASC, vec_id ASC) candidate order, 5x oversample, guarded-cosine
    rescore — so DuckDB reproduces the whole plan bit-for-bit
    (bit_count/xor on the same byte construction) and the driver hash
    covers the quantized-index family's one SQL-expressible member.
    Recall@10 vs exact FLAT additionally asserted in tests/test_bq.py."""
    from aiotcvectordb_spark.functions.vector import metric_score_fixed

    emb = load(spark, sf_dir, "embeddings")
    bin_df = emb.select(
        "vec_id", F.expr(_binarize_spark_expr("embedding")).alias("bvec")
    )
    qs = [qvec(1.0), qvec(-1.0)]
    cand = knn.knn_search(
        bin_df,
        [_binarize_py(v) for v in qs],
        vector_col="bvec",
        id_col="vec_id",
        metric="HAMMING",
        limit=50,
    ).select("query_idx", "vec_id")
    qdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(qs)], "query_idx int, __qv array<double>"
    )
    joined = (
        emb.select("vec_id", "embedding")
        .join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(qdf), "query_idx")
        .withColumn(
            "score",
            F.round(
                metric_score_fixed("COSINE", "embedding", "__qv", DIM),
                ROUND_DIGITS,
            ),
        )
    )
    w = Window.partitionBy("query_idx").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter("rank <= 10")
        .select("query_idx", "vec_id", "score", "rank")
    )


ORACLE_ANN_BQ_COSINE = f"""
WITH bqueries(query_idx, qb) AS (VALUES {", ".join(
    f"({i}, [{', '.join(str(int(b)) for b in v)}]::INT[])"
    for i, v in enumerate(
        [_binarize_py(qvec(1.0)), _binarize_py(qvec(-1.0))]
    )
)}),
{_sql_queries_cte([qvec(1.0), qvec(-1.0)])},
ham AS (
  SELECT q.query_idx, e.vec_id,
         {" + ".join(
             f"bit_count(xor({_bin_byte_sql(j)}, q.qb[{j + 1}]))"
             for j in range(_N_BIN_BYTES)
         )} AS hd
  FROM embeddings e CROSS JOIN bqueries q
),
cand AS (
  SELECT query_idx, vec_id FROM ham
  QUALIFY row_number() OVER (PARTITION BY query_idx
          ORDER BY hd ASC, vec_id) <= 50
),
rescored AS (
  SELECT q.query_idx, e.vec_id, round({_COS_SQL}, {ROUND_DIGITS}) AS score
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN queries q ON q.query_idx = c.query_idx
)
SELECT query_idx, vec_id, score,
       CAST(row_number() OVER (PARTITION BY query_idx
            ORDER BY score DESC, vec_id) AS INT) AS rank
FROM rescored
QUALIFY rank <= 10
ORDER BY query_idx, rank
"""


def q_ann_sq8_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantization ANN — the int8 member of the quantized index
    family (reference index type IVF_SQ8, stub.py; BQ = sign bits, PQ =
    trained codebooks): per-dimension [min, max] over the collection
    define a uniform 256-level grid, candidates are ranked by the
    dequantized-grid approximate cosine (a pure Catalyst expression —
    whole-stage codegen, no Python, 4x less vector I/O than float32
    when the store serves codes), oversampled 5x, then exact-rescored
    so the top-k is float-accurate. ORACLED (r9): like BQ and unlike
    the TRAINED quantizers, every SQ8 stage is closed-form — the grid
    is two order-free min/max aggregates, quantize/dequantize is
    ``lo + round((x-lo)*255/span)*span/255`` with the span<=0 guard,
    and both engines rank on the score rounded to ROUND_DIGITS
    with ascending-id ties — so DuckDB reproduces the whole
    oversample-and-rescore plan. Grid training (the one non-query
    stage) is a single 1-row 2x64-aggregate collect, the same bounded
    shape operators/ann.py:_build_sq8_state uses. Recall@10 vs exact
    FLAT additionally asserted in tests/test_bq.py."""
    from aiotcvectordb_spark.functions.vector import metric_score_fixed
    from aiotcvectordb_spark.operators.ann import sq8_dequant_score_expr

    emb = load(spark, sf_dir, "embeddings")
    aggs = []
    for i in range(DIM):
        x = F.expr(f"cast(embedding[{i}] as double)")
        aggs += [F.min(x).alias(f"lo{i}"), F.max(x).alias(f"hi{i}")]
    row = emb.agg(*aggs).first()  # bounded: ONE row of 2 x dim doubles
    lo = [float(row[f"lo{i}"]) for i in range(DIM)]
    hi = [float(row[f"hi{i}"]) for i in range(DIM)]
    qs = [qvec(1.0), qvec(-1.0)]
    per_q = []
    for qi, v in enumerate(qs):
        # per-query TakeOrdered over a map-only scan (the same shape as
        # operators/ann.ivf_sq8_search, minus the cell prune): the
        # approximate scorer fuses into the scan projection
        approx = F.round(
            sq8_dequant_score_expr("embedding", v, lo, hi, "COSINE"),
            ROUND_DIGITS,
        )
        per_q.append(
            emb.select(
                F.lit(qi).alias("query_idx"), "vec_id", approx.alias("__a")
            )
            .orderBy(F.col("__a").desc(), F.col("vec_id").asc())
            .limit(50)
            .select("query_idx", "vec_id")
        )
    cand = per_q[0]
    for nxt in per_q[1:]:
        cand = cand.unionByName(nxt)
    qdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(qs)], "query_idx int, __qv array<double>"
    )
    joined = (
        emb.select("vec_id", "embedding")
        .join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(qdf), "query_idx")
        .withColumn(
            "score",
            F.round(
                metric_score_fixed("COSINE", "embedding", "__qv", DIM),
                ROUND_DIGITS,
            ),
        )
    )
    w = Window.partitionBy("query_idx").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter("rank <= 10")
        .select("query_idx", "vec_id", "score", "rank")
    )


def _sq8_queries_cte() -> str:
    """queries(query_idx, qv, qn) VALUES rows with the SAME
    python-computed query norm the Spark expression inlines
    (sq8_dequant_score_expr's ``qn = sum(q²)**0.5 or 1.0``)."""
    rows = []
    for i, v in enumerate([qvec(1.0), qvec(-1.0)]):
        qn = sum(float(x) * float(x) for x in v) ** 0.5 or 1.0
        rows.append(f"({i}, {_sql_vec(v)}, {qn!r})")
    return f"queries(query_idx, qv, qn) AS (VALUES {', '.join(rows)})"


ORACLE_ANN_SQ8_COSINE = f"""
WITH {_sq8_queries_cte()},
flat AS (
  SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
),
stats AS (SELECT dim, min(v) AS lo, max(v) AS hi FROM flat GROUP BY dim),
deq AS (
  SELECT f.vec_id, f.dim,
         CASE WHEN s.hi - s.lo <= 0 THEN s.lo
              ELSE s.lo + round((f.v - s.lo) * 255.0 / (s.hi - s.lo))
                   * (s.hi - s.lo) / 255.0
         END AS dv
  FROM flat f JOIN stats s USING (dim)
),
approx AS (
  SELECT q.query_idx, d.vec_id,
         round(sum(d.dv * q.qv[d.dim]) /
               (greatest(sqrt(sum(d.dv * d.dv)), 1e-12) * q.qn),
               {ROUND_DIGITS}) AS a
  FROM deq d CROSS JOIN queries q
  GROUP BY q.query_idx, q.qn, d.vec_id
),
cand AS (
  SELECT query_idx, vec_id FROM approx
  QUALIFY row_number() OVER (PARTITION BY query_idx
          ORDER BY a DESC, vec_id) <= 50
),
rescored AS (
  SELECT c.query_idx, e.vec_id, round({_COS_SQL}, {ROUND_DIGITS}) AS score
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN queries q ON q.query_idx = c.query_idx
)
SELECT query_idx, vec_id, score,
       CAST(row_number() OVER (PARTITION BY query_idx
            ORDER BY score DESC, vec_id) AS INT) AS rank
FROM rescored
QUALIFY rank <= 10
ORDER BY query_idx, rank
"""


# --------------------------------------------------------------------------
# IVF with driver-fixed centroids — the oracled cell-prune plan
# --------------------------------------------------------------------------

_IVF_FIXED_NLIST = 8
_IVF_FIXED_NPROBE = 3
_IVF_FIXED_CENTROIDS = [qvec(30.0 + i) for i in range(_IVF_FIXED_NLIST)]


def q_ann_ivf_cosine_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF partial-probe ANN with FIXED centroids, ORACLED (r10) — the
    promotion the trained ``ann_ivf_cosine`` entry could never get: a
    KMeans fit is iterative and not SQL-expressible, but with
    driver-fixed centroid literals (the ``semantic_dedup`` precedent)
    every IVF stage is closed-form, so DuckDB reproduces the WHOLE
    assign → probe-select → cell-prune → exact-rescore plan and the
    driver hash covers the cell prune itself — including rows that a
    partial probe (nprobe=3 of nlist=8) legitimately drops. Reference
    semantics: index type IVF with the nprobe search knob
    (reference stub.py:609-612, ``nprobe in [1, nlist]``).

    Determinism rules shared with the semdedup/sq8 family: cell
    assignment is argmax COSINE rounded to ROUND_DIGITS with
    lowest-cell ties; the per-query probe set is the top-nprobe cells
    by rounded query-centroid cosine (cell-asc ties) — computed by the
    ENGINE on both sides (a 16-row broadcast frame in Spark, a VALUES
    CTE in DuckDB), never in driver Python, so there is no third
    float implementation to diverge.

    Scale shape: the assignment (one broadcast nested-loop of K
    centroid literals against the scan + a vec_id-keyed window) is the
    index BUILD — at serving scale it is computed once by
    rebuild_index and stored cell-partitioned (operators/ann.py); the
    query-time work is only the probe-set join (broadcast, Q x nprobe
    rows) and the exact rescore inside probed cells (~nprobe/nlist of
    the corpus), ranked by the same bounded per-query window every
    exact-search entry uses. Trained-centroid IVF stays recall-tested
    (tests/test_ann.py); this entry pins the machinery."""
    from aiotcvectordb_spark.functions.vector import cosine_score_fixed

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = spark.createDataFrame(
        list(enumerate(_IVF_FIXED_CENTROIDS)), "cell int, cvec array<double>"
    )
    assigned = _assign_fixed_cells(emb, cents).select(
        "vec_id", "embedding", "cell"
    )
    qdf = spark.createDataFrame(
        list(enumerate(FLAGSHIP_VECTORS)), "query_idx int, qv array<double>"
    )
    w_probe = Window.partitionBy("query_idx").orderBy(
        F.col("qcos").desc(), F.col("cell").asc()
    )
    qcells = (
        qdf.crossJoin(F.broadcast(cents))
        .select(
            "query_idx",
            "qv",
            "cell",
            F.round(
                cosine_score_fixed("qv", "cvec", DIM), ROUND_DIGITS
            ).alias("qcos"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= _IVF_FIXED_NPROBE)
        .select("query_idx", "qv", "cell")
    )
    rescored = assigned.join(F.broadcast(qcells), "cell").withColumn(
        "score",
        F.round(cosine_score_fixed("embedding", "qv", DIM), ROUND_DIGITS),
    )
    w = Window.partitionBy("query_idx").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter("rank <= 10")
        .select("query_idx", "vec_id", "cell", "score", "rank")
    )


def _ivf_fixed_cents_sql() -> str:
    rows = ", ".join(
        f"({i}, {_sql_vec(v)})" for i, v in enumerate(_IVF_FIXED_CENTROIDS)
    )
    return f"cents(cell, cvec) AS (VALUES {rows})"


def _duck_cos(a: str, b: str) -> str:
    return (
        f"round(COALESCE(list_dot_product({a}, {b}) / "
        f"NULLIF(sqrt(list_dot_product({a}, {a})) * "
        f"sqrt(list_dot_product({b}, {b})), 0), 0.0), {ROUND_DIGITS})"
    )


ORACLE_ANN_IVF_COSINE_FIXED = f"""
WITH {_ivf_fixed_cents_sql()},
{_sql_queries_cte(FLAGSHIP_VECTORS)},
scored AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb, c.cell,
         {_duck_cos("CAST(e.embedding AS DOUBLE[])", "c.cvec")} AS ccos
  FROM embeddings e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id, emb, cell FROM scored
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell) = 1
),
qcells AS (
  SELECT query_idx, qv, cell FROM (
    SELECT q.query_idx, q.qv, c.cell,
           {_duck_cos("q.qv", "c.cvec")} AS qcos
    FROM queries q CROSS JOIN cents c
  ) QUALIFY row_number() OVER (PARTITION BY query_idx
            ORDER BY qcos DESC, cell) <= {_IVF_FIXED_NPROBE}
),
rescored AS (
  SELECT qc.query_idx, a.vec_id, a.cell,
         {_duck_cos("a.emb", "qc.qv")} AS score
  FROM assigned a JOIN qcells qc USING (cell)
)
SELECT query_idx, vec_id, cell, score,
       CAST(row_number() OVER (PARTITION BY query_idx
            ORDER BY score DESC, vec_id) AS INT) AS rank
FROM rescored
QUALIFY rank <= 10
ORDER BY query_idx, rank
"""


# --------------------------------------------------------------------------
# Per-label embedding centroids (cluster summary statistics)
# --------------------------------------------------------------------------


_PQ_FIXED_OVERSAMPLE = 50


def q_ann_pq_cosine_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ partial-path ANN with FROZEN codebooks, ORACLED (r11) — the
    ``ann_ivf_cosine_fixed`` promotion applied to product quantization,
    closing the last quantized-index family whose PARTIAL path had no
    hash witness (BQ r9, SQ8 r9, IVF r10; PQ's full-rescore exact-limit
    proof ``ann_pq_fullrescore`` shares the flat oracle, but the
    approximate rank itself was only recall-tested). With the trained
    codebooks pinned as literals (``operators/pq_frozen.py``: m=4
    subspaces x 16 codes x 16 dims — Jegou et al. 2011 geometry) every
    PQ stage is closed-form, so DuckDB reproduces the WHOLE
    unit-normalize → nearest-code ENCODE → per-query ADC LUT →
    approximate rank → bounded oversample (50) → exact-rescore plan,
    and the driver hash covers rows the ADC rank legitimately drops.

    Determinism rules (the fixed-IVF family's): every squared-L2 is
    the left-associated unrolled difference chain in Spark and
    list_dot_product over the zipped difference in DuckDB — proven
    bit-identical accumulation orders (functions/vector.py
    ``_dot_expr_unrolled`` note) — rounded to ROUND_DIGITS before any
    comparison; code assignment ties break lowest-code (a rounded
    struct array_min in Spark, (d2, code) row_number in DuckDB); ADC
    is the left-assoc sum of the four rounded LUT entries; ranks tie
    vec_id-asc. LUTs are computed by the ENGINE on both sides from the
    same literals — no third float implementation.

    Scale shape: ENCODE is the index build (map-only scan projection,
    stored as m bytes/vector at serving scale — operators/pq.py); the
    query-time work is the broadcast of Q x (4x16) LUTs, a map-side
    ADC sum over code bytes, the bounded per-query rank window
    (local_topk at real scale), and an exact rescore of only the
    oversample survivors. Trained-codebook PQ stays recall-tested
    (tests/test_pq.py); this entry pins the machinery."""
    from aiotcvectordb_spark.functions.vector import cosine_score_fixed
    from aiotcvectordb_spark.operators.pq_frozen import (
        FROZEN_PQ_CODEBOOKS,
        FROZEN_PQ_DSUB,
        FROZEN_PQ_M,
    )

    def _normalized(df, vcol: str):
        df = df.withColumn(
            "__ed", F.expr(f"transform({vcol}, x -> cast(x as double))")
        )
        df = df.withColumn(
            "__nrm",
            F.expr(
                "sqrt(aggregate(zip_with(__ed, __ed, (x, y) -> x * y), "
                "0D, (a, v) -> a + v))"
            ),
        )
        return df.withColumn(
            "__ne",
            F.expr(
                "transform(__ed, x -> x / (CASE WHEN __nrm = 0.0D "
                "THEN 1.0D ELSE __nrm END))"
            ),
        )

    def _d2_expr(j: int, cent: list[float]) -> str:
        # HOF fold, not an unrolled chain: the zip_with/aggregate left
        # fold accumulates in the same order as the unrolled chain and
        # DuckDB's list_dot_product (the _dot_expr_unrolled note), but
        # keeps the expression tree ~2x smaller — the 64 per-code
        # distances made plan analysis + codegen the dominant cost
        # (measured 7-8 s warm unrolled vs ~3.6 s HOF; identical
        # values verified at sf0.01)
        lits = ", ".join(f"{v:.17e}" for v in cent)
        return (
            f"round(aggregate(zip_with(slice(__ne, "
            f"{j * FROZEN_PQ_DSUB + 1}, {FROZEN_PQ_DSUB}), array({lits}), "
            f"(x, y) -> (x - y) * (x - y)), 0D, (a, v) -> a + v), "
            f"{ROUND_DIGITS})"
        )

    emb = _normalized(
        load(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        "embedding",
    )
    for j, book in enumerate(FROZEN_PQ_CODEBOOKS):
        structs = ", ".join(
            f"struct({_d2_expr(j, cent)} AS d2, "
            f"{c} AS code)"
            for c, cent in enumerate(book)
        )
        emb = emb.withColumn(f"__c{j}", F.expr(f"array_min(array({structs})).code"))
    codes = emb.select(
        "vec_id", "embedding",
        *[F.col(f"__c{j}") for j in range(FROZEN_PQ_M)],
    )

    qdf = _normalized(
        spark.createDataFrame(
            list(enumerate(FLAGSHIP_VECTORS)), "query_idx int, qv array<double>"
        ),
        "qv",
    )
    luts = ", ".join(
        "array("
        + ", ".join(
            _d2_expr(j, cent) for cent in book
        )
        + ")"
        for j, book in enumerate(FROZEN_PQ_CODEBOOKS)
    )
    qdf = qdf.select(
        "query_idx", "qv", F.expr(f"array({luts})").alias("__lut")
    )

    adc_sum = " + ".join(f"__lut[{j}][__c{j}]" for j in range(FROZEN_PQ_M))
    w_adc = Window.partitionBy("query_idx").orderBy(
        F.col("adc").asc(), F.col("vec_id").asc()
    )
    cand = (
        codes.crossJoin(F.broadcast(qdf))
        .withColumn("adc", F.round(F.expr(adc_sum), ROUND_DIGITS))
        .withColumn("arn", F.row_number().over(w_adc))
        .filter(F.col("arn") <= _PQ_FIXED_OVERSAMPLE)
    )
    w = Window.partitionBy("query_idx").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn(
            "score",
            F.round(cosine_score_fixed("embedding", "qv", DIM), ROUND_DIGITS),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter("rank <= 10")
        .select("query_idx", "vec_id", "adc", "score", "rank")
    )


def _pq_fixed_oracle() -> str:
    from aiotcvectordb_spark.operators.pq_frozen import (
        FROZEN_PQ_CODEBOOKS,
        FROZEN_PQ_DSUB,
        FROZEN_PQ_M,
    )

    cb_rows = ", ".join(
        f"({j}, {c}, {_sql_vec(cent)})"
        for j, book in enumerate(FROZEN_PQ_CODEBOOKS)
        for c, cent in enumerate(book)
    )
    diff = (
        "list_transform(list_zip(list_slice({ne}, c.sub * {d} + 1, "
        "c.sub * {d} + {d}), c.cvec), p -> p[1] - p[2])"
    )
    d2 = (
        f"round(list_dot_product({diff}, {diff}), {{r}})".replace(
            "{d}", str(FROZEN_PQ_DSUB)
        )
    )
    code_cols = ", ".join(
        f"max(CASE WHEN sub = {j} THEN code END) AS c{j}"
        for j in range(FROZEN_PQ_M)
    )
    lut_joins = "\n  ".join(
        f"JOIN lut l{j} ON l{j}.query_idx = q.query_idx AND l{j}.sub = {j} "
        f"AND l{j}.code = cs.c{j}"
        for j in range(FROZEN_PQ_M)
    )
    adc_sum = " + ".join(f"l{j}.l" for j in range(FROZEN_PQ_M))
    norm = (
        "list_transform({v}, x -> x / (CASE WHEN "
        "sqrt(list_dot_product({v}, {v})) = 0 THEN 1 ELSE "
        "sqrt(list_dot_product({v}, {v})) END))"
    )
    return f"""
WITH cb(sub, code, cvec) AS (VALUES {cb_rows}),
{_sql_queries_cte(FLAGSHIP_VECTORS)},
nemb AS (
  SELECT vec_id,
         {norm.format(v="CAST(embedding AS DOUBLE[])")} AS ne
  FROM embeddings
),
enc0 AS (
  SELECT n.vec_id, c.sub, c.code,
         {d2.format(ne="n.ne", r=ROUND_DIGITS)} AS d2
  FROM nemb n CROSS JOIN cb c
),
enc AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY d2 ASC, code ASC) AS rn
    FROM enc0
  ) WHERE rn = 1
),
codes AS (
  SELECT vec_id, {code_cols} FROM enc GROUP BY vec_id
),
nq AS (
  SELECT query_idx, qv, {norm.format(v="qv")} AS nq FROM queries
),
lut AS (
  SELECT q.query_idx, c.sub, c.code,
         {d2.format(ne="q.nq", r=ROUND_DIGITS)} AS l
  FROM nq q CROSS JOIN cb c
),
adc AS (
  SELECT q.query_idx, cs.vec_id, round({adc_sum}, {ROUND_DIGITS}) AS adc
  FROM codes cs CROSS JOIN (SELECT query_idx FROM queries) q
  {lut_joins}
),
cand AS (
  SELECT query_idx, vec_id, adc FROM (
    SELECT adc.*, row_number() OVER (PARTITION BY query_idx
                                     ORDER BY adc ASC, vec_id ASC) AS arn
    FROM adc
  ) WHERE arn <= {_PQ_FIXED_OVERSAMPLE}
),
rescored AS (
  SELECT c.query_idx, c.vec_id, c.adc,
         round({_COS_SQL}, {ROUND_DIGITS}) AS score
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN queries q ON q.query_idx = c.query_idx
)
SELECT query_idx, vec_id, adc, score, CAST(rank AS INT) AS rank FROM (
  SELECT r.*, row_number() OVER (PARTITION BY query_idx
                                 ORDER BY score DESC, vec_id ASC) AS rank
  FROM rescored r
) WHERE rank <= 10
"""


ORACLE_ANN_PQ_COSINE_FIXED = _pq_fixed_oracle()


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid, as (label, dim, c) rows. The
    scale-safe plan is posexplode + groupBy(label, dim): the shuffle
    carries narrow (label, dim, v) rows WITH map-side partial
    aggregation (each map task pre-reduces to labels x 64 rows), unlike
    a collect_list-and-fold shape whose per-group state is O(group
    size). dim is 1-based to match SQL's generate_subscripts."""
    emb = ensure_min_partitions(load(spark, sf_dir, "embeddings"))
    return (
        emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim0", "v"))
        .groupBy("label", (F.col("dim0") + 1).cast("long").alias("dim"))
        .agg(F.round(F.sum("v") / F.count("*"), ROUND_DIGITS).alias("c"))
    )


ORACLE_LABEL_CENTROIDS = """
WITH flat AS (
  SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
)
SELECT label, CAST(dim AS BIGINT) AS dim, round(sum(v) / count(*), 6) AS c
FROM flat GROUP BY label, dim
"""


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier mining: the 5 vectors FARTHEST from
    their own label's centroid — the data-cleaning pass that surfaces
    mislabeled or junk rows before training. Centroids come from the
    same narrow posexplode aggregate as `label_centroids` (rounded to 6
    so both engines rank from identical inputs), re-packed to arrays
    and broadcast onto the scan; the distance fold fuses into the
    projection and the per-label top-5 is one bounded window."""
    emb = ensure_min_partitions(load(spark, sf_dir, "embeddings"))
    cent = (
        emb.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("dim0", "v"),
        )
        .groupBy("label", "dim0")
        .agg(F.round(F.sum("v") / F.count("*"), ROUND_DIGITS).alias("c"))
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(dim0, c))), x -> x.c)"
            ).alias("centroid")
        )
    )
    dist = F.round(
        F.sqrt(
            F.expr(
                "aggregate(zip_with(cast(embedding as array<double>), centroid, "
                "(x, c) -> (x - c) * (x - c)), cast(0.0 as double), (a, b) -> a + b)"
            )
        ),
        ROUND_DIGITS,
    )
    w = Window.partitionBy("label").orderBy(
        F.col("dist").desc(), F.col("vec_id").asc()
    )
    return (
        emb.join(F.broadcast(cent), "label")
        .withColumn("dist", dist)
        .withColumn("out_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("out_rank") <= 5)
        .select("label", "vec_id", "dist", "out_rank")
    )


ORACLE_EMBEDDING_OUTLIERS = """
WITH flat AS (
  SELECT vec_id, label, unnest(CAST(embedding AS DOUBLE[])) AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
),
cent AS (
  SELECT label, dim, round(sum(v) / count(*), 6) AS c
  FROM flat GROUP BY label, dim
),
dists AS (
  SELECT f.vec_id, f.label,
         round(sqrt(sum((f.v - c.c) * (f.v - c.c))), 6) AS dist
  FROM flat f JOIN cent c ON f.label = c.label AND f.dim = c.dim
  GROUP BY f.vec_id, f.label
)
SELECT label, vec_id, dist,
       CAST(row_number() OVER (PARTITION BY label ORDER BY dist DESC, vec_id) AS INTEGER) AS out_rank
FROM dists QUALIFY out_rank <= 5
"""


def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling distinct active users per day (the WAU curve).
    The scale-safe shape for ROLLING DISTINCT: dedupe to (day, user)
    first, EXPLODE each pair into the 7 window-end days it supports,
    then one count-distinct aggregate — linear in events, one shuffle,
    no range join and no per-day window state. Only days with events
    appear (the gap-fill op handles empty days)."""
    ev = load(spark, sf_dir, "events")
    du = (
        ev.select(
            F.expr("ts div 86400000000000").alias("day"), "user_id"
        ).distinct()
    )
    return (
        du.select(
            F.explode(
                F.expr("sequence(day, day + 6)")
            ).alias("win_day"),
            "user_id",
        )
        .groupBy("win_day")
        .agg(F.countDistinct("user_id").alias("wau"))
        .join(
            du.select(F.col("day").alias("win_day")).distinct(), "win_day"
        )
    )


ORACLE_ROLLING_ACTIVE_USERS = """
WITH du AS (
  SELECT DISTINCT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day, user_id
  FROM events
),
expanded AS (
  SELECT du.day + k AS win_day, du.user_id
  FROM du CROSS JOIN (SELECT unnest(range(7)) AS k)
)
SELECT e.win_day, count(DISTINCT e.user_id) AS wau
FROM expanded e
WHERE e.win_day IN (SELECT day FROM du)
GROUP BY e.win_day
"""


# --------------------------------------------------------------------------
# Last-touch attribution (event analytics: which touch type preceded
# each conversion)
# --------------------------------------------------------------------------


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: for every purchase, the most
    recent preceding click/view by the same user (carry-forward
    last_value IGNORE NULLS window — the same one-shuffle shape as the
    as-of join, no range join), then conversions + value per touch
    type ('none' = purchase with no prior touch)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    touch = F.last(
        F.when(F.col("event_type").isin("click", "view"), F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("none")).alias("touch_type"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("value"), ROUND_DIGITS).alias("total_value"),
        )
    )


ORACLE_ATTRIBUTION_LAST_TOUCH = """
WITH t AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS touch
  FROM events
)
SELECT coalesce(touch, 'none') AS touch_type,
       count(*) AS n_purchases,
       round(sum(value), 6) AS total_value
FROM t WHERE event_type = 'purchase'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Equi-depth histogram (quantile-binned — the histogram an optimizer's
# column statistics actually use, vs the fixed-width price_histogram)
# --------------------------------------------------------------------------


def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile histogram of order totals. Exact decile edges
    (percentile_disc semantics: the value at ascending rank ⌈p·n⌉,
    an actually-occurring value, so cross-engine exact with no
    interpolation float drift) from ONE distributed sort instead of
    nine sort-based percentile_disc aggregates (the r02 shape — each
    kept its own full copy of the column in the aggregation buffer):

    1. range-partition + sort-within-partitions on the value (the one
       ordered pass; Spark's sampling range partitioner keeps the
       partitions balanced),
    2. per-partition counts → exclusive prefix offsets (≤P rows of
       METADATA collected driver-side — same class as collecting
       KMeans cluster centers, not a data collect),
    3. each partition emits only the ranks it owns (mapInPandas with a
       running in-partition counter; output is exactly 9 rows),
    4. bin assignment fuses the 9-edge literal array into the scan
       projection; the final aggregate shuffles 10 rows.

    Every stage is linear; nothing driver-side ever exceeds P+9 rows."""
    import math

    orders = load(spark, sf_dir, "orders")
    prices = orders.select("o_totalprice")
    n_parts = 32
    parts = (
        prices.repartitionByRange(n_parts, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    try:
        pc = {
            r["pid"]: r["cnt"]
            for r in parts.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
        }
        n = sum(pc.values())
        offmap = {}
        acc = 0
        for pid in sorted(pc):
            offmap[pid] = acc
            acc += pc[pid]
        # percentile_disc(p) = value at 1-indexed ascending rank ⌈p·n⌉
        targets = sorted(
            (max(1, math.ceil(p / 10 * n)), p) for p in range(1, 10)
        )

        def pick(batches):
            import pandas as pd

            seen = 0
            for pdf in batches:
                if pdf.empty:
                    continue
                pid = int(pdf["pid"].iloc[0])
                start = offmap[pid] + seen  # global rank of row 0 is start+1
                seen += len(pdf)
                hits = [
                    (p, float(pdf["o_totalprice"].iloc[rank - start - 1]))
                    for rank, p in targets
                    if start < rank <= start + len(pdf)
                ]
                if hits:
                    yield pd.DataFrame(hits, columns=["p", "edge"])

        edges = [
            r["edge"]
            for r in parts.mapInPandas(pick, schema="p int, edge double")
            .orderBy("p")
            .collect()
        ]
    finally:
        parts.unpersist()
    edge_arr = F.array(*[F.lit(float(e)) for e in edges])
    return (
        orders.select(
            F.size(F.filter(edge_arr, lambda e: F.col("o_totalprice") > e))
            .cast("int")
            .alias("bin"),
            "o_totalprice",
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), ROUND_DIGITS).alias("lo"),
            F.round(F.max("o_totalprice"), ROUND_DIGITS).alias("hi"),
        )
    )


ORACLE_EQUIDEPTH_HISTOGRAM = f"""
WITH e AS (
  SELECT [{", ".join(f"quantile_disc(o_totalprice, {p / 10})" for p in range(1, 10))}] AS edges
  FROM orders
)
SELECT CAST(len(list_filter(e.edges, x -> o.o_totalprice > x)) AS INTEGER) AS bin,
       count(*) AS n_orders,
       round(min(o.o_totalprice), 6) AS lo,
       round(max(o.o_totalprice), 6) AS hi
FROM orders o CROSS JOIN e
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Per-language top terms (corpus vocabulary report)
# --------------------------------------------------------------------------


def q_lang_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 tokens per language: token counts partially aggregate
    map-side before the (lang, token) shuffle, then a two-phase salted
    top-k (partitioning.salted_group_topk) takes the per-lang top-10.

    r5: the plain ``Window.partitionBy(lang)`` sorted each language's
    ENTIRE vocabulary in one task — the per-language candidate pool
    grows with the corpus (10x ratio 2.17), exactly the hot-key shape
    the salted form exists for. Phase 1 ranks within (lang, salt) and
    keeps 10 per slice, so the final window sees ≤ salt×10 rows per
    language regardless of vocab size — identical output (any global
    top-10 row is top-10 of its slice)."""
    from aiotcvectordb_spark import partitioning

    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    counts = (
        df.select("lang", F.explode(sparse_fn.bm25_tokens_col("text")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("n"))
    )
    ranked = partitioning.salted_group_topk(
        counts,
        ["lang"],
        [F.desc("n"), F.asc("token")],
        10,
        rank_col="term_rank",
    )
    return ranked.withColumn("term_rank", F.col("term_rank").cast("int"))


ORACLE_LANG_TOP_TERMS = f"""
WITH tok AS (
  SELECT lang, unnest({_BM25_TOKS_SQL}) AS token FROM documents
),
counts AS (SELECT lang, token, count(*) AS n FROM tok GROUP BY 1, 2)
SELECT lang, token, n,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS INTEGER) AS term_rank
FROM counts
QUALIFY term_rank <= 10
"""


# --------------------------------------------------------------------------
# One-pass table profiling (the data-quality audit every ingest runs:
# per-column null rate, exact distinct count, value range)
# --------------------------------------------------------------------------

_PROFILE_NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_PROFILE_STR_COLS = ["l_returnflag", "l_linestatus"]


def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of ``lineitem`` in ONE scan: every per-column
    statistic (rows, nulls, exact distinct, min/max — value for
    numerics, length for strings) is computed as one wide aggregate
    row, then unpivoted JVM-side to the long (col_name, ...) form. The
    oracle re-states it as a UNION ALL of per-column scans — same
    numbers, N scans; the one-pass shape is the point at 100 TB.
    count_distinct here is EXACT (it is the oracle-checkable choice);
    the approximate profile at scale is `approx_sketches`' HLL path."""
    df = load(spark, sf_dir, "lineitem")
    aggs: list = []
    for c in _PROFILE_NUM_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(F.col(c).cast("double")).alias(f"{c}__mn"),
            F.max(F.col(c).cast("double")).alias(f"{c}__mx"),
        ]
    for c in _PROFILE_STR_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(F.length(c)).cast("double").alias(f"{c}__mn"),
            F.max(F.length(c)).cast("double").alias(f"{c}__mx"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nn, {c}__nd, {c}__mn, {c}__mx"
        for c in _PROFILE_NUM_COLS + _PROFILE_STR_COLS
    )
    n_cols = len(_PROFILE_NUM_COLS) + len(_PROFILE_STR_COLS)
    return wide.select(
        F.expr(
            f"stack({n_cols}, {stack_args}) AS "
            "(col_name, n_rows, n_null, n_distinct, min_v, max_v)"
        )
    ).select(
        "col_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_v",
        "max_v",
    )


def _profile_oracle_leg(c: str, numeric: bool) -> str:
    mn = f"CAST(min({c}) AS DOUBLE)" if numeric else f"CAST(min(length({c})) AS DOUBLE)"
    mx = f"CAST(max({c}) AS DOUBLE)" if numeric else f"CAST(max(length({c})) AS DOUBLE)"
    return (
        f"SELECT '{c}' AS col_name, count(*) AS n_rows, "
        f"count(*) - count({c}) AS n_null, "
        f"count(DISTINCT {c}) AS n_distinct, {mn} AS min_v, {mx} AS max_v "
        f"FROM lineitem"
    )


ORACLE_PROFILE_TABLE = " UNION ALL ".join(
    [_profile_oracle_leg(c, True) for c in _PROFILE_NUM_COLS]
    + [_profile_oracle_leg(c, False) for c in _PROFILE_STR_COLS]
)


# --------------------------------------------------------------------------
# Incremental near-dedup: new batch vs standing corpus (the
# continuous-ingest shape — never corpus x corpus)
# --------------------------------------------------------------------------

_INCR_SPLIT = 400  # doc_id >= this plays the "newly ingested batch"


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dedup of a NEW batch against a STANDING corpus — the shape
    continuous ingest actually needs: per new document, how many corpus
    documents share any MinHash band bucket, and a keep flag. The plan
    joins new-side band keys against corpus-side band keys on
    (band, hash) — one equi-join shuffle, and no corpus x corpus pair
    is ever formed, so cost is O(batch x collisions), not O(corpus^2).
    At serving scale the corpus side is the stored LSH bucket index
    maintained by streaming/neardup.py instead of a recompute; this
    batch-analytic version recomputes both sides from the table so the
    whole composition stays oracle-checkable."""
    sig = q_minhash_signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("band"), F.col(f"mh{j}").alias("h"))
                    for j in range(_N_MINHASH)
                ]
            )
        ).alias("bh"),
    ).select("doc_id", "bh.band", "bh.h")
    new_b = bands.filter(F.col("doc_id") >= _INCR_SPLIT)
    corp_b = bands.filter(F.col("doc_id") < _INCR_SPLIT).select(
        F.col("doc_id").alias("corpus_id"), "band", "h"
    )
    cand = (
        new_b.join(corp_b, ["band", "h"])
        .select("doc_id", "corpus_id")
        .distinct()
    )
    counts = cand.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_corpus_dups")
    )
    base = sig.filter(F.col("doc_id") >= _INCR_SPLIT).select("doc_id")
    return base.join(counts, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_corpus_dups", F.lit(0)).cast("long").alias("n_corpus_dups"),
        F.col("n_corpus_dups").isNull().alias("keep"),
    )


ORACLE_INCREMENTAL_DEDUP = f"""
WITH sigs AS MATERIALIZED ({ORACLE_MINHASH_SIGNATURES}),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {j} AS band, mh{j} AS h FROM sigs" for j in range(_N_MINHASH))}
),
cand AS (
  SELECT DISTINCT n.doc_id AS doc_id, c.doc_id AS corpus_id
  FROM bands n JOIN bands c ON n.band = c.band AND n.h = c.h
  WHERE n.doc_id >= {_INCR_SPLIT} AND c.doc_id < {_INCR_SPLIT}
),
counts AS (
  SELECT doc_id, count(*) AS n_corpus_dups FROM cand GROUP BY doc_id
)
SELECT s.doc_id,
       coalesce(c.n_corpus_dups, 0) AS n_corpus_dups,
       c.doc_id IS NULL AS keep
FROM sigs s LEFT JOIN counts c USING (doc_id)
WHERE s.doc_id >= {_INCR_SPLIT}
"""


# --------------------------------------------------------------------------
# Per-source quota capping (domain-mix control: cap how many documents
# any one source may contribute, keeping its best by a deterministic
# quality key — the standard guard against over-represented domains)
# --------------------------------------------------------------------------

_SOURCE_QUOTA = 40


def q_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep at most _SOURCE_QUOTA documents per source, best-first by
    (n_chars desc, doc_id) — integer keys so the rank is deterministic
    across engines. One shuffle on source; at skewed real scale the
    same shape runs via the salted two-phase top-k
    (partitioning.salted_group_topk) proven equal in tests."""
    df = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        df.select("doc_id", "source", "n_chars")
        .withColumn("q_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("q_rank") <= _SOURCE_QUOTA)
    )


ORACLE_SOURCE_QUOTA = f"""
SELECT doc_id, source, n_chars,
       CAST(row_number() OVER (PARTITION BY source
                               ORDER BY n_chars DESC, doc_id) AS INTEGER) AS q_rank
FROM documents
QUALIFY q_rank <= {_SOURCE_QUOTA}
"""


# --------------------------------------------------------------------------
# Unigram LM quality score (CCNet-style corpus-level language-model
# filtering: docs whose tokens are improbable under the corpus unigram
# distribution are low-quality / noise)
# --------------------------------------------------------------------------


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    token distribution — the CCNet-style LM quality signal, built from
    the corpus itself (no external model).

    Scale shape: one explode -> (doc_id, token) aggregated FIRST to
    per-doc term frequencies (shrinks the join input from total-token
    rows to distinct (doc, token) pairs), then a single equi-join on
    token against the corpus vocabulary (AQE picks broadcast when the
    vocab is small; shuffle join at real scale), then one per-doc
    aggregation. Three shuffles total, all key-partitioned, nothing
    collected.
    """
    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    toks = sparse_fn.bm25_tokens_sql("text")  # CJK-aware (r4)
    tok = df.select("doc_id", F.explode(F.expr(toks)).alias("token"))
    # per-doc term frequency (shrinks the token->vocab join); persisted
    # because it feeds both the vocabulary derivation and the per-doc
    # join — the explode runs once (ContextCleaner unpersists on GC)
    dtf = (
        tok.groupBy("doc_id", "token").agg(F.count("*").alias("dtf")).persist()
    )
    # corpus vocabulary with counts, plus the corpus token total
    tf_full = dtf.groupBy("token").agg(F.sum("dtf").alias("tf"))
    total = tf_full.agg(F.sum("tf").alias("n"))
    # Hapax pruning — exact, not approximate (the bigram_logprob trick,
    # r5): a corpus-count-1 token joins to tf=1, which is precisely the
    # coalesce miss default, so dropping hapaxes from the JOIN TABLE
    # changes nothing in the output while cutting the build side by the
    # hapax share (~40-50% of web-corpus vocab — the vocab table's
    # growth term at scale; 10x ratio was 2.06).
    tf = tf_full.where(F.col("tf") >= 2)
    return (
        dtf.join(tf, "token", "left")
        .withColumn("tf", F.coalesce("tf", F.lit(1)))
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("dtf").cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("dtf") * F.log2(F.col("tf") / F.col("n")))
                / F.sum("dtf"),
                ROUND_DIGITS,
            ).alias("avg_logprob"),
        )
    )


def q_c4_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2), the line-level
    companion to the Gopher battery (r8): keep only lines that end in
    terminal punctuation ('.', '!', '?', '\"') AND have >= 5 words AND
    do not mention 'javascript'; drop the whole page when it contains
    'lorem ipsum' or a curly brace, or when the kept text has fewer
    than 3 sentences (terminal-punctuation count — the published
    heuristic without a sentence tokenizer; documented simplification).
    Emits the kept-line stats plus md5 of the cleaned text so the
    oracle hashes the actual line-filter output, not just counts.
    ONE map-only scan projection (list ops fused into the scan, no
    shuffle at any scale); the bad-words list is omitted (license), as
    is the three-sentence-span dedup (covered by substring_dedup)."""
    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    kept = (
        "filter(split(text, '\\n'), l -> "
        "right(trim(l), 1) IN ('.', '!', '?', '\"') "
        "AND size(filter(split(l, ' '), w -> w <> '')) >= 5 "
        "AND NOT lower(l) LIKE '%javascript%')"
    )
    clean = f"concat_ws('\\n', {kept})"
    n_sent = f"length({clean}) - length(translate({clean}, '.!?', ''))"
    return df.select(
        "doc_id",
        F.expr("size(filter(split(text, ' '), w -> w <> ''))")
        .cast("long")
        .alias("n_words"),
        F.expr(f"size({kept})").cast("long").alias("kept_lines"),
        F.expr(n_sent).cast("long").alias("n_sentences"),
        F.expr(f"length({clean})").cast("long").alias("clean_len"),
        F.md5(F.expr(clean)).alias("clean_md5"),
        F.expr(f"{n_sent} >= 3").alias("ok_min_sentences"),
        F.expr("NOT lower(text) LIKE '%lorem ipsum%'").alias("ok_no_lorem"),
        F.expr("NOT text LIKE '%{%'").alias("ok_no_brace"),
    ).withColumn(
        "pass",
        F.col("ok_min_sentences")
        & F.col("ok_no_lorem")
        & F.col("ok_no_brace")
        & (F.col("kept_lines") >= 1),
    )


_C4_KEPT_SQL = (
    "list_filter(string_split(text, chr(10)), l -> "
    "right(trim(l), 1) IN ('.', '!', '?', '\"') "
    "AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 5 "
    "AND NOT lower(l) LIKE '%javascript%')"
)

ORACLE_C4_QUALITY_FILTER = f"""
WITH k AS (
  SELECT doc_id, text,
         COALESCE(array_to_string({_C4_KEPT_SQL}, chr(10)), '') AS clean,
         len({_C4_KEPT_SQL}) AS kept_lines,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_words
  FROM documents
),
s AS (
  SELECT doc_id, n_words, kept_lines,
         CAST(length(clean) - length(translate(clean, '.!?', '')) AS BIGINT)
           AS n_sentences,
         CAST(length(clean) AS BIGINT) AS clean_len,
         md5(clean) AS clean_md5,
         (length(clean) - length(translate(clean, '.!?', ''))) >= 3
           AS ok_min_sentences,
         NOT lower(text) LIKE '%lorem ipsum%' AS ok_no_lorem,
         NOT text LIKE '%{{%' AS ok_no_brace
  FROM k
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(kept_lines AS BIGINT) AS kept_lines, n_sentences,
       clean_len, clean_md5, ok_min_sentences, ok_no_lorem, ok_no_brace,
       (ok_min_sentences AND ok_no_lorem AND ok_no_brace
        AND kept_lines >= 1) AS pass
FROM s
"""


def _top_gram_expr(words: str, n: int) -> str:
    """Spark SQL struct('cnt', 'gram'): the count and value of the most
    frequent word {n}-gram of the ``words`` array, computed INSIDE one
    scan projection (no per-doc shuffle): build the gram array, sort
    it, and fold a run-length scan over it — a strictly-greater update
    makes the FIRST (lexicographically smallest) gram win ties, which
    DuckDB reproduces with (count DESC, gram) ordering."""
    grams = (
        f"case when size({words}) < {n} then array() "
        f"else transform(sequence(1, size({words}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({words}, i, {n}))) end"
    )
    run = "if(g = s.prev, s.run + 1L, 1L)"
    return (
        f"aggregate(array_sort({grams}), "
        "named_struct('prev', '', 'run', 0L, 'best', 0L, 'bg', ''), "
        f"(s, g) -> named_struct('prev', g, 'run', {run}, "
        f"'best', if({run} > s.best, {run}, s.best), "
        f"'bg', if({run} > s.best, g, s.bg)), "
        "s -> named_struct('cnt', s.best, 'gram', s.bg))"
    )


def _dup_seg_flag_exprs(
    segs: str, dsegs: str, chars: str, dchars: str, fthr: float, cthr: float
) -> tuple[str, str]:
    """(dup_fraction <= fthr, dup_char_fraction <= cthr) Spark SQL over
    PRE-COMPUTED segment columns: ``segs``/``dsegs`` the non-empty
    segments and their distinct set, ``chars``/``dchars`` their summed
    character masses — Gopher's duplicate-line / duplicate-paragraph
    signals. Taking named columns instead of inlining the split keeps
    each array and each char-mass fold single-eval per row (r9)."""
    frac = (
        f"(size({segs}) - size({dsegs})) * 1.0 "
        f"/ NULLIF(size({segs}), 0) <= {fthr}"
    )
    cfrac = f"({chars} - {dchars}) * 1.0 / NULLIF({chars}, 0) <= {cthr}"
    return frac, cfrac


def _seg_chars_expr(segs: str) -> str:
    """Summed character mass of a pre-computed segment array column."""
    return f"aggregate({segs}, 0L, (a, l) -> a + length(l))"


# (threshold, name) per top-n-gram rule — Rae et al. 2021 Table A1
_GOPHER_TOP_NGRAM_RULES = [(2, 0.20), (3, 0.18), (4, 0.16)]


def q_gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule heuristic filter battery (Rae et al. 2021 §A1.1 +
    Table A1 / the FineWeb recipe): the published pre-LM-training
    quality rules evaluated per document in ONE scan projection —
    word count in [50, 100k], mean word length in [3, 10],
    symbol-to-word ratio (# and ellipsis) <= 0.1, >= 80% of words
    containing an alphabetic char, >= 2 distinct English stop words,
    PLUS the full repetition battery (r8): duplicate-line and
    duplicate-paragraph fractions <= 0.30, their character-mass
    variants <= 0.20, and top-2/3/4-gram character fractions <=
    0.20/0.18/0.16 (most-frequent-gram found by an in-projection
    sorted run-length fold — no per-doc shuffle). Returns each rule's
    flag plus the composite pass — the practitioner's first pass over
    a raw crawl, upstream of the LM/classifier scoring family. Pure
    JVM expressions fused into the scan (map-only, no shuffle at any
    scale); DuckDB predicts every flag exactly.

    r9: the shared arrays (word list, line/para segments and their
    distinct sets) and the three top-n-gram fold structs are HOISTED
    into named columns in staged projections so each is computed ONCE
    per row — the fold had been inlined twice per rule (``.cnt`` and
    ``.gram``) and the word split re-evaluated per flag. CollapseProject
    keeps a non-cheap producer expression referenced more than once in
    its own projection, so the stages survive optimization; the plan is
    still one map-only scan projection chain, no shuffle."""
    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    words = "filter(split(text, ' '), w -> w <> '')"
    stop = "array('the','be','to','of','and','that','have','with')"
    staged = (
        df.select(
            "doc_id",
            "text",
            F.expr(words).alias("_ws"),
            F.expr("filter(split(text, '\\n'), l -> l <> '')").alias(
                "_lines"
            ),
            F.expr("filter(split(text, '\\n\\n'), l -> l <> '')").alias(
                "_paras"
            ),
        )
        .select(
            "doc_id",
            "text",
            "_ws",
            "_lines",
            "_paras",
            F.expr("array_distinct(_lines)").alias("_lines_d"),
            F.expr("array_distinct(_paras)").alias("_paras_d"),
            *[
                F.expr(_top_gram_expr("_ws", n)).alias(f"_tg{n}")
                for n, _ in _GOPHER_TOP_NGRAM_RULES
            ],
        )
        .select(
            "*",
            F.expr(_seg_chars_expr("_lines")).alias("_lc"),
            F.expr(_seg_chars_expr("_lines_d")).alias("_ldc"),
            F.expr(_seg_chars_expr("_paras")).alias("_pc"),
            F.expr(_seg_chars_expr("_paras_d")).alias("_pdc"),
            F.expr("length(concat_ws(' ', _ws))").alias("_wc"),
        )
    )
    line_frac, line_cfrac = _dup_seg_flag_exprs(
        "_lines", "_lines_d", "_lc", "_ldc", 0.30, 0.20
    )
    para_frac, para_cfrac = _dup_seg_flag_exprs(
        "_paras", "_paras_d", "_pc", "_pdc", 0.30, 0.20
    )
    rep_flags = [
        F.coalesce(F.expr(line_frac), F.lit(True)).alias("ok_dup_lines"),
        F.coalesce(F.expr(para_frac), F.lit(True)).alias("ok_dup_paras"),
        F.coalesce(F.expr(line_cfrac), F.lit(True)).alias(
            "ok_dup_line_chars"
        ),
        F.coalesce(F.expr(para_cfrac), F.lit(True)).alias(
            "ok_dup_para_chars"
        ),
    ] + [
        F.coalesce(
            F.expr(
                f"(_tg{n}.cnt * length(_tg{n}.gram)) * 1.0 "
                f"/ NULLIF(_wc, 0) <= {thr}"
            ),
            F.lit(True),
        ).alias(f"ok_top_{n}gram")
        for n, thr in _GOPHER_TOP_NGRAM_RULES
    ]
    return staged.select(
        "doc_id",
        F.expr("size(_ws)").cast("long").alias("n_words"),
        F.expr("size(_ws) BETWEEN 50 AND 100000").alias("ok_word_count"),
        F.coalesce(
            F.expr(
                "aggregate(_ws, 0L, (a, w) -> a + length(w)) * 1.0 "
                "/ NULLIF(size(_ws), 0) BETWEEN 3 AND 10"
            ),
            F.lit(False),
        ).alias("ok_mean_word_len"),
        F.coalesce(
            F.expr(
                "(length(text) - length(replace(replace(text, '#', ''), "
                "'...', ''))) * 1.0 / NULLIF(size(_ws), 0) <= 0.1"
            ),
            F.lit(False),
        ).alias("ok_symbol_ratio"),
        F.coalesce(
            F.expr(
                "size(filter(_ws, w -> w rlike '[a-zA-Z]')) * 1.0 "
                "/ NULLIF(size(_ws), 0) >= 0.8"
            ),
            F.lit(False),
        ).alias("ok_alpha_words"),
        F.expr(
            "size(array_intersect(transform(_ws, w -> lower(w)), "
            f"{stop})) >= 2"
        ).alias("ok_stop_words"),
        *rep_flags,
    ).withColumn(
        "pass",
        F.coalesce(
            F.col("ok_word_count")
            & F.col("ok_mean_word_len")
            & F.col("ok_symbol_ratio")
            & F.col("ok_alpha_words")
            & F.col("ok_stop_words")
            & F.col("ok_dup_lines")
            & F.col("ok_dup_paras")
            & F.col("ok_dup_line_chars")
            & F.col("ok_dup_para_chars")
            & F.col("ok_top_2gram")
            & F.col("ok_top_3gram")
            & F.col("ok_top_4gram"),
            F.lit(False),
        ),
    )


def _oracle_top_ngram_ctes(n: int) -> str:
    """DuckDB CTE pair computing each doc's most frequent word n-gram
    (count DESC, gram ASC tie-break == the Spark fold's first-max)."""
    return f"""cnt{n} AS (
  SELECT doc_id, array_to_string(ws[CAST(i AS BIGINT):CAST(i AS BIGINT) + {n - 1}], ' ') AS g,
         count(*) AS c
  FROM w, LATERAL unnest(range(1, len(ws) - {n - 2})) AS t(i)
  GROUP BY 1, 2
),
top{n} AS (
  SELECT doc_id, c, g FROM cnt{n}
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) = 1
)"""


ORACLE_GOPHER_QUALITY_FILTER = f"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS ws,
         list_filter(string_split(text, chr(10)), x -> x <> '') AS lines,
         list_filter(string_split(text, chr(10) || chr(10)), x -> x <> '') AS paras
  FROM documents
),
{_oracle_top_ngram_ctes(2)},
{_oracle_top_ngram_ctes(3)},
{_oracle_top_ngram_ctes(4)},
flags AS (
  SELECT w.doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         len(ws) BETWEEN 50 AND 100000 AS ok_word_count,
         COALESCE(list_sum(list_transform(ws, x -> length(x))) * 1.0
           / NULLIF(len(ws), 0) BETWEEN 3 AND 10, FALSE) AS ok_mean_word_len,
         COALESCE((length(text) - length(replace(replace(text, '#', ''), '...', '')))
           * 1.0 / NULLIF(len(ws), 0) <= 0.1, FALSE) AS ok_symbol_ratio,
         COALESCE(len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]'))) * 1.0
           / NULLIF(len(ws), 0) >= 0.8, FALSE) AS ok_alpha_words,
         len(list_intersect(list_transform(ws, x -> lower(x)),
             ['the','be','to','of','and','that','have','with'])) >= 2
           AS ok_stop_words,
         COALESCE((len(lines) - len(list_distinct(lines))) * 1.0
           / NULLIF(len(lines), 0) <= 0.30, TRUE) AS ok_dup_lines,
         COALESCE((len(paras) - len(list_distinct(paras))) * 1.0
           / NULLIF(len(paras), 0) <= 0.30, TRUE) AS ok_dup_paras,
         COALESCE((list_sum(list_transform(lines, x -> length(x)))
             - list_sum(list_transform(list_distinct(lines), x -> length(x)))) * 1.0
           / NULLIF(list_sum(list_transform(lines, x -> length(x))), 0) <= 0.20,
           TRUE) AS ok_dup_line_chars,
         COALESCE((list_sum(list_transform(paras, x -> length(x)))
             - list_sum(list_transform(list_distinct(paras), x -> length(x)))) * 1.0
           / NULLIF(list_sum(list_transform(paras, x -> length(x))), 0) <= 0.20,
           TRUE) AS ok_dup_para_chars,
         COALESCE(top2.c * length(top2.g) * 1.0
           / NULLIF(length(array_to_string(ws, ' ')), 0) <= 0.20, TRUE)
           AS ok_top_2gram,
         COALESCE(top3.c * length(top3.g) * 1.0
           / NULLIF(length(array_to_string(ws, ' ')), 0) <= 0.18, TRUE)
           AS ok_top_3gram,
         COALESCE(top4.c * length(top4.g) * 1.0
           / NULLIF(length(array_to_string(ws, ' ')), 0) <= 0.16, TRUE)
           AS ok_top_4gram
  FROM w
  LEFT JOIN top2 ON w.doc_id = top2.doc_id
  LEFT JOIN top3 ON w.doc_id = top3.doc_id
  LEFT JOIN top4 ON w.doc_id = top4.doc_id
)
SELECT doc_id, n_words, ok_word_count, ok_mean_word_len, ok_symbol_ratio,
       ok_alpha_words, ok_stop_words,
       ok_dup_lines, ok_dup_paras, ok_dup_line_chars, ok_dup_para_chars,
       ok_top_2gram, ok_top_3gram, ok_top_4gram,
       COALESCE(ok_word_count AND ok_mean_word_len AND ok_symbol_ratio
                AND ok_alpha_words AND ok_stop_words
                AND ok_dup_lines AND ok_dup_paras
                AND ok_dup_line_chars AND ok_dup_para_chars
                AND ok_top_2gram AND ok_top_3gram AND ok_top_4gram,
                FALSE) AS pass
FROM flags
"""


_DSIR_BUCKETS = 8192
_DSIR_KEEP = 0.25


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by its log importance weight between a TARGET
    distribution (here the curated ``source = 'src0'`` slice — the
    paper's formal-text proxy) and the RAW pool, under hashed-bigram
    bag-of-ngrams models, then keep the top 25% of raw docs.

    Features: token bigrams hashed into {_DSIR_BUCKETS} buckets with
    the portable 60-bit md5 hash (the minhash family's idiom, exact on
    both engines). Per-bucket add-one-smoothed probabilities for
    target and raw give a {_DSIR_BUCKETS}-row log-ratio table —
    broadcast onto the raw docs' (doc_id, bucket) occurrences, one
    per-doc sum, no corpus sort: the global 25% cut reuses the
    perplexity_filter histogram-threshold shape (cumulative window
    over per-rounded-weight counts, row_number only over the boundary
    tie-group). At 100 TB: two map-side-combinable aggregates over
    bucket ids (domain {_DSIR_BUCKETS}), one broadcast join, one
    per-doc agg — every shuffle keyed and bounded."""
    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    toked = df.select(
        "doc_id",
        "source",
        sparse_fn.bm25_tokens_col("text").alias("__toks"),
    ).filter(F.expr("size(__toks) >= 2"))
    bigrams = (
        "transform(sequence(1, size(__toks) - 1), "
        "i -> concat_ws(' ', slice(__toks, i, 2)))"
    )
    occ = toked.select(
        "doc_id",
        "source",
        F.explode(F.expr(bigrams)).alias("bg"),
    ).select(
        "doc_id",
        "source",
        F.expr(
            f"pmod({_portable_hash_expr('bg')}, {_DSIR_BUCKETS})"
        ).alias("bucket"),
    )
    is_target = F.col("source") == "src0"
    counts = occ.groupBy("bucket").agg(
        F.sum(F.when(is_target, 1).otherwise(0)).alias("ct"),
        F.sum(F.when(is_target, 0).otherwise(1)).alias("cr"),
    )
    totals = counts.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    ratios = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log2((F.col("ct") + 1) / (F.col("tt") + _DSIR_BUCKETS))
            - F.log2((F.col("cr") + 1) / (F.col("tr") + _DSIR_BUCKETS))
        ).alias("lr"),
    )
    scored = (
        occ.filter(~is_target)
        .join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(F.round(F.sum("lr"), ROUND_DIGITS).alias("weight"))
    ).persist()
    # global top-25% by weight desc via the histogram threshold (no
    # corpus sort — same shape as perplexity_filter's per-lang cut)
    hist = scored.groupBy("weight").agg(F.count("*").alias("cnt"))
    quota = scored.agg(
        F.ceil(_DSIR_KEEP * F.count("*")).cast("long").alias("quota")
    )
    cum_w = (
        Window.orderBy(F.col("weight").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hist = (
        hist.withColumn("cum", F.sum("cnt").over(cum_w))
        .withColumn("above", F.col("cum") - F.col("cnt"))
        .crossJoin(F.broadcast(quota))
        .where(F.col("above") < F.col("quota"))
        .withColumn(
            "keep_cnt",
            F.least(F.col("cnt"), F.col("quota") - F.col("above")),
        )
        .select("weight", "cnt", "keep_cnt")
    )
    kept = scored.join(F.broadcast(hist), "weight")
    full = kept.where(F.col("keep_cnt") == F.col("cnt"))
    tie_w = Window.partitionBy("weight").orderBy("doc_id")
    boundary = (
        kept.where(F.col("keep_cnt") < F.col("cnt"))
        .withColumn("rn", F.row_number().over(tie_w))
        .where(F.col("rn") <= F.col("keep_cnt"))
        .drop("rn")
    )
    return full.unionByName(boundary).select("doc_id", "weight")


ORACLE_DSIR_WEIGHTS = f"""
WITH toked AS (
  SELECT doc_id, source, {_BM25_TOKS_SQL} AS ts FROM documents
  WHERE len({_BM25_TOKS_SQL}) >= 2
),
occ AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(bg), 1, 15))::BIGINT % {_DSIR_BUCKETS} AS bucket
  FROM (
    SELECT doc_id, source,
           unnest(list_transform(range(1, len(ts)),
                                 i -> array_to_string(ts[i:i+1], ' '))) AS bg
    FROM toked
  )
),
counts AS (
  SELECT bucket,
         sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ct,
         sum(CASE WHEN source = 'src0' THEN 0 ELSE 1 END) AS cr
  FROM occ GROUP BY bucket
),
tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM counts),
ratios AS (
  SELECT bucket,
         log2((ct + 1) * 1.0 / (tt + {_DSIR_BUCKETS}))
         - log2((cr + 1) * 1.0 / (tr + {_DSIR_BUCKETS})) AS lr
  FROM counts, tot
),
scored AS (
  SELECT o.doc_id, round(sum(r.lr), {ROUND_DIGITS}) AS weight
  FROM occ o JOIN ratios r USING (bucket)
  WHERE o.source <> 'src0'
  GROUP BY o.doc_id
),
ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY weight DESC, doc_id) AS rn,
         count(*) OVER () AS n_docs
  FROM scored
)
SELECT doc_id, weight FROM ranked WHERE rn <= ceil({_DSIR_KEEP} * n_docs)
"""


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality classifier (the GPT-3/LLaMA-pipeline method):
    logistic regression on curated-slice-vs-raw labels over hashed
    bigram features, fit driver-side on a bounded deterministic sample
    (``operators/classifier.py`` — the PQ-codebook pattern), then
    every document scored DISTRIBUTED: one broadcast join of the
    (bucket, weight) table onto JVM-built hashed occurrences, one
    per-doc agg, map-side sigmoid. Rows-only by the model-op policy
    (training has no SQL oracle); separation/determinism properties
    pinned in tests/test_classifier.py. Completes the curation-scoring
    triad with ``perplexity_filter`` (LM threshold) and
    ``dsir_weights`` (importance ratio)."""
    from aiotcvectordb_spark.operators.classifier import (
        score_quality,
        train_quality_classifier,
    )

    docs = ensure_min_partitions(load(spark, sf_dir, "documents"))
    model = train_quality_classifier(
        docs,
        target_pred=F.col("source") == "src0",
        train_sample=2048,
    )
    return score_quality(spark, docs, model, round_digits=ROUND_DIGITS)


def q_quality_classifier_frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``quality_classifier``'s frozen-weights ORACLED witness (r11,
    the bpe_token_count_frozen pattern): one deterministic training
    run's logistic weights are pinned as literals
    (``operators/classifier_frozen.py``), and the document-scoring
    pass — JVM-built hashed-bigram buckets, ONE broadcast join of the
    256-row (bucket, weight) table, per-doc l1-normalized dot,
    map-side sigmoid — runs through the IDENTICAL production kernel
    (``operators/classifier.score_quality``), now closed-form in
    DuckDB under the driver hash. The trained lane stays rows-only
    (training itself has no SQL oracle); this row vouches for the
    scoring dataflow the trained lane ships at 100 TB: broadcast-join
    shapes, no collect, cost linear in corpus tokens."""
    import numpy as np

    from aiotcvectordb_spark.operators.classifier import (
        QualityModel,
        score_quality,
    )
    from aiotcvectordb_spark.operators.classifier_frozen import (
        FROZEN_INTERCEPT,
        FROZEN_N_BUCKETS,
        FROZEN_WEIGHTS,
    )

    docs = ensure_min_partitions(load(spark, sf_dir, "documents"))
    model = QualityModel(
        np.array(FROZEN_WEIGHTS, dtype=np.float64),
        FROZEN_INTERCEPT,
        FROZEN_N_BUCKETS,
    )
    return score_quality(spark, docs, model, round_digits=ROUND_DIGITS)


def _classifier_frozen_oracle() -> str:
    from aiotcvectordb_spark.operators.classifier_frozen import (
        FROZEN_INTERCEPT,
        FROZEN_N_BUCKETS,
        FROZEN_WEIGHTS,
    )

    # scientific notation parses directly as DOUBLE in DuckDB (a plain
    # decimal literal would go through DECIMAL), and 17 significant
    # digits round-trip IEEE doubles exactly
    values = ",\n  ".join(
        f"({i}, {w:.17e})" for i, w in enumerate(FROZEN_WEIGHTS)
    )
    return f"""
WITH weights(bucket, w) AS (VALUES
  {values}
),
toks AS (
  SELECT doc_id, {_BM25_TOKS_SQL} AS ts FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ts)),
                               i -> ts[i] || ' ' || ts[i+1])) AS bigram
  FROM toks WHERE len(ts) >= 2
),
occ AS (
  SELECT doc_id,
         ('0x' || substr(md5(bigram), 1, 15))::BIGINT % {FROZEN_N_BUCKETS}
           AS bucket,
         count(*) AS cnt
  FROM bg GROUP BY 1, 2
),
scored AS (
  SELECT o.doc_id,
         sum(o.cnt * COALESCE(w.w, 0.0)) / sum(o.cnt) AS z
  FROM occ o LEFT JOIN weights w USING (bucket)
  GROUP BY o.doc_id
)
SELECT d.doc_id,
       round(1.0 / (1.0 + exp(-(COALESCE(s.z, 0.0)
                                + {FROZEN_INTERCEPT:.17e}))),
             {ROUND_DIGITS}) AS quality
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


ORACLE_QUALITY_CLASSIFIER_FROZEN = _classifier_frozen_oracle()


def q_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filtering: score every document by its
    cross-entropy (bits/token) under a PER-LANGUAGE unigram LM derived
    from the corpus itself, then keep the best 70% of each language —
    the standard pretraining quality gate (CCNet buckets by LM
    perplexity per language; reference's AI surface feeds exactly such
    filtered corpora).

    Scale shape: the LM is the unigram_logprob machinery keyed by
    (lang, token) — per-doc term frequencies first, hapax-pruned join
    table, three key-partitioned shuffles. The 70% cut does NOT sort
    the corpus: scores are rounded, so a per-(lang, bits) histogram
    (tiny — bounded by distinct rounded scores) yields each language's
    threshold via a cumulative window over the HISTOGRAM, and only the
    boundary tie-group needs a row_number, partitioned by (lang, bits).
    At 100 TB that is two map-side-combinable aggregates plus joins;
    the only windows run over histogram-sized or tie-group-sized data.
    """
    from aiotcvectordb_spark import pipelines

    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    # shared kernels (pipelines.doc_term_freqs / lm_bits): the
    # streaming quality-gate sink scores with the SAME code, so batch
    # and ingest agree by construction
    dtf = pipelines.doc_term_freqs(df).persist()
    lm = dtf.groupBy("lang", "token").agg(F.sum("dtf").alias("tf"))
    totals = lm.groupBy("lang").agg(F.sum("tf").alias("n"))
    scored = pipelines.lm_bits(dtf, lm, totals, ROUND_DIGITS).persist()
    # per-(lang, bits) histogram -> cumulative coverage -> threshold
    hist = scored.groupBy("lang", "ppl_bits").agg(
        F.count("*").alias("cnt")
    )
    quota = scored.groupBy("lang").agg(
        F.ceil(0.7 * F.count("*")).cast("long").alias("quota")
    )
    cum_w = (
        Window.partitionBy("lang")
        .orderBy("ppl_bits")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hist = (
        hist.withColumn("cum", F.sum("cnt").over(cum_w))
        .withColumn("below", F.col("cum") - F.col("cnt"))
        .join(F.broadcast(quota), "lang")
        .where(F.col("below") < F.col("quota"))
        .withColumn(
            "keep_cnt",
            F.least(F.col("cnt"), F.col("quota") - F.col("below")),
        )
        .select("lang", "ppl_bits", "cnt", "keep_cnt")
    )
    kept = scored.join(
        F.broadcast(hist), ["lang", "ppl_bits"]
    )
    full = kept.where(F.col("keep_cnt") == F.col("cnt"))
    tie_w = Window.partitionBy("lang", "ppl_bits").orderBy("doc_id")
    boundary = (
        kept.where(F.col("keep_cnt") < F.col("cnt"))
        .withColumn("rn", F.row_number().over(tie_w))
        .where(F.col("rn") <= F.col("keep_cnt"))
        .drop("rn")
    )
    return full.unionByName(boundary).select("doc_id", "lang", "ppl_bits")


ORACLE_PERPLEXITY_FILTER = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({_BM25_TOKS_SQL}) AS token FROM documents
),
dtf AS (
  SELECT doc_id, lang, token, count(*) AS dtf FROM tok GROUP BY ALL
),
lm AS (
  SELECT lang, token, sum(dtf) AS tf FROM dtf GROUP BY ALL
),
tot AS (
  SELECT lang, sum(tf) AS n FROM lm GROUP BY lang
),
scored AS (
  SELECT d.doc_id, d.lang,
         round(-sum(d.dtf * log2(COALESCE(l.tf, 1) * 1.0 / t.n))
               / sum(d.dtf), {ROUND_DIGITS}) AS ppl_bits
  FROM dtf d
  LEFT JOIN (SELECT * FROM lm WHERE tf >= 2) l
         ON d.lang = l.lang AND d.token = l.token
  JOIN tot t ON d.lang = t.lang
  GROUP BY d.doc_id, d.lang
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY lang
                            ORDER BY ppl_bits, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n_docs
  FROM scored
)
SELECT doc_id, lang, ppl_bits FROM ranked WHERE rn <= ceil(0.7 * n_docs)
"""


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM quality score (KenLM-lite, order 2): per-document mean
    log2 of the corpus-derived conditional probability
    p(w2|w1) = c(w1 w2) / c(w1 ·). Same scale shape as the unigram
    variant — per-doc bigram frequencies first, then equi-joins against
    the (bounded, corpus-derived) bigram and prefix tables, then one
    per-doc aggregation. Ranks fluent repeated phrasing above random
    token soup in a way unigram statistics can't."""
    df = ensure_min_partitions(load(spark, sf_dir, "documents"))
    # tokens materialized once per row (lambda bodies re-evaluate their
    # subtree per element — see q_minhash_signatures)
    toked = df.select(
        "doc_id", sparse_fn.bm25_tokens_col("text").alias("__toks")
    ).filter(F.expr("size(__toks) >= 2"))
    # Spark arrays are 0-indexed: pairs (t[i], t[i+1]) for i in [0, n-2]
    pairs = (
        "transform(sequence(0, size(__toks) - 2), "
        "i -> struct(__toks[i] AS w1, __toks[i + 1] AS w2))"
    )
    flat = toked.select("doc_id", F.explode(F.expr(pairs)).alias("b")).select(
        "doc_id", "b.w1", "b.w2"
    )
    # dbf feeds the per-doc join AND derives both corpus tables; persist
    # so the explode+aggregate pipeline (the expensive stage at scale)
    # runs once, not three times. Spark's ContextCleaner unpersists the
    # blocks when the handle is garbage-collected.
    dbf = flat.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("dbf")).persist()
    c2_full = dbf.groupBy("w1", "w2").agg(F.sum("dbf").alias("c2"))
    c1 = c2_full.groupBy("w1").agg(F.sum("c2").alias("c1"))
    # Singleton pruning — exact, not approximate: a corpus-count-1
    # bigram joins to c2=1, which is precisely what coalesce supplies on
    # a miss, so dropping singletons from the JOIN TABLE changes nothing
    # in the output while roughly halving the build side (singletons
    # dominate distinct bigrams in web corpora; this is the bigram
    # table's growth term at scale — 10x ratio was 1.97).
    c2 = c2_full.where(F.col("c2") >= 2)
    # Same exact pruning for the PREFIX table (r5): c1(w1) = 1 forces
    # the lone bigram to c2 = 1, and coalesce supplies 1/1 on the
    # double miss — log2(1) = 0, identical contribution, smaller build
    # side (hapax prefixes ≈ hapax unigrams ≈ 40-50% of vocab).
    c1p = c1.where(F.col("c1") >= 2)
    return (
        dbf.join(c2, ["w1", "w2"], "left")
        .withColumn("c2", F.coalesce("c2", F.lit(1)))
        .join(c1p, "w1", "left")
        .withColumn("c1", F.coalesce("c1", F.lit(1)))
        .groupBy("doc_id")
        .agg(
            F.sum("dbf").cast("long").alias("n_bigrams"),
            F.round(
                F.sum(F.col("dbf") * F.log2(F.col("c2") / F.col("c1")))
                / F.sum("dbf"),
                ROUND_DIGITS,
            ).alias("avg_logprob"),
        )
    )


ORACLE_BIGRAM_LOGPROB = rf"""
WITH tok AS (
  SELECT doc_id, {_BM25_TOKS_SQL} AS t
  FROM documents
),
flat AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> {{'w1': t[i], 'w2': t[i+1]}})) AS b
  FROM tok WHERE len(t) >= 2
),
dbf AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2, count(*) AS dbf FROM flat GROUP BY 1, 2, 3),
c2 AS (SELECT w1, w2, sum(dbf) AS c2 FROM dbf GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1)
SELECT d.doc_id, CAST(sum(d.dbf) AS BIGINT) AS n_bigrams,
       round(sum(d.dbf * log2(c2.c2 / c1.c1)) / sum(d.dbf), 6) AS avg_logprob
FROM dbf d JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
GROUP BY d.doc_id
"""


ORACLE_UNIGRAM_LOGPROB = rf"""
WITH tok AS (
  SELECT doc_id, unnest({_BM25_TOKS_SQL}) AS token
  FROM documents
),
dtf AS (SELECT doc_id, token, count(*) AS dtf FROM tok GROUP BY 1, 2),
tf AS (SELECT token, sum(dtf) AS tf FROM dtf GROUP BY token),
tot AS (SELECT sum(tf) AS n FROM tf)
SELECT d.doc_id,
       CAST(sum(d.dtf) AS BIGINT) AS n_tokens,
       round(sum(d.dtf * log2(f.tf / tot.n)) / sum(d.dtf), 6) AS avg_logprob
FROM dtf d JOIN tf f USING (token) CROSS JOIN tot
GROUP BY d.doc_id
"""


# --------------------------------------------------------------------------
# Deterministic training-shard assignment (the writer layout step of a
# training pipeline: N fixed output shards, stable under re-ingestion)
# --------------------------------------------------------------------------

_N_SHARDS = 16


def q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document a (shard, position): shard by salted
    portable hash of the id, position by a SECOND independent hash —
    i.e. a deterministic global shuffle. Hash-derived placement is the
    only layout stable under repartitioning and re-ingestion (no RNG,
    no input-order dependence), and within-shard hash order is the
    standard 'shuffled once, read sequentially' training layout.
    One shuffle (rank within shard); at real scale this is exactly a
    repartition(N) + sortWithinPartitions write."""
    df = load(spark, sf_dir, "documents")
    shard = F.expr(
        f"pmod({_portable_hash_expr(chr(39) + 'shard#' + chr(39) + ' || cast(doc_id as string)')}, {_N_SHARDS})"
    ).cast("int")
    order_h = F.expr(
        _portable_hash_expr(chr(39) + "order#" + chr(39) + " || cast(doc_id as string)")
    )
    w = Window.partitionBy("shard").orderBy("ord", "doc_id")
    return (
        df.select("doc_id", shard.alias("shard"), order_h.alias("ord"))
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos")
    )


ORACLE_TRAINING_SHARDS = f"""
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('shard#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % {_N_SHARDS} AS INTEGER) AS shard,
         ('0x' || substr(md5('order#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS ord
  FROM documents
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS INTEGER) AS pos
FROM h
"""


_PACK_LEN = 2048


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the training-data step that concatenates the
    token stream in doc order and splits it into fixed-budget packs
    (each doc's pack = where its first token lands). The global
    exclusive token cumsum is computed SCALE-SAFELY in two phases:
    range-partition by doc_id, per-partition running sums (a window
    keyed by the partition id — large partitions, 32 keys), plus a
    32-row partition-offset table joined back by broadcast. No global
    single-partition window, no collect; two shuffles of a 2-column
    table total. Oracle: the same cumsum as one SQL window."""
    tok = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(sparse_fn.bm25_tokens_col("text")).alias("ntok")
    )
    parts = (
        tok.repartitionByRange(32, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    # per-partition totals -> exclusive offsets (32-row window: metadata)
    psums = parts.groupBy("pid").agg(F.sum("ntok").alias("psum"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = psums.select(
        "pid", F.coalesce(F.sum("psum").over(w_off), F.lit(0)).alias("off")
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        parts.withColumn(
            "local_cum", F.coalesce(F.sum("ntok").over(w_local), F.lit(0))
        )
        .join(F.broadcast(offs), "pid")
        .withColumn("cum", F.col("local_cum") + F.col("off"))
    )
    return (
        cum.select(
            F.expr(f"cum div {_PACK_LEN}").alias("pack_id"),
            "doc_id",
            "ntok",
        )
        .groupBy("pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


ORACLE_PACK_SEQUENCES = f"""
WITH t AS (
  SELECT doc_id, len({_BM25_TOKS_SQL}) AS ntok FROM documents
),
c AS (
  SELECT doc_id, ntok,
         coalesce(sum(ntok) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM t
)
SELECT CAST(cum // {_PACK_LEN} AS BIGINT) AS pack_id,
       count(*) AS n_docs,
       CAST(sum(ntok) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM c GROUP BY 1
"""


_PACK_BUCKETS = 32


def q_pack_sequences_nosplit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NO-SPLIT greedy sequence packing (r8) — the first-fit-style
    variant where documents are ATOMS: a training example never slices
    a document (the published alternative to GPT-style concat-split,
    which ``pack_sequences`` implements; see 'Efficient Sequence
    Packing' / T5-style packing). Deterministic greedy, expressed as
    one window cumsum:

    - docs are SALTED into {_PACK_BUCKETS} buckets by a portable md5
      hash (the dataset_mix selection trick) — each bucket is an
      independent packer, so the per-bucket ordering sort is 1/B of
      the corpus and skew-proof (hash-balanced), and packing
      parallelizes across buckets by construction;
    - within a bucket, docs are ordered by a SECOND independent hash
      (deterministic shuffle — the training-layout order), the
      exclusive token cumsum is one window, and a doc joins pack
      ``excl_cumsum div {_PACK_LEN}`` — greedy next-fit where the doc
      holding the boundary OVERFLOWS its pack (packs exceed the budget
      by < max_doc_len instead of splitting; the zero-slack splitting
      variant is ``pack_sequences``). Oversized docs (> budget) become
      their own pack run, never dropped silently.

    Output is per-pack: (bucket, pack_id, n_docs, n_tokens, overflow).
    One hash-keyed window shuffle + one aggregate; at 100 TB this is
    repartition(B) + sortWithinPartitions + a map-side cumsum — the
    training_shards layout with a token budget on top."""
    tok = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id", F.size(sparse_fn.bm25_tokens_col("text")).alias("ntok")
        )
        .filter(F.col("ntok") > 0)
    )
    bucket = F.expr(
        f"pmod({_portable_hash_expr(chr(39) + 'pack#' + chr(39) + ' || cast(doc_id as string)')}, {_PACK_BUCKETS})"
    ).cast("int")
    order_h = F.expr(
        _portable_hash_expr(
            chr(39) + "packorder#" + chr(39) + " || cast(doc_id as string)"
        )
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        tok.select(
            "doc_id", "ntok", bucket.alias("bucket"), order_h.alias("ord")
        )
        .withColumn("excl", F.coalesce(F.sum("ntok").over(w), F.lit(0)))
        .select(
            "bucket",
            F.expr(f"excl div {_PACK_LEN}").alias("pack_id"),
            "doc_id",
            "ntok",
        )
    )
    return packed.groupBy("bucket", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("ntok").cast("long").alias("n_tokens"),
        F.greatest(
            F.sum("ntok").cast("long") - F.lit(_PACK_LEN), F.lit(0).cast("long")
        ).alias("overflow"),
    )


ORACLE_PACK_SEQUENCES_NOSPLIT = f"""
WITH t AS (
  SELECT doc_id, len({_BM25_TOKS_SQL}) AS ntok FROM documents
),
h AS (
  SELECT doc_id, ntok,
         CAST(('0x' || substr(md5('pack#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % {_PACK_BUCKETS} AS INTEGER) AS bucket,
         ('0x' || substr(md5('packorder#' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS ord
  FROM t WHERE ntok > 0
),
c AS (
  SELECT bucket, doc_id, ntok,
         coalesce(sum(ntok) OVER (PARTITION BY bucket ORDER BY ord, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
  FROM h
)
SELECT bucket, CAST(excl // {_PACK_LEN} AS BIGINT) AS pack_id,
       count(*) AS n_docs,
       CAST(sum(ntok) AS BIGINT) AS n_tokens,
       CAST(greatest(sum(ntok) - {_PACK_LEN}, 0) AS BIGINT) AS overflow
FROM c GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# EWMA smoothing (time-series feature engineering over the event stream)
# --------------------------------------------------------------------------

_EWMA_ALPHA = 0.3
_EWMA_SPAN = 8  # bounded frame: the alpha=0.3 tail beyond 8 steps is <6% mass


def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of event values
    over a bounded 8-row frame (finite-window EWMA — the standard
    streaming-friendly formulation; the truncated tail carries <6% of
    the mass at alpha=0.3). One shuffle on user_id; the windowed
    collect_list frame holds <= 8 values per row, so executor memory is
    O(frame), not O(user history)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_SPAN - 1), 0)
    )
    a, b = _EWMA_ALPHA, 1.0 - _EWMA_ALPHA
    # numerator: sum_i a*b^(n-1-i) * x_i (frame order); denominator is the
    # geometric closed form 1 - b^n — both sides compute the identical
    # IEEE expression, so round-6 parity is safe.
    num = (
        f"aggregate(zip_with(vals, sequence(0, size(vals) - 1), "
        f"(v, i) -> v * {a!r} * power({b!r}, cast(size(vals) - 1 - i as double))), "
        f"cast(0.0 as double), (acc, x) -> acc + x)"
    )
    den = f"(1.0 - power({b!r}, cast(size(vals) as double)))"
    return (
        ev.withColumn("vals", F.collect_list("value").over(w))
        .select(
            "event_id",
            "user_id",
            F.round(F.expr(f"{num} / {den}"), ROUND_DIGITS).alias("ewma"),
        )
    )


ORACLE_EWMA_SMOOTH = f"""
WITH w AS (
  SELECT event_id, user_id,
         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN {_EWMA_SPAN - 1} PRECEDING AND CURRENT ROW) AS vals
  FROM events
)
SELECT event_id, user_id,
       round(list_sum(list_transform(range(len(vals)),
                 i -> vals[i + 1] * {_EWMA_ALPHA!r} * power({1.0 - _EWMA_ALPHA!r}, len(vals) - 1 - i)))
             / (1.0 - power({1.0 - _EWMA_ALPHA!r}, len(vals))), 6) AS ewma
FROM w
"""


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------

# Ordering contract: the driver walks this dict in insertion order and
# has a finite per-round budget (round 1 checked exactly the first 50
# entries). Oracled queries WITHOUT a round-1 CORRECTNESS row come
# first, then the round-1-verified ones (fastest first so the most
# entries fit any time budget), then the rows-only approximate ops.
# registered in ORACLES as of r9 (deferred from r8 for rotation slack)
ORACLE_INCREMENTAL_SEMANTIC_DEDUP = f"""
WITH {_semdedup_cents_sql()},
scored AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb, c.cell,
         round(COALESCE(list_dot_product(CAST(e.embedding AS DOUBLE[]), c.cvec)
           / NULLIF(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(c.cvec, c.cvec)), 0), 0.0),
           {ROUND_DIGITS}) AS ccos
  FROM embeddings e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id, emb, cell, ccos FROM scored
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell) = 1
),
batch AS (SELECT * FROM assigned WHERE vec_id >= {_INCR_SPLIT}),
standing AS (SELECT * FROM assigned WHERE vec_id < {_INCR_SPLIT}),
dominated AS (
  SELECT DISTINCT b.vec_id
  FROM standing a JOIN batch b ON a.cell = b.cell
  WHERE {_SEMDEDUP_PAIR_COS} >= {_SEMDEDUP_TAU}
  UNION
  SELECT DISTINCT b.vec_id
  FROM batch a JOIN batch b ON a.cell = b.cell
   AND (a.ccos < b.ccos OR (a.ccos = b.ccos AND a.vec_id < b.vec_id))
  WHERE {_SEMDEDUP_PAIR_COS} >= {_SEMDEDUP_TAU}
)
SELECT s.vec_id, s.cell, s.ccos,
       (d.vec_id IS NOT NULL) AS semantic_dup
FROM batch s LEFT JOIN dominated d USING (vec_id)
"""

# assembled here (module bottom): it nests ORACLE_GOPHER_QUALITY_FILTER /
# ORACLE_C4_QUALITY_FILTER / ORACLE_SEMANTIC_DEDUP, which are defined after
# the curation section the query itself lives in
ORACLE_CURATE_CORPUS_V2 = f"""
WITH gop AS (SELECT * FROM ({ORACLE_GOPHER_QUALITY_FILTER})),
c4 AS (SELECT doc_id, ok_no_lorem, ok_no_brace FROM ({ORACLE_C4_QUALITY_FILTER})),
gate AS (
  SELECT g.doc_id FROM gop g JOIN c4 USING (doc_id)
  WHERE {" AND ".join(_V2_GATE_FLAGS)}
),
clean AS (
  SELECT doc_id, {_CURATE_CLEAN_SQL} AS clean_text FROM documents
),
cg AS (SELECT c.doc_id, c.clean_text FROM clean c JOIN gate USING (doc_id)),
exact AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           doc_id = min(doc_id) OVER (
             PARTITION BY {_CURATE_H60.format(s="clean_text")}) AS k
    FROM cg
  ) WHERE k
),
sem AS (
  SELECT vec_id AS doc_id FROM ({ORACLE_SEMANTIC_DEDUP})
  WHERE NOT semantic_dup
),
final AS (SELECT e.doc_id FROM exact e JOIN sem USING (doc_id)),
sp AS (
  SELECT doc_id,
         CASE WHEN {_CURATE_H60.format(s="CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'train'
              WHEN {_CURATE_H60.format(s="CAST(doc_id AS VARCHAR)")} % 100 < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM final
)
SELECT 0 AS stage_idx, 'raw' AS stage, count(*) AS n_docs FROM documents
UNION ALL
SELECT 1, 'rule_gate', count(*) FROM gate
UNION ALL
SELECT 2, 'exact_keeper', count(*) FROM exact
UNION ALL
SELECT 3, 'semantic_keeper', count(*) FROM final
UNION ALL
SELECT 4, 'final_' || split, count(*) FROM sp GROUP BY split
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # Ordering policy (the driver checks the first ~50 oracled entries
    # per round, in order): (1) queries rewritten since their last
    # driver row OR with no row yet come FIRST; (2) then ascending
    # latest-green-row round (stalest first). tools/check_driver_rows.py
    # enforces this ordering plus the post-driver age cap by simulating
    # the driver consuming the front batch; tools/rotate_registry.py
    # regenerates this block. Re-rotation is the round's CLOSING commit.
    # --- forced for r12: rewritten since last row / no row yet ---
    "audio_mp3_meta": q_audio_mp3_meta,  # rewritten r12
    "jpeg_meta": q_jpeg_meta,  # rewritten r12
    "audio_adpcm_meta": q_audio_adpcm_meta,  # new, no driver row yet
    "video_mjpeg_meta": q_video_mjpeg_meta,  # new, no driver row yet
    "video_mjpeg_frames": q_video_mjpeg_frames,  # new, no driver row yet
    "gif_frames": q_gif_frames,  # rewritten r12
    "jpeg_probe": q_jpeg_probe,  # rewritten r12
    "jpeg_progressive_probe": q_jpeg_progressive_probe,  # rewritten r12
    "docx_extract": q_docx_extract,  # rewritten r12
    "rtf_extract": q_rtf_extract,  # rewritten r12
    "xlsx_extract": q_xlsx_extract,  # rewritten r12
    "xls_extract": q_xls_extract,  # rewritten r12
    "pptx_extract": q_pptx_extract,  # rewritten r12
    "pdf_extract": q_pdf_extract,  # rewritten r12
    "doc_extract": q_doc_extract,  # rewritten r12
    "ppt_extract": q_ppt_extract,  # rewritten r12
    "epub_extract": q_epub_extract,  # rewritten r12
    "multimodal_features": q_multimodal_features,  # rewritten r12
    "image_probe": q_image_probe,  # rewritten r12
    "audio_probe": q_audio_probe,  # rewritten r12
    "video_frames": q_video_frames,  # rewritten r12
    # --- r8 rows (age 4) (must be in the next batch) ---
    "ttl_filter": q_ttl_filter,
    "json_extract": q_json_extract,
    "group_topk": q_group_topk,
    "agg_groupby_stats": q_agg_groupby_stats,
    "window_running": q_window_running,
    "window_funcs": q_window_funcs,
    "scalar_funcs": q_scalar_funcs,
    "set_ops": q_set_ops,
    "count_filter": q_count_filter,
    "delete_filter_limit": q_delete_filter_limit,
    "percentiles": q_percentiles,
    "query_filter_sort_paginate": q_query_filter_sort_paginate,
    # --- r9 rows (age 3) (must be in the next batch) ---
    "gram_novelty": q_gram_novelty,
    "incremental_gram_novelty": q_incremental_gram_novelty,
    "stratified_sample_hash": q_stratified_sample_hash,
    "search_grouped": q_search_grouped,
    "fulltext_phrase": q_fulltext_phrase,
    "fulltext_phrase_cjk": q_fulltext_phrase_cjk,
    "search_by_text": q_search_by_text,
    "gopher_quality_filter": q_gopher_quality_filter,
    "curate_corpus_v2": q_curate_corpus_v2,
    "incremental_semantic_dedup": q_incremental_semantic_dedup,
    "incremental_line_dedup": q_incremental_line_dedup,
    "decontaminate_fraction": q_decontaminate_fraction,
    "ann_bq_cosine": q_ann_bq_cosine,
    "ann_sq8_cosine": q_ann_sq8_cosine,
    "mmr_rerank": q_mmr_rerank,
    "line_dedup": q_line_dedup,
    "substring_dedup": q_substring_dedup,
    "incremental_substring_dedup": q_incremental_substring_dedup,
    "semi_anti_join": q_semi_anti_join,
    "rollup_agg": q_rollup_agg,
    "lang_id": q_lang_id,
    "interval_join": q_interval_join,
    "join_pruned_dims": q_join_pruned_dims,
    "event_window_agg": q_event_window_agg,
    "sliding_window_agg": q_sliding_window_agg,
    "dedup_exact": q_dedup_exact,
    "upsert_merge": q_upsert_merge,
    "search_flat_ip": q_search_flat_ip,
    "asof_join": q_asof_join,
    "fulltext_bm25_cjk": q_fulltext_bm25_cjk,
    "fulltext_bm25": q_fulltext_bm25,
    "sparse_encode": q_sparse_encode,
    "lang_id_cjk": q_lang_id_cjk,
    "doc_repetition": q_doc_repetition,
    "minhash_signatures": q_minhash_signatures,
    "minhash_lsh_candidates": q_minhash_lsh_candidates,
    "dedup_components": q_dedup_components,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "simhash_fingerprint": q_simhash_fingerprint,
    "simhash_near_dup": q_simhash_near_dup,
    "chunk_expand": q_chunk_expand,
    "benchmark_decontaminate": q_benchmark_decontaminate,
    "pack_sequences": q_pack_sequences,
    "curate_corpus": q_curate_corpus,
    "incremental_dedup": q_incremental_dedup,
    # --- r10 rows (age 2) ---
    "ann_ivf_cosine_fixed": q_ann_ivf_cosine_fixed,
    "incremental_decontaminate_fraction": q_incremental_decontaminate_fraction,
    "dataset_mix_temp": q_dataset_mix_temp,
    "dataset_mix": q_dataset_mix,
    "doc_fingerprint": q_doc_fingerprint,
    "text_quality": q_text_quality,
    "perplexity_filter": q_perplexity_filter,
    "dsir_weights": q_dsir_weights,
    "zscore_outliers": q_zscore_outliers,
    "search_radius": q_search_radius,
    "search_flat_cosine": q_search_flat_cosine,
    "search_udtf_topk": q_search_udtf_topk,
    "search_flat_cosine_local_topk": q_search_flat_cosine_local_topk,
    "ann_ivf_fullprobe": q_ann_ivf_fullprobe,
    "knn_join": q_knn_join,
    "search_by_id": q_search_by_id,
    "hybrid_weighted": q_hybrid_weighted,
    "hybrid_rrf": q_hybrid_rrf,
    "embedding_near_dup": q_embedding_near_dup,
    "corr_stats": q_corr_stats,
    "search_flat_l2": q_search_flat_l2,
    "sessionize": q_sessionize,
    "multimodal_meta": q_multimodal_meta,
    "grouping_sets_agg": q_grouping_sets_agg,
    "pivot_wide": q_pivot_wide,
    "unpivot_long": q_unpivot_long,
    "pricing_summary": q_pricing_summary,
    "top_revenue_orders": q_top_revenue_orders,
    "correlated_subquery": q_correlated_subquery,
    "clean_text": q_clean_text,
    "dataset_split": q_dataset_split,
    "nation_volume_shipping": q_nation_volume_shipping,
    "national_market_share": q_national_market_share,
    "order_priority_check": q_order_priority_check,
    "customer_distribution": q_customer_distribution,
    "promo_revenue": q_promo_revenue,
    "returned_item_revenue": q_returned_item_revenue,
    "local_supplier_volume": q_local_supplier_volume,
    "forecast_revenue_change": q_forecast_revenue_change,
    "small_quantity_revenue": q_small_quantity_revenue,
    # --- r11 rows (age 1) ---
    "bpe_token_count_frozen": q_bpe_token_count_frozen,
    "weighted_sample_hash": q_weighted_sample_hash,
    "winnow_fingerprint": q_winnow_fingerprint,
    "token_entropy": q_token_entropy,
    "substring_dedup_cjk": q_substring_dedup_cjk,
    "substring_dedup_cjk_hashed": q_substring_dedup_cjk_hashed,
    "incremental_substring_dedup_cjk": q_incremental_substring_dedup_cjk,
    "quality_classifier_frozen": q_quality_classifier_frozen,
    "embedding_pca_fixed": q_embedding_pca_fixed,
    "substring_dedup_hashed_portable": q_substring_dedup_hashed_portable,
    "ann_pq_cosine_fixed": q_ann_pq_cosine_fixed,
    "ann_lsh_l2_fixed": q_ann_lsh_l2_fixed,
    "semantic_dedup": q_semantic_dedup,
    "pack_sequences_nosplit": q_pack_sequences_nosplit,
    "c4_quality_filter": q_c4_quality_filter,
    "ann_pq_fullrescore": q_ann_pq_fullrescore,
    "unigram_logprob": q_unigram_logprob,
    "lang_top_terms": q_lang_top_terms,
    "bigram_logprob": q_bigram_logprob,
    "large_volume_customers": q_large_volume_customers,
    "time_gap_fill": q_time_gap_fill,
    "window_range_frame": q_window_range_frame,
    "percentile_disc": q_percentile_disc,
    "funnel_steps": q_funnel_steps,
    "retention_cohorts": q_retention_cohorts,
    "sessionize_udtf": q_sessionize_udtf,
    "search_binary_hamming": q_search_binary_hamming,
    "pii_scrub": q_pii_scrub,
    "training_shards": q_training_shards,
    "ewma_smooth": q_ewma_smooth,
    "source_quota": q_source_quota,
    "profile_table": q_profile_table,
    "group_topk_salted": q_group_topk_salted,
    "label_centroids": q_label_centroids,
    "attribution_last_touch": q_attribution_last_touch,
    "embedding_outliers": q_embedding_outliers,
    "rolling_active_users": q_rolling_active_users,
    "equidepth_histogram": q_equidepth_histogram,
    "update_conditional": q_update_conditional,
    "query_projection": q_query_projection,
    "token_count": q_token_count,
    "cube_agg": q_cube_agg,
    "price_histogram": q_price_histogram,
    "query_by_ids": q_query_by_ids,
    # --- non-oracled entries (rows-only driver check; order free) ---
    "curate_corpus_v2_auto": q_curate_corpus_v2_auto,
    "semantic_dedup_auto": q_semantic_dedup_auto,
    "quality_classifier": q_quality_classifier,
    "stratified_sample": q_stratified_sample,
    "heavy_hitters": q_heavy_hitters,
    "ann_lsh_l2": q_ann_lsh_l2,
    "audio_adpcm_probe": q_audio_adpcm_probe,
    "audio_mp3_probe": q_audio_mp3_probe,
    "approx_sketches": q_approx_sketches,
    "ann_ivf_cosine": q_ann_ivf_cosine,
    "ann_pq_cosine": q_ann_pq_cosine,
    "embedding_near_dup_ivf": q_embedding_near_dup_ivf,
    "embedding_near_dup_auto": q_embedding_near_dup_auto,
    "embedding_pca": q_embedding_pca,
    "bpe_token_count": q_bpe_token_count,
    "substring_dedup_hashed": q_substring_dedup_hashed,
}

ORACLES: dict[str, str] = {
    "search_flat_cosine": ORACLE_SEARCH_FLAT_COSINE,
    # the bounded-shuffle scale path must be hash-identical to the
    # declarative path, so it shares the oracle verbatim
    "search_flat_cosine_local_topk": ORACLE_SEARCH_FLAT_COSINE,
    # exact-limit proofs of the approximate-index machinery: IVF at
    # nprobe=nlist and PQ at rescore_k=|corpus| must equal flat exact
    # kNN bit-for-bit, so they share the oracle verbatim too
    "ann_ivf_fullprobe": ORACLE_SEARCH_FLAT_COSINE,
    "ann_pq_fullrescore": ORACLE_SEARCH_FLAT_COSINE,
    "jpeg_probe": ORACLE_JPEG_PROBE,
    # progressive encode is coefficient-exact vs baseline, so the
    # progressive decoder shares the oracle verbatim (an exact-limit
    # proof in the jpeg_probe style)
    "jpeg_progressive_probe": ORACLE_JPEG_PROBE,
    # r11 metadata routes: header-parse-only twins of the codec
    # heavies — encode->header-walk witnesses under the driver hash
    "audio_mp3_meta": ORACLE_AUDIO_MP3_META,
    "jpeg_meta": ORACLE_JPEG_META,
    "audio_adpcm_meta": ORACLE_AUDIO_ADPCM_META,
    "video_mjpeg_meta": ORACLE_VIDEO_MJPEG_META,
    "video_mjpeg_frames": ORACLE_VIDEO_MJPEG_FRAMES,
    "pack_sequences": ORACLE_PACK_SEQUENCES,
    "pack_sequences_nosplit": ORACLE_PACK_SEQUENCES_NOSPLIT,
    "image_probe": ORACLE_IMAGE_PROBE,
    "sessionize_udtf": ORACLE_SESSIONIZE,
    "search_binary_hamming": ORACLE_SEARCH_BINARY_HAMMING,
    # r9: BQ promoted — the one quantized index whose every stage is
    # closed-form (sign bits, integral Hamming, exact rescore), so the
    # full oversample-and-rescore plan is DuckDB-expressible
    "ann_bq_cosine": ORACLE_ANN_BQ_COSINE,
    # r9: SQ8 promoted next to BQ — min/max grid, quantize/dequantize,
    # rounded approximate rank, 5x oversample, exact rescore are all
    # closed-form, so the int8 quantizer joins the sign-bit one under
    # the driver hash (PQ/IVF stay recall-tested: iteratively trained)
    "ann_sq8_cosine": ORACLE_ANN_SQ8_COSINE,
    "ann_ivf_cosine_fixed": ORACLE_ANN_IVF_COSINE_FIXED,  # new r10
    "substring_dedup_hashed_portable": ORACLE_SUBSTRING_DEDUP_HASHED_PORTABLE,  # new r10
    # r9: MMR promoted — the greedy diversified rerank replayed as a
    # DuckDB recursive CTE over explicit (selected-set, running
    # max-sim) state; all ten greedy steps per query under the hash
    "mmr_rerank": ORACLE_MMR_RERANK,
    # r9: per-doc first-seen gram fraction — the corpus-order novelty
    # profile next to the dedup family (same gram kernel)
    "gram_novelty": ORACLE_GRAM_NOVELTY,
    "incremental_gram_novelty": ORACLE_INCREMENTAL_GRAM_NOVELTY,
    # r9: the deterministic (portable-hash) stratified sampler — full
    # membership under the hash, next to the seeded rows-only one
    "stratified_sample_hash": ORACLE_STRATIFIED_SAMPLE_HASH,
    # r9: grouped (diversify-by-label) search — struct-min per group
    "search_grouped": ORACLE_SEARCH_GROUPED,
    # r9: exact-phrase adjacency search, map-only token-window fold
    "fulltext_phrase": ORACLE_FULLTEXT_PHRASE,
    "fulltext_phrase_cjk": ORACLE_FULLTEXT_PHRASE_CJK,
    "pii_scrub": ORACLE_PII_SCRUB,
    "benchmark_decontaminate": ORACLE_BENCHMARK_DECONTAMINATE,
    "decontaminate_fraction": ORACLE_DECONTAMINATE_FRACTION,  # new r9
    "incremental_decontaminate_fraction": ORACLE_INCREMENTAL_DECONTAMINATE_FRACTION,  # new r10
    "unigram_logprob": ORACLE_UNIGRAM_LOGPROB,
    "perplexity_filter": ORACLE_PERPLEXITY_FILTER,
    "dsir_weights": ORACLE_DSIR_WEIGHTS,
    "gopher_quality_filter": ORACLE_GOPHER_QUALITY_FILTER,
    "c4_quality_filter": ORACLE_C4_QUALITY_FILTER,
    "bigram_logprob": ORACLE_BIGRAM_LOGPROB,
    "training_shards": ORACLE_TRAINING_SHARDS,
    "ewma_smooth": ORACLE_EWMA_SMOOTH,
    "source_quota": ORACLE_SOURCE_QUOTA,
    "incremental_dedup": ORACLE_INCREMENTAL_DEDUP,
    "profile_table": ORACLE_PROFILE_TABLE,
    "equidepth_histogram": ORACLE_EQUIDEPTH_HISTOGRAM,
    "lang_top_terms": ORACLE_LANG_TOP_TERMS,
    # the skew-safe two-phase top-k must be hash-identical to the plain
    # window, so it shares the oracle verbatim
    "group_topk_salted": ORACLE_GROUP_TOPK,
    "label_centroids": ORACLE_LABEL_CENTROIDS,
    "attribution_last_touch": ORACLE_ATTRIBUTION_LAST_TOUCH,
    "audio_probe": ORACLE_AUDIO_PROBE,
    "video_frames": ORACLE_VIDEO_FRAMES,
    "embedding_outliers": ORACLE_EMBEDDING_OUTLIERS,
    "rolling_active_users": ORACLE_ROLLING_ACTIVE_USERS,
    "search_flat_l2": ORACLE_SEARCH_FLAT_L2,
    "search_flat_ip": ORACLE_SEARCH_FLAT_IP,
    "search_radius": ORACLE_SEARCH_RADIUS,
    "search_by_id": ORACLE_SEARCH_BY_ID,
    "search_udtf_topk": ORACLE_SEARCH_UDTF_TOPK,
    "knn_join": ORACLE_KNN_JOIN,
    "query_filter_sort_paginate": ORACLE_QUERY_FILTER_SORT_PAGINATE,
    "query_by_ids": ORACLE_QUERY_BY_IDS,
    "count_filter": ORACLE_COUNT_FILTER,
    "query_projection": ORACLE_QUERY_PROJECTION,
    "ttl_filter": ORACLE_TTL_FILTER,
    "json_extract": ORACLE_JSON_EXTRACT,
    "upsert_merge": ORACLE_UPSERT_MERGE,
    "update_conditional": ORACLE_UPDATE_CONDITIONAL,
    "delete_filter_limit": ORACLE_DELETE_FILTER_LIMIT,
    "fulltext_bm25": ORACLE_FULLTEXT_BM25,
    "fulltext_bm25_cjk": ORACLE_FULLTEXT_BM25_CJK,
    "multimodal_features": ORACLE_MULTIMODAL_FEATURES,
    "pdf_extract": ORACLE_PDF_EXTRACT,
    "doc_extract": ORACLE_DOC_EXTRACT,
    "ppt_extract": ORACLE_PPT_EXTRACT,
    "xls_extract": ORACLE_XLS_EXTRACT,
    "docx_extract": ORACLE_DOCX_EXTRACT,
    "pptx_extract": ORACLE_PPTX_EXTRACT,
    "xlsx_extract": ORACLE_XLSX_EXTRACT,
    "rtf_extract": ORACLE_RTF_EXTRACT,
    "epub_extract": ORACLE_EPUB_EXTRACT,
    "gif_frames": ORACLE_GIF_FRAMES,
    "lang_id_cjk": ORACLE_LANG_ID_CJK,
    "hybrid_rrf": ORACLE_HYBRID_RRF,
    "sparse_encode": ORACLE_SPARSE_ENCODE,
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "doc_fingerprint": ORACLE_DOC_FINGERPRINT,
    "text_quality": ORACLE_TEXT_QUALITY,
    "doc_repetition": ORACLE_DOC_REPETITION,
    "lang_id": ORACLE_LANG_ID,
    "minhash_signatures": ORACLE_MINHASH_SIGNATURES,
    "minhash_lsh_candidates": ORACLE_MINHASH_LSH_CANDIDATES,
    "dedup_components": ORACLE_DEDUP_COMPONENTS,
    "ngram_jaccard_pairs": ORACLE_NGRAM_JACCARD_PAIRS,
    "embedding_near_dup": ORACLE_EMBEDDING_NEAR_DUP,
    "semantic_dedup": ORACLE_SEMANTIC_DEDUP,
    "group_topk": ORACLE_GROUP_TOPK,
    "agg_groupby_stats": ORACLE_AGG_GROUPBY_STATS,
    "simhash_fingerprint": ORACLE_SIMHASH_FINGERPRINT,
    "simhash_near_dup": ORACLE_SIMHASH_NEAR_DUP,
    "token_count": ORACLE_TOKEN_COUNT,
    "hybrid_weighted": ORACLE_HYBRID_WEIGHTED,
    "chunk_expand": ORACLE_CHUNK_EXPAND,
    "join_pruned_dims": ORACLE_JOIN_PRUNED_DIMS,
    "window_running": ORACLE_WINDOW_RUNNING,
    "rollup_agg": ORACLE_ROLLUP_AGG,
    "window_funcs": ORACLE_WINDOW_FUNCS,
    "scalar_funcs": ORACLE_SCALAR_FUNCS,
    "cube_agg": ORACLE_CUBE_AGG,
    "percentiles": ORACLE_PERCENTILES,
    "semi_anti_join": ORACLE_SEMI_ANTI_JOIN,
    "set_ops": ORACLE_SET_OPS,
    "event_window_agg": ORACLE_EVENT_WINDOW_AGG,
    "sliding_window_agg": ORACLE_SLIDING_WINDOW_AGG,
    "price_histogram": ORACLE_PRICE_HISTOGRAM,
    "asof_join": ORACLE_ASOF_JOIN,
    "interval_join": ORACLE_INTERVAL_JOIN,
    "sessionize": ORACLE_SESSIONIZE,
    "multimodal_meta": ORACLE_MULTIMODAL_META,
    "grouping_sets_agg": ORACLE_GROUPING_SETS_AGG,
    "pivot_wide": ORACLE_PIVOT_WIDE,
    "unpivot_long": ORACLE_UNPIVOT_LONG,
    "pricing_summary": ORACLE_PRICING_SUMMARY,
    "top_revenue_orders": ORACLE_TOP_REVENUE_ORDERS,
    "correlated_subquery": ORACLE_CORRELATED_SUBQUERY,
    "clean_text": ORACLE_CLEAN_TEXT,
    "line_dedup": ORACLE_LINE_DEDUP,
    "incremental_line_dedup": ORACLE_INCREMENTAL_LINE_DEDUP,  # new r9
    "substring_dedup_cjk": ORACLE_SUBSTRING_DEDUP_CJK,
    # r11: the hashed CJK lane's portable-keyed witness — DuckDB runs
    # the reduced-key dataflow end-to-end (hash-pair dup aggregate,
    # keyed coverage join) that the xxhash64 production lane ships
    "substring_dedup_cjk_hashed": ORACLE_SUBSTRING_DEDUP_CJK_HASHED,
    "substring_dedup": ORACLE_SUBSTRING_DEDUP,
    "incremental_substring_dedup": ORACLE_INCREMENTAL_SUBSTRING_DEDUP,
    "dataset_mix": ORACLE_DATASET_MIX,
    "dataset_mix_temp": ORACLE_DATASET_MIX_TEMP,
    "incremental_substring_dedup_cjk": ORACLE_INCREMENTAL_SUBSTRING_DEDUP_CJK,
    "dataset_split": ORACLE_DATASET_SPLIT,
    # stratified_sample: intentionally no oracle (engine RNG; property test)
    # embedding_near_dup_ivf: intentionally no oracle (iterative KMeans;
    # recall vs the exact operator asserted in pytest)
    "curate_corpus": ORACLE_CURATE_CORPUS,
    # r9: the two r8-deferred registrations land (the r8 batch had no
    # slot slack against the 45 age-capped rows; this round's front
    # batch carries them as forced entries)
    "curate_corpus_v2": ORACLE_CURATE_CORPUS_V2,
    "incremental_semantic_dedup": ORACLE_INCREMENTAL_SEMANTIC_DEDUP,
    "nation_volume_shipping": ORACLE_NATION_VOLUME_SHIPPING,
    "national_market_share": ORACLE_NATIONAL_MARKET_SHARE,
    "order_priority_check": ORACLE_ORDER_PRIORITY_CHECK,
    "customer_distribution": ORACLE_CUSTOMER_DISTRIBUTION,
    "promo_revenue": ORACLE_PROMO_REVENUE,
    "returned_item_revenue": ORACLE_RETURNED_ITEM_REVENUE,
    "local_supplier_volume": ORACLE_LOCAL_SUPPLIER_VOLUME,
    "forecast_revenue_change": ORACLE_FORECAST_REVENUE_CHANGE,
    "small_quantity_revenue": ORACLE_SMALL_QUANTITY_REVENUE,
    "large_volume_customers": ORACLE_LARGE_VOLUME_CUSTOMERS,
    "time_gap_fill": ORACLE_TIME_GAP_FILL,
    "window_range_frame": ORACLE_WINDOW_RANGE_FRAME,
    "zscore_outliers": ORACLE_ZSCORE_OUTLIERS,
    "corr_stats": ORACLE_CORR_STATS,
    # heavy_hitters: intentionally no oracle (sketch boundary ties are
    # engine-specific; exactness asserted in pytest)
    "percentile_disc": ORACLE_PERCENTILE_DISC,
    "funnel_steps": ORACLE_FUNNEL_STEPS,
    "retention_cohorts": ORACLE_RETENTION_COHORTS,
    "search_by_text": ORACLE_SEARCH_BY_TEXT,  # oracled r8 (was rows-only)
    # r11: frozen-weights classifier scoring — the last big rows-only
    # curation operator's dataflow gains a hash witness (the trained
    # lane stays rows-only: training has no SQL oracle)
    "quality_classifier_frozen": ORACLE_QUALITY_CLASSIFIER_FROZEN,
    # r11: frozen-basis PCA projection — the map-only matmul dataflow
    # under the driver hash (the trained-basis lane stays rows-only)
    "embedding_pca_fixed": ORACLE_EMBEDDING_PCA_FIXED,
    # r11: frozen-codebook PQ — the last quantized family's partial
    # path (encode -> ADC -> oversample -> rescore) under the hash
    "ann_pq_cosine_fixed": ORACLE_ANN_PQ_COSINE_FIXED,
    # r11: frozen-plane LSH — the bucket-prune OR-amplification under
    # the hash; completes the per-index-family witness set
    "ann_lsh_l2_fixed": ORACLE_ANN_LSH_L2_FIXED,
    # r11: the four r10-staged promotions land. Their oracles were
    # written in r10 and pytest-pinned bit-equal to the Spark side at
    # BOTH sf0.001 and sf0.01 (tests/test_staged_oracles.py,
    # tests/test_bpe.py), so registration is the planned zero-risk
    # one-liner; crossing 152 oracled lifts the rotation cap to
    # ceil(152/50) = 4.
    "bpe_token_count_frozen": ORACLE_BPE_TOKEN_COUNT_FROZEN,
    "weighted_sample_hash": ORACLE_WEIGHTED_SAMPLE_HASH,
    "winnow_fingerprint": ORACLE_WINNOW_FINGERPRINT,
    "token_entropy": ORACLE_TOKEN_ENTROPY,
    # multimodal_features / ann_ivf_cosine / ann_lsh_l2:
    # intentionally no oracle (rows-only checks)
}
