"""Full-text (BM25) search — op 33 of the reference surface.

Semantics (reference: aiotcvectordb/client/stub.py:782-826,
aiotcvectordb/model/collection.py:403-467): score documents against a
text query by summed BM25 term weights over the sparse index; knobs
``cutoff_frequency`` (ignore terms whose document frequency exceeds the
cap — stub.py:809-810) and ``terminate_after`` (cap on scanned candidate
postings, recommended 4000 — stub.py:807-808). Single query in, single
ranked list out (collection.py:467).

Plan: postings(term, doc, weight) join broadcast(query terms) →
groupBy(doc).sum(weight) → top-k. The join is a broadcast hash join (the
query has a handful of terms) and the aggregation is map-side partial —
no full-corpus shuffle. At 100 TB the postings table is the thing you
persist once (bucketed by term_id) and reuse per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aiotcvectordb_spark.functions.sparse import build_postings, _TOKENS_FOR_QUERY


def fulltext_search_df(
    df: DataFrame,
    query_text: str,
    *,
    id_col: str = "id",
    text_col: str = "text",
    limit: int = 10,
    filter: str | None = None,
    cutoff_frequency: float | None = None,
    terminate_after: int | None = None,
    output_fields: list[str] | None = None,
    round_digits: int | None = None,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Returns (id, score, rank[, output_fields...]) ordered by BM25 desc.

    ``postings`` may be passed pre-built (the persisted-index path);
    otherwise it is derived from ``df`` on the fly.
    """
    if filter:
        df = df.filter(filter)
    if postings is None:
        postings, _ = build_postings(df, id_col=id_col, text_col=text_col)

    q_tokens = _TOKENS_FOR_QUERY(query_text)
    if not q_tokens:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, score double, rank int"
        )
    spark = df.sparkSession
    qdf = spark.createDataFrame([(t,) for t in set(q_tokens)], "token string")

    cand = postings.join(F.broadcast(qdf), "token")
    if cutoff_frequency is not None:
        # drop terms more frequent than the cap (absolute count if >=1,
        # fraction of corpus if <1 — reference stub.py:809-816 semantics)
        if cutoff_frequency >= 1:
            cand = cand.filter(F.col("df") <= cutoff_frequency)
        elif "n_docs" in cand.columns:
            # corpus size is a postings column (broadcast constant from
            # build_postings) — the fractional cutoff stays lazy, no
            # extra count job per query.
            cand = cand.filter(
                F.col("df") <= cutoff_frequency * F.col("n_docs")
            )
        else:
            # pre-built postings from an older schema without n_docs
            n_docs = df.count()
            cand = cand.filter(F.col("df") <= cutoff_frequency * n_docs)
    if terminate_after is not None:
        # early-termination analog: cap candidate postings deterministically
        # (highest-weight postings first so the approximation is best-effort)
        cand = cand.orderBy(F.col("weight").desc(), F.col(id_col).asc()).limit(
            terminate_after
        )

    scored = cand.groupBy(id_col).agg(F.sum("weight").alias("score"))
    score_col = (
        F.col("score") if round_digits is None else F.round(F.col("score"), round_digits)
    )
    # Global top-k: sort+limit compiles to TakeOrderedAndProject (local
    # per-partition top-k, driver merge — no single-partition window over
    # the full corpus); the rank window then runs over <= limit rows.
    topk = scored.orderBy(score_col.desc(), F.col(id_col).asc()).limit(limit)
    w = Window.orderBy(score_col.desc(), F.col(id_col).asc())
    out = topk.withColumn("rank", F.row_number().over(w))
    if round_digits is not None:
        out = out.withColumn("score", F.round(F.col("score"), round_digits))
    if output_fields:
        out = out.join(df.select(id_col, *output_fields), id_col, "left")
    return out.select(
        id_col, "score", "rank", *(output_fields or [])
    )
