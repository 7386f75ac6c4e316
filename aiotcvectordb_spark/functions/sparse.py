"""Sparse (BM25) text encoding — tokenize, term-id, corpus-weighted.

Re-creates the client-side ``tcvdb-text`` BM25 encoder's role
(reference: pyproject.toml:13 dependency; sparse_vector =
List[[term_id, weight]] — reference stub.py:787-801) as Spark-native
column expressions:

- tokenize: lower + alphanumeric words, with CJK runs emitted as
  overlapping character bigrams (the Lucene CJKAnalyzer approach — the
  reference's encoder is jieba-segmented Chinese, so CJK text must
  produce sub-sentence tokens; bigrams are the standard public
  segmentation-free approximation). All JVM regexp/array expressions,
  codegen'd — no Python in the hot path.
- term id: ``xxhash64(token)`` (JVM-side 64-bit hash, like mmh3's role)
- weights: classic BM25 (k1=1.2, b=0.75) from corpus statistics computed
  with two aggregations (doc lengths + document frequencies).

Everything here is built-in-function only — no Python in the hot path —
so the encoder scales to any corpus Spark can scan.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75

# Tokenizer shared by spark and oracle SQL: lowercase, split on runs of
# non-alphanumeric, drop empties. (Plain word tokenizer — used by the
# corpus-statistics queries; the BM25 path below adds CJK handling.)
TOKEN_SPLIT_RE = "[^a-z0-9]+"

# CJK character classes bigrammed by the BM25 tokenizer (the Lucene
# CJKAnalyzer set): Hiragana+Katakana, CJK Ext-A, CJK Unified, Hangul.
CJK_RANGES = "぀-ヿ㐀-䶿一-鿿가-힯"
# One match per segment: a latin/digit word OR a maximal CJK run.
SEGMENT_RE = f"[a-z0-9]+|[{CJK_RANGES}]+"
_CJK_START_RE = f"^[{CJK_RANGES}]"
_SEGMENT_PAT = re.compile(SEGMENT_RE)
_CJK_START_PAT = re.compile(_CJK_START_RE)


def _TOKENS_FOR_QUERY(text: str) -> list[str]:
    """Driver-side tokenizer identical to ``bm25_tokens_col``: latin
    words as-is, CJK runs as overlapping character bigrams (single char
    for a length-1 run)."""
    out: list[str] = []
    for seg in _SEGMENT_PAT.findall(text.lower()):
        if _CJK_START_PAT.match(seg):
            if len(seg) == 1:
                out.append(seg)
            else:
                out.extend(seg[i : i + 2] for i in range(len(seg) - 1))
        else:
            out.append(seg)
    return out


def tokens_col(text_col: str) -> Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE), lambda t: t != ""
    )


# BPE pre-tokenization: latin words as units, each CJK character its
# OWN unit (BPE then learns multi-char merges from data — bigrams would
# double-count overlaps). One match per word or per CJK char.
BPE_PRETOKEN_RE = f"[a-z0-9]+|[{CJK_RANGES}]"
_BPE_PRETOKEN_PAT = re.compile(BPE_PRETOKEN_RE)


def bpe_pretokens(text: str) -> list[str]:
    """Driver/executor-side BPE pre-tokenizer (CJK-aware)."""
    return _BPE_PRETOKEN_PAT.findall(text.lower())


def bpe_pretokens_col(text_col: str) -> Column:
    """Column form of ``bpe_pretokens`` (JVM regexp_extract_all)."""
    return F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(BPE_PRETOKEN_RE), F.lit(0)
    )


def bm25_tokens_sql(col: str = "text") -> str:
    """Spark-SQL-string form of ``bm25_tokens_col`` for queries built
    with ``F.expr`` chains (shingling, slicing). Equality with the
    Column form is pinned by tests/test_cjk_text.py.

    ASCII fast path: a document with no CJK characters takes the plain
    split (one regex pass) instead of segment-extract + per-segment
    transform — the branches produce identical arrays on their domains
    (both delete every non-[a-z0-9] char when no CJK run exists), so
    this is a pure cost guard for the overwhelmingly-ASCII common case."""
    cjk_full = (
        "flatten(transform("
        f"regexp_extract_all(lower({col}), '{SEGMENT_RE}', 0), "
        f"s -> CASE WHEN s rlike '{_CJK_START_RE}' "
        "THEN transform(sequence(1, greatest(length(s) - 1, 1)), "
        "i -> substring(s, i, 2)) "
        "ELSE array(s) END))"
    )
    ascii_fast = (
        f"filter(split(lower({col}), '{TOKEN_SPLIT_RE}'), t -> t != '')"
    )
    return (
        f"CASE WHEN {col} rlike '[{CJK_RANGES}]' "
        f"THEN {cjk_full} ELSE {ascii_fast} END"
    )


def bm25_tokens_col(text_col: str) -> Column:
    """CJK-aware tokenizer for the BM25/full-text path, pure Catalyst.

    Identical to ``tokens_col`` on ASCII text (latin segments are the
    exact complement of ``TOKEN_SPLIT_RE``); CJK runs additionally emit
    overlapping character bigrams so Chinese/Japanese/Korean corpora —
    the reference encoder's home turf (jieba dependency,
    reference pyproject.toml:13; Chinese ranking test
    tests/test_documents/test_documents_search_text.py:20-33) — produce
    matchable sub-sentence terms. regexp_extract_all + transform +
    flatten: all JVM-side, no UDF. Documents with no CJK characters
    take the plain-split fast path (identical output, one regex pass —
    see ``bm25_tokens_sql``)."""
    lowered = F.lower(F.col(text_col))
    segs = F.regexp_extract_all(lowered, F.lit(SEGMENT_RE), F.lit(0))
    cjk_full = F.flatten(
        F.transform(
            segs,
            lambda s: F.when(
                s.rlike(_CJK_START_RE),
                F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.length(s) - 1, F.lit(1))
                    ),
                    lambda i: s.substr(i, F.lit(2)),
                ),
            ).otherwise(F.array(s)),
        )
    )
    ascii_fast = F.filter(
        F.split(lowered, TOKEN_SPLIT_RE), lambda t: t != ""
    )
    return F.when(
        F.col(text_col).rlike(f"[{CJK_RANGES}]"), cjk_full
    ).otherwise(ascii_fast)


def doc_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Explode documents to (id, token, tf, dl) — one row per distinct
    term per document."""
    toks = df.select(
        F.col(id_col), bm25_tokens_col(text_col).alias("__toks")
    ).withColumn("dl", F.size("__toks"))
    return (
        toks.select(id_col, "dl", F.explode("__toks").alias("token"))
        .groupBy(id_col, "dl", "token")
        .agg(F.count("*").alias("tf"))
    )


def build_postings(
    df: DataFrame, *, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Returns (postings, stats).

    postings: (term_id, token, doc id, weight) — BM25 per-term doc weight.
    stats: single row (n_docs, avgdl).
    The posting build is two shuffles (explode+groupBy, then join with
    per-term df counts); both are partial-aggregated map-side.
    """
    terms = doc_terms(df, id_col, text_col)
    stats = terms.groupBy(id_col).agg(F.first("dl").alias("dl")).agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = terms.groupBy("token").agg(F.countDistinct(id_col).alias("df"))
    # Corpus stats join in as a broadcast 1-row cross join — keeps the
    # whole build ONE lazy plan (no eager collect, no recompute of the
    # tokenize/explode chain per consumer).
    postings = (
        terms.join(dfreq, "token")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "weight",
            F.col("idf")
            * (F.col("tf") * (K1 + 1))
            / (
                F.col("tf")
                + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
            ),
        )
        .withColumn("term_id", F.xxhash64("token"))
        # n_docs rides along (constant per corpus, already broadcast):
        # consumers that need the corpus size — e.g. fractional
        # cutoff_frequency — read it lazily instead of launching a
        # df.count() job per query.
        .select("term_id", "token", F.col(id_col), "weight", "df", "n_docs")
    )
    return postings, stats


def encode_sparse_vectors(df: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """Attach a ``sparse_vector`` column: array<struct<term_id,weight>>
    (the reference's client-side encoder output shape, stub.py:801)."""
    postings, _ = build_postings(df, id_col=id_col, text_col=text_col)
    sv = postings.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("term_id"), F.col("weight")))
        ).alias("sparse_vector")
    )
    return df.join(sv, id_col, "left")
