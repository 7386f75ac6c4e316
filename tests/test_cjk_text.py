"""CJK tokenization through the sparse/full-text/embedding paths.

Mirrors the reference's flagship Chinese text test
(tests/test_documents/test_documents_search_text.py:20-33: searching
"苹果" must rank the apple document first — the reference's encoder is
jieba-backed, reference pyproject.toml:13). Our public-knowledge
equivalent is CJK character bigrams (the Lucene CJKAnalyzer approach);
these tests pin the ranking behavior and the tokenizer contract.
"""

from __future__ import annotations

import pytest

from aiotcvectordb_spark.functions import sparse as sparse_fn
from aiotcvectordb_spark.functions.embedding import _tokens as embed_tokens
from aiotcvectordb_spark.operators import fulltext


CJK_DOCS = [
    ("t_apple", "苹果很好吃，我每天都吃一个大苹果"),
    ("t_banana", "香蕉是黄色的水果，猴子最爱吃香蕉"),
    ("t_grape", "葡萄可以用来酿酒，紫色的葡萄很甜"),
    ("t_en", "plain english text about fruit and apples"),
]


def test_query_tokenizer_cjk_bigrams():
    assert sparse_fn._TOKENS_FOR_QUERY("苹果") == ["苹果"]
    assert sparse_fn._TOKENS_FOR_QUERY("我喜欢苹果") == [
        "我喜", "喜欢", "欢苹", "苹果",
    ]
    # mixed script: latin words stay words, CJK runs become bigrams
    assert sparse_fn._TOKENS_FOR_QUERY("apple 苹果汁 100ml") == [
        "apple", "苹果", "果汁", "100ml",
    ]
    # single CJK char survives as itself
    assert sparse_fn._TOKENS_FOR_QUERY("茶") == ["茶"]
    # ASCII behavior identical to the plain tokenizer
    import re

    for text in ["Hello, World_3", "foo-bar baz", "", "..."]:
        old = [t for t in re.split(sparse_fn.TOKEN_SPLIT_RE, text.lower()) if t]
        assert sparse_fn._TOKENS_FOR_QUERY(text) == old


def test_spark_tokenizer_matches_python(spark):
    texts = [t for _, t in CJK_DOCS] + ["茶", "", "！？", "한국어 text です"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [r[0] for r in df.select(sparse_fn.bm25_tokens_col("text")).collect()]
    want = [sparse_fn._TOKENS_FOR_QUERY(t) for t in texts]
    assert got == want


def test_fulltext_chinese_ranks_apple_doc_first(spark):
    """The reference ranking property: query 苹果 → apple doc first."""
    df = spark.createDataFrame(CJK_DOCS, ["doc_id", "text"])
    hits = fulltext.fulltext_search_df(
        df, "苹果", id_col="doc_id", text_col="text", limit=4
    ).collect()
    assert hits, "Chinese query must match (was zero hits pre-CJK tokenizer)"
    assert hits[0]["doc_id"] == "t_apple"

    hits_b = fulltext.fulltext_search_df(
        df, "香蕉", id_col="doc_id", text_col="text", limit=4
    ).collect()
    assert hits_b[0]["doc_id"] == "t_banana"


def test_embedding_tokens_cjk_bigrams_share_terms():
    toks_doc = embed_tokens("苹果很好吃")
    toks_q = embed_tokens("苹果")
    assert "苹果" in toks_doc and toks_q == ["苹果"]
    # mixed token with latin+CJK splits into both parts
    assert embed_tokens("abc苹果def") == ["abc", "苹果", "def"]


def test_registry_cjk_query_matches_reference_semantics(spark):
    from aiotcvectordb_spark import queries as Q

    rows = Q.q_fulltext_bm25_cjk(spark, "").collect()
    assert [r["doc_id"] for r in rows][:1] == ["c_apple"]
    assert all(r["score"] > 0 for r in rows)


def test_engine_search_by_text_chinese(engine):
    """Engine-path mirror of the reference's Chinese semantic test:
    upsert Chinese docs through the ai-mode embedding path, then
    search_by_text with a related Chinese query ranks the apple doc
    first (CJK bigrams give the hash embedder shared coordinates)."""
    from aiotcvectordb_spark.catalog import IndexField

    engine.create_database("db_cjk")
    engine.create_collection(
        "db_cjk",
        "cjk_coll",
        indexes=[
            IndexField(name="id", kind="primary_key", field_type="string"),
            IndexField(
                name="vector", kind="vector", field_type="vector",
                metric_type="COSINE", index_type="FLAT", dimension=64,
            ),
        ],
        embedding={"field": "text", "vector_field": "vector", "model": "hash-embed"},
        if_not_exists=True,
    )
    engine.upsert(
        "db_cjk", "cjk_coll",
        [{"id": i, "vector": t} for i, t in CJK_DOCS],
    )
    hits = engine.search_by_text(
        "db_cjk", "cjk_coll", ["苹果好吃吗"], limit=4
    )
    assert hits[0][0]["id"] == "t_apple"
