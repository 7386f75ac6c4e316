"""Deterministic text embedding — stand-in for the server-side model.

The reference delegates text→vector to a hosted model (``bge-base-zh``,
dim 768 — reference tests/conftest.py:269 and the collection-level
``Embedding`` config). No model weights ship in this container, so we use
a deterministic feature-hashing embedder: each whitespace/punctuation
token hashes (md5) to a coordinate and a sign, counts accumulate, and the
vector is L2-normalized. Properties that matter for the API semantics
hold: identical text → identical vector; texts sharing tokens →
higher cosine; fixed dimension.

Exposed three ways: a plain Python fn (driver-side query embedding), a
pandas UDF (bulk upsert path — Arrow-vectorized), and nothing row-at-a-time.
"""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOKEN_RE = re.compile(r"[\W_]+", re.UNICODE)

# CJK runs inside a token are emitted as overlapping character bigrams
# (same classes as the sparse BM25 tokenizer) — an unsegmented Chinese
# sentence is one \w+ token, which would otherwise reduce search_by_text
# to near-exact matching on CJK corpora.
from aiotcvectordb_spark.functions.sparse import CJK_RANGES as _CJK_RANGES

_CJK_RUN_RE = re.compile(f"[{_CJK_RANGES}]+")


def _tokens(text: str) -> list[str]:
    out: list[str] = []
    for t in _TOKEN_RE.split(text.lower()):
        if not t:
            continue
        pos = 0
        for m in _CJK_RUN_RE.finditer(t):
            if m.start() > pos:
                out.append(t[pos : m.start()])
            run = m.group(0)
            if len(run) == 1:
                out.append(run)
            else:
                out.extend(run[i : i + 2] for i in range(len(run) - 1))
            pos = m.end()
        if pos < len(t):
            out.append(t[pos:])
    return out


def _embed_one(text: str, dim: int) -> list[float]:
    vec = [0.0] * dim
    for tok in _tokens(text):
        h = hashlib.md5(tok.encode("utf-8")).digest()
        idx = int.from_bytes(h[:4], "big") % dim
        sign = 1.0 if h[4] & 1 else -1.0
        vec[idx] += sign
    norm = math.sqrt(sum(x * x for x in vec))
    if norm > 0:
        vec = [x / norm for x in vec]
    return vec


class _EmbedUDF:
    """Factory for embedding callables at a given dimension."""

    def python_fn(self, dim: int):
        return lambda text: _embed_one(text or "", dim)

    def pandas_udf(self, dim: int):
        @F.pandas_udf(T.ArrayType(T.DoubleType()))
        def _udf(texts: pd.Series) -> pd.Series:
            return texts.fillna("").map(lambda t: _embed_one(t, dim))

        return _udf


embed_udf = _EmbedUDF()
