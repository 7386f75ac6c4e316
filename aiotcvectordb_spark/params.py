"""Vendor-style search parameter objects.

The reference's hybrid search takes param objects — ``ann: AnnSearch``,
``match: KeywordSearch``, ``rerank: RRFRerank | WeightedRerank``
(reference aiotcvectordb/client/stub.py:737-780, model re-exports at
aiotcvectordb/model/__init__.py) — and follows a single-vs-list
convention: a single ``AnnSearch`` in means a single hit-list out
(reference collection.py:344-354, 399-401). These thin dataclasses give
a reference user the same call shapes on this engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


@dataclass
class AnnSearch:
    """Dense leg: one query vector over ``field_name``."""

    data: list[float]
    field_name: str = "vector"
    params: dict = field(default_factory=dict)  # e.g. {'ef': 10, 'nprobe': 4}


@dataclass
class KeywordSearch:
    """Sparse leg: query text BM25-encoded against the postings index.
    ``terminate_after`` / ``cutoff_frequency`` as in reference
    stub.py:807-810."""

    data: str
    field_name: str = "sparse_vector"
    terminate_after: int | None = None
    cutoff_frequency: float | None = None


@dataclass
class RRFRerank:
    k: int = 60

    def to_dict(self) -> dict:
        return {"type": "rrf", "k": self.k}


@dataclass
class WeightedRerank:
    weights: list[float] = field(default_factory=lambda: [0.5, 0.5])

    def to_dict(self) -> dict:
        return {"type": "weighted", "weights": list(self.weights)}


class ReadConsistency(str, Enum):
    """Per-client/per-call consistency hint (reference stub.py:29,
    collection.py:658,681 — injected into every query/search body as
    ``readConsistency``). This engine reads immutable parquet snapshots,
    so every read IS strongly consistent and the setting is a validated
    no-op, accepted everywhere the reference accepts it."""

    STRONG_CONSISTENCY = "strongConsistency"
    EVENTUAL_CONSISTENCY = "eventualConsistency"


def validate_read_consistency(value):
    """Accept a ReadConsistency, its name, or its wire value; None passes
    through. Raises ParamError on anything else (engine surface contract)."""
    if value is None:
        return None
    if isinstance(value, ReadConsistency):
        return value
    if isinstance(value, str):
        for rc in ReadConsistency:
            if value in (rc.name, rc.value):
                return rc
    from aiotcvectordb_spark.errors import ParamError

    raise ParamError(f"invalid read_consistency: {value!r}")
