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
