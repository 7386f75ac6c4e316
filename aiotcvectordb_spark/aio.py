"""Async facade — the reference's client IS asyncio
(`AsyncVectorDBClient`, reference aiotcvectordb/client/stub.py:29-61),
so offer the same calling convention: every engine operator awaitable,
with the engine's blocking Spark work moved off the event loop via
``asyncio.to_thread`` (the same pattern the reference uses for its
synchronous COS SDK — reference collection_view.py:123-130).

Method names match ``VectorDBEngine`` one-for-one (which itself mirrors
the reference stub surface), so a user of the reference can port
``await client.search(...)`` calls by swapping the constructor:

    engine = AsyncVectorDBEngine(spark, root)
    await engine.create_database("db0")
    hits = await engine.search("db0", "docs", vectors, limit=10)

Concurrency note: Spark's driver accepts concurrent job submission
(scheduler pools), so ``asyncio.gather`` over several searches
overlaps their stages the same way the reference overlaps HTTP
requests over its pool of 10 connections (stub.py:31).
"""

from __future__ import annotations

import asyncio
import functools
from typing import Any

from pyspark.sql import SparkSession

from aiotcvectordb_spark.engine import VectorDBEngine


class AsyncVectorDBEngine:
    def __init__(
        self, spark: SparkSession, root: str, *, read_consistency=None, **client_kw
    ) -> None:
        # read_consistency matches the reference constructor
        # (stub.py:29); validated no-op — see VectorDBEngine.__init__.
        self._engine = VectorDBEngine(
            spark, root, read_consistency=read_consistency, **client_kw
        )

    @property
    def engine(self) -> VectorDBEngine:
        """The underlying synchronous engine (for DataFrame-returning
        helpers like ``read``/``query_df`` that you want to keep lazy)."""
        return self._engine

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(name)
        attr = getattr(self._engine, name)
        if not callable(attr):
            return attr

        @functools.wraps(attr)
        async def call(*args: Any, **kwargs: Any) -> Any:
            return await asyncio.to_thread(attr, *args, **kwargs)

        return call
