"""Async facade: awaitable round-trip and concurrent searches
(the reference's calling convention — stub.py's AsyncVectorDBClient)."""

from __future__ import annotations

import asyncio

from aiotcvectordb_spark.aio import AsyncVectorDBEngine
from aiotcvectordb_spark.catalog import IndexField


def test_async_roundtrip_and_concurrent_search(spark, tmp_path):
    aeng = AsyncVectorDBEngine(spark, str(tmp_path / "vdb"))

    async def flow():
        await aeng.create_database("db0")
        await aeng.create_collection(
            "db0",
            "docs",
            indexes=[
                IndexField(name="id", kind="primary_key", field_type="string"),
                IndexField(
                    name="vector", kind="vector", field_type="vector",
                    metric_type="COSINE", index_type="FLAT", dimension=3,
                ),
                IndexField(name="tag", kind="filter", field_type="string"),
            ],
        )
        n = await aeng.upsert(
            "db0",
            "docs",
            [
                {"id": f"d{i}", "vector": [0.1 * i, 0.2, 0.3], "tag": "ab"[i % 2]}
                for i in range(10)
            ],
        )
        assert n["affectedCount"] == 10
        # concurrent searches overlap on the event loop (reference
        # overlaps HTTP requests the same way)
        r1, r2 = await asyncio.gather(
            aeng.search("db0", "docs", [[0.1, 0.2, 0.3]], limit=3),
            aeng.search(
                "db0", "docs", [[0.5, 0.2, 0.3]], limit=3, filter="tag = 'a'"
            ),
        )
        assert len(r1) == 1 and len(r1[0]) == 3
        assert all(hit["tag"] == "a" for hit in r2[0])
        assert await aeng.count("db0", "docs") == 10

    asyncio.run(flow())


def test_aio_read_consistency_accepted(spark, tmp_path):
    """Constructor + per-call read_consistency on the async facade
    (reference AsyncVectorDBClient ctor, stub.py:29)."""
    import asyncio

    from aiotcvectordb_spark.aio import AsyncVectorDBEngine
    from aiotcvectordb_spark.params import ReadConsistency

    aeng = AsyncVectorDBEngine(
        spark,
        str(tmp_path / "aio_rc"),
        read_consistency=ReadConsistency.EVENTUAL_CONSISTENCY,
    )

    async def flow():
        await aeng.create_database("db0")
        await aeng.create_collection(
            "db0",
            "docs",
            indexes=[
                IndexField(name="id", kind="primary_key", field_type="string"),
                IndexField(
                    name="vector", kind="vector", field_type="vector",
                    metric_type="COSINE", index_type="FLAT", dimension=3,
                ),
            ],
        )
        await aeng.upsert(
            "db0", "docs", [{"id": "a", "vector": [1.0, 0.0, 0.0]}]
        )
        hits = await aeng.search(
            "db0", "docs", [[1.0, 0.0, 0.0]], limit=1,
            read_consistency=ReadConsistency.STRONG_CONSISTENCY,
        )
        assert hits[0][0]["id"] == "a"
        assert await aeng.count(
            "db0", "docs", read_consistency="eventualConsistency"
        ) == 1

    asyncio.run(flow())
