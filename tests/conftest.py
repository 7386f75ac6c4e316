from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from aiotcvectordb_spark.session import get_spark

    s = get_spark("tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from aiotcvectordb_spark.engine import VectorDBEngine

    return VectorDBEngine(spark, str(tmp_path / "vdb"))


def load_events(spark, sf_dir: str):
    """Events table with ts normalized to BIGINT epoch-nanos (the
    engine's canonical event-time form) regardless of whether the
    parquet stores TIMESTAMP(NANOS) or TIMESTAMP(MICROS)."""
    from aiotcvectordb_spark.sources.event_time import normalize_event_time

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return normalize_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))


def write_events_source(spark, sf_dir: str, dest) -> None:
    """Materialize a normalized copy of the events table for streaming
    sources (readStream needs a fixed schema; normalizing first keeps ts
    a BIGINT there too)."""
    load_events(spark, sf_dir).coalesce(4).write.mode("overwrite").parquet(str(dest))
