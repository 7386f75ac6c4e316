"""One-time media-payload materialization (r12, verdict item #2).

Every codec query's fixture used to SYNTHESIZE its payloads (MP3/JPEG/
PDF/... encode) inside the timed query, so bench and probe rows carried
the encode cost — BASELINE.md's r11 notes concede the 100x meta-route
numbers were encode-dominated, "which a real corpus doesn't pay". At
100 TB the corpus's media bytes already live in the lake: a serving
query READS and PARSES them. This module makes the fixtures behave the
same way: each (sf_dir, kind, version) payload table is built once,
written to the payload store (``spark-warehouse/payloads`` by default,
``$SPARK_GRAFT_PAYLOAD_STORE`` to relocate), and every later run reads
the stored parquet — so steady-state measurements time the read+parse
path while the first run (or a bumped fixture VERSION) pays the encode.

Correctness is untouched: the stored bytes are exactly the builder's
deterministic output, and the DuckDB oracles check parsed fields
against the source text, not payload bytes. Bump ``version`` at any
call site whose builder's byte output changes — a stale table would
otherwise silently serve the old fixture.

Scale shape: the store write inherits the builder's partitioning
(``ensure_min_partitions`` upstream → ~32 files), and reads re-widen
via the same guard, so decode stages keep their partition parallelism
without ever shuffling payload bytes after the one-time write.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from aiotcvectordb_spark.partitioning import ensure_min_partitions


def store_base() -> str:
    env = os.environ.get("SPARK_GRAFT_PAYLOAD_STORE")
    if env:
        return env
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(here, "spark-warehouse", "payloads")


def store_path(sf_dir: str, kind: str, version: int) -> str:
    """Store location for a fixture table: keyed by the sf_dir's name
    PLUS a path hash (probe ladders synthesize scaled corpora in temp
    dirs whose basenames can collide), and the fixture version."""
    norm = os.path.abspath(os.path.normpath(sf_dir))
    tag = (
        os.path.basename(norm)
        + "-"
        + hashlib.md5(norm.encode()).hexdigest()[:8]
    )
    return os.path.join(store_base(), tag, f"{kind}_v{version}")


def payload_table(
    spark: SparkSession,
    sf_dir: str,
    kind: str,
    version: int,
    build,
    *,
    min_partitions: bool = True,
) -> DataFrame:
    """The materialized payload table for ``kind`` at ``sf_dir``,
    building it once via ``build()`` (a zero-arg callable returning the
    payload DataFrame) if the store has no complete copy. ``mode
    ("overwrite")`` makes a torn previous write self-heal: only a
    directory with Spark's ``_SUCCESS`` marker is trusted.
    ``min_partitions=False`` skips the read-side widening for callers
    whose decode cost is dominated by Python-worker spawn on tiny
    inputs (the multimodal_features note)."""
    path = store_path(sf_dir, kind, version)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        build().write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    return ensure_min_partitions(df) if min_partitions else df
