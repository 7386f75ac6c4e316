"""Per-process media-payload materialization (r12, verdict item #2;
scoped to the process in the optimization round).

Every codec query's fixture used to SYNTHESIZE its payloads (MP3/JPEG/
PDF/... encode) inside the timed query, so bench and probe rows carried
the encode cost — BASELINE.md's r11 notes concede the 100x meta-route
numbers were encode-dominated, "which a real corpus doesn't pay". At
100 TB the corpus's media bytes already live in the lake: a serving
query READS and PARSES them. This module makes the fixtures behave the
same way: each (sf_dir, kind, version) payload table is built once PER
PROCESS, written to an ephemeral temp-dir store (removed at interpreter
exit; ``$SPARK_GRAFT_PAYLOAD_STORE`` pins a location for tests), and
every later read within the process uses the stored parquet — so the
bench's best-of-3 interleave times the read+parse path (pass 1 pays the
one-time encode; the min never includes it), while every INVOCATION of
bench or oracle still computes everything from the parquet inputs:
nothing keyed on the sf_dir persists across runs, by design — a
cross-run store would let a later benchmark run skip work a fresh
deployment must do.

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

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from aiotcvectordb_spark.partitioning import ensure_min_partitions

_EPHEMERAL_BASE: str | None = None


def store_base() -> str:
    # NOTE (advisor r12): mkdtemp honors TMPDIR, which is commonly
    # tmpfs (RAM-backed) — at bigger SFs the payload parquet can be
    # hundreds of MB per process. Point TMPDIR (or
    # SPARK_GRAFT_PAYLOAD_STORE) at disk when memory is tight.
    env = os.environ.get("SPARK_GRAFT_PAYLOAD_STORE")
    if env:
        return env
    global _EPHEMERAL_BASE
    if _EPHEMERAL_BASE is None:
        _EPHEMERAL_BASE = tempfile.mkdtemp(prefix="aiotc_payloads_")
        atexit.register(shutil.rmtree, _EPHEMERAL_BASE, True)
    return _EPHEMERAL_BASE


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
    sc = spark.sparkContext
    key = (sc.applicationId, sc.startTime, path, min_partitions)
    hit = _HANDLE_CACHE.get(key)
    if hit is not None:
        return hit
    for k in [k for k in _HANDLE_CACHE if k[:2] != key[:2]]:
        del _HANDLE_CACHE[k]
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # r13 (advisor): write to a per-process temp dir, then publish
        # with one atomic rename — under a PINNED store
        # ($SPARK_GRAFT_PAYLOAD_STORE) shared by parallel test
        # processes, the old check-then-overwrite sequence could serve
        # a reader a table mid-overwrite. If another process won the
        # rename race, trust its published copy and drop ours.
        tmp = f"{path}.tmp-{os.getpid()}"
        build().write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            # rename fails when path exists: either another process
            # published a complete copy (trust it), or a crashed one
            # left a torn dir (clear it and retry — the self-heal the
            # old overwrite provided)
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                shutil.rmtree(path, ignore_errors=True)
            try:
                os.rename(tmp, path)
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)
                if not os.path.exists(os.path.join(path, "_SUCCESS")):
                    raise
    df = spark.read.parquet(path)
    df = ensure_min_partitions(df) if min_partitions else df
    _HANDLE_CACHE[key] = df
    return df


# DataFrame-HANDLE cache (r12, the qfam.core._LOAD_CACHE pattern): a
# stored payload table is immutable for its (path, version), so the
# resolved scan — and ensure_min_partitions' ~60-100 ms driver-side
# df.rdd partition probe — runs once per session instead of once per
# query invocation. Keyed by (applicationId, startTime) so handles from
# a dead SparkContext are purged, never served stale. This memoizes a
# plan handle only, never data or results.
_HANDLE_CACHE: dict[tuple[str, int, str, bool], DataFrame] = {}
