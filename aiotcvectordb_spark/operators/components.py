"""Distributed connected components over a pair-edge list.

Near-duplicate candidates (MinHash/SimHash/embedding) form an
undirected graph; deduplication keeps one representative per CONNECTED
COMPONENT, not per pair. The one-pass bucket-min domination used inside
``pipelines.near_dedup_stage`` is exact for pair groups but can keep
two docs of a longer chain (a-b, b-c with a<b<c keeps a and can keep c
if b was c's only bucket-mate). This operator closes that gap exactly.

Algorithm: alternating large-star / small-star contraction (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
MapReduce and Beyond", SoCC'14). Each round rewrites the EDGE LIST so
every node points closer to its component minimum:

- large-star: for each node u, every strictly-larger neighbor is
  re-attached to m(u) = min(N(u) ∪ {u});
- small-star: orient edges high→low, then every smaller neighbor of u
  (and u itself) is re-attached to its minimum.

Alternating the two provably converges to per-component stars in
O(log n) rounds INDEPENDENT of how node ids correlate with the graph
topology. (The previous min-label + pointer-jumping formulation hit its
adversarial case in practice: on an LSH chain whose doc-id order zigzags
along the chain, label-of-label jumps stop doubling reach and
convergence degrades to O(diameter).)

Scale shape: each half-round is one groupBy-min plus one equi-join,
both shuffling on the node key, so rounds reuse the same hash
partitioning; the edge list only shrinks (contraction), and the
convergence probe is a LIMIT 1 count on a set-difference. Lineage is
truncated every round with an eager ``localCheckpoint``; on a real
cluster swap in ``checkpoint()`` to HDFS for executor fault tolerance.

Execution is adaptively two-phase: every round re-counts the (just
materialized) edge list and, once contraction shrinks the parent forest
under a bounded cap, finishes it exactly with driver-side union-find —
the distributed rounds do the O(N) work; the collect is capped by
``local_finish_edges`` and never sees the raw candidate graph.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Round materializations are DISK-backed: a memory-first local
# checkpoint can lose an evicted block under pressure (observed at the
# 100x probe: "Block rdd_N does not exist" after MemoryStore
# evictions), and a lost block is unrecoverable once lineage is
# truncated. Disk blocks never evict; the per-round edge list is the
# contracted forest, so the I/O is modest and shrinking.
_ROUND_LEVEL = StorageLevel.DISK_ONLY


def _large_star(edges: DataFrame) -> DataFrame:
    """(a, b) undirected → re-attach each larger endpoint to the min of
    the smaller endpoint's closed neighborhood."""
    sym = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    mins = (
        sym.groupBy("a")
        .agg(F.min("b").alias("_mnb"))
        .select("a", F.least("a", "_mnb").alias("m"))
    )
    # No distinct here: duplicate edges don't change any groupBy-min and
    # the small-star half that always follows dedupes its output — saves
    # one shuffle per round.
    return (
        sym.join(mins, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .where(F.col("a") != F.col("b"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient high→low, then re-attach each node's smaller neighbors
    (and the node itself) to the minimum of that down-neighborhood."""
    down = edges.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    )
    mins = down.groupBy("a").agg(F.min("b").alias("m"))
    reattached = (
        down.join(mins, "a")
        .where(F.col("b") != F.col("m"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )
    selfs = mins.select(F.col("a"), F.col("m").alias("b"))
    return (
        reattached.union(selfs)
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _local_union_find(rows) -> dict:
    """Exact union-find with path compression over a BOUNDED collected
    edge list (the contracted parent forest, never the raw candidate
    graph). Returns node -> component-min for every node seen."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 25,
    local_finish_edges: int = 200_000,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    smallest node id in its connected component.

    Returns a DataFrame (node, component). Only nodes that appear in at
    least one edge are returned (isolated docs need no dedup decision).

    Adaptive two-phase execution: each round re-counts the edge list (a
    cheap action on the just-checkpointed materialization) and picks a
    strategy. While the parent forest is larger than
    ``local_finish_edges`` the round runs a distributed large-star /
    small-star alternation; once contraction shrinks it under the cap,
    the BOUNDED remainder is collected and finished exactly with
    union-find — the standard two-phase CC shape (distributed contract,
    bounded local finish). The collect is capped by the parameter (never
    O(N) — at 100 TB the distributed path simply keeps contracting);
    pass ``local_finish_edges=0`` to force pure-distributed iteration to
    the star fixpoint.

    Raises ``RuntimeError`` if the contraction hasn't converged after
    ``max_iter`` rounds (O(log n) expected — at that point something is
    wrong with the input, e.g. null ids)."""
    # Materialize the input ONCE: every round reads it, and without this
    # the whole upstream candidate pipeline (shingles, md5 minhashes,
    # bucket expansion) would re-execute per iteration.
    cur = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True, storageLevel=_ROUND_LEVEL)
    )
    spark = cur.sparkSession
    node_type = cur.schema["a"].dataType
    for _ in range(max_iter):
        if local_finish_edges and cur.count() <= local_finish_edges:
            labels = _local_union_find(
                (r[0], r[1]) for r in cur.toLocalIterator()
            )
            from pyspark.sql.types import StructField, StructType

            schema = StructType(
                [
                    StructField("node", node_type, False),
                    StructField("component", node_type, False),
                ]
            )
            return spark.createDataFrame(
                list(labels.items()), schema=schema
            )
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True, storageLevel=_ROUND_LEVEL)
        # Star fixpoint = edge SET unchanged. Both frames are distinct,
        # so one LIMIT-1 probe over the symmetric difference decides
        # equality in a single job; the edge list only shrinks under
        # contraction, so the probe gets cheaper every round.
        changed = (
            nxt.exceptAll(cur).union(cur.exceptAll(nxt)).limit(1).count()
        )
        cur = nxt
        if changed == 0:
            return (
                cur.select(F.col("a").alias("node"), F.col("b").alias("component"))
                .union(
                    cur.select(
                        F.col("b").alias("node"), F.col("b").alias("component")
                    )
                )
                .distinct()
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "check the input for null/NaN node ids"
    )
