"""Distributed connected components over a pair-edge list.

Near-duplicate candidates (MinHash/SimHash/embedding) form an
undirected graph; deduplication keeps one representative per CONNECTED
COMPONENT, not per pair. The one-pass bucket-min domination used inside
``pipelines.near_dedup_stage`` is exact for pair groups but can keep
two docs of a longer chain (a-b, b-c with a<b<c keeps a and can keep c
if b was c's only bucket-mate). This operator closes that gap exactly.

Algorithm: iterative min-label propagation — every node starts labeled
with its own id, and each round takes the min label over itself and its
neighbors. Converges to min-reachable-id per component in O(diameter)
rounds (near-dup chains are shallow; boilerplate mega-clusters are star
shaped through their bucket minimum, so diameter stays small).

Scale shape: each round is one equi-join of the label table with the
symmetrized edge list plus one groupBy-min — both shuffle on the node
key, so successive rounds reuse the same hash partitioning; nothing is
collected to the driver (the convergence probe is a LIMIT 1 count).
Lineage is truncated every round with an eager ``localCheckpoint`` so
the plan doesn't grow with iterations (the standard Spark iterative
pattern; on a cluster swap in ``checkpoint()`` on HDFS for executor
fault tolerance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    smallest node id in its connected component.

    Returns a DataFrame (node, component). Only nodes that appear in at
    least one edge are returned (isolated docs need no dedup decision).
    Raises ``RuntimeError`` if the propagation hasn't converged after
    ``max_iter`` rounds (diameter larger than max_iter — raise it)."""
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # Materialize the symmetrized edge list ONCE: every round joins it,
    # and without this the whole upstream candidate pipeline (shingles,
    # md5 minhashes, bucket expansion) re-executes per iteration.
    sym = und.union(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = sym.join(labels, sym.b == labels.node).select(
            sym.a.alias("node"), F.col("label")
        )
        # hop feeds the union AND both sides of the jump self-join.
        # ReuseExchange dedups its shuffle write; only the small
        # post-shuffle HashAggregate re-executes per occurrence (measured
        # cheaper here than persist/localCheckpoint round-trips — on a
        # cluster where the label table is large, persist() this).
        hop = (
            labels.union(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # Pointer jumping: also adopt the label OF my label. Halves the
        # distance to the component minimum every round, so convergence
        # is O(log diameter) instead of O(diameter) — on a 100 TB
        # near-dup graph with million-doc boilerplate components that is
        # ~20 rounds, not ~thousands.
        jump = hop.alias("h").join(
            hop.alias("r"), F.col("h.label") == F.col("r.node")
        ).select(F.col("h.node").alias("node"), F.col("r.label").alias("label"))
        new_labels = (
            hop.union(jump)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") < F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the graph diameter exceeds max_iter"
    )
