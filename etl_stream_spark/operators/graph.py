"""Link analysis over relational-derived graphs: deterministic integer
PageRank.

The companion of the dedup stack's connected components
(``operators/dedup.py::duplicate_clusters``): CC answers "which nodes
form one group", PageRank answers "which nodes matter" — the standard
importance prior for curation (e.g. weighting documents by the link
graph, ranking suppliers by shared-customer centrality).

Determinism discipline (the repo rule — no float accumulation): ranks
are BIGINTs scaled by ``SCALE``; every division is integral ``div``,
so a run is bit-identical across engines, partitionings, and repeat
executions. The truncation bias is deterministic and bounded by one
scaled unit per in-edge per iteration — at ``SCALE = 10^12`` that is
noise relative to rank magnitudes, and both the Spark plan and a SQL
oracle reproduce it exactly (classic double-rounding pitfalls cannot
arise: there are no doubles).

Scale shape per iteration: one equi-join of the rank vector to the
edge list on the source key and one map-side-combinable sum by
destination — the canonical Pregel step as two shuffles bounded by
|E| and |V|; lineage is cut per round (lazy ``localCheckpoint``, the
CC precedent) so the plan stays flat at any iteration count. The only
driver-side value is the node count (one scalar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Scaled-integer PageRank over a directed edge list (symmetrize
    upstream for an undirected graph). Returns ``(node, rank)`` with
    ``rank`` summing to ≈ ``SCALE`` (minus deterministic truncation).

    ``rank_{k+1}(v) = (den-num)·SCALE div (den·N)
                      + num·Σ_{u→v}(rank_k(u) div outdeg(u)) div den``

    Every node present at either edge end participates; the derived
    edge lists this operator targets have no dangling sources (a node
    appears with ≥1 out-edge after symmetrization)."""
    e = (
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    n_nodes = nodes.count()  # the single bounded driver-side scalar
    base = ((damping_den - damping_num) * SCALE) // (damping_den * n_nodes)

    ranks = nodes.select("node", F.lit(SCALE // n_nodes).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "_src"), "_src")
            .join(outdeg, "_src")
            .select(
                F.col("_dst").alias("node"),
                F.expr("rank div _deg").alias("_c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * coalesce(_s, 0L)) div {damping_den}"
                    )
                )
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
