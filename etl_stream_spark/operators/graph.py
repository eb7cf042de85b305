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


def triangle_stats(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
) -> DataFrame:
    """Global triangle census over a canonical undirected edge list
    (every edge stored once with ``a < b``; callers building
    co-occurrence graphs get this for free from the ``<`` in the
    pairing self-join).

    Returns ONE row: ``n_nodes``, ``n_edges``, ``n_wedges`` (paths of
    length two, ``sum over nodes of C(deg, 2)``), ``n_triangles``, and
    the global clustering coefficient ``3 * triangles / wedges``
    (0.0 when wedge-free).

    Algorithm: the id-oriented two-join census — for edges (a,b), (b,c)
    with a<b<c, probe for the closing (a,c); each triangle is produced
    exactly once because its vertices appear in only one sorted order.
    This is the MapReduce-classic node-iterator+orientation form
    (Suri & Vassilvitskii, "Counting Triangles and the Curse of the
    Last Reducer", WWW'11 — public): orientation bounds the join fan-out
    by the max ORIENTED degree, and a support threshold upstream is
    what keeps |E| itself subquadratic at 100 TB. Wedge counts are
    exact integers (degree products), so the whole row is
    engine-deterministic.
    """
    # lazily checkpointed: the census consumes the edge list SIX times
    # (two degree union legs, three join legs, the edge count), and
    # callers hand in non-trivial subtrees (the co-purchase entry's
    # lineitem pair join) that would otherwise be re-derived per leg —
    # the dedup_clusters fork-recompute discipline
    e = edges.select(F.col(a).alias("_a"), F.col(b).alias("_b")).localCheckpoint(
        eager=False
    )
    deg = (
        e.select(F.col("_a").alias("_x"))
        .unionAll(e.select(F.col("_b").alias("_x")))
        .groupBy("_x")
        .agg(F.count(F.lit(1)).cast("long").alias("_d"))
    )
    node_stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.expr("(_d * (_d - 1L)) div 2")).cast("long").alias("n_wedges"),
    )
    e2 = e.select(F.col("_a").alias("_b"), F.col("_b").alias("_c"))
    e3 = e.select(F.col("_a").alias("_a3"), F.col("_b").alias("_c3"))
    tri = (
        e.join(e2, "_b")
        .join(
            e3,
            (F.col("_a") == F.col("_a3")) & (F.col("_c") == F.col("_c3")),
            "inner",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    edge_count = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    out = node_stats.crossJoin(edge_count).crossJoin(tri)
    return out.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(
            F.when(
                F.col("n_wedges") > 0,
                (F.lit(3.0) * F.col("n_triangles")) / F.col("n_wedges"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("global_clustering"),
    )
