"""Integer PageRank (operators/graph.py): parity with a pure-Python
reference, partitioning invariance, mass conservation."""

from __future__ import annotations

from etl_stream_spark.operators.graph import SCALE, pagerank


def py_pagerank(edge_list, iterations=3, num=85, den=100):
    nodes = sorted({n for e in edge_list for n in e})
    n = len(nodes)
    outdeg = {}
    for s, _d in edge_list:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = ((den - num) * SCALE) // (den * n)
    r = {v: SCALE // n for v in nodes}
    for _ in range(iterations):
        s = {v: 0 for v in nodes}
        for u, v in edge_list:
            s[v] += r[u] // outdeg[u]
        r = {v: base + (num * s[v]) // den for v in nodes}
    return r


def sym(pairs):
    e = set()
    for a, b in pairs:
        e.add((a, b))
        e.add((b, a))
    return sorted(e)


def test_matches_python_reference(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (1, 4), (4, 5), (6, 1)]
    edges = sym(pairs)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r["rank"] for r in pagerank(df, iterations=3).collect()}
    assert got == py_pagerank(edges, iterations=3)
    # hub node 4 (degree 3) outranks leaf node 5 (degree 1)
    assert got[4] > got[5]


def test_partitioning_invariant_and_mass_conserved(spark):
    edges = sym((i, (i * 3 + 1) % 17) for i in range(17))
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, pagerank(df.repartition(1), iterations=2).collect()))
    b = sorted(map(tuple, pagerank(df.repartition(9, "dst"), iterations=2).collect()))
    assert a == b
    total = sum(r for _n, r in a)
    n = len({x for e in edges for x in e})
    # truncation only ever loses mass, deterministically, and at most
    # ~1 unit per div: n divs at init + (|E| + n) per iteration
    assert SCALE - (2 * (len(edges) + n) + n) <= total <= SCALE

class TestTriangleStats:
    def _stats(self, spark, edges):
        from etl_stream_spark.operators.graph import triangle_stats

        df = spark.createDataFrame(edges, "a long, b long")
        return triangle_stats(df).collect()[0]

    def test_single_triangle(self, spark):
        r = self._stats(spark, [(1, 2), (2, 3), (1, 3)])
        assert (r.n_nodes, r.n_edges, r.n_triangles) == (3, 3, 1)
        # each node closes one wedge -> 3 wedges, clustering 3*1/3 = 1.0
        assert (r.n_wedges, r.global_clustering) == (3, 1.0)

    def test_path_has_wedge_but_no_triangle(self, spark):
        r = self._stats(spark, [(1, 2), (2, 3)])
        assert (r.n_triangles, r.n_wedges) == (0, 1)
        assert r.global_clustering == 0.0

    def test_k4_counts_four_triangles_once_each(self, spark):
        edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        r = self._stats(spark, edges)
        assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)
        # every node has degree 3 -> 4 * C(3,2) = 12 wedges
        assert r.n_wedges == 12 and r.global_clustering == 1.0

    def test_disconnected_components_sum(self, spark):
        r = self._stats(spark, [(1, 2), (2, 3), (1, 3), (10, 11)])
        assert (r.n_nodes, r.n_triangles) == (5, 1)
