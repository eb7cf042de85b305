"""Property tests for the round-6 operators: brute-force parity and
partitioning invariance (the repo's standard evidence that an operator
is a function of the DATA, not of the split)."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestTriangleCensusProperties:
    def _brute(self, edges):
        nodes = sorted({v for e in edges for v in e})
        es = {tuple(sorted(e)) for e in edges}
        tri = sum(
            1
            for a, b, c in itertools.combinations(nodes, 3)
            if (a, b) in es and (b, c) in es and (a, c) in es
        )
        deg = {n: 0 for n in nodes}
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        wedges = sum(d * (d - 1) // 2 for d in deg.values())
        return len(nodes), len(es), wedges, tri

    def test_matches_bruteforce_on_random_graphs(self, spark):
        from etl_stream_spark.operators.graph import triangle_stats

        rng = random.Random(42)
        for trial in range(8):
            n = rng.randint(3, 12)
            possible = list(itertools.combinations(range(1, n + 1), 2))
            edges = rng.sample(possible, rng.randint(1, len(possible)))
            want = self._brute(edges)
            got = triangle_stats(
                spark.createDataFrame(edges, "a long, b long")
            ).collect()[0]
            assert (
                got.n_nodes,
                got.n_edges,
                got.n_wedges,
                got.n_triangles,
            ) == want, (trial, edges)

    def test_partitioning_invariance(self, spark):
        from etl_stream_spark.operators.graph import triangle_stats

        edges = [(a, b) for a in range(1, 9) for b in range(a + 1, 9)
                 if (a * 7 + b) % 3 != 0]
        df1 = spark.createDataFrame(edges, "a long, b long")
        df7 = df1.repartition(7)
        assert _rows(triangle_stats(df1)) == _rows(triangle_stats(df7))


class TestMadAnomalyProperties:
    def test_partitioning_invariance(self, spark):
        from etl_stream_spark.operators.anomaly import mad_anomaly_report

        rng = random.Random(7)
        rows = [
            (f"g{i % 3}", round(rng.uniform(-50, 50), 2)) for i in range(200)
        ]
        df = spark.createDataFrame(rows, "grp string, value double")
        a = _rows(mad_anomaly_report(df, "value", ["grp"]))
        b = _rows(mad_anomaly_report(df.repartition(11), "value", ["grp"]))
        assert a == b and len(a) == 3


class TestKAnonymityProperties:
    def test_accounting_identities(self, spark):
        from etl_stream_spark.operators.privacy import k_anonymity_report

        rng = random.Random(3)
        rows = [
            (f"n{rng.randint(0, 4)}", f"s{rng.randint(0, 2)}")
            for _ in range(300)
        ]
        df = spark.createDataFrame(rows, "nation string, seg string")
        rep = k_anonymity_report(df, ["nation", "seg"], k=20).collect()
        # per-nation rows partition the dataset exactly
        assert sum(r.n_rows for r in rep) == 300
        for r in rep:
            assert 0 <= r.rows_at_risk <= r.n_rows
            assert 0 <= r.n_unsafe_groups <= r.n_groups
            # every unsafe class has < k rows, so risk < k * unsafe count
            assert r.rows_at_risk < 20 * max(r.n_unsafe_groups, 1) or (
                r.n_unsafe_groups == 0 and r.rows_at_risk == 0
            )

    def test_masking_repairs_k_anonymity(self, spark):
        """Generalizing the fine QI column (the masking module's bucket
        strategy) must weakly GROW every equivalence class — the
        audit→mask→re-audit loop the two modules exist to close."""
        from etl_stream_spark.functions.masking import mask_columns
        from etl_stream_spark.operators.privacy import qi_group_sizes

        rng = random.Random(9)
        rows = [(rng.randint(0, 4), float(rng.randint(0, 999))) for _ in range(400)]
        df = spark.createDataFrame(rows, "nation long, bal double")
        fine_min = min(
            r.group_size
            for r in qi_group_sizes(df, ["nation", "bal"]).collect()
        )
        coarse = mask_columns(df, {"bal": "bucket:500"})
        coarse_min = min(
            r.group_size
            for r in qi_group_sizes(coarse, ["nation", "bal"]).collect()
        )
        assert coarse_min >= fine_min


class TestCompatLatticeProperties:
    def test_widening_is_transitive_and_antisymmetric(self):
        from pyspark.sql import types as T

        from etl_stream_spark.schema.compat import is_widening

        prim = [
            T.ByteType(),
            T.ShortType(),
            T.IntegerType(),
            T.LongType(),
            T.FloatType(),
            T.DoubleType(),
            T.StringType(),
            T.DateType(),
            T.TimestampNTZType(),
            T.TimestampType(),
        ]
        for a in prim:
            for b in prim:
                for c in prim:
                    if is_widening(a, b) and is_widening(b, c):
                        assert is_widening(a, c), (a, b, c)
                if a != b:
                    # no two distinct primitives widen both ways
                    assert not (is_widening(a, b) and is_widening(b, a)), (a, b)
