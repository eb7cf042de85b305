"""Property tests for the round-6 operators: brute-force parity and
partitioning invariance (the repo's standard evidence that an operator
is a function of the DATA, not of the split)."""

from __future__ import annotations

import datetime
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


class TestCusumProperties:
    def _brute(self, counts):
        n, total = len(counts), sum(counts)
        prefix, out = 0, []
        for k, c in enumerate(counts, 1):
            prefix += c
            out.append(n * prefix - k * total)
        return out

    def test_matches_bruteforce_and_flags_level_shift(self, spark):
        from etl_stream_spark.operators.anomaly import cusum_changepoints

        counts = [5] * 10 + [50] * 10
        df = spark.createDataFrame(
            list(enumerate(counts, 1)), "bucket long, n long"
        )
        got = cusum_changepoints(df, "bucket", "n").orderBy("bucket").collect()
        want = self._brute(counts)
        assert [r.cusum_scaled for r in got] == want
        # the peak |S_k| sits exactly at the shift boundary (bucket 10)
        peaks = [r.bucket for r in got if r.is_peak]
        assert peaks == [10]
        # telescoping identity: S_n == 0 always
        assert got[-1].cusum_scaled == 0

    def test_partitioning_invariance(self, spark):
        from etl_stream_spark.operators.anomaly import cusum_changepoints

        rng = random.Random(11)
        counts = [rng.randint(0, 100) for _ in range(60)]
        df = spark.createDataFrame(
            list(enumerate(counts, 1)), "bucket long, n long"
        )
        a = _rows(cusum_changepoints(df, "bucket", "n"))
        b = _rows(cusum_changepoints(df.repartition(13), "bucket", "n"))
        assert a == b
        # exactly one peak row
        assert sum(1 for r in a if r[3]) == 1


class TestBenfordProperties:
    def test_counts_and_ppm_identities(self, spark):
        from etl_stream_spark.operators.anomaly import (
            BENFORD_EXPECTED_PPM,
            benford_report,
        )

        # 1-, 2-, 3-digit values; zero/negative excluded; digit 9 absent
        vals = [1, 12, 123, 222, 2999, 345, 40, 41, 5, -7, 0]
        df = spark.createDataFrame([(v,) for v in vals], "amount long")
        got = {r.digit: r for r in benford_report(df, "amount").collect()}
        assert sorted(got) == list(range(1, 10))
        counts = {1: 3, 2: 2, 3: 1, 4: 2, 5: 1, 9: 0}
        for d in range(1, 10):
            assert got[d].n_values == counts.get(d, 0), d
        # observed shares round half-up to ppm and sum to ~1e6
        total = sum(counts.values())
        for d in range(1, 10):
            n = counts.get(d, 0)
            assert got[d].observed_ppm == (2 * n * 1_000_000 + total) // (
                2 * total
            ), d
            assert got[d].expected_ppm == BENFORD_EXPECTED_PPM[d]
            assert got[d].delta_ppm == got[d].observed_ppm - got[d].expected_ppm
        assert sum(BENFORD_EXPECTED_PPM.values()) == 1_000_000
        assert abs(sum(r.observed_ppm for r in got.values()) - 1_000_000) <= 9

    def test_partitioning_invariance(self, spark):
        from etl_stream_spark.operators.anomaly import benford_report

        rng = random.Random(5)
        vals = [(rng.randint(1, 10**6),) for _ in range(500)]
        df = spark.createDataFrame(vals, "amount long")
        assert _rows(benford_report(df, "amount")) == _rows(
            benford_report(df.repartition(17), "amount")
        )


class TestSourceConcentrationProperties:
    def _brute_gini_ppm(self, weights):
        xs = sorted(weights)
        n, s = len(xs), sum(xs)
        iw = sum(i * x for i, x in enumerate(xs, 1))
        num = 2 * iw - (n + 1) * s
        den = n * s
        return (2 * num * 1_000_000 + den) // (2 * den)

    def test_equal_weights_give_zero_gini(self, spark):
        from etl_stream_spark.operators.corpus import source_concentration

        rows = [(f"s{i}", 100) for i in range(6) for _ in range(3)]
        df = spark.createDataFrame(rows, "source string, n_chars long")
        out = source_concentration(df).collect()
        assert all(r.gini_ppm == 0 for r in out)
        assert out == sorted(out, key=lambda r: (r.total_weight, r.source))

    def test_matches_bruteforce_and_lorenz_identities(self, spark):
        from etl_stream_spark.operators.corpus import source_concentration

        rng = random.Random(9)
        per_source = {f"s{i}": rng.randint(1, 500) for i in range(8)}
        rows = [(s, w) for s, w in per_source.items()]
        df = spark.createDataFrame(rows, "source string, n_chars long")
        out = source_concentration(df).orderBy("cum_weight").collect()
        assert [r.gini_ppm for r in out] == [
            self._brute_gini_ppm(list(per_source.values()))
        ] * len(out)
        # Lorenz curve: cumulative weights are monotone and end at the
        # total; the final cumulative share is exactly 1e6 ppm
        assert out[-1].cum_weight == sum(per_source.values())
        assert out[-1].cum_share_ppm == 1_000_000
        cums = [r.cum_weight for r in out]
        assert cums == sorted(cums)

    def test_partitioning_invariance(self, spark):
        from etl_stream_spark.operators.corpus import source_concentration

        rng = random.Random(21)
        rows = [
            (f"s{rng.randint(0, 5)}", rng.randint(10, 2000)) for _ in range(300)
        ]
        df = spark.createDataFrame(rows, "source string, n_chars long")
        assert _rows(source_concentration(df)) == _rows(
            source_concentration(df.repartition(19))
        )


class TestAutocorrelationProperties:
    def test_periodic_series_has_unit_acf_at_period(self, spark):
        from etl_stream_spark.operators.temporal import autocorrelation

        series = [(t, [3, 9, 1, 7][t % 4]) for t in range(48)]
        df = spark.createDataFrame(series, "bucket long, n long")
        out = {
            r.lag: r
            for r in autocorrelation(df, "bucket", "n", lags=(1, 2, 4, 8)).collect()
        }
        assert out[4].acf == 1.0 and out[8].acf == 1.0
        assert out[4].n_pairs == 44
        assert out[1].acf < 1.0

    def test_constant_series_yields_null_acf(self, spark):
        from etl_stream_spark.operators.temporal import autocorrelation

        df = spark.createDataFrame(
            [(t, 5) for t in range(30)], "bucket long, n long"
        )
        out = autocorrelation(df, "bucket", "n", lags=(1, 2)).collect()
        assert all(r.acf is None for r in out)

    def test_matches_bruteforce_pearson(self, spark):
        from etl_stream_spark.operators.temporal import autocorrelation

        rng = random.Random(13)
        vals = [rng.randint(0, 50) for _ in range(80)]
        df = spark.createDataFrame(
            list(enumerate(vals)), "bucket long, n long"
        )
        out = {
            r.lag: r.acf
            for r in autocorrelation(df, "bucket", "n", lags=(1, 5)).collect()
        }
        for lag in (1, 5):
            xs, ys = vals[:-lag], vals[lag:]
            n = float(len(xs))
            sx, sy = float(sum(xs)), float(sum(ys))
            sxy = float(sum(x * y for x, y in zip(xs, ys)))
            sxx = float(sum(x * x for x in xs))
            syy = float(sum(y * y for y in ys))
            want = (n * sxy - sx * sy) / (
                ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
            )
            assert abs(out[lag] - want) <= 1e-6, lag

    def test_partitioning_invariance(self, spark):
        from etl_stream_spark.operators.temporal import autocorrelation

        rng = random.Random(17)
        vals = [(t, rng.randint(0, 9)) for t in range(100)]
        df = spark.createDataFrame(vals, "bucket long, n long")
        assert _rows(autocorrelation(df, "bucket", "n")) == _rows(
            autocorrelation(df.repartition(23), "bucket", "n")
        )


class TestLateAnalyticsEntryInvariants:
    """Cross-column invariants of the late-round catalog entries over
    the real sf0.001 tables (the oracle gate proves value parity; these
    pin the semantic identities a refactor could silently break)."""

    SF = "/root/testdata/sf0.001"

    def test_oov_rate_bounds_and_totals(self, spark):
        from etl_stream_spark.catalog import corpus_oov_rate, corpus_vocabulary

        rows = corpus_oov_rate(spark, self.SF).collect()
        assert rows, "at least one source"
        total_tokens = sum(r.n_tokens for r in rows)
        vocab_total = (
            corpus_vocabulary(spark, self.SF)
            .agg(F.sum("term_freq").alias("s"))
            .collect()[0]
            .s
        )
        # every exploded token lands in exactly one source bucket
        assert total_tokens == vocab_total
        for r in rows:
            assert 0 <= r.n_oov <= r.n_tokens
            assert 0 <= r.oov_ppm <= 1_000_000
            assert r.oov_ppm == (2 * r.n_oov * 1_000_000 + r.n_tokens) // (
                2 * r.n_tokens
            )

    def test_calibration_bins_partition_the_corpus(self, spark):
        from etl_stream_spark.catalog import corpus_quality_calibration

        rows = corpus_quality_calibration(spark, self.SF).collect()
        assert sorted(r.bin for r in rows) == list(range(10))
        n_docs = (
            spark.read.parquet(f"{self.SF}/documents.parquet").count()
        )
        assert sum(r.n_docs for r in rows) == n_docs
        for r in rows:
            assert r.n_heuristic_keep <= r.n_docs
            if r.n_docs == 0:
                assert r.keep_ppm is None and r.min_score is None
            else:
                # scores in a decile bin sit inside its half-open range
                # (bin 9 also holds score == 1.0)
                assert r.min_score >= r.bin / 10 - 1e-9
                assert r.max_score <= (r.bin + 1) / 10 + 1e-9

    def test_conversion_latency_percentiles_monotone(self, spark):
        from etl_stream_spark.catalog import events_conversion_latency

        r = events_conversion_latency(spark, self.SF).collect()[0]
        assert r.n_converted > 0
        assert 0 <= r.p25_s <= r.p50_s <= r.p75_s <= r.p90_s


class TestStreamingCusumParity:
    def test_stream_equals_batch_report(self, spark):
        """The streaming CUSUM monitor must reproduce the batch
        change-point report exactly — counts are additive, so however
        the stream is batched the final bucket frame is identical."""
        from etl_stream_spark.catalog import (
            events_cusum_changepoint,
            streaming_cusum_monitor,
        )

        sf = "/root/testdata/sf0.001"
        batch = _rows(events_cusum_changepoint(spark, sf))
        stream = _rows(streaming_cusum_monitor(spark, sf))
        assert stream == batch


# -- property: gap-fill equals the brute-force dense spine ---------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

buckets_st = st.dictionaries(
    st.integers(min_value=0, max_value=60),
    st.integers(min_value=0, max_value=1000),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(observed=buckets_st)
def test_zero_fill_matches_bruteforce_dense_spine(spark, observed):
    """For ANY sparse set of observed day buckets, the single-pass
    gap-fill (lead + posexplode) produces exactly the dense
    [min, max] spine with observed counts in place and zeros in the
    gaps — the contract the spine-join formulation had, minus its
    second scan."""
    from etl_stream_spark.catalog import _zero_fill_buckets

    df = spark.createDataFrame(
        [(d, n) for d, n in observed.items()], "b long, n long"
    ).select(F.timestamp_seconds(F.col("b") * 86400).alias("day"), "n")
    # replace(tzinfo=UTC): the session renders UTC-naive datetimes;
    # naive .timestamp() would reinterpret them in the host's local
    # timezone and break this assertion on any non-UTC test box
    out = {
        int(r.day.replace(tzinfo=datetime.timezone.utc).timestamp()) // 86400: r.n
        for r in _zero_fill_buckets(df, "day", "day").collect()
    }
    lo, hi = min(observed), max(observed)
    want = {d: observed.get(d, 0) for d in range(lo, hi + 1)}
    assert out == want


counts_st = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=2, max_size=40
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(counts=counts_st)
def test_cusum_matches_bruteforce_on_random_series(spark, counts):
    """For ANY count series: exact scaled-integer CUSUM per bucket,
    telescoping S_n == 0, and exactly one peak at the earliest argmax
    of |S_k|."""
    from etl_stream_spark.operators.anomaly import cusum_changepoints

    df = spark.createDataFrame(list(enumerate(counts, 1)), "bucket long, n long")
    got = cusum_changepoints(df, "bucket", "n").orderBy("bucket").collect()
    n, total, prefix = len(counts), sum(counts), 0
    want = []
    for k, c in enumerate(counts, 1):
        prefix += c
        want.append(n * prefix - k * total)
    assert [r.cusum_scaled for r in got] == want
    assert got[-1].cusum_scaled == 0
    peak_want = max(range(n), key=lambda i: (abs(want[i]), -i)) + 1
    assert [r.bucket for r in got if r.is_peak] == [peak_want]


amounts_st = st.lists(
    st.integers(min_value=-100, max_value=10**9), min_size=1, max_size=60
).filter(lambda xs: any(x > 0 for x in xs))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(amounts=amounts_st)
def test_benford_matches_bruteforce_on_random_amounts(spark, amounts):
    """For ANY integer amounts (nonpositives excluded): exact per-digit
    counts, half-up integer-space ppm shares, full 9-digit spine."""
    from etl_stream_spark.operators.anomaly import benford_report

    df = spark.createDataFrame([(v,) for v in amounts], "amount long")
    got = {r.digit: r for r in benford_report(df, "amount").collect()}
    pos = [v for v in amounts if v > 0]
    want = {d: sum(1 for v in pos if str(v)[0] == str(d)) for d in range(1, 10)}
    total = len(pos)
    assert sorted(got) == list(range(1, 10))
    for d in range(1, 10):
        assert got[d].n_values == want[d], d
        assert got[d].observed_ppm == (2 * want[d] * 1_000_000 + total) // (
            2 * total
        ), d


weights_st = st.dictionaries(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4),
    st.integers(min_value=1, max_value=10**6),
    min_size=1,
    max_size=15,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(per_source=weights_st)
def test_gini_matches_bruteforce_on_random_weights(spark, per_source):
    """For ANY per-source weights: the exact integer-space Gini and a
    Lorenz curve that is monotone and terminates at exactly 1e6 ppm."""
    from etl_stream_spark.operators.corpus import source_concentration

    df = spark.createDataFrame(
        [(s, w) for s, w in per_source.items()], "source string, n_chars long"
    )
    out = sorted(source_concentration(df).collect(), key=lambda r: (r.cum_weight))
    xs = sorted(per_source.values())
    n, s_tot = len(xs), sum(xs)
    iw = sum(i * x for i, x in enumerate(xs, 1))
    num, den = 2 * iw - (n + 1) * s_tot, n * s_tot
    want_gini = (2 * num * 1_000_000 + den) // (2 * den)
    assert all(r.gini_ppm == want_gini for r in out)
    assert out[-1].cum_share_ppm == 1_000_000
    shares = [r.cum_share_ppm for r in out]
    assert shares == sorted(shares)


class TestDailyTrendProperties:
    def test_matches_bruteforce_ols(self, spark):
        """The catalog OLS over sf0.001 equals a pure-Python least
        squares over the same dense zero-filled daily cents series."""
        import duckdb

        from etl_stream_spark.catalog import orders_daily_trend

        sf = "/root/testdata/sf0.001"
        got = orders_daily_trend(spark, sf).collect()[0]
        con = duckdb.connect()
        rows = con.execute(
            f"""
            SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{sf}/orders.parquet') GROUP BY 1 ORDER BY 1
            """
        ).fetchall()
        lo, hi = rows[0][0], rows[-1][0]
        by_day = dict(rows)
        ys, cur = [], lo
        while cur <= hi:
            ys.append(by_day.get(cur, 0))
            cur = cur + __import__("datetime").timedelta(days=1)
        n = len(ys)
        sx, sy = sum(range(n)), sum(ys)
        sxy = sum(i * y for i, y in enumerate(ys))
        sxx = sum(i * i for i in range(n))
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        assert got.n_days == n
        assert abs(got.slope_per_day - slope / 100.0) <= 1e-4
        assert abs(got.intercept - intercept / 100.0) <= 1e-2
