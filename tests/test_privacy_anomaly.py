"""Tests for the round-6 governance operators: k-anonymity audit and
median/MAD robust anomaly detection."""

from __future__ import annotations

import pytest

from etl_stream_spark.operators.anomaly import mad_anomaly_report
from etl_stream_spark.operators.privacy import k_anonymity_report, qi_group_sizes


class TestKAnonymity:
    def _df(self, spark):
        rows = (
            # QI (nation, band): class sizes 3, 1, 2
            [("A", 0)] * 3
            + [("A", 1)]
            + [("B", 0)] * 2
        )
        return spark.createDataFrame(rows, "nation string, band long")

    def test_group_sizes(self, spark):
        got = {
            (r.nation, r.band): r.group_size
            for r in qi_group_sizes(self._df(spark), ["nation", "band"]).collect()
        }
        assert got == {("A", 0): 3, ("A", 1): 1, ("B", 0): 2}

    def test_report_counts_unsafe_classes_and_rows(self, spark):
        rep = {
            r.nation: r
            for r in k_anonymity_report(
                self._df(spark), ["nation", "band"], k=3
            ).collect()
        }
        a, b = rep["A"], rep["B"]
        assert (a.n_groups, a.min_group_size) == (2, 1)
        assert (a.n_unsafe_groups, a.rows_at_risk, a.n_rows) == (1, 1, 4)
        # B's single class of 2 is below k=3: whole nation at risk
        assert (b.n_unsafe_groups, b.rows_at_risk, b.n_rows) == (1, 2, 2)

    def test_k_anonymous_dataset_has_no_risk(self, spark):
        rep = k_anonymity_report(self._df(spark), ["nation", "band"], k=1).collect()
        assert all(r.n_unsafe_groups == 0 and r.rows_at_risk == 0 for r in rep)

    def test_by_must_be_a_qi_column(self, spark):
        with pytest.raises(ValueError):
            k_anonymity_report(self._df(spark), ["nation"], k=2, by="band")


class TestMadAnomaly:
    def test_hampel_filter_known_values(self, spark):
        df = spark.createDataFrame(
            [("t", float(v)) for v in (1, 2, 3, 4, 100)]
            + [("u", 5.0), ("u", 5.0), ("u", 5.0)],
            "grp string, value double",
        )
        rep = {
            r.grp: r
            for r in mad_anomaly_report(df, "value", ["grp"], k=3.0).collect()
        }
        t = rep["t"]
        # median 3, devs [2,1,0,1,97], MAD 1 -> only 97 > 3*1
        assert (t.n_events, t.med_value, t.mad_value) == (5, 3.0, 1.0)
        assert (t.n_anomalies, t.max_abs_dev) == (1, 97.0)
        u = rep["u"]  # constant series: MAD 0, nothing exceeds 0 strictly
        assert (u.mad_value, u.n_anomalies) == (0.0, 0)

    def test_outliers_do_not_inflate_threshold(self, spark):
        # mean/std would let two big outliers mask each other; MAD does not
        vals = [10.0] * 20 + [1000.0, -1000.0]
        df = spark.createDataFrame([("g", v) for v in vals], "grp string, value double")
        (r,) = mad_anomaly_report(df, "value", ["grp"]).collect()
        assert r.n_anomalies == 2

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame(
            [("g", 1.0), ("g", None), ("g", 3.0)], "grp string, value double"
        )
        (r,) = mad_anomaly_report(df, "value", ["grp"]).collect()
        assert r.n_events == 2
