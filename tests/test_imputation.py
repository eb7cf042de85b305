"""impute_nulls: group-statistic missing-data fills."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_stream_spark.operators.imputation import impute_nulls


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("a", 1, 10.0),
        ("a", 2, 20.0),
        ("a", 3, None),
        ("b", 4, 7.0),
        ("b", 5, None),
        ("c", 6, None),  # group entirely null → global fallback
    ]
    return spark.createDataFrame(rows, "g string, id long, v double")


def _by_id(out):
    return {r.id: r for r in out.collect()}


class TestImputeNulls:
    def test_median_group_fill_and_global_fallback(self, df):
        out = _by_id(impute_nulls(df, ["g"], "v", strategy="median"))
        assert out[3].v_imputed == 15.0  # median of {10, 20}
        assert out[5].v_imputed == 7.0
        assert out[6].v_imputed == 10.0  # global median of {10,20,7}
        assert out[1].v_imputed == 10.0 and not out[1].was_imputed
        assert all(out[i].was_imputed for i in (3, 5, 6))

    def test_mean_is_decimal_exact(self, df):
        out = _by_id(impute_nulls(df, ["g"], "v", strategy="mean"))
        assert out[3].v_imputed == 15.0
        assert out[6].v_imputed == round((10.0 + 20.0 + 7.0) / 3, 6)

    def test_zero_strategy(self, df):
        out = _by_id(impute_nulls(df, ["g"], "v", strategy="zero"))
        assert out[3].v_imputed == 0.0 and out[1].v_imputed == 10.0

    def test_unknown_strategy_raises(self, df):
        with pytest.raises(ValueError, match="unknown imputation strategy"):
            impute_nulls(df, ["g"], "v", strategy="mode")

    def test_no_nulls_is_identity(self, spark):
        clean = spark.createDataFrame(
            [("a", 1, 5.0), ("a", 2, 6.0)], "g string, id long, v double"
        )
        out = impute_nulls(clean, ["g"], "v")
        assert out.filter(F.col("was_imputed")).count() == 0
        assert {r.v_imputed for r in out.collect()} == {5.0, 6.0}

    def test_partitioning_invariant(self, df):
        a = _by_id(impute_nulls(df.repartition(7), ["g"], "v"))
        b = _by_id(impute_nulls(df.coalesce(1), ["g"], "v"))
        assert {k: (r.v_imputed, r.was_imputed) for k, r in a.items()} == {
            k: (r.v_imputed, r.was_imputed) for k, r in b.items()
        }


def test_null_group_key_matches_its_own_group(spark):
    """NULL group keys form their own group (groupBy semantics): rows in
    it must take the NULL-key group's statistic, not silently fall back
    to the global one. Requires a null-safe stats join."""
    rows = [
        (None, 1, 100.0),
        (None, 2, 100.0),
        (None, 3, None),  # must get 100.0 (its group), not the global
        ("a", 4, 1.0),
        ("a", 5, None),
    ]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = _by_id(impute_nulls(df, ["g"], "v", strategy="median"))
    assert out[3].v_imputed == 100.0 and out[3].was_imputed
    assert out[5].v_imputed == 1.0 and out[5].was_imputed
    assert out[1].v_imputed == 100.0 and not out[1].was_imputed
