"""Group-statistic null imputation — the missing-data cleaning pass.

The complement to outlier clipping (`catalog.orders_price_winsorized`)
and the quarantine/repair loop (`schema/expectations.py`): where those
handle WRONG values, this fills ABSENT ones. A feature pipeline imputes
nulls with a statistic of the non-null values in the row's own group
(user, segment, device) so the fill respects group-level distribution
shift instead of flattening it with a global constant.

Strategies (all deterministic, all DuckDB-oracle-expressible):

* ``mean``   — exact-DECIMAL mean of the group's non-null values (no
  float accumulation; the repo's money-path convention);
* ``median`` — exact interpolated percentile(0.5) (Spark ``percentile``
  / DuckDB ``quantile_cont`` parity, hash-proven by
  `order_price_quantiles`);
* ``zero``   — the constant baseline.

Scale shape: one aggregation to the per-group statistic table
(|groups| rows), one equi-join back on the group key — AQE broadcasts
the statistic table when it fits, shuffles both sides when it does not;
no hint is ever forced since |groups| scales with the data. Groups that
are entirely null fall back to the GLOBAL statistic (computed in the
same pass via a grand-total row), so the imputed column is non-null
whenever any value exists at all.

Reference anchor: the reference tolerates missing values via nullable
landings and moves on (``etl-snowflake-py/etl_snowflake/ddl.py:
290-321``); imputation is the downstream-training extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(18,2)"
_DECSUM = "decimal(38,2)"


def _group_stat(strategy: str) -> F.Column:
    if strategy == "mean":
        return F.round(
            F.sum(F.col("_v").cast(_DEC)).cast(_DECSUM).cast("double")
            / F.count("_v"),
            6,
        )
    if strategy == "median":
        return F.round(F.expr("percentile(_v, 0.5)"), 6)
    if strategy == "zero":
        return F.lit(0.0)
    raise ValueError(f"unknown imputation strategy: {strategy}")


def impute_nulls(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    strategy: str = "median",
) -> DataFrame:
    """Fill nulls in ``value_col`` with the group's statistic.

    Adds two columns: ``<value_col>_imputed`` (double; original value
    where present, group statistic — or global statistic for all-null
    groups — where absent) and ``was_imputed`` (boolean).
    """
    v = df.withColumn("_v", F.col(value_col))
    stats = (
        v.filter(F.col("_v").isNotNull())
        .groupBy(*group_cols)
        .agg(_group_stat(strategy).alias("_grp_stat"))
        # null-safe join keys: a NULL group key is its own group (window
        # /groupBy semantics), so rows in it must match the NULL-key
        # statistic rather than silently falling through to the global
        # one. Plain equality would reject NULL = NULL.
        .select(
            *[F.col(c).alias(f"_g_{c}") for c in group_cols], "_grp_stat"
        )
    )
    grp_cond = None
    for c in group_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_g_{c}"))
        grp_cond = eq if grp_cond is None else (grp_cond & eq)
    glob = (
        v.filter(F.col("_v").isNotNull())
        .agg(_group_stat(strategy).alias("_glob_stat"))
        .withColumn("_one", F.lit(1))
    )
    out_col = f"{value_col}_imputed"
    return (
        v.join(stats, grp_cond, "left")
        .drop(*[f"_g_{c}" for c in group_cols])
        # 1-row global fallback joined on a constant key: a broadcast
        # hash join, never a nested-loop/cartesian shape
        .withColumn("_one", F.lit(1))
        .join(glob, "_one", "left")
        .drop("_one")
        .withColumn(
            out_col,
            F.coalesce(
                F.col("_v"), F.col("_grp_stat"), F.col("_glob_stat")
            ).cast("double"),
        )
        .withColumn("was_imputed", F.col("_v").isNull())
        .drop("_v", "_grp_stat", "_glob_stat")
    )
