"""Robust anomaly detection: median / MAD outlier statistics.

Mean/stddev z-scores (``catalog.user_value_zscores``) break down when
the outliers themselves inflate the scale estimate; the
median-absolute-deviation form (Hampel's robust scale; public
statistics) has a 50% breakdown point.  A point is anomalous when
``|x - median| > k * MAD`` — the classic Hampel filter with k around
3 (3 * MAD ~ 2 sigma for Gaussian data).

Determinism: exact interpolated percentiles via Spark's ``percentile``
(bit-identical to DuckDB's ``quantile_cont`` — parity established by
the driver-green ``order_price_quantiles``); the deviation and the
``k * MAD`` threshold are single IEEE ops on both engines, and the
comparison is strict on both sides, so the flag set is reproducible.

Scale shape: two window aggregations over the SAME partitioning (the
group key), so the exchange is planned once and reused; exact
per-group percentiles hold the group's values, which is fine for
bounded per-key series — at 100 TB with huge groups, swap the median
estimate for the mergeable fixed-domain histogram in
``operators/quantiles.py`` (same report schema, bounded memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mad_anomaly_report(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: float = 3.0,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group Hampel-filter report.

    Output per group: ``n_events`` (BIGINT), ``med_value`` /
    ``mad_value`` / ``max_abs_dev`` (DOUBLE, rounded for transport),
    ``n_anomalies`` = rows with ``|x - med| > k * MAD``, counted on the
    UNROUNDED statistics (BIGINT).
    """
    w = Window.partitionBy(*group_cols)
    v = F.col(value_col).cast("double")
    flagged = (
        df.where(v.isNotNull())
        .select(*group_cols, v.alias("_v"))
        .withColumn("_med", F.expr("percentile(_v, 0.5)").over(w))
        .withColumn("_dev", F.abs(F.col("_v") - F.col("_med")))
        .withColumn("_mad", F.expr("percentile(_dev, 0.5)").over(w))
    )
    return flagged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.max("_med"), round_dp).alias("med_value"),
        F.round(F.max("_mad"), round_dp).alias("mad_value"),
        F.sum(
            F.when(F.col("_dev") > F.lit(float(k)) * F.col("_mad"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_anomalies"),
        F.round(F.max("_dev"), round_dp).alias("max_abs_dev"),
    )
