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


def cusum_changepoints(
    counts: DataFrame, order_col: str, count_col: str
) -> DataFrame:
    """CUSUM change-point statistic over a bucketed count series.

    Input is ONE ROW PER BUCKET (e.g. the per-day count frame a
    monitoring pipeline already maintains), assumed dense — the caller
    zero-fills missing buckets so a silent outage registers as a level
    shift rather than a gap.  The classic CUSUM of deviations from the
    series mean, ``S_k = sum_{i<=k} (c_i - T/n)``, is kept in EXACT
    integer space scaled by ``n``: ``cusum_scaled = n * prefix_k -
    k * T`` (prefix_k = running count sum, T = grand total) — no float
    accumulation, so the statistic reproduces across partitionings and
    engines bit-for-bit.  ``|S_k|`` peaks at the most likely single
    change point (Page 1954; Taylor's CUSUM change detection — public);
    the earliest bucket attaining the max is flagged ``is_peak``.

    Scale shape: the windows run over the BUCKETED frame (days/hours —
    bounded by the time range, not the row count), downstream of the
    map-side-combinable count aggregation the caller supplies.  A
    single-partition sort of a few thousand bucket rows is trivial at
    any data scale.  Magnitudes: ``n * T`` must fit BIGINT — 1e12
    events over 1e4 buckets is 1e16, three orders under the limit;
    beyond that, pre-divide the counts (the statistic is scale-free).
    """
    w_ord = (
        Window.orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = F.col(count_col).cast("long")
    staged = (
        counts.select(F.col(order_col), c.alias("_c"))
        .withColumn("_prefix", F.sum("_c").over(w_ord))
        .withColumn("_k", F.row_number().over(Window.orderBy(order_col)))
        .withColumn("_n", F.count(F.lit(1)).over(w_full))
        .withColumn("_t", F.sum("_c").over(w_full))
        .withColumn(
            # decimal(38,0) products: past the documented n·T BIGINT
            # bound, raw-BIGINT math wraps silently on Spark while the
            # DuckDB oracle (HUGEINT) keeps exact and casts — a silent
            # value divergence. The windows run on the tiny bucket
            # frame, so the decimal cost is nil (round-6 advice; the
            # Gini operator's discipline). The BIGINT cast below keeps
            # the driver boundary type.
            "cusum_scaled",
            (
                F.col("_n").cast("decimal(38,0)") * F.col("_prefix")
                - F.col("_k").cast("decimal(38,0)") * F.col("_t")
            ).cast("long"),
        )
    )
    peak = Window.orderBy(F.abs(F.col("cusum_scaled")).desc(), F.col(order_col).asc())
    return staged.withColumn("_pk", F.row_number().over(peak)).select(
        F.col(order_col),
        F.col("_c").alias("n_events"),
        F.col("cusum_scaled"),
        (F.col("_pk") == 1).alias("is_peak"),
    )


#: Benford first-digit expectation, parts-per-million: round(1e6 *
#: log10(1 + 1/d)) for d = 1..9.  Hard literals on BOTH engines (libm
#: log10 is not pinned cross-engine); they sum to exactly 1_000_000.
BENFORD_EXPECTED_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_report(df: DataFrame, int_col: str) -> DataFrame:
    """Benford's-law first-digit audit over a positive integer column.

    The fraud/DQ screen (Benford 1938; Nigrini's audit use — public):
    naturally-occurring multi-magnitude amounts follow ``P(d) =
    log10(1 + 1/d)``; fabricated or truncated data doesn't.  The caller
    pre-quantizes to a positive integer (e.g. cents) so the leading
    digit is a STRING operation on an integer rendering — identical on
    every engine, no log10/floor-of-log float hazard near powers of 10.

    Output is all-integer (digit, count, observed ppm, expected ppm,
    delta ppm): observed shares round half-up in exact integer space —
    ``(2 * n_d * 1e6 + N) // (2 * N)`` — and the expectation is the
    hard-literal :data:`BENFORD_EXPECTED_PPM` table, so the report is
    bit-deterministic.  A 9-row digit spine left-joins the observed
    counts: a digit with zero observations still reports its deficit.

    Scale shape: one map-side-combinable aggregation on a 9-value key,
    then arithmetic on a 9-row frame.  Nothing else touches the data.
    """
    spark = df.sparkSession
    g = (
        df.where(F.col(int_col) > 0)
        .select(
            F.substring(F.col(int_col).cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_values"))
    )
    spine = spark.range(1, 10).select(F.col("id").alias("digit"))
    full = Window.orderBy("digit").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    expected = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in BENFORD_EXPECTED_PPM.items() for x in kv]
        ),
        F.col("digit").cast("int"),
    ).cast("long")
    return (
        spine.join(g, "digit", "left")
        .withColumn("n_values", F.coalesce(F.col("n_values"), F.lit(0)).cast("long"))
        .withColumn("_total", F.sum("n_values").over(full))
        .withColumn(
            # half-up in exact integer space (both terms positive) —
            # Spark `div` / DuckDB `//` — never a double division; the
            # zero-total guard keeps the operator total on empty input.
            # Numerator in decimal(38,0): 2·n_d·1e6 wraps BIGINT past
            # ~4.6e12 rows per digit — first-digit-skewed data at the
            # 100 TB envelope (~1e12 rows) has only ~5× headroom, and
            # a silent Spark wrap would diverge from DuckDB's HUGEINT
            "observed_ppm",
            F.when(
                F.col("_total") > 0,
                F.expr(
                    "cast((2 * cast(n_values as decimal(38,0)) * 1000000"
                    " + _total) div (2 * cast(_total as decimal(38,0)))"
                    " as long)"
                ),
            ).cast("long"),
        )
        .withColumn("expected_ppm", expected)
        .select(
            "digit",
            "n_values",
            "observed_ppm",
            "expected_ppm",
            (F.col("observed_ppm") - F.col("expected_ppm")).alias("delta_ppm"),
        )
    )
