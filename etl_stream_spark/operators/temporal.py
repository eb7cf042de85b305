"""Temporal join operators: as-of (point-in-time) join and
interval-containment join.

Spark has no native as-of join; the scalable formulation here is the
union + last-value carry-forward: tag both inputs, union them, and for
each left row take the most recent right row via ``last(..,
ignorenulls)`` over a (key, time)-ordered window. One shuffle on the
key, no range-condition nested loop, no per-row Python — the plan is a
single sort-based window over the co-partitioned union, which survives
any scale where the per-key history fits a partition (keys are hash
distributed; no global sort).

The interval join keeps the equi-key as the join key so Catalyst plans
a hash join; the range predicate is a post-join filter, never a
BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` for the same key (backward as-of join).

    Right rows at exactly ``left_ts`` match (inclusive). Rows with no
    earlier right row keep nulls. ``right_cols`` defaults to every
    right column except the key and timestamp. ``tolerance`` (an SQL
    interval string like ``'1 hour'``) nulls out matches older than
    ``left_ts - tolerance`` — the bounded attribution window; the plan
    is unchanged (the bound is a projection, not a join condition).

    If several right rows share (key, right_ts), make the choice
    deterministic upstream (e.g. keep the max id per timestamp);
    otherwise ``last`` picks the union-sort's tie order.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    lcols = left.columns
    # marker orders right before left at equal timestamps → inclusive
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols if c != on],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_cols],
    )
    tagged_r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c != on],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_l.unionByName(tagged_r).select(
        "*",
        F.last(F.when(F.col("_is_left") == 0, F.col("_t")), ignorenulls=True)
        .over(w)
        .alias("_m__ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in right_cols
        ],
    )
    out_suffix = suffix or ""
    in_window = (
        F.col("_t") <= F.col("_m__ts") + F.expr(f"INTERVAL {tolerance}")
        if tolerance
        else F.lit(True)
    )
    return carried.filter(F.col("_is_left") == 1).select(
        F.col("_k").alias(on),
        *[F.col(c) for c in lcols if c != on],
        *[
            F.when(in_window, F.col(f"_m_{c}")).alias(c + out_suffix)
            for c in right_cols
        ],
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    on: tuple[str, str],
    ts_col: str,
    start_col: str,
    end_col: str,
    how: str = "inner",
) -> DataFrame:
    """Join events to intervals containing them: equi-join on the key
    (hash join, shuffle on key), range predicate ``start <= ts < end``
    applied as a join condition — no nested-loop plan.
    """
    ekey, ikey = on
    cond = (
        (events[ekey] == intervals[ikey])
        & (events[ts_col] >= intervals[start_col])
        & (events[ts_col] < intervals[end_col])
    )
    return events.join(intervals, cond, how)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the EARLIEST right row with
    ``right_ts >= left_ts`` for the same key (forward as-of join — the
    next-event attribution direction). ``tolerance`` bounds the lookahead
    (matches beyond ``left_ts + tolerance`` null out).

    Mirror of :func:`asof_join`: tag, union, and carry the first future
    right row via ``first(.., ignorenulls)`` over a forward-unbounded
    (key, time)-ordered window. Same single shuffle on the key; at equal
    timestamps the right row matches (inclusive) because rights sort
    after lefts.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    lcols = left.columns
    # marker orders left before right at equal timestamps → inclusive
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_ord"),
        *[F.col(c) for c in lcols if c != on],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_cols],
    )
    tagged_r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(1).alias("_ord"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c != on],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_ord")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = tagged_l.unionByName(tagged_r).select(
        "*",
        F.first(F.when(F.col("_ord") == 1, F.col("_t")), ignorenulls=True)
        .over(w)
        .alias("_m__ts"),
        *[
            F.first(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in right_cols
        ],
    )
    out_suffix = suffix or ""
    in_window = (
        F.col("_m__ts") <= F.col("_t") + F.expr(f"INTERVAL {tolerance}")
        if tolerance
        else F.lit(True)
    )
    return carried.filter(F.col("_ord") == 0).select(
        F.col("_k").alias(on),
        *[F.col(c) for c in lcols if c != on],
        *[
            F.when(in_window, F.col(f"_m_{c}")).alias(c + out_suffix)
            for c in right_cols
        ],
    )


def interpolate_at(
    grid: DataFrame,
    obs: DataFrame,
    on: str,
    grid_ts: str,
    obs_ts: str,
    value_col: str,
    out_col: str = "value",
    decimals: int = 6,
) -> DataFrame:
    """Linear interpolation of ``obs[value_col]`` at each grid
    timestamp: the value at a grid point is interpolated between the
    nearest observation at-or-before and the nearest strictly-after
    one; outside the observed range the nearest endpoint clamps
    (forward-fill past the last observation, back-fill before the
    first). A grid point that coincides with an observation returns the
    observed value exactly.

    Same shuffle discipline as :func:`asof_join`: grid and observation
    rows union into ONE frame, a single per-key ordered window carries
    the bracketing (ts, value) pairs in both directions, and the
    interpolation itself is closed-form arithmetic on exact µs epochs —
    no range join, no per-key driver work, deterministic to the bit for
    a DuckDB twin. Time math runs on ``unix_micros`` BIGINTs; the
    result rounds to ``decimals``.

    Contract: ``obs`` must be unique per ``(on, obs_ts)`` — with
    duplicate observation timestamps the bracketing value is
    sort-order-dependent. Pre-aggregate (e.g. ``max_by``) first, as
    the catalog entry does.
    """
    g = grid.select(
        F.col(on).alias("_k"),
        F.unix_micros(F.col(grid_ts)).alias("_t"),
        F.col(grid_ts).alias("_grid_ts"),
        F.lit(1).alias("_is_grid"),
        F.lit(None).cast("double").alias("_v"),
    )
    o = obs.select(
        F.col(on).alias("_k"),
        F.unix_micros(F.col(obs_ts)).alias("_t"),
        F.lit(None).cast("timestamp").alias("_grid_ts"),
        F.lit(0).alias("_is_grid"),
        F.col(value_col).cast("double").alias("_v"),
    )
    u = g.unionByName(o)
    # observations sort before grid points at equal timestamps, so the
    # backward window sees a coincident observation as its "previous"
    w_back = (
        Window.partitionBy("_k")
        .orderBy("_t", "_is_grid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy("_t", "_is_grid")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("_v").isNotNull(), F.col("_t"))
    br = (
        u.withColumn("_pv", F.last("_v", ignorenulls=True).over(w_back))
        .withColumn("_pt", F.last(obs_t, ignorenulls=True).over(w_back))
        .withColumn("_nv", F.first("_v", ignorenulls=True).over(w_fwd))
        .withColumn("_nt", F.first(obs_t, ignorenulls=True).over(w_fwd))
        .filter(F.col("_is_grid") == 1)
    )
    frac = (F.col("_t") - F.col("_pt")).cast("double") / (
        F.col("_nt") - F.col("_pt")
    ).cast("double")
    interp = (
        F.when(F.col("_pv").isNull(), F.col("_nv"))
        .when(F.col("_nv").isNull(), F.col("_pv"))
        .when(F.col("_nt") == F.col("_pt"), F.col("_pv"))
        .otherwise(F.col("_pv") + (F.col("_nv") - F.col("_pv")) * frac)
    )
    return br.select(
        F.col("_k").alias(on),
        F.col("_grid_ts").alias(grid_ts),
        F.round(interp, decimals).alias(out_col),
    )


def autocorrelation(
    series: DataFrame,
    order_col: str,
    value_col: str,
    lags: tuple[int, ...] = (1, 2, 3, 6, 12, 24),
) -> DataFrame:
    """Sample autocorrelation of an integer-valued series at fixed lags.

    The seasonality/trend diagnostic of a metrics pipeline: Pearson r
    between the series and its lag-L shift, for each L in ``lags``.
    Input is ONE ROW PER BUCKET with an integer ``value_col`` (e.g. the
    hourly count frame), dense — the caller zero-fills gaps so the lag
    alignment is positional time, not observation order.

    Determinism recipe (same as ``catalog.price_time_correlation``):
    every Σ (n, Σx, Σy, Σxy, Σx², Σy²) accumulates EXACTLY over
    decimal(38,0) — integer values, no float addition order anywhere —
    and the closed-form r evaluates in doubles from those exact
    scalars, the identical IEEE expression on both engines.

    Plan shape: ALL lags come off one window sort — a single
    projection computes every ``lead(value, L)`` over the same ordered
    frame, then explodes (lag, x, y) triples and aggregates per lag.
    One pass over the bucketed frame (bounded by the time range, not
    the data volume), never one scan per lag.

    Returns (lag BIGINT, n_pairs BIGINT, acf DOUBLE) — acf NULL when a
    lag has fewer than 2 pairs or zero variance.
    """
    w = Window.orderBy(order_col)
    v = F.col(value_col).cast("long")
    led = series.select(
        v.alias("_x"),
        *[F.lead(v, L).over(w).alias(f"_y{L}") for L in lags],
    )
    pairs = led.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(L).cast("long").alias("lag"),
                        F.col("_x").alias("x"),
                        F.col(f"_y{L}").alias("y"),
                    )
                    for L in lags
                ]
            )
        ).alias("p")
    ).select("p.lag", "p.x", "p.y").where(F.col("y").isNotNull())
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # moment products multiply IN decimal (a long·long product wraps
    # silently past 2^63 — values above ~3e9 would corrupt the acf)
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(d(F.col("x"))).cast("double").alias("sx"),
        F.sum(d(F.col("y"))).cast("double").alias("sy"),
        F.sum(d(F.col("x")) * d(F.col("y"))).cast("double").alias("sxy"),
        F.sum(d(F.col("x")) * d(F.col("x"))).cast("double").alias("sxx"),
        F.sum(d(F.col("y")) * d(F.col("y"))).cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    den = F.sqrt(var_x * var_y)
    return agg.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        F.when(
            (F.col("n") > 1) & (var_x > 0) & (var_y > 0), F.round(num / den, 6)
        ).alias("acf"),
    )
