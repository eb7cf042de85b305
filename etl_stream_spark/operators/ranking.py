"""Two-phase exact global ordering (rank / running sum) without the
single-task funnel.

``Window.orderBy(...)`` with no ``partitionBy`` is the classic scale
cliff: Spark plans it as ONE task sorting the ENTIRE frame — fine on a
bounded 24-row hour table, fatal on an SF-scaling frame at the 100 TB
design point. This module gives the exact same answers with a parallel
two-phase plan (the ``operators/topk.py`` shape, extended from "top k"
to "every rank").

Why not ``repartitionByRange`` + ``spark_partition_id()``: the range
partitioner SAMPLES its boundaries per exchange execution, and Spark
does not guarantee the physical reuse of identical exchanges — when the
local-rank subtree and the prefix-count subtree each materialized their
own range exchange, the sampled boundaries disagreed and every rank
drifted (caught by the sf0.1 gate in round 7; sf0.001/sf0.01 were
green because the sample there covered the whole frame). The fix is a
partitioning that is a PURE FUNCTION of the row, so any recomputation
of any subtree lands every row in the same bucket:

1. One exact min/max aggregate over the primary sort column (and the
   tie-break column) — deterministic, map-side combinable, 1 row.
2. Each row computes its fine bucket arithmetically: ``floor((v - min)
   / width)`` over ``fine_buckets`` equi-width cells (monotone in the
   sort direction, so bucket order == sort order; equal values always
   share a bucket).
3. A bounded per-bucket stats aggregate (count + min/max + running-sum
   partials, one row per NON-EMPTY ``(fine bucket, tie sub-bucket)``)
   becomes the unit table: buckets holding a single value (a tie mass —
   think a Zipfy frequency column where millions of rows share v=7)
   are sub-split by the tie-break column's own equi-width cells, which
   is order-consistent exactly because the bucket is a pure tie. Unit
   prefix counts/sums come from a window over this BOUNDED frame
   (≤ fine_buckets·tie_buckets rows, data-size independent).
4. The frame joins the broadcast unit map on its computed bucket key;
   a window partitioned by UNIT produces local ranks / running sums in
   parallel, and ``global = unit_prefix + local``.

Determinism: the caller must supply a TOTAL order (include a unique
tie-break column); all order columns must be non-null, non-NaN
numerics. The result is then row-for-row equal to the plain
global-window plan — property-tested against it in
``tests/test_ranking.py``, including under AQE on/off, input
repartitioning, and heavy-tie distributions.

Cost model at 100 TB: two bounded map-side-combinable aggregates plus
ONE hash shuffle of the frame (by unit) and one bounded broadcast —
versus one task receiving every row under the naive plan. Parallelism
is ``min(#non-empty units, shuffle partitions)``; skew is bounded by
the larger of (rows per equi-width cell) and (tie mass / tie_buckets).

Honest limit of the equi-width assumption: a distribution whose mass
clusters in a range much narrower than (max − min) — e.g. values in
[0, 1e-9] plus one outlier at 1e9 — collapses most rows into one or
two fine cells that are NOT pure ties, and that cell's window becomes
the large task again (the pure-tie sub-split only rescues exact
ties). The catalog's sort keys (cents, counts, epoch seconds,
surprisal bits) are well-spread, and ``fine_buckets`` can be raised;
a rank-compressing monotone transform (log-shift, or the IEEE
bit-pattern ordering) is the upgrade path if such a key ever appears.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_V = "_fb_v"  # primary-column fine bucket
_K = "_fb_k"  # tie-break fine bucket
_UK = "_fb_uk"  # unit sub-key: tie sub-bucket when pure-tie, else -1
_LRN = "_fb_lrn"

_NUMERIC_PREFIXES = (
    "tinyint",
    "smallint",
    "int",
    "bigint",
    "float",
    "double",
    "decimal",
    "timestamp",
)


def _bucket(col: Column, mn: Column, mx: Column, n: int, asc: bool) -> Column:
    """Equi-width cell index of ``col`` in [mn, mx], monotone in the
    sort direction (descending order reverses the index). All four
    operands are doubles; IEEE subtraction/division by a positive
    constant and ``floor`` are monotone, and equal inputs always map to
    equal cells — the two properties the rank algebra needs."""
    width = (mx - mn) / F.lit(float(n))
    raw = F.floor((col - mn) / width).cast("long")
    idx = F.when(width <= 0.0, F.lit(0)).otherwise(
        F.least(F.lit(n - 1), F.greatest(F.lit(0), raw))
    )
    return idx if asc else F.lit(n - 1) - idx


def with_global_order(
    df: DataFrame,
    order_by: list[tuple[str, bool]],
    *,
    rank_col: str | None = None,
    count_col: str | None = None,
    running_sums: list[tuple[str, str, str | None]] = (),
    fine_buckets: int = 2048,
    tie_buckets: int = 128,
    materialize: bool = True,
) -> DataFrame:
    """Append exact global-order columns to ``df`` without a global sort.

    ``order_by``: list of ``(column, ascending)`` — must be a TOTAL
    order (append a unique tie-break); order columns non-null numeric.
    ``rank_col``: global ``row_number`` under that order (1-based,
    BIGINT). ``count_col``: total row count on every row (the
    ``count(*) over ()`` analog). ``running_sums``: each
    ``(value_col, cum_col, total_col)`` emits the running sum of
    ``value_col`` up to and including the current row under the global
    order, plus (when ``total_col`` is not None) the grand total.
    Output rows and values equal the plain unpartitioned-window plan
    exactly.

    ``materialize`` (default True) lazily ``localCheckpoint``s the
    input, so the three passes this plan takes over it (bounds, cell
    stats, the ranked output) compute its upstream lineage ONCE — Spark
    does not reliably reuse identical exchanges across subtrees (the
    ``dedup_clusters`` discipline), and without the checkpoint a CHAIN
    of global orders (RFM's three ranks) recomputes upstream
    exponentially. Cost at scale: one frame-sized executor-storage
    materialization per call, the same currency as a shuffle write.
    """
    if materialize:
        df = df.localCheckpoint(eager=False)
    dtypes = dict(df.dtypes)
    v_name, v_asc = order_by[0]
    k_name, k_asc = order_by[1] if len(order_by) > 1 else (None, True)
    for c, _a in order_by[:2]:
        if not dtypes[c].startswith(_NUMERIC_PREFIXES):
            raise ValueError(f"order column {c!r} must be numeric, got {dtypes[c]}")
    sort = [(F.col(c).asc() if asc else F.col(c).desc()) for c, asc in order_by]

    vd = F.col(v_name).cast("double")
    bounds_agg = [
        F.min(vd).alias("_fb_vmin"),
        F.max(vd).alias("_fb_vmax"),
    ]
    if k_name is not None:
        kd = F.col(k_name).cast("double")
        bounds_agg += [F.min(kd).alias("_fb_kmin"), F.max(kd).alias("_fb_kmax")]
    bounds = df.agg(*bounds_agg)  # deterministic 1-row aggregate

    framed = df.crossJoin(F.broadcast(bounds)).withColumn(
        _V, _bucket(vd, F.col("_fb_vmin"), F.col("_fb_vmax"), fine_buckets, v_asc)
    )
    if k_name is not None:
        framed = framed.withColumn(
            _K,
            _bucket(kd, F.col("_fb_kmin"), F.col("_fb_kmax"), tie_buckets, k_asc),
        )
    else:
        framed = framed.withColumn(_K, F.lit(0).cast("long"))
    framed = framed.drop("_fb_vmin", "_fb_vmax", "_fb_kmin", "_fb_kmax")

    # Bounded stats: one row per non-empty (fine, tie) cell. Also
    # deterministic, so its recomputation agrees with the main pass.
    cell_aggs = [
        F.count(F.lit(1)).alias("_fb_cnt"),
        F.min(vd).alias("_fb_lo"),
        F.max(vd).alias("_fb_hi"),
    ]
    for val, cum, _tot in running_sums:
        cell_aggs.append(F.sum(val).alias(f"_fb_s_{cum}"))
    cells = framed.groupBy(_V, _K).agg(*cell_aggs)
    sum_types = dict(cells.dtypes)

    # Everything below runs on the BOUNDED cells frame (≤ fine·tie
    # non-empty rows, data-size independent) as pure window arithmetic —
    # no joins, no further aggregates. A fine bucket is sub-split by
    # the tie bucket ONLY when it holds a single primary value (the one
    # case where tie-break order alone decides, so splitting cannot
    # interleave differing primary values); a unit is then either a
    # whole fine bucket or one (fine, tie) cell, and its prefix is
    #   global_cell_prefix − (pure_tie ? 0 : within_bucket_prefix)
    # because a unit's cells are contiguous in (fine, tie) order. The
    # constant partition key on the global window keeps the plan free
    # of unbounded-frame global windows.
    wv = Window.partitionBy(_V)
    sub = F.min("_fb_lo").over(wv) == F.max("_fb_hi").over(wv)
    g = Window.partitionBy(F.lit(0)).orderBy(_V, _K)
    prevg = g.rowsBetween(Window.unboundedPreceding, -1)
    fullg = g.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    prevv = Window.partitionBy(_V).orderBy(_K).rowsBetween(
        Window.unboundedPreceding, -1
    )

    def _prefix(col: str, zero: Column) -> Column:
        pg = F.coalesce(F.sum(col).over(prevg), zero)
        pv = F.coalesce(F.sum(col).over(prevv), zero)
        return pg - F.when(F.col("_fb_sub"), zero).otherwise(pv)

    staged = cells.withColumn("_fb_sub", sub)
    proj = [
        F.col(_V),
        F.col(_K),
        F.when(F.col("_fb_sub"), F.col(_K))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias(_UK),
        _prefix("_fb_cnt", F.lit(0)).cast("long").alias("_fb_off"),
        F.sum("_fb_cnt").over(fullg).cast("long").alias("_fb_n"),
    ]
    for val, cum, _tot in running_sums:
        zero = F.lit(0).cast(sum_types[f"_fb_s_{cum}"])
        proj.append(_prefix(f"_fb_s_{cum}", zero).alias(f"_fb_po_{cum}"))
        proj.append(F.sum(f"_fb_s_{cum}").over(fullg).alias(f"_fb_pt_{cum}"))
    offsets = staged.select(*proj)

    w_unit = Window.partitionBy(_V, _UK).orderBy(*sort)
    w_run = w_unit.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = framed.join(F.broadcast(offsets), [_V, _K]).withColumn(
        _LRN, F.row_number().over(w_unit).cast("long")
    )
    if rank_col is not None:
        out = out.withColumn(rank_col, (F.col("_fb_off") + F.col(_LRN)).cast("long"))
    if count_col is not None:
        out = out.withColumn(count_col, F.col("_fb_n"))
    for val, cum, tot in running_sums:
        out = out.withColumn(cum, F.col(f"_fb_po_{cum}") + F.sum(val).over(w_run))
        if tot is not None:
            out = out.withColumn(tot, F.col(f"_fb_pt_{cum}"))
    drop = [_V, _K, _UK, _LRN, "_fb_off", "_fb_n"]
    drop += [f"_fb_po_{cum}" for _v, cum, _t in running_sums]
    drop += [f"_fb_pt_{cum}" for _v, cum, _t in running_sums]
    return out.drop(*drop)


def ntile_expr(rank_col: str, n_col: str, k: int) -> Column:
    """SQL-standard ``NTILE(k)`` derived from a global rank column and a
    total-count column in exact BIGINT arithmetic (``div``/``%`` only —
    no float division anywhere): with ``q = n div k`` and
    ``r = n mod k``, buckets 1..r hold ``q+1`` rows (ranks up to
    ``r·(q+1)``, bucket = ceil(rank/(q+1))) and buckets r+1..k hold
    ``q`` rows. Equal to both Spark's and DuckDB's NTILE for every
    (rank, n) — property-tested in ``tests/test_ranking.py`` — which
    lets an entry keep its proven NTILE oracle while the Spark side
    swaps the single-task ntile window for the two-phase rank above.
    ``rank_col``/``n_col`` must be materialized BIGINT columns."""
    q = f"({n_col} div {k})"
    r = f"({n_col} % {k})"
    head = f"({r} * ({q} + 1))"
    return F.expr(
        f"cast(case when {rank_col} <= {head} "
        f"then ({rank_col} + {q}) div ({q} + 1) "
        f"else {r} + ({rank_col} - {head} + {q} - 1) div {q} end as long)"
    )
