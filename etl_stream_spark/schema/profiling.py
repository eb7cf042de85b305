"""Table profiling: per-column statistics in one pruned pass per column.

The ``ANALYZE TABLE`` / data-profiling surface a warehouse needs before
CBO decisions, expectation authoring, or a migration: row count, null
count, exact distinct count, and numeric min/max for every column —
emitted long-format so the result is a small stats table regardless of
the source's width.

Scale shape: one aggregation *per column*, unioned. That is deliberate —
with columnar storage each branch's scan prunes to a single column
(``ReadSchema`` carries one field), so profiling N columns costs about
one full-width read of the table in total IO, and each branch's distinct
count is a two-phase hash aggregate (map-side partial by value, shuffle
only distinct values) rather than the row-multiplying Expand that a
single multi-distinct aggregation would plan. Nothing is collected on
the driver; the result is N rows.

Exactness contract: ``n_distinct`` is exact (it is the grouped-value
count, not a sketch), which keeps the profile oracle-checkable; callers
at extreme cardinalities can profile a column subset. For estimate-only
monitoring at 100 TB the KMV sketches in ``operators/sketches.py`` are
the constant-memory alternative.

No reference analog (the reference reads warehouse metadata tables but
never computes table statistics); this is part of the warehouse-ops
extension surface alongside expectations (`schema/expectations.py`).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format per-column profile of ``df``.

    Returns one row per column:
    ``(col_name STRING, dtype STRING, n_rows BIGINT, n_nulls BIGINT,
    n_distinct BIGINT, min_value DOUBLE, max_value DOUBLE)`` —
    ``min_value``/``max_value`` are NULL for non-numeric columns
    (cross-engine string/timestamp formatting is not part of the
    contract; numeric min/max are stored values, no arithmetic).
    ``n_distinct`` counts non-null values, matching ``COUNT(DISTINCT)``.
    """
    parts = []
    for name in columns if columns is not None else df.columns:
        dt = df.schema[name].dataType
        numeric = isinstance(dt, NumericType)
        v = F.col(name)
        parts.append(
            df.select(v.alias("v")).agg(
                F.lit(name).alias("col_name"),
                F.lit(dt.simpleString()).alias("dtype"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                (F.count(F.lit(1)) - F.count("v")).cast("bigint").alias("n_nulls"),
                F.count_distinct(F.col("v")).cast("bigint").alias("n_distinct"),
                (
                    F.min("v").cast("double")
                    if numeric
                    else F.lit(None).cast("double")
                ).alias("min_value"),
                (
                    F.max("v").cast("double")
                    if numeric
                    else F.lit(None).cast("double")
                ).alias("max_value"),
            )
        )
    return reduce(DataFrame.unionByName, parts)


def suggest_expectations(
    df: DataFrame,
    columns: list[str] | None = None,
    max_accepted_values: int = 16,
    range_slack: float = 0.0,
) -> list:
    """Constraint suggestion from an observed profile (the Deequ
    "constraint suggestion" idea): profile ``df`` once, then propose
    the declarative expectations the data currently satisfies —

    * ``not_null(c)`` where no nulls were observed;
    * ``unique(c)`` where every non-null value was distinct;
    * ``in_range(c, min, max)`` for numeric columns (± ``range_slack``
      fraction of the observed span, for tolerance on future data);
    * ``accepted_values(c, …)`` for low-cardinality non-numeric columns
      (``n_distinct ≤ max_accepted_values`` — the value list costs one
      extra bounded aggregation on just those columns).

    Suggestions are a STARTING POINT: they encode what one dataset
    looked like, and a human promotes them to contracts. By
    construction every suggested rule passes on the profiled data —
    `tests/test_profiling.py` pins that round-trip, and the returned
    list feeds `schema.expectations.check` directly.
    """
    from . import expectations as ex

    cols = columns if columns is not None else df.columns
    prof = {r.col_name: r for r in profile_table(df, cols).collect()}
    out: list = []
    enum_values: dict = {}
    for c in cols:
        p = prof[c]
        if p.min_value is None and 0 < p.n_distinct <= max_accepted_values:
            # bounded driver-side collect: ≤ max_accepted_values rows
            vals = [
                r[0]
                for r in df.select(c).filter(F.col(c).isNotNull()).distinct().collect()
            ]
            enum_values[c] = sorted(vals)
    for c in cols:
        p = prof[c]
        if p.n_nulls == 0 and p.n_rows > 0:
            out.append(ex.not_null(c))
        non_null = p.n_rows - p.n_nulls
        if non_null > 0 and p.n_distinct == non_null:
            out.append(ex.unique(c))
        if p.min_value is not None:
            slack = (p.max_value - p.min_value) * range_slack
            out.append(ex.in_range(c, p.min_value - slack, p.max_value + slack))
        elif c in enum_values:
            out.append(ex.accepted_values(c, enum_values[c]))
    return out
