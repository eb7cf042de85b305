"""Shuffle-reducing top-k per group.

The plain plan for "top k rows per group" is a ranking window: shuffle
EVERY row on the group key, sort each group, keep k. At 100 TB the
shuffle is the whole cost, and k of it is all anyone wanted. The
classic fix is two-phase top-k (the same algebra behind SQL engines'
partial TopNs): each input partition first reduces to its own per-group
top k — correct because the global top k of a union is contained in the
union of per-part top ks — and only ``partitions × groups × k`` rows
reach the exchange; the final ranking window then runs on that reduced
set.

Phase 1 runs as an Arrow-batched ``mapInPandas`` that accumulates a
per-group k-head across the partition's batches (memory:
``groups-present-in-partition × k`` rows — fine for the
moderate-cardinality groups this pattern targets; with millions of
groups the plain window is already shuffle-proportional and fine).
Determinism: ordering ties break on the explicit ``tie_col``, so the
result equals the ranking-window plan row for row — which is exactly
what the oracle checks.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.partitioning import ensure_parallelism


def partial_topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    tie_col: str,
    k: int,
    ascending: bool = False,
) -> DataFrame:
    """Top ``k`` rows per group by ``order_col`` (desc by default), ties
    broken by ascending ``tie_col``; output carries ``rank``. Equal to
    the plain ranking-window plan, at a shuffle of
    ``partitions × groups × k`` rows instead of all of them.

    NULL handling matches the window plan: NULL group keys form their
    own group, and NULL order values sort first under ``ascending`` /
    last under descending (Spark's asc/desc defaults). ``tie_col`` must
    be non-null — it is the determinism anchor. NULL *group* keys in
    integral columns holding values above 2^53 are unsupported (Arrow→
    pandas turns a nullable int column into float64, which could merge
    distinct huge-key groups); integral ORDER columns are safe — they
    cross the Arrow boundary as a (null-flag, zero-filled value) pair so
    no nullable-int→float64 conversion ever touches them."""
    cols = list(df.columns)
    dtypes = dict(df.dtypes)
    int_order = dtypes[order_col] in ("tinyint", "smallint", "int", "bigint")
    if int_order:
        # Nullable int64 → float64 at the Arrow→pandas boundary loses
        # exactness above 2^53, corrupting both the k-head selection and
        # the emitted values. Ship a non-null pair instead and rebuild
        # the column JVM-side after the reduction. When order_col is ALSO
        # a group/tie column (degenerate but valid — "top k per value"),
        # it must survive the projection: the pandas stage groups and
        # tie-breaks by name, and as a GROUP key a huge nullable int is
        # already documented-unsupported, so keeping it is safe here.
        keep_order = order_col in group_cols or order_col == tie_col
        df = df.select(
            *[c for c in cols if c != order_col or keep_order],
            F.col(order_col).isNull().alias("_ord_null"),
            F.coalesce(F.col(order_col), F.lit(0).cast(dtypes[order_col])).alias(
                "_ord_filled"
            ),
        )
        # asc ⇒ nulls first ⇒ _ord_null=True rows lead (sort flag False);
        # desc ⇒ nulls last ⇒ True rows trail (sort flag True).
        sort_cols = [*group_cols, "_ord_null", "_ord_filled", tie_col]
        sort_flags = [True] * len(group_cols) + [not ascending, ascending, True]
    else:
        sort_cols = [*group_cols, order_col, tie_col]
        sort_flags = [True] * len(group_cols) + [ascending, True]

    work_cols = list(df.columns)

    def _heads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.DataFrame | None = None
        for pdf in batches:
            both = pdf if acc is None else pd.concat([acc, pdf], ignore_index=True)
            # na_position mirrors Spark's window ordering (asc → nulls
            # FIRST, desc → nulls last); dropna=False keeps NULL group
            # keys — both required for row-for-row window-plan equality
            both = both.sort_values(
                sort_cols,
                ascending=sort_flags,
                na_position="first" if ascending else "last",
            )
            acc = both.groupby(group_cols, sort=False, dropna=False).head(k)
        yield acc if acc is not None else pd.DataFrame(columns=work_cols)

    schema = ", ".join(f"{c} {t}" for c, t in df.dtypes)
    reduced = ensure_parallelism(df).mapInPandas(_heads, schema=schema)
    if int_order:
        reduced = reduced.select(
            *[
                F.when(~F.col("_ord_null"), F.col("_ord_filled"))
                .alias(c)
                if c == order_col
                else F.col(c)
                for c in cols
            ]
        )
    order = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = Window.partitionBy(*group_cols).orderBy(order, F.col(tie_col).asc())
    return (
        reduced.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*cols, F.col("rank").cast("long").alias("rank"))
    )
