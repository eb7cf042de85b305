"""Privacy governance operators: k-anonymity auditing.

The erasure path (``cdc/erasure.py``) removes keys on request; this
module answers the *preventive* question a training-data pipeline must
ask before release: does any quasi-identifier combination isolate fewer
than k individuals?  (Sweeney, "k-anonymity: a model for protecting
privacy", 2002 — public.)  Complements the PII redaction pass in
``operators/text_analysis.py``.

Scale shape: one hash aggregation on the quasi-identifier tuple (the
group count IS the k-anonymity statistic), then a second aggregation
over the tiny per-group frame — no joins, no windows, map-side
combinable all the way.  At 100 TB the QI-tuple cardinality is bounded
by the attribute domains, not the row count, so the second stage is
trivially small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def qi_group_sizes(df: DataFrame, qi_cols: list[str]) -> DataFrame:
    """Equivalence-class sizes of the quasi-identifier tuple.

    Returns one row per distinct QI combination with its ``group_size``
    (BIGINT).  A dataset is k-anonymous iff ``MIN(group_size) >= k``.
    """
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("group_size")
    )


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list[str],
    k: int,
    by: str | None = None,
) -> DataFrame:
    """Per-``by``-attribute k-anonymity audit.

    For each value of ``by`` (one of the QI columns; defaults to the
    first): the number of equivalence classes, the smallest class, how
    many classes fall below ``k``, and how many ROWS sit in those
    unsafe classes (the re-identification exposure if the dataset were
    released as-is).  All outputs BIGINT; suppressing the unsafe rows
    (or generalizing their QI values) restores k-anonymity.
    """
    if by is None:
        by = qi_cols[0]
    if by not in qi_cols:
        raise ValueError(f"by={by!r} must be one of qi_cols {qi_cols}")
    unsafe = F.col("group_size") < F.lit(int(k))
    return (
        qi_group_sizes(df, qi_cols)
        .groupBy(by)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min("group_size").cast("long").alias("min_group_size"),
            F.sum(F.when(unsafe, 1).otherwise(0)).cast("long").alias(
                "n_unsafe_groups"
            ),
            F.sum(F.when(unsafe, F.col("group_size")).otherwise(0))
            .cast("long")
            .alias("rows_at_risk"),
            F.sum("group_size").cast("long").alias("n_rows"),
        )
    )
