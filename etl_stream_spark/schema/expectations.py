"""Declarative data-quality expectations (Deequ / DLT-expectations
shape) on top of the P10 validation predicates.

A pipeline declares WHAT must hold — non-null keys, uniqueness,
ranges, accepted values, referential integrity, custom predicates —
and the engine compiles the row-level rules into ONE aggregation pass
(a single scan however many rules there are) plus one bounded job per
set-level rule (uniqueness = count-distinct, foreign keys = an
anti-join probe). Everything is JVM-side expressions; reports are
plain DataFrames so they oracle-check like any query.

Two consumption modes, matching the reference's two validation
behaviors (reject vs null-out, ``validation.rs`` /
``snowflake_destination.rs:1106-1125``):

* :func:`check` — violation counts per expectation (monitoring /
  gating);
* :func:`split` — (valid, quarantined) row split for the DLQ path,
  row-level rules only (set-level rules are properties of the whole
  frame, not of a row).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One named rule.

    * ``kind="row"`` — ``violation`` yields a boolean violation
      predicate; fused into the shared aggregation pass.
    * ``kind="unique"`` — ``cols`` holds the key; ALSO fused into the
      shared pass (COUNT − COUNT DISTINCT needs no extra job).
    * ``kind="job"`` — ``count_violations`` runs its own bounded job
      (foreign keys: an anti-join probe).
    """

    name: str
    violation: Callable[[DataFrame], Column] | None = None
    count_violations: Callable[[DataFrame], int] | None = None
    cols: tuple[str, ...] = ()
    kind: str = field(default="row")


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null({col})", violation=lambda df: F.col(col).isNull())


def in_range(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"in_range({col})",
        violation=lambda df: F.col(col).isNotNull()
        & ~F.col(col).between(F.lit(lo), F.lit(hi)),
    )


def accepted_values(col: str, values: list) -> Expectation:
    return Expectation(
        f"accepted_values({col})",
        violation=lambda df: F.col(col).isNotNull() & ~F.col(col).isin(values),
    )


def matches(col: str, regex: str) -> Expectation:
    return Expectation(
        f"matches({col})",
        violation=lambda df: F.col(col).isNotNull() & ~F.col(col).rlike(regex),
    )


def finite(col: str) -> Expectation:
    from etl_stream_spark.schema.validation import is_finite

    return Expectation(
        f"finite({col})",
        violation=lambda df: F.col(col).isNotNull() & ~is_finite(F.col(col)),
    )


def custom(name: str, violation: Callable[[DataFrame], Column]) -> Expectation:
    return Expectation(name, violation=violation)


def unique(*cols: str) -> Expectation:
    """Duplicate rows over fully-non-null keys
    (= COUNT(keys) − COUNT(DISTINCT keys)); computed inside the shared
    aggregation pass — no extra scan."""
    return Expectation(f"unique({', '.join(cols)})", cols=tuple(cols), kind="unique")


def foreign_key(
    cols: list[str], ref: DataFrame, ref_cols: list[str]
) -> Expectation:
    """Set-level: rows whose (non-null) key has no match in ``ref`` —
    an anti-join probe; broadcast-able when the ref key set is a dim."""

    def count(df: DataFrame) -> int:
        keys = ref.select(*ref_cols).distinct()
        cond = [df[c].eqNullSafe(keys[r]) for c, r in zip(cols, ref_cols)]
        probe = df.na.drop(subset=cols)
        return probe.join(keys, cond, "left_anti").count()

    return Expectation(
        f"foreign_key({', '.join(cols)})", count_violations=count, kind="job"
    )


def check(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Violation counts per expectation, as a DataFrame
    ``(expectation STRING, n_rows BIGINT, violations BIGINT,
    passed BOOLEAN)`` ordered by expectation name.

    Row-level rules share ONE aggregation over one scan; each
    set-level rule runs its own bounded job (counts only — no data to
    the driver beyond scalars).
    """
    spark = df.sparkSession
    row_rules = [e for e in expectations if e.kind == "row"]
    uniq_rules = [e for e in expectations if e.kind == "unique"]
    job_rules = [e for e in expectations if e.kind == "job"]

    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for e in row_rules:
        aggs.append(
            F.sum(F.when(e.violation(df), 1).otherwise(0)).cast("long").alias(e.name)
        )
    for i, e in enumerate(uniq_rules):
        nn = None
        for c in e.cols:
            p = F.col(c).isNotNull()
            nn = p if nn is None else (nn & p)
        aggs.append(F.sum(F.when(nn, 1).otherwise(0)).cast("long").alias(f"_u{i}n"))
        aggs.append(F.countDistinct(*e.cols).cast("long").alias(f"_u{i}d"))
    row = df.agg(*aggs).collect()[0]
    n_rows = int(row["_n"])
    results = [(e.name, n_rows, int(row[e.name])) for e in row_rules]
    for i, e in enumerate(uniq_rules):
        results.append((e.name, n_rows, int(row[f"_u{i}n"]) - int(row[f"_u{i}d"])))

    for e in job_rules:
        results.append((e.name, n_rows, int(e.count_violations(df))))

    results.sort(key=lambda r: r[0])
    return spark.createDataFrame(
        [(n, t, v, v == 0) for n, t, v in results],
        "expectation string, n_rows long, violations long, passed boolean",
    )


def split(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined): rows violating ANY row-level rule go to
    quarantine with a ``_violations`` array naming the failed rules —
    the DLQ feed. Set-level rules are ignored here (frame properties)."""
    row_rules = [e for e in expectations if e.kind == "row"]
    marks = F.array_compact(
        F.array(
            *[
                F.when(e.violation(df), F.lit(e.name))
                for e in row_rules
            ]
        )
    )
    marked = df.withColumn("_violations", marks)
    valid = marked.filter(F.size("_violations") == 0).drop("_violations")
    quarantined = marked.filter(F.size("_violations") > 0)
    return valid, quarantined
