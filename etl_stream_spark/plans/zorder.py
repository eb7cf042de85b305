"""Z-order (Morton-curve) clustering for multi-dimensional scan pruning.

A table sorted by ONE column prunes beautifully on that column and not
at all on any other. Interleaving the bits of two (or more) quantized
sort keys — the Morton curve — gives every participating column
locality: rows close in z-value are close in EVERY dimension, so
per-file/row-group min-max stats become selective for predicates on
any of them. This is the technique behind Delta's OPTIMIZE ZORDER and
Iceberg's z-ordering rewrite (public algorithm — Morton 1966),
re-expressed as plain Spark expressions:

* each key is quantized to ``bits`` integer levels over its min/max
  domain (one bounded 1-row aggregate — the same shape as the
  histogram/quantile entries);
* the z-value interleaves the quantized bits as a single BIGINT, pure
  JVM integer arithmetic (whole-stage codegen, no UDFs);
* :func:`write_zordered` range-partitions on the z-value and sorts
  within partitions before writing — every output file covers a small
  hyper-rectangle of the key space instead of a full-domain stripe.

At 100 TB this is a write-once cost (one shuffle, same as any sort)
paid to make every later multi-predicate scan prune at the file level;
``tests/test_zorder.py`` measures the span shrinkage on real parquet
footers.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map ``col`` in [lo, hi] onto ``2**bits`` integer levels —
    monotone exact BIGINT arithmetic (``(x - lo) * 2^bits div
    (hi - lo + 1)`` over integral inputs), engine-portable."""
    levels = F.lit(1 << bits).cast("long")
    span = (hi - lo + F.lit(1)).cast("long")
    q = ((col - lo).cast("long") * levels - (((col - lo).cast("long") * levels) % span)) / span
    return q.cast("long")


def interleave_bits_n(cols: list[Column], bits: int) -> Column:
    """Morton z-value of n ``bits``-level quantized keys: column j's
    bit i lands at position ``i·n + j`` (round-robin interleave — the
    general form real ZORDER rewrites use for 2-4 clustered columns).
    Pure shift/mask arithmetic — identical SQL runs on DuckDB for the
    oracle. Requires ``n · bits ≤ 63`` to stay in a signed BIGINT."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit z-value")
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftrightunsigned(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms).cast("long")


def interleave_bits(x: Column, y: Column, bits: int) -> Column:
    """Two-column Morton z-value: x's bit i at position 2i, y's at
    2i+1 (the n-ary round-robin specialized to n = 2)."""
    return interleave_bits_n([x, y], bits)


def with_zvalue_n(
    df: DataFrame, cols: list[str], bits: int = 16, z_col: str = "_z"
) -> DataFrame:
    """Append the z-value of n integral columns, each quantized over
    its observed min/max (one bounded 1-row aggregate broadcast into
    the plan — never a driver-side action)."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).cast("long").alias(f"_z{c}_lo"))
        aggs.append(F.max(c).cast("long").alias(f"_z{c}_hi"))
    framed = df.crossJoin(F.broadcast(df.agg(*aggs)))
    qs = [
        quantize(F.col(c), F.col(f"_z{c}_lo"), F.col(f"_z{c}_hi"), bits)
        for c in cols
    ]
    drop = [f"_z{c}_{s}" for c in cols for s in ("lo", "hi")]
    return framed.withColumn(z_col, interleave_bits_n(qs, bits)).drop(*drop)


def with_zvalue(
    df: DataFrame, x_col: str, y_col: str, bits: int = 16, z_col: str = "_z"
) -> DataFrame:
    """Two-column :func:`with_zvalue_n`."""
    return with_zvalue_n(df, [x_col, y_col], bits, z_col)


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    num_files: int = 32,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` z-order-clustered on (x_col, y_col): range
    partition + local sort on the z-value, one file per partition —
    each output file covers a compact hyper-rectangle, so min-max file
    stats prune scans filtered on EITHER column. (Range boundaries are
    sampled per write; that affects file balance only, never content —
    the layout is a physical property, not a query answer.)"""
    z = with_zvalue(df, x_col, y_col, bits)
    (
        z.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
