"""Z-order (Morton-curve) clustering for multi-column data skipping.

Parquet scans prune files and row groups from footer min/max statistics.
A table sorted on one column skips beautifully on that column and not at
all on any other; interleaving the bits of several columns into one
Z-value and range-partition-sorting on it gives every interleaved column
*partial* locality — each file covers a small hyper-rectangle of the key
space, so predicates on ANY of the Z-columns prune most files. This is
what Delta's ``OPTIMIZE ZORDER BY`` / Iceberg's ``rewrite_data_files``
sort-order does; this module is the engine-level primitive on plain
parquet, with the same public shape so a table-format swap is a rename.

Reference analog: the reference writes Iceberg files unpartitioned and
unsorted (``/root/reference/etl-destination/src/iceberg/client.rs:359-363``)
— fine at trickle rates, hostile to 100 TB scans. SURVEY §7.1 phase 8
names ZORDER as the scale path for the merged silver tables.

All computation is JVM columnar expressions: per-column min/max ranges
(one tiny aggregate) normalize values to ``bits``-wide integer grid
coordinates, bit interleave is a fold over ``shiftleft``/``bitwise or``
— no UDFs, one range-partitioning shuffle to write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16  # 16 bits/column: 2 columns fill 32 of 63 usable bits


def _grid_coord(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Normalize a numeric value into ``[0, 2^bits)`` on the min/max
    range (floor semantics; degenerate constant range → 0)."""
    span = (mx.cast("double") - mn.cast("double"))
    scaled = F.floor(
        (col.cast("double") - mn.cast("double")) * ((1 << bits) - 1) / span
    ).cast("long")
    return F.when(span > 0, F.least(F.lit((1 << bits) - 1), scaled)).otherwise(F.lit(0))


def z_value(coords: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Interleave ``bits``-wide grid coordinates into one Morton value.

    Bit ``b`` of coordinate ``i`` lands at position ``b*n + i`` — the
    classic Z-curve. ``n * bits`` must stay < 63 (signed long).
    """
    n = len(coords)
    if n * bits >= 63:
        raise ValueError(f"{n} columns x {bits} bits overflow a signed long")
    z = F.lit(0).cast("long")
    for i, c in enumerate(coords):
        for b in range(bits):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def with_z_value(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS, out_col: str = "_z"
) -> DataFrame:
    """Append the Morton value of ``cols`` (numeric or timestamp).

    The per-column ranges come from one aggregate over the input —
    bounded driver metadata (2 scalars per column), same discipline as
    the merge engine's bucket lists. Timestamps interleave on their
    microsecond epoch.
    """
    casted = {
        c: F.col(c).cast("double")
        if dict(df.dtypes)[c] not in ("timestamp", "timestamp_ntz")
        else F.unix_micros(F.col(c)).cast("double")
        for c in cols
    }
    rng = df.agg(
        *[m for c in cols for m in (F.min(casted[c]).alias(f"_mn_{c}"), F.max(casted[c]).alias(f"_mx_{c}"))]
    ).first()
    coords = [
        _grid_coord(
            casted[c], F.lit(rng[f"_mn_{c}"]), F.lit(rng[f"_mx_{c}"]), bits
        )
        for c in cols
    ]
    return df.withColumn(out_col, z_value(coords, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-curve of ``cols``.

    ``repartitionByRange`` on the Z-value gives each output file a
    contiguous curve segment (a compact hyper-rectangle in key space);
    the within-partition sort tightens row-group stats inside each
    file. One shuffle; the Z column itself is dropped from storage.
    """
    zdf = with_z_value(df, cols, bits)
    (
        zdf.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
