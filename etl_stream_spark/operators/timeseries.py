"""Per-entity trajectory construction and exact similarity ranking.

The time-series complement of the embedding kNN stack: build each
key's fixed-length activity trajectory (bucketed integer-quantized
sums over the global order range) and rank keys by exact squared
distance to a reference trajectory. Everything is BIGINT arithmetic —
quantized cents, integral ``div`` bucketing and averaging — so results
are bit-identical across engines and partitionings (the repo's
determinism rule: no float accumulation).

Scale shape: ONE map-side-combinable aggregation per key — the bucket
dimension is folded into ``n_buckets`` conditional sums inside the
same groupBy, so the single exchange carries ``n_buckets`` BIGINTs per
key and no second shuffle densifies; the reference is a 1-row
aggregate broadcast once; distance is an in-row
``zip_with``/``aggregate`` fold. Driver-free throughout — the single
1-row bounds aggregate rides a broadcast join (the
``_snapshot_cutoff`` precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRAJ_COL = "trajectory"


def bucket_trajectories(
    events: DataFrame,
    key_col: str,
    order_col: str,
    value_cents: F.Column,
    n_buckets: int,
) -> DataFrame:
    """One row per key with its dense length-``n_buckets`` BIGINT
    trajectory: bucket ``b`` holds the sum of ``value_cents`` over the
    key's events whose ``order_col`` falls in the b-th slice of the
    GLOBAL order range (integral ``div`` — engine-portable). Keys are
    every key present in ``events``; buckets without events hold 0."""
    bounds = F.broadcast(
        events.agg(
            F.min(order_col).cast("long").alias("_lo"),
            F.max(order_col).cast("long").alias("_hi"),
        )
    )
    bucket = F.expr(
        f"(({order_col} - _lo) * {n_buckets}) div (_hi - _lo + 1)"
    ).cast("int")
    # one conditional sum per bucket INSIDE the per-key aggregation:
    # a single map-side-combinable exchange of n_buckets longs per key
    # (a (key, bucket) groupBy would shuffle twice to densify)
    per_bucket = [
        F.coalesce(
            F.sum(F.when(F.col("_b") == i, value_cents)), F.lit(0).cast("long")
        ).alias(f"_t{i}")
        for i in range(n_buckets)
    ]
    return (
        events.join(bounds)
        .withColumn("_b", bucket)
        .groupBy(key_col)
        .agg(*per_bucket)
        .select(
            key_col,
            F.array(*[F.col(f"_t{i}") for i in range(n_buckets)]).alias(TRAJ_COL),
        )
    )


def mean_trajectory(trajectories: DataFrame, n_buckets: int) -> DataFrame:
    """One-row reference: the per-bucket integral mean over all keys
    (``sum div count`` — exact, deterministic). Broadcast-join it to
    the per-key trajectories for ranking."""
    per_bucket = [
        F.sum(F.element_at(F.col(TRAJ_COL), i + 1)).alias(f"_t{i}")
        for i in range(n_buckets)
    ]
    totals = trajectories.agg(F.count(F.lit(1)).alias("_n"), *per_bucket)
    ref = F.array(
        *[F.expr(f"_t{i} div _n").cast("long") for i in range(n_buckets)]
    )
    return totals.select(ref.alias("_ref"))


def rank_by_distance(
    trajectories: DataFrame,
    reference: DataFrame,
    key_col: str,
    k: int,
) -> DataFrame:
    """Top-``k`` keys by exact squared distance (BIGINT) to the 1-row
    ``reference``, ascending, ties broken by key — the deterministic
    LIMIT contract."""
    d2 = F.aggregate(
        F.zip_with(
            F.col(TRAJ_COL), F.col("_ref"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        trajectories.join(F.broadcast(reference))
        .select(key_col, d2.alias("dist2"))
        .orderBy("dist2", key_col)
        .limit(k)
    )
