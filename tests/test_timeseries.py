"""Trajectory similarity (operators/timeseries.py): dense bucketing,
exact integral reference, deterministic ranking, partitioning
invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_stream_spark.operators import timeseries as tsq

SCHEMA = "uid long, seq long, cents long"


def events(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_dense_trajectories_with_zero_buckets(spark):
    # order range 0..7 → with 4 buckets each bucket covers 2 positions
    df = events(spark, [(1, 0, 10), (1, 1, 5), (1, 6, 7), (2, 3, 4)])
    got = {
        r.uid: r.trajectory
        for r in tsq.bucket_trajectories(
            df, "uid", "seq", F.col("cents"), n_buckets=4
        ).collect()
    }
    assert got == {1: [15, 0, 0, 7], 2: [0, 4, 0, 0]}


def test_mean_is_integral_div(spark):
    df = events(spark, [(1, 0, 10), (2, 0, 5), (3, 1, 1)])
    traj = tsq.bucket_trajectories(df, "uid", "seq", F.col("cents"), n_buckets=2)
    ref = tsq.mean_trajectory(traj, n_buckets=2).first()._ref
    assert ref == [5, 0]  # (10+5+0) div 3, (0+0+1) div 3


def test_rank_deterministic_ties_and_partitioning(spark):
    rows = [(u, s, (u * 7 + s) % 50) for u in range(20) for s in range(10)]
    df = events(spark, rows)

    def run(d):
        traj = tsq.bucket_trajectories(d, "uid", "seq", F.col("cents"), 4)
        return [
            (r.uid, r.dist2)
            for r in tsq.rank_by_distance(
                traj, tsq.mean_trajectory(traj, 4), "uid", k=5
            ).collect()
        ]

    a = run(df.repartition(1))
    b = run(df.repartition(13, "cents"))
    assert a == b
    assert [d for _u, d in a] == sorted(d for _u, d in a)
