"""Distributed logistic training: convergence on a separable problem,
determinism, and partitioning invariance of the learned model."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_stream_spark.operators.ml import logistic_score, logistic_train


def _separable(spark, n=400):
    """Label = 1 iff x1 + x2 > 1 (with a margin): linearly separable."""
    rows = []
    for i in range(n):
        x1 = (i * 37 % 100) / 100.0
        x2 = (i * 61 % 100) / 100.0
        margin = x1 + x2 - 1.0
        if abs(margin) < 0.08:
            continue  # keep a margin so 20 epochs separate cleanly
        rows.append((i, x1, x2, 1 if margin > 0 else 0))
    return spark.createDataFrame(rows, "id long, x1 double, x2 double, y int")


def test_training_converges_and_scores(spark):
    df = _separable(spark)
    w, b = logistic_train(df, ["x1", "x2"], "y", lr=2.0, epochs=40)
    scored = logistic_score(df, ["x1", "x2"], w, b)
    acc = (
        scored.select(
            ((F.col("score") > 0.5).cast("int") == F.col("y")).cast("int").alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc > 0.95, (w, b, acc)
    # the learned boundary must weight both features positively
    assert w[0] > 0 and w[1] > 0 and b < 0


def test_training_is_partitioning_invariant(spark):
    df = _separable(spark)
    w1, b1 = logistic_train(df, ["x1", "x2"], "y", lr=1.0, epochs=5)
    w2, b2 = logistic_train(df.repartition(13), ["x1", "x2"], "y", lr=1.0, epochs=5)
    w3, b3 = logistic_train(df.coalesce(1), ["x1", "x2"], "y", lr=1.0, epochs=5)
    # exact equality: integer gradient sums make the whole training
    # trajectory independent of physical layout
    assert (w1, b1) == (w2, b2) == (w3, b3)


def test_empty_input_raises(spark):
    import pytest

    df = spark.createDataFrame([], "x1 double, y int")
    with pytest.raises(ValueError):
        logistic_train(df, ["x1"], "y")
