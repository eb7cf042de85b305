"""On-engine model training: distributed logistic regression with
deterministic exact-integer gradient accumulation.

The quality-classifier step of a training-data pipeline (FineWeb-Edu /
DCLM-style): learn a keep/drop model over cheap columnar features, then
score the whole corpus with a pure expression. Training follows the same
loop discipline as ``similarity.kmeans_train``: the dataset never leaves
the executors; per epoch one aggregate ships ``dim + 1`` integers to the
driver, which applies the update in plain Python. O(epochs) Spark jobs
at any corpus size.

Determinism: per-row gradient contributions quantize to integer
micro-units BEFORE the global sum (float summation order across
partitions would otherwise make every run differ); the weight update is
driver-side Python float arithmetic — identical on every run and every
partitioning. The same micro-unit discipline as the LM surprisal sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_stream_spark.plans.partitioning import ensure_parallelism

GRAD_QUANT = 1_000_000  # micro-units: gradients exact to 1e-6


def _margin(cols: list[str], weights: list[float], bias: float) -> Column:
    z = F.lit(float(bias))
    for c, w in zip(cols, weights):
        z = z + F.col(c).cast("double") * float(w)
    return z


def logistic_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    epochs: int = 20,
) -> tuple[list[float], float]:
    """Train ``sigmoid(w.x + b)`` against a boolean/0-1 label.

    Returns ``(weights, bias)``. Mean-gradient descent: per epoch the
    executors compute ``(sigmoid(z) - y) * x_j`` per row, quantized to
    micro-units, and one aggregate produces exact integer sums — the
    only driver-side data ever collected.

    Quantization is half-up via ``floor(v + 0.5)``, NOT ``round(v)``:
    the first epoch's error is exactly ±0.5 (all-zero weights → z = 0),
    so ``v`` lands exactly on .5 micro-unit ties for every feature whose
    6-dp value has an odd last digit — where double ROUND's tie
    behavior diverges between engines (Spark half-up vs DuckDB
    half-even), while floor and the +0.5 add are exact IEEE ops on
    both. This is what makes the whole training loop reproducible as a
    chained-CTE SQL oracle (see ``QUALITY_TRAINED_SQL``).
    """
    # persist the narrow feature projection: without it every epoch (and
    # the count) re-evaluates the full upstream lineage — feature
    # engineering over the whole corpus times epochs+1
    data = ensure_parallelism(df).select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("_y"),
    ).persist()
    try:
        n = data.count()
        if n == 0:
            raise ValueError("empty training input")
        weights = [0.0] * len(feature_cols)
        bias = 0.0
        for _ in range(epochs):
            err = (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(feature_cols, weights, bias)))
                - F.col("_y")
            )
            aggs = [
                F.sum(
                    F.floor(err * F.col(c) * GRAD_QUANT + 0.5).cast("long")
                ).alias(f"_g_{i}")
                for i, c in enumerate(feature_cols)
            ] + [F.sum(F.floor(err * GRAD_QUANT + 0.5).cast("long")).alias("_g_b")]
            row = data.agg(*aggs).first()
            weights = [
                w - lr * row[f"_g_{i}"] / (n * GRAD_QUANT) for i, w in enumerate(weights)
            ]
            bias = bias - lr * row["_g_b"] / (n * GRAD_QUANT)
    finally:
        data.unpersist()
    return weights, bias


def logistic_score(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    bias: float,
    out_col: str = "score",
) -> DataFrame:
    """Score with a trained model as one pure columnar expression."""
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(feature_cols, weights, bias)))
    return df.withColumn(out_col, F.round(p, 6))
