"""Deterministic column masking for replication pipelines.

The third leg of the privacy suite — `operators/privacy.py` audits
(may this be released?), `cdc/erasure.py` forgets (remove this
subject), and this module MASKS: a pipeline replicating into a less
trusted zone rewrites sensitive columns in flight, per the standard
warehouse dynamic-data-masking / Debezium SMT shape.

Strategies (all pure JVM expressions — masking must never be the slow
path of a replication stream):

* ``hash`` — md5 of the string form, salted.  Deterministic, so
  equality joins and GROUP BYs still work on the masked value
  (pseudonymization); the salt prevents trivial dictionary reversal
  and differs per deployment.
* ``bucket:N`` — numeric values floored to N-width buckets
  (generalization, the k-anonymity repair for continuous columns).
* ``null`` — typed NULL (suppression; keeps the column's stored type,
  per the repo's no-VOID-literal rule).
* ``keep_last:N`` — all but the last N characters replaced with ``*``
  (the card-number / phone-tail display form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mask_expr(col: Column, dtype: str, strategy: str, salt: str = "") -> Column:
    """The masking expression for one column under ``strategy``."""
    if strategy == "hash":
        return F.md5(F.concat(F.lit(salt), col.cast("string")))
    if strategy.startswith("bucket:"):
        width = int(strategy.split(":", 1)[1])
        if width <= 0:
            raise ValueError(f"bucket width must be positive, got {width}")
        return (
            (F.floor(col.cast("double") / F.lit(float(width))) * F.lit(width))
            .cast("long")
        )
    if strategy == "null":
        return F.lit(None).cast(dtype)
    if strategy.startswith("keep_last:"):
        n = int(strategy.split(":", 1)[1])
        if n < 0:
            raise ValueError(f"keep_last length must be >= 0, got {n}")
        s = col.cast("string")
        tail = F.substring(s, -n, n) if n > 0 else F.lit("")
        stars = F.repeat(F.lit("*"), F.greatest(F.length(s) - n, F.lit(0)))
        return F.concat(stars, tail)
    raise ValueError(f"unknown masking strategy {strategy!r}")


def mask_columns(
    df: DataFrame, rules: dict[str, str], salt: str = ""
) -> DataFrame:
    """Apply per-column masking ``rules`` ({column: strategy}).

    Unlisted columns pass through untouched.  Unknown columns raise
    (a typo in a masking rule must fail the pipeline, not silently
    leak the unmasked column).
    """
    missing = [c for c in rules if c not in df.columns]
    if missing:
        raise ValueError(f"masking rules for absent columns: {missing}")
    dtypes = dict(df.dtypes)
    out = [
        mask_expr(F.col(c), dtypes[c], rules[c], salt).alias(c)
        if c in rules
        else F.col(c)
        for c in df.columns
    ]
    return df.select(*out)
