"""CEP row-pattern matching (operators/cep.py): ordering, symbol
mapping, non-overlapping match counts, and partitioning invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_stream_spark.operators.cep import (
    match_pattern,
    symbol_expr,
    symbol_sequences,
)

SCHEMA = "uid long, seq long, et string"
SYMS = {"signup": "s", "purchase": "p", "error": "e"}


def test_sequences_ordered_and_unmapped_to_other(spark):
    df = spark.createDataFrame(
        [(1, 3, "purchase"), (1, 1, "signup"), (1, 2, "weird"), (2, 1, "error")],
        SCHEMA,
    )
    got = {
        r.uid: r.symbol_seq
        for r in symbol_sequences(df, ["uid"], ["seq"], "et", SYMS).collect()
    }
    assert got == {1: "sop", 2: "e"}


def test_match_counts_non_overlapping(spark):
    # e e e e -> 'ee+' matches ONCE (greedy, non-overlapping);
    # p e p e -> 'pe' matches twice
    rows = [(1, i, "error") for i in range(1, 5)]
    rows += [(2, 1, "purchase"), (2, 2, "error"), (2, 3, "purchase"), (2, 4, "error")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r.uid: (r.burst_matches, r.pe_matches)
        for r in match_pattern(
            df, ["uid"], ["seq"], "et", SYMS,
            patterns={"burst": "ee+", "pe": "pe"},
        ).collect()
    }
    assert got == {1: (1, 0), 2: (0, 2)}


def test_partitioning_invariant(spark):
    rows = [(u, i, t) for u in range(5) for i, t in enumerate(
        ["signup", "purchase", "error", "purchase", "signup", "purchase"]
    )]
    df = spark.createDataFrame(rows, SCHEMA)
    a = match_pattern(
        df.repartition(1), ["uid"], ["seq"], "et", SYMS, {"conv": "s[^e]*p"}
    )
    b = match_pattern(
        df.repartition(7, "et"), ["uid"], ["seq"], "et", SYMS, {"conv": "s[^e]*p"}
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # spp then sp after the error: two non-overlapping conversions
    assert a.filter(F.col("uid") == 0).first().conv_matches == 2


def test_multichar_symbol_rejected(spark):
    with pytest.raises(ValueError):
        symbol_expr("et", {"signup": "su"})
