"""Bloom-filter pruned joins: exactness, one-sidedness, pruning power.

The contract under test is the one that makes the sketch safe at any
scale: the pruned join is row-for-row the plain join (false positives
are invisible — they flow to the exact stage), and a key that WAS
inserted is never reported absent (the one-sided guarantee the
definite-absent branch of the anti join rests on).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_stream_spark.operators.bloom import (
    bloom_anti_join,
    bloom_semi_join,
    build_bloom,
    might_contain,
    optimal_num_bits,
    optimal_num_hashes,
)

NB, NH = 1 << 14, 5


def _frames(spark):
    history = spark.range(0, 600).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("fp")
    )
    # overlap: 200..799 -> 400 dups, 400 novel
    incoming = spark.range(200, 1000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("fp"),
        (F.col("id") * 7).alias("payload"),
    )
    return history, incoming


def test_no_false_negatives(spark):
    """Every inserted key probes positive — the one-sided guarantee."""
    history, _ = _frames(spark)
    flt = build_bloom(history, "fp", NB, NH)
    missed = (
        history.join(F.broadcast(flt))
        .filter(~might_contain(F.col("fp"), NB, NH))
        .count()
    )
    assert missed == 0


def test_semi_join_matches_plain_semi(spark):
    history, incoming = _frames(spark)
    got = bloom_semi_join(incoming, history, "fp", NB, NH)
    want = incoming.join(history, "fp", "left_semi")
    assert got.columns == incoming.columns
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() == 400


def test_anti_join_matches_plain_anti(spark):
    history, incoming = _frames(spark)
    got = bloom_anti_join(incoming, history, "fp", NB, NH)
    want = incoming.join(history, "fp", "left_anti")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() == 400


def test_exact_even_when_undersized(spark):
    """A badly undersized filter (high fpr) degrades pruning, never
    correctness: everything falls through to the exact stage."""
    history, incoming = _frames(spark)
    got = bloom_anti_join(incoming, history, "fp", num_bits=64, num_hashes=2)
    assert got.count() == 400


def test_pruning_actually_drops_rows(spark):
    """On a disjoint incoming set, the map-side probe should eliminate
    (almost) everything before the exact join: fpr at this sizing
    (m/n ~ 27 bits/key, k=5) is well under 1%."""
    history, _ = _frames(spark)
    novel = spark.range(5000, 9000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("fp")
    )
    flt = build_bloom(history, "fp", NB, NH)
    maybe = (
        novel.join(F.broadcast(flt))
        .filter(might_contain(F.col("fp"), NB, NH))
        .count()
    )
    assert maybe <= 40  # <=1% of 4000 at a ~0.03% theoretical fpr


def test_sizing_helpers():
    m = optimal_num_bits(1_000_000, 0.01)
    assert m % 64 == 0
    assert 9_000_000 < m < 10_000_000  # ~9.59 bits/key at 1%
    assert optimal_num_hashes(m, 1_000_000) == 7
    # the documented 100 TB cutover: 1e9 keys at 1% ~ 1.2 GB
    assert 1.1e9 < optimal_num_bits(10**9, 0.01) / 8 < 1.3e9


def test_build_is_deterministic(spark):
    history, _ = _frames(spark)
    a = build_bloom(history, "fp", NB, NH).collect()[0][0]
    b = build_bloom(history.repartition(7), "fp", NB, NH).collect()[0][0]
    assert a == b


# -- property: pruned joins equal plain joins on arbitrary inputs --------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

keys_st = st.lists(
    st.integers(min_value=0, max_value=30), min_size=0, max_size=25
)
bits_st = st.sampled_from([64, 128, 1024])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(hist_keys=keys_st, inc_keys=keys_st, num_bits=bits_st)
def test_pruned_joins_match_plain_on_random_inputs(
    spark, hist_keys, inc_keys, num_bits
):
    """For ANY key multisets and ANY filter sizing (including absurdly
    undersized → near-100% fpr), semi and anti results are exactly the
    plain joins' and partition the incoming rows."""
    history = spark.createDataFrame(
        [(f"k{k}",) for k in hist_keys] or [("__never__",)], "fp string"
    )
    incoming = spark.createDataFrame(
        [(f"k{k}", i) for i, k in enumerate(inc_keys)] or [("__none__", 0)],
        "fp string, payload long",
    )
    semi = bloom_semi_join(incoming, history, "fp", num_bits, 3)
    anti = bloom_anti_join(incoming, history, "fp", num_bits, 3)
    want_semi = incoming.join(history, "fp", "left_semi")
    assert semi.exceptAll(want_semi).count() == 0
    assert want_semi.exceptAll(semi).count() == 0
    assert semi.count() + anti.count() == incoming.count()
