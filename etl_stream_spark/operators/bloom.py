"""Bloom-filter membership pruning for incremental dedup at corpus scale.

The incremental question — "which documents in this NEW shard were seen
in ANY earlier shard" — is a join of each incoming batch against a
fingerprint history with billions of rows. The engine already has the
bucket-pruned exact path (``operators/incremental_dedup.py``); this
module adds the complementary sketch path: summarize the HISTORY once
into a fixed-size bit array, ship the array (kilobytes to a few hundred
MB — independent of the history's row width) to every executor as a
one-row broadcast, and test each incoming row map-side with ``k`` hash
probes. The filter is one-sided by construction: "definitely absent"
rows — the vast majority in an append-mostly corpus — never enter a
shuffle at all; "maybe present" rows (true duplicates plus an
``fpr``-bounded sliver of novel rows) continue to the EXACT join, so
the final answer is exact regardless of the false-positive rate and the
sketch is invisible in the results — which is what makes the whole
family oracle-checkable against the plain join.

Scale posture (100 TB): the bit array costs ``m ≈ -n·ln(p)/ln(2)²``
bits for ``n`` distinct fingerprints at false-positive rate ``p`` —
~1.2 GB per 10⁹ fingerprints at 1%. Up to O(10⁸–10⁹) history keys the
broadcast beats shuffling the incoming shard; beyond that the array
outgrows a sane broadcast and the bucket-pruned exact store is the
right tool. ``optimal_num_bits`` exposes the math so callers can make
that call explicitly instead of discovering it as an OOM.

Everything here is JVM-side: build is explode(k positions) → bit_or
per 64-bit word (map-side combinable, the exchange carries ≤ m/64
rows); probe is ``element_at`` + bitmask on the broadcast array. The
single ``collect()`` gathers at most ``num_bits/64`` (word, bits) rows
— bounded by the configured filter size, not by the data.

The reference has no sketch layer — its dedup is the server-side MERGE
(etl-snowflake-py/etl_snowflake/task.py:154-190); this is extension
surface for the training-data pipeline.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

WORDS_COL = "bloom_words"


def _shiftleft(value: Column, bits: Column) -> Column:
    # F.shiftleft only takes a literal int shift; call the SQL function
    # directly to shift by a column.
    return F.call_function("shiftleft", value, bits)


def optimal_num_bits(n_items: int, fpr: float) -> int:
    """Bits for ``n_items`` distinct keys at false-positive rate ``fpr``.

    Rounded up to a multiple of 64 so the word array is exact.
    """
    if not 0.0 < fpr < 1.0:
        raise ValueError(f"fpr must be in (0, 1), got {fpr}")
    m = -n_items * math.log(fpr) / (math.log(2) ** 2)
    return max(64, int(math.ceil(m / 64.0)) * 64)


def optimal_num_hashes(num_bits: int, n_items: int) -> int:
    """Probe count minimizing fpr for the given sizing: (m/n)·ln 2."""
    return max(1, round(num_bits / max(1, n_items) * math.log(2)))


def _positions(col: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k independent bit positions for a key.

    xxhash64 with a distinct literal seed column per probe; engine
    portability is NOT required here — the sketch only prunes, it never
    reaches a result or an oracle comparison.
    """
    return [
        F.pmod(F.xxhash64(col.cast("string"), F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def build_bloom(
    df: DataFrame,
    col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Distributed build: one-row DataFrame holding the dense word array.

    explode(k positions) → (word, mask) → bit_or per word. The bit_or
    aggregate map-side combines, so the exchange carries at most
    ``num_bits/64`` rows no matter how large ``df`` is; the collect()
    below is bounded by the same constant (the configured filter size).
    """
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    pos = F.explode(F.array(*_positions(F.col(col), num_bits, num_hashes)))
    words = (
        df.select(pos.alias("_pos"))
        .select(
            (F.col("_pos") / 64).cast("bigint").alias("_word"),
            _shiftleft(
                F.lit(1).cast("bigint"), F.pmod("_pos", F.lit(64)).cast("int")
            ).alias("_mask"),
        )
        .groupBy("_word")
        .agg(F.bit_or("_mask").alias("_bits"))
        .collect()  # bounded: <= num_bits/64 rows by construction
    )
    dense = [0] * (num_bits // 64)
    for r in words:
        dense[r["_word"]] = r["_bits"]
    spark = SparkSession.getActiveSession() or df.sparkSession
    schema = StructType([StructField(WORDS_COL, ArrayType(LongType(), False), False)])
    return spark.createDataFrame([(dense,)], schema)


def might_contain(
    col: Column, num_bits: int, num_hashes: int, words_col: str = WORDS_COL
) -> Column:
    """Map-side probe: AND over k (word & mask) tests against the array.

    Use after cross-joining the one-row ``build_bloom`` frame in (a
    bounded broadcast — the frame is a local relation of exactly one
    array row, never a scan of data tables).
    """
    test = F.lit(True)
    for p in _positions(col, num_bits, num_hashes):
        word = F.element_at(F.col(words_col), (p / 64).cast("int") + 1)
        mask = _shiftleft(F.lit(1).cast("bigint"), F.pmod(p, F.lit(64)).cast("int"))
        test = test & (word.bitwiseAND(mask) != 0)
    return test


def bloom_semi_join(
    incoming: DataFrame,
    history: DataFrame,
    on: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Exact ``incoming SEMI JOIN history ON on``, bloom-pruned.

    Single pass over ``incoming``: the map-side probe drops every
    definitely-absent row before the exchange, so the semi join
    shuffles only true duplicates plus the fpr sliver. Result is
    row-for-row the plain semi join (the oracle form).
    """
    flt = build_bloom(history.select(on), on, num_bits, num_hashes)
    maybe = (
        incoming.join(F.broadcast(flt))  # 1-row local relation, always bounded
        .filter(might_contain(F.col(on), num_bits, num_hashes))
        .drop(WORDS_COL)
    )
    # no .distinct() on history: semi join semantics already dedup, and
    # the distinct would add a full history-wide exchange
    return maybe.join(history.select(on), on, "left_semi")


def bloom_anti_join(
    incoming: DataFrame,
    history: DataFrame,
    on: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Exact ``incoming ANTI JOIN history ON on``, bloom-pruned.

    Two branches over the same scan: definitely-absent rows are novel
    by the filter's one-sided guarantee and bypass the join entirely;
    only maybe-rows reach the exact anti join. Both branches are
    map-side pipelined reads of the same files (no cache needed — the
    scan is cheap relative to the shuffle the definite branch skips).
    """
    flt = build_bloom(history.select(on), on, num_bits, num_hashes)
    tagged = incoming.join(F.broadcast(flt)).withColumn(
        "_maybe", might_contain(F.col(on), num_bits, num_hashes)
    )
    definite = tagged.filter(~F.col("_maybe")).drop("_maybe", WORDS_COL)
    survivors = (
        tagged.filter(F.col("_maybe"))
        .drop("_maybe", WORDS_COL)
        .join(history.select(on), on, "left_anti")
    )
    return definite.unionByName(survivors)
