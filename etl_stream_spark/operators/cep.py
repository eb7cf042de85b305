"""Sequential pattern matching over per-key event sequences (CEP).

The MATCH_RECOGNIZE / Flink-CEP capability reduced to its classical
equivalent: a regular-expression match over each key's ordered symbol
string. Engines compile row-pattern clauses to an NFA driven over the
ordered rows; for a bounded per-key sequence the regex engine IS that
NFA, and Spark runs it JVM-side inside whole-stage codegen — no Python,
no per-row state machine, no window shuffle beyond the one groupBy.

Scale shape: ONE shuffle of (key, order, one-char symbol) triples —
the exchange carries three scalars per event, the per-key sort happens
in-row on the collected array (``array_sort`` over structs, not a
window), and the regex runs once per key. Per-key sequence length must
be bounded (per-entity event counts are, in practice; segment an
unbounded key by time window first — ``sessionize`` — exactly as
MATCH_RECOGNIZE's PARTITION BY ... ORDER BY contract assumes the
partition fits).

No reference analog (the reference pipes events, never analyzes them);
the pattern-to-regex reduction is textbook (row-pattern matching in
SQL:2016, Flink CEP's NFA compilation).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEQ_COL = "symbol_seq"


def symbol_expr(
    event_col: str | Column, symbol_map: Mapping[str, str], other: str = "o"
) -> Column:
    """One-character symbol per event (unmapped types → ``other``).
    Every symbol must be exactly one char — the regex positions are
    event positions, which multi-char symbols would break."""
    for sym in list(symbol_map.values()) + [other]:
        if len(sym) != 1:
            raise ValueError(f"symbols must be single characters, got {sym!r}")
    col = F.col(event_col) if isinstance(event_col, str) else event_col
    expr = F.lit(other)
    for event_type, sym in sorted(symbol_map.items(), reverse=True):
        expr = F.when(col == event_type, sym).otherwise(expr)
    return expr


def symbol_sequences(
    events: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    event_col: str,
    symbol_map: Mapping[str, str],
    other: str = "o",
) -> DataFrame:
    """One row per key with its ordered symbol string (``symbol_seq``).

    The order columns ride inside the collected struct and
    ``array_sort`` orders lexicographically by field position, so the
    caller's ``order_cols`` must sort correctly as struct fields (ints,
    timestamps, zero-padded strings all do). Ties are broken by the
    symbol itself — deterministic for any input."""
    sym = symbol_expr(event_col, symbol_map, other).alias("_sym")
    packed = F.struct(*[F.col(c) for c in order_cols], sym)
    return (
        events.groupBy(*key_cols)
        .agg(F.array_sort(F.collect_list(packed)).alias("_seq"))
        .select(
            *key_cols,
            F.concat_ws(
                "", F.transform(F.col("_seq"), lambda s: s["_sym"])
            ).alias(SEQ_COL),
        )
    )


def match_pattern(
    events: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    event_col: str,
    symbol_map: Mapping[str, str],
    patterns: Mapping[str, str],
    other: str = "o",
) -> DataFrame:
    """Per-key row-pattern matches: for each named pattern (a regex
    over the symbol alphabet), the number of non-overlapping matches in
    the key's ordered sequence (``<name>_matches``, BIGINT). A key
    appears once, with zero counts where nothing matched."""
    seqs = symbol_sequences(
        events, key_cols, order_cols, event_col, symbol_map, other
    )
    out = seqs
    for name, regex in patterns.items():
        out = out.withColumn(
            f"{name}_matches",
            F.regexp_count(F.col(SEQ_COL), F.lit(regex)).cast("long"),
        )
    return out.drop(SEQ_COL)
