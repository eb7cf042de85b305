"""Streaming row-pattern matching: per-key CEP state over a stream.

The streaming form of ``operators/cep.py``: a continuously-ingesting
pipeline wants per-entity pattern matches maintained as events arrive,
not recomputed from history. Each key holds its ordered
(order, symbol) buffer in keyed state; every micro-batch merges the
key's new events into the buffer (sorted by (order, symbol) — the
batch form's exact tie-break) and re-counts the compiled patterns,
emitting one row per touched key with the running match counts.

Out-of-order arrival is therefore free WITHIN the buffer: a late event
slots into its ordered position and the counts repair themselves on
the next emission — semantics a forward-only NFA cannot offer without
retraction. The cost is the batch contract carried over: state per key
is its event count (MATCH_RECOGNIZE's partition-fits assumption);
segment unbounded keys by session/window first.

Python ``re`` counts (non-overlapping, leftmost, greedy) match the
JVM ``regexp_count`` and DuckDB ``regexp_extract_all`` semantics the
batch twin and its oracle use — the availableNow snapshot is
hash-identical to the batch operator on the same log.
"""

from __future__ import annotations

import re
from collections.abc import Mapping
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.cep import symbol_expr

_STATE_SCHEMA = "orders array<long>, syms array<string>, n long"


def pattern_matches(
    stream: DataFrame,
    key_col: str,
    order_col: str,
    event_col: str,
    symbol_map: Mapping[str, str],
    patterns: Mapping[str, str],
    other: str = "o",
    max_buffer: int | None = None,
    suppressed_keys: frozenset | None = None,
) -> DataFrame:
    """Per-key running pattern-match counts over a stream.

    Emits ``(key, <name>_matches..., events_seen)`` for every key a
    micro-batch touched; ``events_seen`` strictly increases per
    emission, so downstream keeps the latest row per key (the same
    snapshot-generation convention as ``trending_items``).

    ``max_buffer`` bounds per-key state for keys that never stop: only
    the HIGHEST-order ``max_buffer`` (order, symbol) pairs are
    retained, so counts become "matches within the trailing
    max_buffer events" and a late event older than the retained window
    is dropped rather than repaired — the explicit trade a bounded-
    state CEP makes (Flink CEP's ``within`` clause is the same trade
    in time units). Size it ≥ the longest pattern span you care
    about. Default None keeps everything: exact counts, state = the
    key's event count (the MATCH_RECOGNIZE partition-fits contract).

    ``suppressed_keys`` is the right-to-be-forgotten hook (pass the
    current ``cdc.erasure.ErasureList`` keys at query (re)start): a
    suppressed key's arriving events are not buffered, its EXISTING
    state is removed the first time the key fires, and it never emits
    again. Residual contract (pinned in ``tests/test_erasure.py``):
    state of a suppressed key that never appears again lives in the
    checkpoint until rollover — full erasure is suppression + a
    checkpoint rotation, or one replayed event per forgotten key to
    trigger the in-operator purge."""
    key_dt = stream.schema[key_col].dataType.simpleString()
    names = list(patterns)
    out_schema = ", ".join(
        [f"{key_col} {key_dt}"]
        + [f"{n}_matches long" for n in names]
        + ["events_seen long"]
    )
    compiled = {n: re.compile(p) for n, p in patterns.items()}
    # NULL order values are dropped here, explicitly: such a row has no
    # position in the sequence, and letting it reach the stateful
    # function would poison the micro-batch (and every replay of it).
    # Malformed input belongs in the DLQ decode path, not this buffer.
    keyed = stream.select(
        F.col(key_col),
        F.col(order_col).cast("long").alias("_ord"),
        symbol_expr(event_col, symbol_map, other).alias("_sym"),
    ).filter(F.col("_ord").isNotNull())

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if suppressed_keys is not None and key[0] in suppressed_keys:
            # erasure purge: drop the buffered history AND the incoming
            # events; emit nothing so the key leaves no fresh output
            for _ in pdfs:
                pass
            if state.exists:
                state.remove()
            return
        if state.exists:
            orders, syms, seen = state.get
            orders, syms = list(orders), list(syms)
        else:
            orders, syms, seen = [], [], 0
        for pdf in pdfs:
            seen += len(pdf)
            orders.extend(int(x) for x in pdf["_ord"])
            syms.extend(pdf["_sym"])
        pairs = sorted(zip(orders, syms))
        if max_buffer is not None and len(pairs) > max_buffer:
            pairs = pairs[-max_buffer:]
        orders = [p[0] for p in pairs]
        syms = [p[1] for p in pairs]
        state.update((orders, syms, int(seen)))
        s = "".join(syms)
        row = {key_col: [key[0]]}
        for n in names:
            row[f"{n}_matches"] = [len(compiled[n].findall(s))]
        # cumulative, never the (possibly capped) buffer length —
        # strictly increasing so latest-per-key selection stays sound
        row["events_seen"] = [int(seen)]
        yield pd.DataFrame(row)

    return keyed.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
