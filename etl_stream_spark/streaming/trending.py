"""Streaming trending items: sharded Misra-Gries state over a stream.

The streaming form of :func:`~etl_stream_spark.operators.frequency.
heavy_hitters`: a continuously-ingesting pipeline wants "what is hot
RIGHT NOW" without re-scanning history, which is exactly a persistent
frequency summary updated per micro-batch.

State layout: items are hash-assigned to a fixed number of SHARDS and
each shard key holds one Misra-Gries summary (``capacity`` counters) in
keyed state — so state size is ``shards × capacity`` counters total,
independent of both stream length and key cardinality, and every item's
full count lands in exactly one shard. An item whose running count
exceeds ``n_shard / (capacity + 1)`` is guaranteed present in its
shard's summary (the weighted-MG bound, property-tested in
``tests/test_frequency.py``); with balanced shards that is
``≈ n / (shards × (capacity + 1))`` of the whole stream.

Each micro-batch appends the updated summaries of the shards it
touched (≤ ``capacity`` rows per shard, with conservative
lower-bound counts); downstream consumers keep the latest snapshot per
shard. The shard hash is the repo's engine-portable md5-prefix integer,
so a batch oracle can reproduce shard assignment exactly.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.frequency import _mg_update
from ..operators.sketches import kmv_hash

TRENDING_OUTPUT_SCHEMA = "shard long, item string, est long, shard_rows long"
_TRENDING_STATE_SCHEMA = "items array<string>, counts array<long>, n long"


def trending_items(
    stream: DataFrame,
    item_col: str,
    capacity: int = 256,
    num_shards: int = 8,
    suppressed_items: frozenset | None = None,
) -> DataFrame:
    """Per-micro-batch trending summaries over ``stream[item_col]``.

    Emits ``(shard, item, est, shard_rows)`` rows for every shard the
    batch touched: ``est`` is the MG lower-bound count (= exact while a
    shard tracks ≤ ``capacity`` distinct items), ``shard_rows`` the
    shard's total rows absorbed so far.

    ``suppressed_items`` is the right-to-be-forgotten hook: suppressed
    items are neither counted from new batches nor RETAINED — any
    counter a shard already holds for one is dropped the next time the
    shard updates (shards update constantly, so retained counters decay
    out quickly; the formal completion point is still checkpoint
    rollover, same contract as ``streaming/cep.pattern_matches``).
    """
    items = stream.select(F.col(item_col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    keyed = items.withColumn("shard", F.pmod(kmv_hash("item"), F.lit(num_shards)))

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            s_items, s_counts, n = state.get
            counters = dict(zip(s_items, s_counts))
        else:
            counters, n = {}, 0
        if suppressed_items:
            # erasure purge: retained counters for forgotten items drop
            # on the shard's next update (n keeps its historical total —
            # the MG error bound must not shrink retroactively)
            for doomed in suppressed_items.intersection(counters):
                del counters[doomed]
        for pdf in pdfs:
            if suppressed_items:
                pdf = pdf[~pdf["item"].isin(suppressed_items)]
            n += len(pdf)
            for item, w in pdf["item"].value_counts().items():
                _mg_update(counters, item, capacity, int(w))
        state.update(
            (list(counters.keys()), [int(c) for c in counters.values()], int(n))
        )
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(counters),
                "item": list(counters.keys()),
                "est": [int(c) for c in counters.values()],
                "shard_rows": [int(n)] * len(counters),
            }
        )

    return keyed.groupBy("shard").applyInPandasWithState(
        fn,
        outputStructType=TRENDING_OUTPUT_SCHEMA,
        stateStructType=_TRENDING_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
