"""Incremental exact dedup against a persisted fingerprint store.

The batch dedup operators (``operators/dedup.py``) answer "which
documents in THIS corpus are duplicates". A continuously-ingesting
training-data pipeline needs the incremental question: "which documents
in this NEW shard were never seen in ANY earlier shard" — without
rescanning the history each time.

Storage is the engine's own bucketed merge table keyed by the content
fingerprint, which buys the scale properties for free:

* membership lookup prunes to the buckets the batch's fingerprints hash
  into (``touched/num_buckets`` of the store read, not all of it);
* registration is the idempotent CDC MERGE — replaying a shard after a
  crash re-inserts the same fingerprints with no duplicates (the PK is
  the fingerprint);
* the store survives restarts (plain parquet/Delta path, no driver
  state).

At 100 TB the store holds one ~50-byte row per distinct document —
orders of magnitude smaller than the corpus — and lookups touch only
the hashed buckets of the incoming shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_stream_spark.cdc.envelope import OPERATION_COL, SEQUENCE_COL, make_sequence
from etl_stream_spark.cdc.merge import BUCKET_COL, ParquetMergeTable

FP_COL = "fp"


def _fingerprint(text_col: str) -> F.Column:
    from etl_stream_spark.operators.text_analysis import fingerprint

    return fingerprint(F.col(text_col))


class FingerprintStore:
    """Persisted set of document fingerprints with pruned membership."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        num_buckets: int = 64,
    ) -> None:
        self.spark = spark
        self.table = ParquetMergeTable(
            spark, path, keys=[FP_COL], num_buckets=num_buckets
        )
        self._epoch = 0

    def novel(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Rows of ``docs`` whose content was never registered before.

        Within-batch duplicates also collapse (min id per fingerprint
        survives — deterministic at any partitioning). The store read
        prunes to the buckets of the batch's fingerprints.
        """
        fp = _fingerprint(text_col).alias(FP_COL)
        batch = docs.select("*", fp)
        w_min = F.min(F.col(id_col)).over(Window.partitionBy(FP_COL))
        batch = batch.withColumn("_min_id", w_min).filter(
            F.col(id_col) == F.col("_min_id")
        ).drop("_min_id")
        if not self.table.exists():
            return batch.drop(FP_COL)
        # prune the store scan to the batch's buckets (bounded collect:
        # at most num_buckets ints)
        bucket = self.table._bucket_expr()
        touched = [
            r[0]
            for r in batch.select(bucket.alias(BUCKET_COL)).distinct().collect()
        ]
        state = self.table._read_state(buckets=touched)
        if state is None:
            # table root exists but none of the batch's buckets are
            # materialized (e.g. purge() emptied them) — all novel
            return batch.drop(FP_COL)
        return (
            batch.join(state.select(FP_COL), FP_COL, "left_anti").drop(FP_COL)
        )

    def register(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        """Record a shard's fingerprints (idempotent — re-registering a
        replayed shard changes nothing; the fingerprint is the PK)."""
        self._epoch += 1
        fp = _fingerprint(text_col).alias(FP_COL)
        rows = (
            docs.select(fp, F.col(id_col).alias("first_doc"))
            .groupBy(FP_COL)
            .agg(F.min("first_doc").alias("first_doc"))
            .select(
                FP_COL,
                "first_doc",
                F.lit("INSERT").alias(OPERATION_COL),
                F.lit(make_sequence(self._epoch, 0)).alias(SEQUENCE_COL),
            )
        )
        self.table.merge(rows)

    def purge(
        self, docs: DataFrame, text_col: str = "text"
    ) -> None:
        """Right-to-be-forgotten propagation: erase the given documents'
        content fingerprints from the store. The hash is DERIVED from
        the erased content — keeping it would both retain derived data
        and silently suppress a future legitimate re-submission of the
        same content as "already seen". Content-keyed by design: if a
        kept document shares the exact content, that fingerprint is
        removed too and the next ingest re-registers it — convergent,
        never lossy. Bucket-pruned via the merge engine's purge."""
        self.table.purge_keys(
            docs.select(_fingerprint(text_col).alias(FP_COL)).distinct()
        )

    def dedup_shard(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """novel() + register() in the ingest order a pipeline uses.

        The returned DataFrame is materialized with ``localCheckpoint``
        (lineage cut): the novelty decision must be computed against the
        PRE-registration store, and a merely-cached plan would be
        invalidated-and-recomputed when ``register`` writes the store
        path (Spark recaches by path), silently seeing its own shard."""
        out = self.novel(docs, id_col, text_col).localCheckpoint(eager=True)
        self.register(docs, id_col, text_col)
        return out
