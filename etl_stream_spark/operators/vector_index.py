"""Persisted IVF index: build once, partition-pruned search many times.

:func:`~etl_stream_spark.operators.similarity.ivf_topk` and
``ivf_trained_topk`` train/probe per call — right for a one-shot query,
wasteful for the production pattern where one corpus serves many query
batches. ``IvfIndex`` persists the index the way a 100 TB deployment
would:

* ``centroids.parquet`` — k × dims rows (driver-bounded metadata);
* ``corpus/`` — the quantized vectors written **partitioned by cell**
  (``_cell=NN`` directories), so a search that probes ``nprobe`` of
  ``nlist`` cells reads only those directories: partition pruning at
  the *file listing* level, before any IO. Work per search batch is
  ``nprobe/nlist`` of the corpus, and re-building is the only full
  scan.

Determinism carries over from the similarity module: integer-quantized
vectors, exact integer-L2 training, cosine as one double division.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_stream_spark.operators.similarity import (
    QUANT_SCALE,
    _assign_to,
    cosine_from_quantized,
    int_dot,
    int_norm_sq,
    kmeans_train,
    quantize,
)

CELL_COL = "_cell"


class IvfIndex:
    """Disk-backed IVF index over an ``array<float>`` embedding column."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        nlist: int = 8,
        scale: int = QUANT_SCALE,
    ) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.nlist = nlist
        self.scale = scale

    @property
    def _cent_path(self) -> str:
        return os.path.join(self.path, "centroids.parquet")

    @property
    def _corpus_path(self) -> str:
        return os.path.join(self.path, "corpus")

    def build(
        self,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        rounds: int = 2,
    ) -> None:
        """Train the coarse quantizer and write the cell-partitioned
        corpus — the only full corpus scan in the index lifecycle."""
        assigned, cents_py = kmeans_train(
            corpus, k=self.nlist, rounds=rounds, id_col=id_col, vec_col=vec_col,
            scale=self.scale,
        )
        cents = self.spark.createDataFrame(
            cents_py, "cluster_id long, _cent array<long>"
        )
        cents.coalesce(1).write.mode("overwrite").parquet(self._cent_path)
        vecs = corpus.select(F.col(id_col), quantize(vec_col, self.scale).alias("_v"))
        (
            vecs.join(assigned.select(id_col, "cluster_id"), id_col)
            .withColumnRenamed("cluster_id", CELL_COL)
            .write.mode("overwrite")
            .partitionBy(CELL_COL)
            .parquet(self._corpus_path)
        )

    def exists(self) -> bool:
        try:
            self.spark.read.parquet(self._cent_path).head(1)
            return True
        except Exception:
            return False

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Top-k per query over the probed cells only.

        The probed-cell set is collected (bounded by |queries| × nprobe
        cell ids) and becomes an ``isin`` filter on the partition
        column, so the corpus scan lists only those ``_cell=``
        directories."""
        cents = self.spark.read.parquet(self._cent_path)
        q = queries.select(
            F.col(id_col).alias("query_id"), quantize(vec_col, self.scale).alias("_qvec")
        )
        cosc = (
            int_dot(F.col("_qvec"), F.col("_cent")).cast("double")
            / F.sqrt(
                int_norm_sq(F.col("_qvec")).cast("double")
                * int_norm_sq(F.col("_cent")).cast("double")
            )
        ).alias("_cosc")
        pr = Window.partitionBy("query_id").orderBy(F.desc("_cosc"), F.col("cluster_id"))
        probed = (
            q.join(F.broadcast(cents))
            .select("query_id", "_qvec", "cluster_id", cosc)
            .withColumn("_pr", F.row_number().over(pr))
            .filter(F.col("_pr") <= nprobe)
            .select("query_id", "_qvec", F.col("cluster_id").alias(CELL_COL))
        )
        cells = [r[0] for r in probed.select(CELL_COL).distinct().collect()]
        corpus = self.spark.read.parquet(self._corpus_path).filter(
            F.col(CELL_COL).isin(cells)
        )
        cand = corpus.join(F.broadcast(probed), CELL_COL).filter(
            F.col(id_col) != F.col("query_id")
        )
        scored = cand.select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cosine_from_quantized(F.col("_qvec"), F.col("_v")).alias("cos_sim"),
        )
        rank = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(rank).cast("long"))
            .filter(F.col("rank") <= k)
        )
