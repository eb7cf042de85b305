"""Mergeable quantile sketches: fixed-domain binned histograms.

Exact interpolated quantiles (``percentile`` / ``quantile_cont``) need
the group's values sorted — fine per-group at test scale, but at 100 TB
a global or hot-group percentile is a sort-shaped shuffle of the value
column. The standard engine answer is a mergeable summary (t-digest,
KLL); those are *randomized* or merge-order-dependent, which would break
this repo's determinism contract. The deterministic member of the
family is the fixed-domain equi-width histogram (the classic
"equi-width histogram" of Piatetsky-Shapiro & Connell 1984, and what
`approx_count_distinct`-era warehouses shipped as ANALYZE histograms):

1. **pass 1** — global ``min``/``max`` of the value column (one row);
2. **pass 2** — per (group, bin) counts over
   ``bin = clamp(floor((v - min) / width), 0, bins-1)`` — a map-side
   combinable aggregate whose state is ≤ ``bins`` counters per group;
3. quantiles read off the cumulative histogram: the p-quantile estimate
   is the midpoint of the first bin whose cumulative count reaches
   ``ceil(p · n)``, so the error is ≤ ``width / 2`` by construction.

Everything is closed-form double arithmetic on exact integers and two
literals, so a DuckDB oracle reproduces every estimate bit-for-bit —
and histograms over the SAME fixed domain merge by adding bin counts
(union-of-parts == histogram-of-union; property-tested), which is what
makes the summary incremental: per-partition/per-day histograms roll up
without re-reading data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def binned_histogram(
    df: DataFrame,
    value_col: str,
    num_bins: int,
    group_cols: list[str] | None = None,
    domain: tuple[float, float] | None = None,
) -> DataFrame:
    """Per-group equi-width histogram of ``value_col`` over a GLOBAL
    [min, max] domain (global so group histograms share bin edges and
    merge). By default the domain is the data's own min/max (pass 1);
    pass ``domain`` explicitly to pin it — required when histograms
    from *different* batches must merge, since bin edges only line up
    under a shared domain (values outside a pinned domain clamp into
    the edge bins). Returns ``group_cols + (bin BIGINT, cnt BIGINT,
    dom_min DOUBLE, dom_max DOUBLE)``; nulls are excluded."""
    groups = group_cols or []
    vals = df.filter(F.col(value_col).isNotNull())
    if domain is not None:
        dom = F.broadcast(
            vals.sparkSession.createDataFrame(
                [(float(domain[0]), float(domain[1]))], "dom_min double, dom_max double"
            )
        )
    else:
        dom = F.broadcast(
            vals.agg(
                F.min(F.col(value_col).cast("double")).alias("dom_min"),
                F.max(F.col(value_col).cast("double")).alias("dom_max"),
            )
        )
    v = F.col(value_col).cast("double")
    width = (F.col("dom_max") - F.col("dom_min")) / F.lit(float(num_bins))
    bin_ = F.when(F.col("dom_max") == F.col("dom_min"), F.lit(0).cast("long")).otherwise(
        F.greatest(
            F.lit(0).cast("long"),
            F.least(
                F.floor((v - F.col("dom_min")) / width),
                F.lit(num_bins - 1).cast("long"),
            ),
        )
    )
    return (
        vals.crossJoin(dom)
        .groupBy(*groups, bin_.alias("bin"), "dom_min", "dom_max")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(*groups, "bin", "cnt", "dom_min", "dom_max")
    )


class HistogramStore:
    """Persisted per-group binned histograms maintained incrementally —
    the quantile twin of ``operators.sketches.KmvSketchStore``.

    The domain is pinned at construction (bin edges must agree across
    batches for counts to add), each ``update`` histograms the batch
    and merges by summing per-(group, bin) counts, and ``quantiles``
    reads estimates off the stored cumulative counts. Update cost is
    O(batch + groups×bins) regardless of absorbed history; the store
    never re-reads data. Use from a streaming ``foreachBatch`` or a
    scheduled batch job.

    Exactness of the merge (not just approximation) is testable: a
    store built from ANY batch split holds bin counts equal to the
    one-shot histogram of the full data.
    """

    def __init__(
        self,
        spark,
        path: str,
        group_cols: list[str],
        value_col: str,
        domain: tuple[float, float],
        num_bins: int = 1024,
    ) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.domain = (float(domain[0]), float(domain[1]))
        self.num_bins = num_bins

    def _read(self) -> DataFrame | None:
        from pyspark.errors.exceptions.captured import AnalysisException

        try:
            return self.spark.read.parquet(self.path)
        except AnalysisException:
            return None

    def update(self, batch: DataFrame) -> None:
        """Histogram the batch and count-merge it into the store."""
        fresh = binned_histogram(
            batch, self.value_col, self.num_bins, self.group_cols, self.domain
        ).select(*self.group_cols, "bin", "cnt")
        stored = self._read()
        merged = (
            fresh
            if stored is None
            else stored.unionByName(fresh)
            .groupBy(*self.group_cols, "bin")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        # localCheckpoint, not persist: the write overwrites its own
        # input path (see KmvSketchStore.update for the rationale)
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(self.path)

    def histogram(self) -> DataFrame:
        """The stored per-(group, bin) counts with domain columns
        attached — same schema :func:`binned_histogram` emits."""
        stored = self._read()
        if stored is None:
            # empty-store schema must still carry the group columns so
            # quantiles() resolves; types default to string (no rows
            # exist to constrain them)
            groups = "".join(f"{c} string, " for c in self.group_cols)
            return self.spark.createDataFrame(
                [], f"{groups}bin long, cnt long, dom_min double, dom_max double"
            )
        return stored.withColumns(
            {
                "dom_min": F.lit(self.domain[0]),
                "dom_max": F.lit(self.domain[1]),
            }
        )

    def quantiles(self, probs: list[float]) -> DataFrame:
        """Per-group quantile estimates from the stored histogram —
        same contract as :func:`binned_quantiles`."""
        return _quantiles_from_histogram(
            self.histogram(), probs, self.num_bins, self.group_cols
        )


def binned_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    num_bins: int = 1024,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group quantile estimates from the binned histogram: for each
    ``p`` the midpoint of the first bin whose cumulative count reaches
    ``ceil(p · n)`` — deterministic, error ≤ (max−min)/(2·num_bins).

    Returns ``group_cols + (prob DOUBLE, q_est DOUBLE)``.
    """
    groups = group_cols or []
    hist = binned_histogram(df, value_col, num_bins, groups)
    return _quantiles_from_histogram(hist, probs, num_bins, groups)


def _quantiles_from_histogram(
    hist: DataFrame, probs: list[float], num_bins: int, groups: list[str]
) -> DataFrame:
    w_cum = (
        Window.partitionBy(*groups)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*groups)
    cum = hist.select(
        *groups,
        "bin",
        "dom_min",
        "dom_max",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    probs_df = F.explode(
        F.array(*[F.lit(float(p)) for p in probs])
    ).alias("prob")
    width = (F.col("dom_max") - F.col("dom_min")) / F.lit(float(num_bins))
    est = F.col("dom_min") + (F.col("bin").cast("double") + 0.5) * width
    return (
        cum.select(*groups, "bin", "dom_min", "dom_max", "cum", "n", probs_df)
        .filter(F.col("cum") >= F.ceil(F.col("prob") * F.col("n")))
        .groupBy(*groups, "prob")
        .agg(
            F.min("bin").alias("bin"),
            F.first("dom_min").alias("dom_min"),
            F.first("dom_max").alias("dom_max"),
        )
        .select(
            *groups,
            "prob",
            F.round(
                F.when(F.col("dom_max") == F.col("dom_min"), F.col("dom_min")).otherwise(
                    est
                ),
                6,
            ).alias("q_est"),
        )
    )
