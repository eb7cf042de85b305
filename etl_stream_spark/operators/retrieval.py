"""Hybrid retrieval: BM25 lexical scoring + vector ranking, RRF-fused.

The serving-side counterpart of the corpus-prep stack: given query
documents, rank corpus documents by Okapi BM25 over the token tables,
by embedding cosine (the existing kNN path), and fuse the two lists
with reciprocal-rank fusion (RRF, Cormack et al. SIGIR'09:
``score(d) = Σ_lists 1/(C + rank_list(d))``).

Scale shape: the corpus-side postings/term tables are built once with
map-side-combinable aggregations; the query side is bounded and
broadcast; candidate generation is an equi-join on the term, so only
documents sharing a query term are ever scored (no corpus cross join).

Determinism contract (repo rules): BM25 term contributions are
quantized to DECIMAL(28,8) before the per-document sum (float sums are
partition-order dependent; decimal sums are exact), the final score is
one terminal ROUND→DOUBLE, and every rank carries an id tie-break. RRF
adds exactly two coalesced terms in a fixed expression order — no float
aggregation anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_stream_spark.operators.text_analysis import tokens

K1 = 1.2
B = 0.75
RRF_C = 60


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k corpus documents per query document by Okapi BM25.

    ``queries`` must be bounded (its distinct terms are broadcast into
    the postings join). Self-matches are excluded. Returns
    (query_id, doc_id, bm25_score, bm25_rank).
    """
    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("t"))
    tf = toks.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    # exact-integer corpus stats (no float aggregation — the repo's
    # determinism rule): the average length enters the formula as
    # dl * n_docs / sum_dl, evaluated per-row in doubles
    stats = F.broadcast(
        dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").cast("long").alias("sum_dl"),
        )
    )
    qterms = (
        queries.select(
            F.col(id_col).alias("query_id"), F.explode(tokens(text_col)).alias("t")
        )
        .distinct()
    )
    # Document frequency is only needed for terms that appear in some
    # query, so semi-join the postings to the bounded query-term set
    # BEFORE aggregating: at 100 TB the full vocabulary is 10^8-10^9
    # terms (unbroadcastable), while the surviving dfreq is bounded by
    # |query terms| — broadcastable by construction. df values are
    # unchanged (each surviving term still counts every corpus posting).
    dfreq = (
        tf.join(F.broadcast(qterms.select("t").distinct()), "t", "left_semi")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
    )

    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    rel_len = F.col("dl").cast("double") * F.col("n_docs") / F.col("sum_dl")
    tf_norm = (F.col("tf") * (K1 + 1)) / (
        F.col("tf") + K1 * (1 - B + B * rel_len)
    )
    contrib = (
        F.broadcast(qterms)
        .join(tf, "t")
        .filter(F.col(id_col) != F.col("query_id"))
        .join(dl, id_col)
        .join(F.broadcast(dfreq), "t")
        .join(stats)
        .select(
            "query_id",
            id_col,
            F.round(idf * tf_norm, 8).cast("decimal(28,8)").alias("_c"),
        )
    )
    scored = contrib.groupBy("query_id", id_col).agg(
        F.round(F.sum("_c").cast("decimal(38,8)"), 6).cast("double").alias("bm25_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25_score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("bm25_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("bm25_rank") <= k)
        .select("query_id", id_col, "bm25_score", "bm25_rank")
    )


def rrf_fuse(
    lists: list[DataFrame],
    rank_cols: list[str],
    k: int = 5,
    id_cols: tuple[str, str] = ("query_id", "doc_id"),
    c: int = RRF_C,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked lists keyed by (query, doc).

    Each input holds ``id_cols + [rank_col]``; absent entries simply
    contribute nothing. Returns the fused top-k with the per-list ranks
    riding along (NULL where a list missed the document).
    """
    if not lists:
        raise ValueError("rrf_fuse requires at least one ranked list")
    if len(lists) != len(rank_cols):
        raise ValueError(
            f"rrf_fuse: {len(lists)} lists but {len(rank_cols)} rank_cols — "
            "a silent zip-truncation would drop whole lists from the fusion"
        )
    qc, dc = id_cols
    fused = None
    for df, rc in zip(lists, rank_cols):
        part = df.select(qc, dc, rc)
        fused = (
            part
            if fused is None
            else fused.join(part, [qc, dc], "full_outer")
        )
    score = None
    for rc in rank_cols:
        term = F.coalesce(1.0 / (c + F.col(rc)), F.lit(0.0))
        score = term if score is None else score + term
    w = Window.partitionBy(qc).orderBy(F.desc("rrf_score"), F.col(dc))
    return (
        fused.withColumn("rrf_score", F.round(score, 6))
        .withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("fused_rank") <= k)
        .select(qc, dc, "rrf_score", *rank_cols, "fused_rank")
    )
