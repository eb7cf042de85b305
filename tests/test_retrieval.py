"""Hybrid retrieval (`operators/retrieval.py`): BM25 ordering sanity and
RRF fusion mechanics (the catalog oracle pins exact values)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_stream_spark.operators import retrieval as rtr

DOCS = [
    (0, "spark engine shuffles data across the cluster"),
    (1, "the spark engine shuffles data"),
    (2, "cats sit on warm mats all day long"),
    (3, "a cluster of cats"),
    (4, "data data data"),
]


def test_bm25_prefers_term_overlap(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = rtr.bm25_topk(docs, docs.filter(F.col("doc_id") == 0), k=4)
    rows = sorted(
        ((r["bm25_rank"], r["doc_id"]) for r in out.collect())
    )
    # doc 1 shares 4 informative terms with doc 0 → rank 1; the cat doc
    # shares nothing and must be absent entirely (term-join candidates only)
    assert rows[0] == (1, 1)
    assert all(d != 2 for _r, d in rows)
    # self-match excluded
    assert all(d != 0 for _r, d in rows)


def test_rrf_fusion_combines_and_breaks_ties(spark):
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id long, doc_id long, r1 long"
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 12, 2)], "query_id long, doc_id long, r2 long"
    )
    out = {r["doc_id"]: r for r in rtr.rrf_fuse([a, b], ["r1", "r2"], k=3).collect()}
    # doc 11 appears in both lists → highest fused score
    assert out[11]["fused_rank"] == 1
    assert out[11]["r1"] == 2 and out[11]["r2"] == 1
    # 10 (rank 1 in a) vs 12 (rank 2 in b): 1/61 > 1/62 → 10 before 12
    assert out[10]["fused_rank"] == 2 and out[12]["fused_rank"] == 3
    # single-list docs carry NULL for the other rank
    assert out[10]["r2"] is None and out[12]["r1"] is None
