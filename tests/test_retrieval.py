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


def _ranks(df):
    return {
        (r["query_id"], r["bm25_rank"]): (r["doc_id"], r["bm25_score"])
        for r in df.collect()
    }


def test_postings_index_parity_with_scan(spark, tmp_path):
    """A freshly-built index must rank exactly like bm25_topk's direct
    scan of the same corpus — shared scoring, shared results."""
    from etl_stream_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    queries = docs.filter(F.col("doc_id") < 3)
    idx = rtr.PostingsIndex(spark, str(tmp_path / "lex"), num_term_buckets=16)
    idx.build(docs)
    got = _ranks(idx.search(queries, k=5))
    want = _ranks(rtr.bm25_topk(docs, queries, k=5))
    assert got == want and len(got) > 0


def test_postings_index_incremental_parity(spark, tmp_path):
    """Upserts (new + changed docs) and removals must leave the index
    ranking exactly like a direct scan of the CURRENT logical corpus:
    stale postings of re-indexed docs are invalidated by the forward
    generation, removed docs by the tombstone."""
    from etl_stream_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    idx = rtr.PostingsIndex(spark, str(tmp_path / "lex"), num_term_buckets=16)
    idx.build(docs.filter("doc_id % 10 < 8"))
    idx.upsert(docs.filter("doc_id % 10 >= 8"))
    changed = docs.filter("doc_id % 7 = 0").select(
        "doc_id", F.concat("text", F.lit(" "), "text").alias("text")
    )
    idx.upsert(changed)
    idx.remove(docs.filter("doc_id % 13 = 0").select("doc_id"))

    current = (
        docs.filter("doc_id % 7 <> 0")
        .unionByName(changed)
        .filter("doc_id % 13 <> 0")
    )
    queries = docs.filter(F.col("doc_id") < 3)
    got = _ranks(idx.search(queries, k=5))
    want = _ranks(rtr.bm25_topk(current, queries, k=5))
    assert got == want and len(got) > 0
    # removed docs never surface
    assert all(d % 13 != 0 for d, _s in got.values())

    # compaction changes nothing and reclaims superseded rows
    idx.compact()
    assert _ranks(idx.search(queries, k=5)) == want
    raw = spark.read.parquet(str(tmp_path / "lex") + "/postings")
    live_docs = current.count()
    assert raw.select("doc_id").distinct().count() == live_docs


def test_postings_search_prunes_term_buckets(spark, tmp_path):
    """The postings scan must list only the buckets the query terms
    hash to — partition pruning before IO."""
    import re

    from etl_stream_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    idx = rtr.PostingsIndex(spark, str(tmp_path / "lex"), num_term_buckets=64)
    idx.build(docs)
    one = spark.createDataFrame([(999999, "spark merge")], "doc_id long, text string")
    out = idx.search(one, k=3)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*_tb#\d+\)?\s*(?:=\s*(\d+)|IN \(([\d,]+)\))", plan)
    assert m, plan[:3000]
    got = m.group(1) or m.group(2)
    assert 0 < len(got.split(",")) <= 2, got


def test_hybrid_serving_over_incremental_indexes(spark, tmp_path):
    """The full incremental serving stack: lexical PostingsIndex +
    vector IvfIndex, RRF-fused — must fuse identically to the scan-path
    hybrid (bm25_topk + brute-force kNN with exhaustive probing)."""
    from etl_stream_spark.operators.similarity import brute_force_topk
    from etl_stream_spark.operators.vector_index import IvfIndex
    from etl_stream_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    lex = rtr.PostingsIndex(spark, str(tmp_path / "lex"), num_term_buckets=16)
    lex.build(docs.filter("doc_id % 2 = 0"))
    lex.upsert(docs.filter("doc_id % 2 = 1"))
    ivf = IvfIndex(spark, str(tmp_path / "ivf"), nlist=4)
    ivf.build(emb.filter("vec_id % 2 = 0"), rounds=1)
    ivf.upsert(emb.filter("vec_id % 2 = 1"))

    qd = docs.filter(F.col("doc_id") < 3)
    qv = emb.filter(F.col("vec_id") < 3)
    bm = lex.search(qd, k=10).select("query_id", "doc_id", "bm25_rank")
    vec = ivf.search(qv, k=10, nprobe=4).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("vec_rank")
    )
    got = {
        (r["query_id"], r["fused_rank"]): r["doc_id"]
        for r in rtr.rrf_fuse([bm, vec], ["bm25_rank", "vec_rank"], k=5).collect()
    }

    bm_ref = rtr.bm25_topk(docs, qd, k=10).select("query_id", "doc_id", "bm25_rank")
    vec_ref = brute_force_topk(emb, qv, k=10).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("vec_rank")
    )
    want = {
        (r["query_id"], r["fused_rank"]): r["doc_id"]
        for r in rtr.rrf_fuse(
            [bm_ref, vec_ref], ["bm25_rank", "vec_rank"], k=5
        ).collect()
    }
    assert got == want and len(got) == 15


def test_build_over_existing_index_resets(spark, tmp_path):
    """build() on an already-populated index is a full rebuild: the old
    forward index (with its higher sequences and any tombstones) must
    not survive to veto the gen-0 rows — previously search returned
    empty and removed docs stayed dead forever."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = rtr.PostingsIndex(spark, str(tmp_path / "lex"), num_term_buckets=16)
    idx.build(docs.filter("doc_id < 4"))
    idx.upsert(docs.filter("doc_id = 4"))
    idx.remove(docs.filter("doc_id = 2").select("doc_id"))

    idx.build(docs)  # full rebuild over the populated index
    queries = docs.filter(F.col("doc_id") == 0)
    got = _ranks(idx.search(queries, k=5))
    want = _ranks(rtr.bm25_topk(docs, queries, k=5))
    assert got == want and len(got) > 0
    # the previously-removed doc is alive again after the rebuild
    fwd = idx._fwd().read()
    assert fwd.filter(F.col("doc_id") == 2).count() == 1


class TestPostingsL0:
    """Upserts append to a flat L0 log (no partitionBy committer per
    batch); a counter-gated drain folds it into the bucket layout. The
    index must rank identically at EVERY point of that lifecycle."""

    def _docs(self, spark):
        return spark.createDataFrame(DOCS, "doc_id long, text string")

    def test_search_correct_with_undrained_l0(self, spark, tmp_path):
        docs = self._docs(spark)
        idx = rtr.PostingsIndex(
            spark, str(tmp_path / "lex"), num_term_buckets=16, compact_threshold=50
        )
        idx.build(docs.filter("doc_id < 3"))
        idx.upsert(docs.filter("doc_id >= 3"))
        assert idx._l0_files()  # the upsert stayed in L0 (no drain yet)
        queries = docs.filter(F.col("doc_id") == 0)
        got = _ranks(idx.search(queries, k=5))
        want = _ranks(rtr.bm25_topk(docs, queries, k=5))
        assert got == want and len(got) > 0

    def test_drain_folds_l0_and_preserves_ranking(self, spark, tmp_path):
        docs = self._docs(spark)
        idx = rtr.PostingsIndex(
            spark, str(tmp_path / "lex"), num_term_buckets=16, compact_threshold=1
        )
        idx.build(docs.filter("doc_id < 3"))
        idx.upsert(docs.filter("doc_id = 3"))
        idx.upsert(docs.filter("doc_id = 4"))  # counter trips, L0 drains
        assert idx._l0_files() == []
        queries = docs.filter(F.col("doc_id") == 0)
        got = _ranks(idx.search(queries, k=5))
        want = _ranks(rtr.bm25_topk(docs, queries, k=5))
        assert got == want and len(got) > 0

    def test_crashed_drain_duplication_is_invisible(self, spark, tmp_path):
        """A drain that dies between the fold-append and the L0 deletes
        leaves every consumed row twice (bucket layout + L0). The
        read-side (doc, term, generation) collapse must keep scores
        byte-identical — duplication may never double a tf."""
        docs = self._docs(spark)
        idx = rtr.PostingsIndex(
            spark, str(tmp_path / "lex"), num_term_buckets=16, compact_threshold=50
        )
        idx.build(docs.filter("doc_id < 3"))
        idx.upsert(docs.filter("doc_id >= 3"))
        queries = docs.filter(F.col("doc_id") == 0)
        want = _ranks(idx.search(queries, k=5))
        # simulate the crash: fold L0 into the layout but keep the files
        l0 = spark.read.parquet(*idx._l0_files())
        l0.write.mode("append").partitionBy(rtr.TERM_BUCKET_COL).parquet(
            idx._post_path
        )
        assert idx._l0_files()  # consumed rows now exist twice
        assert _ranks(idx.search(queries, k=5)) == want
        # recovery is simply the next drain; ranking still unchanged
        idx._drain_l0()
        assert idx._l0_files() == []
        assert _ranks(idx.search(queries, k=5)) == want

    def test_upsert_only_index_serves_from_l0(self, spark, tmp_path):
        """An index populated purely by upserts (never built) has no
        drained bucket layout at all — search must serve from the L0
        log alone, and a later drain must not change rankings."""
        docs = self._docs(spark)
        idx = rtr.PostingsIndex(
            spark, str(tmp_path / "lex"), num_term_buckets=16, compact_threshold=50
        )
        idx.upsert(docs.filter("doc_id < 3"))
        idx.upsert(docs.filter("doc_id >= 3"))
        queries = docs.filter(F.col("doc_id") == 0)
        got = _ranks(idx.search(queries, k=5))
        want = _ranks(rtr.bm25_topk(docs, queries, k=5))
        assert got == want and len(got) > 0
        idx._drain_l0()
        assert _ranks(idx.search(queries, k=5)) == want

    def test_restart_with_pending_l0_keeps_serving(self, spark, tmp_path):
        docs = self._docs(spark)
        path = str(tmp_path / "lex")
        idx = rtr.PostingsIndex(
            spark, path, num_term_buckets=16, compact_threshold=50
        )
        idx.build(docs.filter("doc_id < 3"))
        idx.upsert(docs.filter("doc_id >= 3"))
        restarted = rtr.PostingsIndex(
            spark, path, num_term_buckets=16, compact_threshold=50
        )
        queries = docs.filter(F.col("doc_id") == 0)
        got = _ranks(restarted.search(queries, k=5))
        want = _ranks(rtr.bm25_topk(docs, queries, k=5))
        assert got == want and len(got) > 0
        # and the restarted instance keeps indexing correctly
        extra = spark.createDataFrame(
            [(9, "spark engine cluster data shuffles")], "doc_id long, text string"
        )
        restarted.upsert(extra)
        got2 = _ranks(restarted.search(queries, k=5))
        want2 = _ranks(rtr.bm25_topk(docs.unionByName(extra), queries, k=5))
        assert got2 == want2
