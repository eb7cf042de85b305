"""IvfIndex lifecycle: build persists, search prunes partitions, results
match the one-shot trained-IVF operator, and a rebuilt session reloads."""

from __future__ import annotations

from etl_stream_spark.operators.similarity import ivf_trained_topk
from etl_stream_spark.operators.vector_index import IvfIndex
from etl_stream_spark.session import load_table


def test_build_search_matches_oneshot(spark, tmp_path):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.select("vec_id", "embedding")
    queries = corpus.filter("vec_id < 5")

    idx = IvfIndex(spark, str(tmp_path / "ivf"), nlist=8)
    assert not idx.exists()
    idx.build(corpus, rounds=2)
    assert idx.exists()

    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in idx.search(queries, k=5, nprobe=2).collect()
    }
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in ivf_trained_topk(
            corpus, queries, k=5, n_cells=8, nprobe=2, rounds=2
        ).collect()
    }
    assert got == want and len(got) == 25


def test_search_prunes_cell_partitions(spark, tmp_path):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.select("vec_id", "embedding")
    idx = IvfIndex(spark, str(tmp_path / "ivf"), nlist=8)
    idx.build(corpus, rounds=1)

    one_query = corpus.filter("vec_id = 3")
    result = idx.search(one_query, k=3, nprobe=2)
    result.collect()
    # the corpus FileScan carries a partition filter on at most nprobe
    # cells (inputFiles() would list the whole relation pre-pruning, so
    # assert on the executed plan)
    import re

    plan = result._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[_cell#\d+ IN \(([\d,]+)\)", plan)
    assert m, plan[:2000]
    assert 0 < len(m.group(1).split(",")) <= 2, m.group(1)


def test_reload_without_rebuild(spark, tmp_path):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.select("vec_id", "embedding")
    IvfIndex(spark, str(tmp_path / "ivf"), nlist=8).build(corpus, rounds=1)

    reopened = IvfIndex(spark, str(tmp_path / "ivf"), nlist=8)
    assert reopened.exists()
    out = reopened.search(corpus.filter("vec_id < 2"), k=3, nprobe=2)
    assert out.count() == 6
