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


def _results(idx, queries, k=5, nprobe=8):
    return {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in idx.search(queries, k=k, nprobe=nprobe).collect()
    }


def test_upsert_parity_with_rebuild(spark, tmp_path):
    """An index maintained by upserts must search identically to one
    whose corpus was rebuilt from the same logical state against the
    SAME centroids — inserts, vector changes (possibly moving cells),
    and removals all resolved by the generation/tombstone protocol."""
    from pyspark.sql import functions as F

    from etl_stream_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.select("vec_id", "embedding")
    base = corpus.filter("vec_id < 80")
    idx = IvfIndex(spark, str(tmp_path / "inc"), nlist=4)
    idx.build(base, rounds=2)

    # batch 1: brand-new ids
    add = corpus.filter("vec_id >= 80 AND vec_id < 95")
    idx.upsert(add)
    # batch 2: change existing vectors (negate → almost surely a new
    # cell: tombstone in the old cell + live row in the new one)
    changed = corpus.filter("vec_id >= 10 AND vec_id < 20").select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    idx.upsert(changed)
    # batch 3: remove some of the originals and one just-added id
    idx.remove(spark.range(5).select(F.col("id").alias("vec_id")))
    idx.remove(spark.createDataFrame([(80,)], "vec_id long"))

    # the equivalent logical corpus, rebuilt against the SAME centroids
    current = (
        base.filter("vec_id >= 5 AND (vec_id < 10 OR vec_id >= 20)")
        .unionByName(add.filter("vec_id > 80"))
        .unionByName(changed)
    )
    ref = IvfIndex(spark, str(tmp_path / "ref"), nlist=4)
    ref.build(base, rounds=2)  # same training input → same centroids
    ref.rebuild_corpus(current)

    queries = corpus.filter("vec_id >= 95 AND vec_id < 100")
    got, want = _results(idx, queries), _results(ref, queries)
    assert got == want and len(got) == 25
    # removed / superseded ids must never surface
    neighbors = {n for n, _ in got.values()}
    assert not neighbors & {0, 1, 2, 3, 4, 80}

    # compaction must not change any result
    idx.compact()
    assert _results(idx, queries) == want
    # and physically drops the superseded generations + tombstones
    raw = spark.read.parquet(str(tmp_path / "inc") + "/corpus")
    assert raw.filter("_tomb").count() == 0
    assert raw.count() == current.count()


def test_upsert_map_lookup_is_bucket_pruned(spark, tmp_path):
    """The id→cell map read during an upsert must touch only the map
    buckets the batch ids hash to, not the whole map."""
    from pyspark.sql import functions as F

    from etl_stream_spark.cdc.merge import bucket_expr_for
    from etl_stream_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.select("vec_id", "embedding")
    idx = IvfIndex(spark, str(tmp_path / "inc"), nlist=4)
    idx.build(corpus, rounds=1)

    one = corpus.filter("vec_id = 7")
    expected_bucket = (
        one.select(bucket_expr_for(["vec_id"], 32).alias("b")).first()["b"]
    )
    looked = idx._old_cells(one.select("vec_id"), "vec_id")
    # the merge engine prunes at the PATH level (only touched _bucket=
    # dirs are listed at all), so the pruning is visible in the scan's
    # file set rather than as a PartitionFilters plan entry — assert the
    # stronger property directly: every map file the plan reads lives
    # under the one expected bucket directory.
    map_files = [f for f in looked.inputFiles() if "/ids/" in f]
    assert map_files, looked.inputFiles()
    assert all(f"_bucket={expected_bucket}/" in f for f in map_files), map_files

    # after an upsert the map gains a bounded L0 append log: probes may
    # read it (it is at most compact_threshold batches of map rows) plus
    # the pruned bucket dirs — but never a FOREIGN bucket directory
    idx.upsert(corpus.filter("vec_id = 8"))
    looked2 = idx._old_cells(one.select("vec_id"), "vec_id")
    for f in [f for f in looked2.inputFiles() if "/ids/" in f]:
        assert f"_bucket={expected_bucket}/" in f or "/_delta/" in f, f


def test_streaming_upsert_serves_fresh_vectors(spark, tmp_path):
    """The index is a valid sink for a vector stream: each micro-batch
    upserted via foreachBatch becomes searchable, and the end state
    matches a rebuild from the same logical corpus — the 'new documents
    flow into the serving index continuously' production shape."""
    import os

    from pyspark.sql import functions as F

    from etl_stream_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.select("vec_id", "embedding")
    base = corpus.filter("vec_id < 60")
    idx = IvfIndex(spark, str(tmp_path / "stream_idx"), nlist=4)
    idx.build(base, rounds=1)

    src = str(tmp_path / "incoming")
    fresh = corpus.filter("vec_id >= 60 AND vec_id < 90")
    # 3 files → 3 micro-batches at 1 file/trigger
    fresh.withColumn("_g", F.col("vec_id") % 3).repartition(3, "_g").drop(
        "_g"
    ).write.parquet(src)
    q = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(lambda b, _eid: idx.upsert(b))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    ref = IvfIndex(spark, str(tmp_path / "ref_idx"), nlist=4)
    ref.build(base, rounds=1)  # same training input → same centroids
    ref.rebuild_corpus(corpus.filter("vec_id < 90"))

    queries = corpus.filter("vec_id >= 95 AND vec_id < 100")
    got = _results(idx, queries, k=5, nprobe=4)
    assert got == _results(ref, queries, k=5, nprobe=4) and len(got) == 25
    # streamed ids must actually be reachable
    assert any(n >= 60 for n, _ in got.values())


def test_build_over_existing_index_resets(spark, tmp_path):
    """build() on an already-populated index is a full rebuild: the old
    id map's higher sequences (and tombstones) must not veto the gen-0
    assignments — previously every search silently dropped to empty."""
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.select("vec_id", "embedding")
    queries = corpus.filter("vec_id < 3")

    idx = IvfIndex(spark, str(tmp_path / "ivf"), nlist=8)
    idx.build(corpus.filter("vec_id % 2 = 0"), rounds=2)
    idx.remove(corpus.filter("vec_id = 4").select("vec_id"))

    idx.build(corpus, rounds=2)  # full rebuild over the populated index
    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in idx.search(queries, k=5, nprobe=8).collect()
    }
    assert len(got) == 15
    # exhaustive probe of a rebuilt index must see the once-removed id
    # (fresh query id so the self-match exclusion doesn't hide it)
    from pyspark.sql import functions as F

    probe = corpus.filter("vec_id = 4").select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    back = idx.search(probe, k=1, nprobe=8)
    assert [r.neighbor_id for r in back.collect()] == [4]


def test_id_map_id_col_mismatch_raises(spark, tmp_path):
    """The cached id map is keyed on the FIRST call's id_col; serving it
    for a different id_col would bucket-hash on the wrong key — the
    index must refuse loudly instead."""
    import pytest

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.select("vec_id", "embedding")
    idx = IvfIndex(spark, str(tmp_path / "ivf"), nlist=4)
    idx.build(corpus.filter("vec_id < 40"), rounds=1)
    with pytest.raises(ValueError, match="keyed on 'vec_id'"):
        idx._id_map("other_id")


def test_id_map_crashed_drain_window_is_idempotent(spark, tmp_path):
    """Kill the id map's L0 drain between the bucket rewrite and the L0
    deletes (consumed rows exist twice — ParquetMergeTable.compact's
    documented crash window), restart, and keep operating: the map's
    read-side LWW collapse must make the duplication invisible, so
    moved-cell detection — and therefore search — stays in parity with
    an undisturbed twin."""
    import os
    import shutil

    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.select("vec_id", "embedding")
    base = corpus.filter("vec_id < 60")
    idx = IvfIndex(spark, str(tmp_path / "a"), nlist=4)
    ref = IvfIndex(spark, str(tmp_path / "b"), nlist=4)
    for i in (idx, ref):
        i.build(base, rounds=2)  # same input → same centroids

    # move a slice of ids to (almost surely) different cells — the map
    # now carries their new assignments in un-drained L0
    moved = corpus.filter("vec_id >= 10 AND vec_id < 20").select(
        "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
    )
    idx.upsert(moved)
    ref.upsert(moved)

    # crash the drain: stash L0, compact (bucket rewrite + L0 delete),
    # then restore the consumed files — exactly the mid-compact state
    l0_dir = str(tmp_path / "a" / "ids" / "_delta")
    stash = str(tmp_path / "stash")
    shutil.copytree(l0_dir, stash)
    idx._id_map("vec_id").compact()
    for f in os.listdir(stash):
        shutil.copy(os.path.join(stash, f), os.path.join(l0_dir, f))

    # restart (fresh instance), then move the same ids BACK — correct
    # old-cell detection requires resolving the duplicated map rows
    re_idx = IvfIndex(spark, str(tmp_path / "a"), nlist=4)
    back = corpus.filter("vec_id >= 10 AND vec_id < 20")
    re_idx.upsert(back)
    ref.upsert(back)

    queries = corpus.filter("vec_id >= 95 AND vec_id < 100")
    got = _results(re_idx, queries)
    assert got == _results(ref, queries) and len(got) == 25

    # the next drain removes the duplication for good
    re_idx._id_map("vec_id").compact()
    assert _results(re_idx, queries) == got
