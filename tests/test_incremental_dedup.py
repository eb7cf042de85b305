"""FingerprintStore: cross-shard novelty, within-shard collapse,
idempotent replay, restart persistence, and bucket-pruned lookups."""

from __future__ import annotations

from etl_stream_spark.operators.incremental_dedup import FingerprintStore


def docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def ids(df):
    return sorted(r.doc_id for r in df.collect())


def test_cross_shard_and_within_shard_dedup(spark, tmp_path):
    store = FingerprintStore(spark, str(tmp_path / "fps"), num_buckets=4)
    shard1 = docs(
        spark,
        [
            (1, "alpha beta gamma"),
            (2, "delta epsilon"),
            (3, "Alpha  beta GAMMA!"),  # normalized dup of 1 within shard
        ],
    )
    out1 = store.dedup_shard(shard1)
    assert ids(out1) == [1, 2]  # min-id survivor of the within-shard pair

    shard2 = docs(
        spark,
        [
            (10, "delta epsilon"),  # seen in shard1 → dropped
            (11, "zeta eta theta"),  # novel
            (12, "alpha beta gamma"),  # seen → dropped
        ],
    )
    out2 = store.dedup_shard(shard2)
    assert ids(out2) == [11]


def test_replay_is_idempotent_and_survives_restart(spark, tmp_path):
    path = str(tmp_path / "fps")
    store = FingerprintStore(spark, path, num_buckets=4)
    shard = docs(spark, [(1, "one"), (2, "two")])
    assert ids(store.dedup_shard(shard)) == [1, 2]
    # replay of the same shard: nothing novel, store unchanged
    assert ids(store.dedup_shard(shard)) == []

    # restart: a fresh store instance over the same path remembers
    restarted = FingerprintStore(spark, path, num_buckets=4)
    shard3 = docs(spark, [(5, "one"), (6, "three")])
    assert ids(restarted.dedup_shard(shard3)) == [6]


def test_novel_on_empty_store_passes_all(spark, tmp_path):
    store = FingerprintStore(spark, str(tmp_path / "fps"))
    out = store.novel(docs(spark, [(1, "a"), (2, "b")]))
    assert ids(out) == [1, 2]
    assert "fp" not in out.columns  # internal column does not leak


def test_purge_forgets_content_and_reingest_recovers(spark, tmp_path):
    store = FingerprintStore(spark, str(tmp_path / "fps"), num_buckets=4)
    corpus = docs(
        spark,
        [
            (1, "alpha beta"),
            (2, "delta epsilon"),
            (3, "alpha beta"),  # shares content with 1
            (4, "zeta eta"),
        ],
    )
    store.register(corpus)
    assert ids(store.novel(corpus)) == []  # everything seen
    # forget docs 1 and 4: their CONTENT fingerprints leave the store
    store.purge(docs(spark, [(1, "alpha beta"), (4, "zeta eta")]))
    back = store.novel(corpus)
    # shared content (1,3) resurfaces as min-id 1; unshared 4 returns;
    # remembered content (2) stays suppressed
    assert ids(back) == [1, 4]
    # re-registering converges back to fully-seen
    store.register(corpus)
    assert ids(store.novel(corpus)) == []
