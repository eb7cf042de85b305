"""FingerprintStore: cross-shard novelty, within-shard collapse,
idempotent replay, restart persistence, and bucket-pruned lookups."""

from __future__ import annotations

from pyspark.sql import functions as F

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


class TestPersistedEpoch:
    """Registration sequences must stay monotone across instance
    restarts AND across the 9→10 digit boundary — otherwise matched
    re-registrations are silently vetoed by the merge engine's
    stale-sequence guard and first_doc goes stale."""

    def test_sequences_are_lexicographically_monotone(self, spark, tmp_path):
        from etl_stream_spark.operators.incremental_dedup import _PersistedEpoch

        ep = _PersistedEpoch(spark, str(tmp_path / "tbl"))
        seqs = [ep.next_sequence() for _ in range(12)]
        assert seqs == sorted(seqs)  # raw ints would invert at 10 vs 9
        assert len(set(seqs)) == 12

    def test_restart_continues_monotonically(self, spark, tmp_path):
        from etl_stream_spark.operators.incremental_dedup import _PersistedEpoch

        path = str(tmp_path / "tbl")
        a = _PersistedEpoch(spark, path)
        last = [a.next() for _ in range(3)][-1]
        b = _PersistedEpoch(spark, path)  # restart
        assert b.next() == last + 1

    def test_upgrade_from_legacy_unpadded_sequences(self, spark, tmp_path):
        """Stores persisted by the pre-round-5 code carry UNPADDED
        ``<epoch>_00000000`` sequences; the new format must sort above
        them or every matched re-registration on an upgraded store
        would be vetoed by the stale-sequence guard forever."""
        from etl_stream_spark.cdc.envelope import make_sequence
        from etl_stream_spark.operators.incremental_dedup import (
            LshBandStore,
            _PersistedEpoch,
        )

        path = str(tmp_path / "legacy")
        text = "the quick brown fox jumps over the lazy dog again and again"
        store = LshBandStore(spark, path, num_buckets=4)
        bands = store._bands(docs(spark, [(5, text)]), "doc_id", "text")
        # simulate the legacy writer: same band rows, OLD sequence format
        legacy_rows = (
            bands.groupBy("band_id", "band_key")
            .agg(F.min("doc_id").alias("first_doc"))
            .select(
                "band_id",
                "band_key",
                "first_doc",
                F.lit("INSERT").alias("operation"),
                F.lit(make_sequence(3, 0)).alias("sequence"),
            )
        )
        store.table.merge(legacy_rows)
        assert {r.first_doc for r in store.table.read().collect()} == {5}

        # a new-format registration of the same bands must WIN, not veto
        out = store.check_and_register(docs(spark, [(9, text)]))
        assert {r.doc_id: r.is_near_dup for r in out.collect()} == {9: True}
        assert {r.first_doc for r in store.table.read().collect()} == {9}

        # and the format itself is totally ordered: every new sequence
        # beats every legacy one, and new ones stay monotone
        ep = _PersistedEpoch(spark, str(tmp_path / "seq"))
        seqs = [ep.next_sequence() for _ in range(3)]
        assert seqs == sorted(seqs)
        assert all(s > make_sequence(999_999, 0) for s in seqs)

    def test_restarted_store_re_registration_wins(self, spark, tmp_path):
        """A restarted instance's registrations carry HIGHER sequences
        than anything stored, so a matched band updates first_doc
        instead of being vetoed by the stale guard (the pre-fix bug:
        instance-local epochs reset to 0 on restart)."""
        from etl_stream_spark.operators.incremental_dedup import LshBandStore

        path = str(tmp_path / "lsh_restart")
        text = "the quick brown fox jumps over the lazy dog again and again"
        store = LshBandStore(spark, path, num_buckets=4)
        store.check_and_register(docs(spark, [(5, text)]))
        restarted = LshBandStore(spark, path, num_buckets=4)
        out = restarted.check_and_register(docs(spark, [(9, text)]))
        assert {r.doc_id: r.is_near_dup for r in out.collect()} == {9: True}
        first = {r.first_doc for r in restarted.table.read().collect()}
        assert first == {9}  # re-registration applied, not vetoed


class TestLshBandStore:
    """Incremental NEAR-dup detection: band matches across shards,
    same-shard lower-id matches, near-dup bands still claim buckets,
    and erasure purges claims."""

    def _texts(self):
        base = "the quick brown fox jumps over the lazy dog again and again"
        near = "the quick brown fox jumps over the lazy dog again and again today"
        other = "completely different words about spark shuffle exchanges here"
        return base, near, other

    def test_cross_and_within_shard_near_dups(self, spark, tmp_path):
        from etl_stream_spark.operators.incremental_dedup import LshBandStore

        base, near, other = self._texts()
        store = LshBandStore(spark, str(tmp_path / "lsh"), num_buckets=4)
        v1 = {
            r.doc_id: r.is_near_dup
            for r in store.check_and_register(
                docs(spark, [(1, base), (2, other), (3, base)])
            ).collect()
        }
        assert v1 == {1: False, 2: False, 3: True}  # 3 matches 1 in-shard

        # shard 2: 10 near-dups the STORE's doc 1; 11 matches doc 3 —
        # a doc that was itself a near-dup must still have claimed bands
        v2 = {
            r.doc_id: r.is_near_dup
            for r in store.check_and_register(
                docs(spark, [(10, near), (11, base), (12, "unrelated novel text entirely")])
            ).collect()
        }
        assert v2[10] is True and v2[11] is True and v2[12] is False

    def test_replay_is_idempotent(self, spark, tmp_path):
        from etl_stream_spark.operators.incremental_dedup import LshBandStore

        base, _near, other = self._texts()
        store = LshBandStore(spark, str(tmp_path / "lsh2"), num_buckets=4)
        shard = docs(spark, [(1, base), (2, other)])
        store.check_and_register(shard)
        # crash-replay of the same shard: ITS OWN bands are in the store
        # now, so verdicts flip to near-dup (claimed by "an earlier
        # document" — itself); the store's membership is unchanged
        before = store.table.read().count()
        store.check_and_register(shard)
        assert store.table.read().count() == before

    def test_purge_removes_claims(self, spark, tmp_path):
        from etl_stream_spark.operators.incremental_dedup import LshBandStore

        base, near, other = self._texts()
        store = LshBandStore(spark, str(tmp_path / "lsh3"), num_buckets=4)
        store.check_and_register(docs(spark, [(1, base), (2, other)]))
        store.purge(docs(spark, [(1, base)]))
        # doc 1's claims are gone: a near-dup of it now reads novel
        v = {
            r.doc_id: r.is_near_dup
            for r in store.check_and_register(docs(spark, [(10, near)])).collect()
        }
        assert v == {10: False}
