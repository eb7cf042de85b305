"""Right-to-be-forgotten (cdc/erasure.py + purge_keys on the storage
layers): erasure must remove every trace of a key — merged state,
tombstones, SCD2 history, quarantine — and keep it out under replays,
while touching only the buckets/files that hold it."""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_stream_spark.cdc import (
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    ParquetMergeTable,
    make_sequence,
)
from etl_stream_spark.cdc.erasure import (
    ErasureList,
    erasure_list_for,
    forget_keys,
    purge_parquet_dir,
)
from etl_stream_spark.cdc.pipeline import CdcBatchApplier, CdcTableConfig
from etl_stream_spark.cdc.scd2 import Scd2Table

EVENT_SCHEMA = "id long, name string, qty long, operation string, sequence string"


def ev(id_, name, qty, op, seq_idx):
    return (id_, name, qty, op, make_sequence(1_700_000_000_000_000, seq_idx))


def keys_of(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def bucket_files(path):
    """{bucket_dir: sorted parquet file names} for a bucketed table."""
    out = {}
    for entry in sorted(os.listdir(path)):
        if entry.startswith("_bucket="):
            files = sorted(
                f for f in os.listdir(os.path.join(path, entry))
                if f.endswith(".parquet")
            )
            out[entry] = files
    return out


class TestMergeTablePurge:
    def test_rows_and_sequence_state_removed(self, spark, tmp_path):
        t = ParquetMergeTable(spark, str(tmp_path / "t"), keys=["id"], num_buckets=4)
        t.merge(
            spark.createDataFrame(
                [ev(i, f"n{i}", i, OP_INSERT, i) for i in range(1, 9)], EVENT_SCHEMA
            )
        )
        t.purge_keys(keys_of(spark, [2, 5]))
        assert {r.id for r in t.read().collect()} == {1, 3, 4, 6, 7, 8}
        # erasure leaves no sequence state: an OLD (stale) event for the
        # key re-inserts — exactly why suppression must accompany purge
        t.merge(
            spark.createDataFrame([ev(2, "old", 0, OP_INSERT, 0)], EVENT_SCHEMA)
        )
        assert 2 in {r.id for r in t.read().collect()}

    def test_tombstones_purged_too(self, spark, tmp_path):
        t = ParquetMergeTable(
            spark, str(tmp_path / "t"), keys=["id"], num_buckets=4,
            tombstone_deletes=True,
        )
        t.merge(
            spark.createDataFrame(
                [ev(1, "a", 1, OP_INSERT, 1), ev(2, "b", 2, OP_INSERT, 2)],
                EVENT_SCHEMA,
            )
        )
        t.merge(spark.createDataFrame([ev(1, None, None, OP_DELETE, 3)], EVENT_SCHEMA))
        state = t._read_state()
        assert state.filter(F.col("_deleted")).count() == 1
        t.purge_keys(keys_of(spark, [1]))
        state = t._read_state()
        assert state.filter(F.coalesce(F.col("_deleted"), F.lit(False))).count() == 0
        assert {r.id for r in t.read().collect()} == {2}

    def test_untouched_buckets_not_rewritten(self, spark, tmp_path):
        t = ParquetMergeTable(spark, str(tmp_path / "t"), keys=["id"], num_buckets=8)
        t.merge(
            spark.createDataFrame(
                [ev(i, f"n{i}", i, OP_INSERT, i) for i in range(1, 33)], EVENT_SCHEMA
            )
        )
        before = bucket_files(t.path)
        purge_ids = [1, 2]
        doomed_buckets = {
            f"_bucket={r[0]}"
            for r in keys_of(spark, purge_ids)
            .select(t._bucket_expr().alias("b"))
            .distinct()
            .collect()
        }
        t.purge_keys(keys_of(spark, purge_ids))
        after = bucket_files(t.path)
        untouched = set(before) - doomed_buckets
        assert untouched, "fixture degenerate: every bucket touched"
        for b in untouched:
            assert after[b] == before[b], f"{b} rewritten by unrelated purge"
        assert {r.id for r in t.read().collect()} == set(range(3, 33))

    def test_purge_missing_keys_is_noop(self, spark, tmp_path):
        t = ParquetMergeTable(spark, str(tmp_path / "t"), keys=["id"], num_buckets=4)
        t.merge(spark.createDataFrame([ev(1, "a", 1, OP_INSERT, 1)], EVENT_SCHEMA))
        t.purge_keys(keys_of(spark, [99]))
        assert {r.id for r in t.read().collect()} == {1}


class TestScd2Purge:
    def test_all_versions_erased_others_intact(self, spark, tmp_path):
        h = Scd2Table(spark, str(tmp_path / "h"), keys=["id"], num_buckets=4)
        h.apply_batch(
            spark.createDataFrame(
                [ev(1, "a1", 1, OP_INSERT, 1), ev(2, "b1", 1, OP_INSERT, 2)],
                EVENT_SCHEMA,
            )
        )
        h.apply_batch(
            spark.createDataFrame(
                [ev(1, "a2", 2, OP_UPDATE, 3), ev(2, "b2", 2, OP_UPDATE, 4)],
                EVENT_SCHEMA,
            )
        )
        assert h.read().filter(F.col("id") == 1).count() == 2  # closed + open
        h.purge_keys(keys_of(spark, [1]))
        hist = h.read()
        assert hist.filter(F.col("id") == 1).count() == 0
        got = {(r.id, r.name, r.is_current) for r in hist.collect()}
        assert got == {(2, "b1", False), (2, "b2", True)}
        # as_of can no longer resurrect the erased key at any point
        assert h.as_of(make_sequence(1_700_000_000_000_000, 2)).filter(
            F.col("id") == 1
        ).count() == 0


class TestScd2Retention:
    def seq(self, i):
        return make_sequence(1_700_000_000_000_000, i)

    def build(self, spark, tmp_path):
        h = Scd2Table(spark, str(tmp_path / "h"), keys=["id"], num_buckets=4)
        # three batches → three closed-zone file generations
        h.apply_batch(
            spark.createDataFrame(
                [ev(1, "a1", 1, OP_INSERT, 1), ev(2, "b1", 1, OP_INSERT, 2)],
                EVENT_SCHEMA,
            )
        )
        h.apply_batch(
            spark.createDataFrame([ev(1, "a2", 2, OP_UPDATE, 4)], EVENT_SCHEMA)
        )
        h.apply_batch(
            spark.createDataFrame(
                [ev(1, "a3", 3, OP_UPDATE, 8), ev(2, "b2", 2, OP_UPDATE, 9)],
                EVENT_SCHEMA,
            )
        )
        return h

    def test_expire_drops_only_ended_versions(self, spark, tmp_path):
        h = self.build(spark, tmp_path)
        # horizon at seq 5: a1 (ended 4) expires; a2 (ends 8) and
        # b1 (ends 9) survive, as do both open versions
        h.expire_closed_before(self.seq(5))
        got = {(r.id, r.name, r.valid_to_seq is None) for r in h.read().collect()}
        assert got == {
            (1, "a2", False),
            (1, "a3", True),
            (2, "b1", False),
            (2, "b2", True),
        }
        # as_of after the horizon is unaffected
        at7 = {(r.id, r.name) for r in h.as_of(self.seq(7)).collect()}
        assert at7 == {(1, "a2"), (2, "b1")}
        # as_of before it loses the expired version — by design
        assert {r.id for r in h.as_of(self.seq(3)).collect()} == {2}

    def test_expire_rewrites_only_files_with_expired_rows(self, spark, tmp_path):
        h = self.build(spark, tmp_path)
        before = set(
            f.split("/")[-1]
            for f in os.listdir(h.closed_path)
            if f.endswith(".parquet")
        )
        # horizon 5 dooms only batch-2's closed file (a1, ended at 4);
        # batch-3's closed files (ended 8 and 9) must not be rewritten
        h.expire_closed_before(self.seq(5))
        after = set(
            f for f in os.listdir(h.closed_path) if f.endswith(".parquet")
        )
        survivors = before & after
        assert survivors, "retention rewrote every closed file"
        # and nothing expired remains
        assert h.read().filter(F.col("name") == "a1").count() == 0

    def test_expire_noop_below_everything(self, spark, tmp_path):
        h = self.build(spark, tmp_path)
        before = sorted(os.listdir(h.closed_path))
        h.expire_closed_before(self.seq(0))
        assert sorted(os.listdir(h.closed_path)) == before

    def test_purge_rewrites_only_files_with_key(self, spark, tmp_path):
        h = Scd2Table(spark, str(tmp_path / "h2"), keys=["id"], num_buckets=4)
        h.apply_batch(
            spark.createDataFrame([ev(1, "a1", 1, OP_INSERT, 1)], EVENT_SCHEMA)
        )
        h.apply_batch(
            spark.createDataFrame([ev(1, "a2", 2, OP_UPDATE, 2)], EVENT_SCHEMA)
        )  # closes a1 → file gen 1
        h.apply_batch(
            spark.createDataFrame([ev(2, "b1", 1, OP_INSERT, 3)], EVENT_SCHEMA)
        )
        h.apply_batch(
            spark.createDataFrame([ev(2, "b2", 2, OP_UPDATE, 4)], EVENT_SCHEMA)
        )  # closes b1 → file gen 2
        before = set(
            f for f in os.listdir(h.closed_path) if f.endswith(".parquet")
        )
        h.purge_keys(keys_of(spark, [1]))
        after = set(
            f for f in os.listdir(h.closed_path) if f.endswith(".parquet")
        )
        assert before & after, "purge rewrote closed files without the key"
        assert {r.id for r in h.read().collect()} == {2}


class TestForgetLoop:
    def batch(self, spark, rows):
        return spark.createDataFrame(
            [r + ("t1",) for r in rows],
            EVENT_SCHEMA + ", table string",
        )

    def test_replay_cannot_resurrect_and_survivors_unchanged(self, spark, tmp_path):
        applier = CdcBatchApplier(
            spark, str(tmp_path), {"t1": CdcTableConfig(keys=["id"], num_buckets=4)}
        )
        log = self.batch(
            spark,
            [ev(i, f"n{i}", i, OP_INSERT, i) for i in range(1, 7)]
            + [ev(3, "n3v2", 33, OP_UPDATE, 10)],
        )
        applier.apply_batch(log)
        forget_keys(applier, "t1", keys_of(spark, [3, 5]))
        assert {r.id for r in applier.target("t1").read().collect()} == {1, 2, 4, 6}
        # full replay (DLQ/landing re-read shape): erased keys suppressed,
        # survivors' equal-sequence events lose to the stale guard
        applier.apply_batch(log)
        got = {(r.id, r.name) for r in applier.target("t1").read().collect()}
        assert got == {(1, "n1"), (2, "n2"), (4, "n4"), (6, "n6")}
        # a genuinely NEW key still lands after the erasure list exists
        applier.apply_batch(self.batch(spark, [ev(9, "n9", 9, OP_INSERT, 20)]))
        assert 9 in {r.id for r in applier.target("t1").read().collect()}

    def test_erasure_list_survives_restart(self, spark, tmp_path):
        applier = CdcBatchApplier(
            spark, str(tmp_path), {"t1": CdcTableConfig(keys=["id"], num_buckets=4)}
        )
        applier.apply_batch(
            self.batch(spark, [ev(1, "a", 1, OP_INSERT, 1), ev(2, "b", 2, OP_INSERT, 2)])
        )
        forget_keys(applier, "t1", keys_of(spark, [1]))
        # a fresh applier (restart) reads the same persisted list
        applier2 = CdcBatchApplier(
            spark, str(tmp_path), {"t1": CdcTableConfig(keys=["id"], num_buckets=4)}
        )
        applier2.apply_batch(self.batch(spark, [ev(1, "back", 9, OP_INSERT, 30)]))
        assert {r.id for r in applier2.target("t1").read().collect()} == {2}

    def test_quarantine_and_history_purged(self, spark, tmp_path):
        from etl_stream_spark.schema.expectations import custom

        gate = custom("qty_not_negative", lambda df: F.col("qty") < 0)
        hist = Scd2Table(spark, str(tmp_path / "hist"), keys=["id"], num_buckets=4)
        applier = CdcBatchApplier(
            spark,
            str(tmp_path),
            {"t1": CdcTableConfig(keys=["id"], num_buckets=4, expectations=[gate])},
            histories={"t1": hist},
        )
        applier.apply_batch(
            self.batch(
                spark,
                [
                    ev(1, "a", 1, OP_INSERT, 1),
                    ev(2, "b", -2, OP_INSERT, 2),  # quarantined
                    ev(3, "c", 3, OP_INSERT, 3),
                ],
            )
        )
        assert applier.read_quarantine("t1").count() == 1
        report = forget_keys(applier, "t1", keys_of(spark, [2, 3]))
        # proof-of-erasure: per-surface removal counts + audit trail
        assert report == {
            "table": "t1",
            "requested_keys": 2,
            "state_rows": 1,       # id 3 (id 2 was quarantined, never merged)
            "history_rows": 1,     # id 3's single open version
            "quarantine_rows": 1,  # id 2's parked row
            "extra_path_rows": 0,
        }
        audit = spark.read.parquet(str(tmp_path / "_erasure_audit"))
        assert audit.count() == 1 and audit.first().state_rows == 1
        q = applier.read_quarantine("t1")
        assert q is None or q.count() == 0
        assert hist.read().filter(F.col("id") == 3).count() == 0
        assert {r.id for r in applier.target("t1").read().collect()} == {1}
        # erased key's quarantined row resubmitted by a stale repair
        # job is suppressed at the gate's front door
        applier.apply_batch(self.batch(spark, [ev(2, "b", -2, OP_INSERT, 2)]))
        q = applier.read_quarantine("t1")
        assert q is None or q.count() == 0

    def test_truncate_markers_pass_suppression(self, spark, tmp_path):
        from etl_stream_spark.cdc import OP_TRUNCATE

        applier = CdcBatchApplier(
            spark, str(tmp_path), {"t1": CdcTableConfig(keys=["id"], num_buckets=4)}
        )
        applier.apply_batch(self.batch(spark, [ev(1, "a", 1, OP_INSERT, 1)]))
        forget_keys(applier, "t1", keys_of(spark, [1]))
        # NULL-keyed truncate marker must not be eaten by the anti-join
        applier.apply_batch(
            self.batch(
                spark,
                [
                    ev(2, "b", 2, OP_INSERT, 2),
                    (None, None, None, OP_TRUNCATE, make_sequence(1_700_000_000_000_000, 3)),
                    ev(4, "d", 4, OP_INSERT, 4),
                ],
            )
        )
        assert {r.id for r in applier.target("t1").read().collect()} == {4}

    def test_extra_paths_landing_purged(self, spark, tmp_path):
        from etl_stream_spark.cdc.pipeline import LandingTable

        landing = LandingTable(spark, str(tmp_path / "landing"))
        applier = CdcBatchApplier(
            spark, str(tmp_path), {"t1": CdcTableConfig(keys=["id"], num_buckets=4)}
        )
        batch = self.batch(
            spark, [ev(1, "a", 1, OP_INSERT, 1), ev(2, "b", 2, OP_INSERT, 2)]
        )
        landing.append(batch.drop("table"))
        applier.apply_batch(batch)
        forget_keys(applier, "t1", keys_of(spark, [1]), extra_paths=[landing.path])
        assert {r.id for r in landing.read().collect()} == {2}
        assert {r.id for r in applier.target("t1").read().collect()} == {2}

    def test_partitioned_landing_layout_survives_purge(self, spark, tmp_path):
        """Purging a PARTITIONED directory must keep its Hive layout:
        an unpartitioned append into a dt=*/ tree corrupts every future
        read ('conflicting directory structures')."""
        from etl_stream_spark.cdc.pipeline import LandingTable

        landing = LandingTable(
            spark, str(tmp_path / "landing"), partition_cols=("dt",)
        )
        applier = CdcBatchApplier(
            spark, str(tmp_path), {"t1": CdcTableConfig(keys=["id"], num_buckets=4)}
        )
        batch = self.batch(
            spark, [ev(1, "a", 1, OP_INSERT, 1), ev(2, "b", 2, OP_INSERT, 2)]
        )
        landing.append(
            batch.drop("table").withColumn(
                "dt", F.when(F.col("id") == 1, "2026-01-01").otherwise("2026-01-02")
            )
        )
        applier.apply_batch(batch)
        forget_keys(applier, "t1", keys_of(spark, [1]), extra_paths=[landing.path])
        # the read itself fails if the layout was corrupted (partition
        # values re-infer as DATE — compare stringified)
        rows = landing.read().collect()
        assert {(r.id, str(r.dt)) for r in rows} == {(2, "2026-01-02")}

    def test_keys_from_mutated_state_purge_every_surface(self, spark, tmp_path):
        """keys_df derived FROM the target state must keep working after
        the target is purged: every later surface (history, quarantine)
        sees the materialized request, not a lazily re-evaluated (now
        empty) plan — the silent-compliance-hole regression."""
        hist = Scd2Table(spark, str(tmp_path / "hist"), keys=["id"], num_buckets=4)
        applier = CdcBatchApplier(
            spark,
            str(tmp_path),
            {"t1": CdcTableConfig(keys=["id"], num_buckets=4)},
            histories={"t1": hist},
        )
        applier.apply_batch(
            self.batch(
                spark,
                [ev(1, "keep", 1, OP_INSERT, 1), ev(2, "doomed", 2, OP_INSERT, 2)],
            )
        )
        # the erasure request is a FILTER OVER CURRENT STATE — the shape
        # a takedown job produces
        doomed = applier.target("t1").read().filter(F.col("name") == "doomed")
        forget_keys(applier, "t1", doomed)
        assert {r.id for r in applier.target("t1").read().collect()} == {1}
        assert hist.read().filter(F.col("id") == 2).count() == 0

    def test_rollup_groups_repaired(self, spark, tmp_path):
        from etl_stream_spark.cdc.rollup import IncrementalRollup

        silver = ParquetMergeTable(
            spark, str(tmp_path / "t1"), keys=["id"], num_buckets=4
        )
        rollup = IncrementalRollup(
            spark,
            silver,
            str(tmp_path / "gold"),
            group_cols=["name"],
            aggs={"total": lambda: F.sum("qty").cast("long")},
            num_buckets=2,
        )
        applier = CdcBatchApplier(
            spark,
            str(tmp_path),
            {"t1": CdcTableConfig(keys=["id"], num_buckets=4)},
            rollups={"t1": rollup},
        )
        applier.apply_batch(
            self.batch(
                spark,
                [
                    ev(1, "g1", 10, OP_INSERT, 1),
                    ev(2, "g1", 5, OP_INSERT, 2),
                    ev(3, "g2", 7, OP_INSERT, 3),
                ],
            )
        )
        assert {(r.name, r.total) for r in rollup.read().collect()} == {
            ("g1", 15),
            ("g2", 7),
        }
        forget_keys(applier, "t1", keys_of(spark, [1, 3]))
        assert {(r.name, r.total) for r in rollup.read().collect()} == {("g1", 5)}


class TestInterleavedConvergence:
    def test_forget_between_batches_equals_never_ingested(self, spark, tmp_path):
        """Apply → forget → apply → replay-everything must converge to
        the state of a pipeline that never saw the forgotten keys —
        the erasure contract under the messiest realistic interleaving
        (late batches AND full replays after the forget)."""
        rows = [
            ev(i % 7, f"v{i}", i, OP_INSERT if i % 5 else OP_DELETE, i)
            for i in range(1, 31)
        ]
        batches = [rows[:10], rows[10:20], rows[20:]]
        doomed = [2, 5]

        def batch(rs):
            return spark.createDataFrame(
                [r + ("t1",) for r in rs], EVENT_SCHEMA + ", table string"
            )

        actual = CdcBatchApplier(
            spark,
            str(tmp_path / "a"),
            {"t1": CdcTableConfig(keys=["id"], num_buckets=4)},
        )
        actual.apply_batch(batch(batches[0]))
        forget_keys(actual, "t1", keys_of(spark, doomed))
        actual.apply_batch(batch(batches[1]))
        actual.apply_batch(batch(batches[0]))  # full replay of batch 1
        actual.apply_batch(batch(batches[2]))
        actual.apply_batch(batch(rows))  # replay of EVERYTHING

        expected = CdcBatchApplier(
            spark,
            str(tmp_path / "e"),
            {"t1": CdcTableConfig(keys=["id"], num_buckets=4)},
        )
        clean = [r for r in rows if r[0] not in doomed]
        expected.apply_batch(batch(clean))

        got = sorted(map(tuple, actual.target("t1").read().collect()))
        want = sorted(map(tuple, expected.target("t1").read().collect()))
        assert got == want


class TestErasureProperty:
    @pytest.mark.slow
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[
            HealthCheck.function_scoped_fixture,
            HealthCheck.too_slow,
        ],
    )
    @given(
        log=st.lists(
            st.tuples(
                st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
                st.sampled_from([1, 2, 3, 4]),
                st.integers(min_value=0, max_value=9),
            ),
            min_size=1,
            max_size=16,
        ),
        cuts=st.lists(
            st.integers(min_value=1, max_value=15), max_size=3, unique=True
        ),
        forgets=st.lists(
            st.tuples(st.integers(min_value=0, max_value=3), st.sampled_from([1, 2, 3, 4])),
            max_size=2,
            unique=True,
        ),
        replays=st.lists(st.integers(min_value=0, max_value=7), max_size=2),
    )
    def test_random_forgets_and_replays_converge(
        self, spark, tmp_path_factory, log, cuts, forgets, replays
    ):
        """Random log, random batch cuts, random mid-stream forgets,
        random batch replays afterwards (tombstoned deletes, so replays
        alone are idempotent): the final state must equal a sequential
        oracle over the events of never-forgotten keys only."""
        import uuid as _uuid

        events = [
            (op, key, payload, make_sequence(1_700_000_000_000_000, i))
            for i, (op, key, payload) in enumerate(log)
        ]
        bounds = sorted({c for c in cuts if c < len(events)})
        batches, start = [], 0
        for b in [*bounds, len(events)]:
            if b > start:
                batches.append(events[start:b])
                start = b

        applier = CdcBatchApplier(
            spark,
            str(tmp_path_factory.mktemp("eprop") / f"t_{_uuid.uuid4().hex[:8]}"),
            {
                "t1": CdcTableConfig(
                    keys=["id"], num_buckets=4, tombstone_deletes=True
                )
            },
        )

        def apply(batch_events):
            df = spark.createDataFrame(
                [
                    (key, payload if op != "DELETE" else None, op, seq, "t1")
                    for op, key, payload, seq in batch_events
                ],
                "id long, payload long, operation string, sequence string, table string",
            )
            applier.apply_batch(df)

        forgotten: set[int] = set()
        for i, batch_events in enumerate(batches):
            apply(batch_events)
            for j, k in forgets:
                if j == i:
                    forget_keys(applier, "t1", keys_of(spark, [k]))
                    forgotten.add(k)
        # forget points past the last batch still apply (at the end)
        for j, k in forgets:
            if j >= len(batches) and k not in forgotten:
                forget_keys(applier, "t1", keys_of(spark, [k]))
                forgotten.add(k)
        for idx in replays:
            apply(batches[idx % len(batches)])

        expected: dict[int, int] = {}
        for op, key, payload, _seq in events:
            if key in forgotten:
                continue
            if op == "DELETE":
                expected.pop(key, None)
            else:
                expected[key] = payload
        got = {r.id: r.payload for r in applier.target("t1").read().collect()}
        assert got == expected


class TestPrimitives:
    def test_purge_parquet_dir(self, spark, tmp_path):
        path = str(tmp_path / "q")
        spark.createDataFrame(
            [(1, "x"), (2, "y"), (3, "z")], "id long, v string"
        ).write.parquet(path)
        purge_parquet_dir(spark, path, keys_of(spark, [2]), ["id"])
        assert {r.id for r in spark.read.parquet(path).collect()} == {1, 3}
        # missing dir: no-op, no raise
        purge_parquet_dir(spark, str(tmp_path / "absent"), keys_of(spark, [1]), ["id"])

    def test_erasure_list_distinct_and_idempotent(self, spark, tmp_path):
        el = ErasureList(spark, str(tmp_path / "e"), ["id"])
        assert not el.exists()
        el.add(keys_of(spark, [1, 2]))
        el.add(keys_of(spark, [2, 3]))
        assert el.exists()
        assert {r.id for r in el.read().collect()} == {1, 2, 3}
        df = spark.createDataFrame([(1, "a"), (4, "d")], "id long, v string")
        assert {r.id for r in el.suppress(df).collect()} == {4}


class TestStreamingStateErasure:
    """Erasure × keyed streaming state (round-3 verdict #6): the
    pipeline's upstream suppression keeps forgotten keys out of NEW
    state, and the operators' ``suppressed_*`` hooks purge EXISTING
    state the next time the key/shard fires. The pinned residual
    contract: state for a key that never fires again lives in the
    checkpoint until rollover — full erasure = suppression + checkpoint
    rotation (or one replayed event to trigger the in-operator purge)."""

    def test_cep_suppressed_key_purges_state_and_emits_nothing(self, spark, tmp_path):
        import json

        from etl_stream_spark.sources.file_source import read_cdc_file_stream
        from etl_stream_spark.streaming.cep import pattern_matches

        syms = {"signup": "s", "purchase": "p"}
        pats = {"conv": "sp"}
        schema = "uid long, seq long, et string"
        src = tmp_path / "ev"
        src.mkdir()
        (src / "a.json").write_text(
            "\n".join(
                json.dumps(d)
                for d in [
                    {"uid": 1, "seq": 1, "et": "signup"},
                    {"uid": 2, "seq": 1, "et": "signup"},
                ]
            )
        )

        def run(suppressed):
            # foreachBatch sink: the one sink shape that RECOVERS from a
            # checkpoint, which is the whole point — the suppression list
            # changes across restarts of the same stateful query
            out: list = []
            stream = read_cdc_file_stream(spark, str(src), schema)
            q = (
                pattern_matches(
                    stream, "uid", "seq", "et", syms, pats,
                    suppressed_keys=suppressed,
                )
                .writeStream.outputMode("append")
                .foreachBatch(lambda df, _eid: out.extend(df.collect()))
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120)
            return out

        out1 = run(None)
        assert {r.uid for r in out1} == {1, 2}

        # uid 1 is forgotten; a replayed/late event arrives for both keys
        (src / "b.json").write_text(
            "\n".join(
                json.dumps(d)
                for d in [
                    {"uid": 1, "seq": 2, "et": "purchase"},
                    {"uid": 2, "seq": 2, "et": "purchase"},
                ]
            )
        )
        out2 = {r.uid: r for r in run(frozenset([1]))}
        assert set(out2) == {2}  # the forgotten key emits nothing
        assert out2[2].conv_matches == 1

        # the purge removed uid 1's buffer: un-suppressing and replaying
        # shows state rebuilt from scratch (events_seen restarts), not
        # the pre-erasure history
        (src / "c.json").write_text(json.dumps({"uid": 1, "seq": 3, "et": "signup"}))
        out3 = [r for r in run(None) if r.uid == 1]
        assert len(out3) == 1
        assert out3[0].events_seen == 1  # history was purged, not retained
        assert out3[0].conv_matches == 0

    def test_cep_suppression_holds_across_checkpoint_restarts(self, spark, tmp_path):
        """The checkpoint-rollover leg of the erasure contract: a CEP
        stream restarted from its checkpoint with a suppression list
        must (a) keep the forgotten key's state dormant while the key
        stays quiet (the documented residual), (b) purge it the first
        time the key fires under suppression, and (c) never resurrect
        the pre-erasure buffer from the state store — a later
        unsuppressed run sees a FRESH key, whatever the checkpoint once
        held."""
        import json

        from etl_stream_spark.sources.file_source import read_cdc_file_stream
        from etl_stream_spark.streaming.cep import pattern_matches

        syms = {"signup": "s", "purchase": "p"}
        pats = {"conv": "sp"}
        schema = "uid long, seq long, et string"
        src = tmp_path / "ev_r"
        src.mkdir()

        def feed(name, rows):
            (src / name).write_text("\n".join(json.dumps(d) for d in rows))

        def run(suppressed):
            out: list = []
            stream = read_cdc_file_stream(spark, str(src), schema)
            q = (
                pattern_matches(
                    stream, "uid", "seq", "et", syms, pats,
                    suppressed_keys=suppressed,
                )
                .writeStream.outputMode("append")
                .foreachBatch(lambda df, _eid: out.extend(df.collect()))
                .option("checkpointLocation", str(tmp_path / "ckpt_r"))
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120)
            return out

        feed("a.json", [
            {"uid": 7, "seq": 1, "et": "signup"},
            {"uid": 7, "seq": 2, "et": "purchase"},
            {"uid": 8, "seq": 1, "et": "signup"},
        ])
        out1 = {r.uid: r for r in run(None)}
        assert out1[7].conv_matches == 1 and out1[7].events_seen == 2

        # restart 1, uid 7 suppressed but QUIET: only uid 8 fires; the
        # forgotten key emits nothing and its state stays dormant
        feed("b.json", [{"uid": 8, "seq": 2, "et": "purchase"}])
        out2 = {r.uid: r for r in run(frozenset([7]))}
        assert set(out2) == {8} and out2[8].conv_matches == 1

        # restart 2, still suppressed, uid 7 finally fires: the purge
        # runs inside the recovered stateful operator — no emission
        feed("c.json", [{"uid": 7, "seq": 3, "et": "signup"}])
        out3 = run(frozenset([7]))
        assert all(r.uid != 7 for r in out3)

        # restart 3, suppression lifted: the key rebuilds from scratch —
        # events_seen 1 proves the checkpointed pre-erasure buffer
        # (2 events, 1 match) did not resurrect from the state store
        feed("d.json", [{"uid": 7, "seq": 4, "et": "signup"}])
        out4 = [r for r in run(None) if r.uid == 7]
        assert len(out4) == 1
        assert (out4[0].events_seen, out4[0].conv_matches) == (1, 0)

    def test_trending_suppressed_item_drops_retained_counter(self, spark, tmp_path):
        import json

        from etl_stream_spark.sources.file_source import read_cdc_file_stream
        from etl_stream_spark.streaming.trending import trending_items

        schema = "tok string"
        src = tmp_path / "toks"
        src.mkdir()
        (src / "a.json").write_text(
            "\n".join(json.dumps({"tok": t}) for t in ["pii", "pii", "keep", "keep"])
        )

        def run(suppressed):
            out: list = []
            stream = read_cdc_file_stream(spark, str(src), schema)
            q = (
                trending_items(
                    stream, "tok", capacity=8, num_shards=1,
                    suppressed_items=suppressed,
                )
                .writeStream.outputMode("append")
                .foreachBatch(lambda df, _eid: out.extend(df.collect()))
                .option("checkpointLocation", str(tmp_path / "ckpt_t"))
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120)
            return out

        first = {r.item: r.est for r in run(None)}
        assert first == {"pii": 2, "keep": 2}

        # forget 'pii'; the next batch touching the shard purges its
        # retained counter and never re-counts it
        (src / "b.json").write_text(
            "\n".join(json.dumps({"tok": t}) for t in ["keep", "pii"])
        )
        latest = {}
        for r in run(frozenset(["pii"])):
            if r.item not in latest or r.shard_rows > latest[r.item].shard_rows:
                latest[r.item] = r
        assert "pii" not in latest
        assert latest["keep"].est == 3
