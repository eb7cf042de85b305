"""ChecksumStore: incrementally maintained replication checksums.

Contract under test (operators/checksum.py::ChecksumStore):
* split-invariance — a store maintained over ANY batch split of a CDC
  log equals the one-shot bucket checksum of the final table state;
* deletes and upserts refresh the touched buckets only, and the stored
  map still matches a full recompute;
* restart safety — a fresh instance over the persisted path agrees;
* verify() is empty exactly when the store is faithful.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_stream_spark.cdc import OP_DELETE, OP_INSERT, OP_UPDATE, ParquetMergeTable
from etl_stream_spark.operators.checksum import ChecksumStore

from etl_stream_spark.cdc import make_sequence

EVENT_SCHEMA = "id long, name string, qty long, operation string, sequence string"


def ev(id_, name, qty, op, seq_idx):
    return (id_, name, qty, op, make_sequence(1_700_000_000_000_000, seq_idx))


def make_batch(spark, rows):
    return spark.createDataFrame(rows, EVENT_SCHEMA)

FP_COLS = ["id", "name", "qty"]


@pytest.fixture()
def target(spark, tmp_path):
    return ParquetMergeTable(spark, str(tmp_path / "t"), keys=["id"], num_buckets=4)


def checksum_map(store):
    return {r.bucket: (r.n_rows, r.xor_fp) for r in store.read().collect()}


class TestChecksumStore:
    def test_split_invariance_and_verify(self, spark, tmp_path, target):
        rows = [ev(i, f"n{i}", i * 10, OP_INSERT, i) for i in range(40)]
        rows += [ev(i, f"m{i}", i * 11, OP_UPDATE, 100 + i) for i in range(0, 40, 3)]
        rows += [ev(i, None, None, OP_DELETE, 200 + i) for i in range(0, 40, 7)]

        store = ChecksumStore(spark, str(tmp_path / "cs"), target, FP_COLS)
        for lo, hi in [(0, 25), (25, 47), (47, len(rows))]:
            batch = make_batch(spark, rows[lo:hi])
            target.merge(batch)
            store.update(batch)

        # one-shot recompute of the final state == the maintained store
        assert store.verify().count() == 0

        # and the map itself matches a from-scratch bucket pass
        oneshot = {
            r.bucket: (r.n_rows, r.xor_fp) for r in store._fresh(None).collect()
        }
        assert checksum_map(store) == oneshot
        # rows: 40 inserted, ceil(40/7)=6 deleted
        assert sum(n for n, _ in oneshot.values()) == 40 - 6

    def test_untouched_buckets_carry_over(self, spark, tmp_path, target):
        first = make_batch(spark, [ev(i, f"n{i}", i, OP_INSERT, i) for i in range(20)])
        store = ChecksumStore(spark, str(tmp_path / "cs"), target, FP_COLS)
        target.merge(first)
        store.update(first)
        before = checksum_map(store)

        # a single-key batch touches exactly one bucket
        one = make_batch(spark, [ev(3, "changed", 999, OP_UPDATE, 500)])
        target.merge(one)
        store.update(one)
        after = checksum_map(store)

        changed = {b for b in after if after[b] != before.get(b)}
        assert len(changed) == 1
        assert store.verify().count() == 0

    def test_restart_safe(self, spark, tmp_path, target):
        batch = make_batch(spark, [ev(i, f"n{i}", i, OP_INSERT, i) for i in range(10)])
        path = str(tmp_path / "cs")
        store = ChecksumStore(spark, path, target, FP_COLS)
        target.merge(batch)
        store.update(batch)

        reopened = ChecksumStore(spark, path, target, FP_COLS)
        assert checksum_map(reopened) == checksum_map(store)
        assert reopened.verify().count() == 0

    def test_verify_flags_drift(self, spark, tmp_path, target):
        batch = make_batch(spark, [ev(i, f"n{i}", i, OP_INSERT, i) for i in range(10)])
        store = ChecksumStore(spark, str(tmp_path / "cs"), target, FP_COLS)
        target.merge(batch)
        store.update(batch)

        # merge more data WITHOUT updating the store → stale buckets
        drift = make_batch(spark, [ev(i, "x", 0, OP_UPDATE, 100 + i) for i in (1, 2)])
        target.merge(drift)
        assert store.verify().count() >= 1


def test_streaming_checksum_maintenance(spark, tmp_path):
    """ChecksumStore under the streaming runtime: CDC micro-batches via
    foreachBatch (merge then update, the deployment loop) leave the
    stored parity map equal to a full recompute of the final state."""
    import json

    src = tmp_path / "src"
    src.mkdir()
    half1 = [
        {"id": i, "name": f"n{i}", "qty": i, "operation": OP_INSERT,
         "sequence": make_sequence(1, i)}
        for i in range(25)
    ]
    half2 = [
        {"id": i, "name": "upd", "qty": i * 2, "operation": OP_UPDATE,
         "sequence": make_sequence(2, i)}
        for i in range(0, 25, 4)
    ] + [
        {"id": i, "name": None, "qty": None, "operation": OP_DELETE,
         "sequence": make_sequence(3, i)}
        for i in range(0, 25, 9)
    ]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in half1))
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in half2))

    target = ParquetMergeTable(spark, str(tmp_path / "t"), keys=["id"], num_buckets=4)
    store = ChecksumStore(spark, str(tmp_path / "cs"), target, FP_COLS)

    def apply(df, _eid):
        target.merge(df)
        store.update(df)

    stream = (
        spark.readStream.schema(
            "id long, name string, qty long, operation string, sequence string"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert store.verify().count() == 0
    assert sum(r.n_rows for r in store.read().collect()) == 25 - 3  # ceil(25/9)=3
