"""Incremental SCD2 maintenance (`cdc/scd2.py`) — the replayed history
must equal the sequential oracle no matter how the log is cut into
micro-batches, and stale cross-batch events must be rejected."""

from __future__ import annotations

import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_stream_spark.cdc import OP_DELETE, OP_INSERT, OP_UPDATE, Scd2Table

KEYS = [1, 2, 3]
OPS = [OP_INSERT, OP_UPDATE, OP_DELETE]

event_st = st.tuples(
    st.sampled_from(OPS),
    st.sampled_from(KEYS),
    st.integers(min_value=0, max_value=9),
)
log_st = st.lists(event_st, min_size=1, max_size=12)
cuts_st = st.lists(st.integers(min_value=1, max_value=11), max_size=3, unique=True)


def seq(i: int) -> str:
    return f"{i:020d}"


def oracle_history(events):
    """Sequential replay: each event closes the key's open interval at
    its sequence; INSERT/UPDATE opens a new version, DELETE does not.
    Returns {(key, valid_from): (payload, valid_to)}."""
    versions: dict[tuple[int, str], tuple[int, str | None]] = {}
    open_at: dict[int, str] = {}
    for op, key, payload, s in events:
        if key in open_at:
            frm = open_at.pop(key)
            pay, _ = versions[(key, frm)]
            versions[(key, frm)] = (pay, s)
        if op != OP_DELETE:
            versions[(key, s)] = (payload, None)
            open_at[key] = s
    return versions


def replay(spark, tmp, events, cut_points):
    t = Scd2Table(spark, f"{tmp}/scd2_{uuid.uuid4().hex}", keys=["id"], num_buckets=4)
    bounds = sorted({c for c in cut_points if c < len(events)}) + [len(events)]
    start = 0
    for end in bounds:
        if end <= start:
            continue
        chunk = events[start:end]
        start = end
        df = spark.createDataFrame(
            [(k, p, op, s) for op, k, p, s in chunk],
            "id long, v long, operation string, sequence string",
        )
        t.apply_batch(df)
    return t


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(log=log_st, cuts=cuts_st)
def test_incremental_history_matches_sequential_oracle(spark, tmp_path, log, cuts):
    events = [(op, k, p, seq(i + 1)) for i, (op, k, p) in enumerate(log)]
    t = replay(spark, str(tmp_path), events, cuts)
    got = {
        (r["id"], r["valid_from_seq"]): (r["v"], r["valid_to_seq"])
        for r in t.read().collect()
    }
    assert got == oracle_history(events)


def test_is_current_flags_and_delete_closure(spark, tmp_path):
    events = [
        (OP_INSERT, 1, 10, seq(1)),
        (OP_UPDATE, 1, 11, seq(2)),
        (OP_INSERT, 2, 20, seq(3)),
        (OP_DELETE, 2, 0, seq(4)),
    ]
    t = replay(spark, str(tmp_path), events, [2])
    rows = {(r["id"], r["valid_from_seq"]): r for r in t.read().collect()}
    assert rows[(1, seq(1))]["valid_to_seq"] == seq(2)
    assert not rows[(1, seq(1))]["is_current"]
    assert rows[(1, seq(2))]["valid_to_seq"] is None
    assert rows[(1, seq(2))]["is_current"]
    # deleted key: version closed at the delete, nothing current
    assert rows[(2, seq(3))]["valid_to_seq"] == seq(4)
    assert not any(r["is_current"] for (k, _), r in rows.items() if k == 2)


def test_stale_cross_batch_event_rejected(spark, tmp_path):
    t = Scd2Table(spark, str(tmp_path / "t"), keys=["id"], num_buckets=4)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "id long, v long, operation string, sequence string"
    )
    t.apply_batch(mk([(1, 10, OP_INSERT, seq(5))]))
    # stale update (older than the open version) must not rewrite history
    t.apply_batch(mk([(1, 99, OP_UPDATE, seq(3))]))
    rows = t.read().collect()
    assert len(rows) == 1
    assert rows[0]["v"] == 10 and rows[0]["valid_from_seq"] == seq(5)
    assert rows[0]["is_current"]


def test_pipeline_history_with_truncate_barrier(spark, tmp_path):
    """CdcBatchApplier with a history target: pre-truncate versions are
    RECORDED (closed at the truncate seq) while the merge target drops
    them — the two truncate semantics side by side."""
    from pyspark.sql import functions as F

    from etl_stream_spark.cdc import OP_TRUNCATE
    from etl_stream_spark.cdc.pipeline import CdcBatchApplier, CdcTableConfig

    hist = Scd2Table(spark, str(tmp_path / "hist"), keys=["id"], num_buckets=4)
    applier = CdcBatchApplier(
        spark,
        str(tmp_path / "silver"),
        {"t": CdcTableConfig(keys=["id"], num_buckets=4)},
        histories={"t": hist},
    )
    rows = [
        (1, 10, OP_INSERT, seq(1), "t"),
        (1, 11, OP_UPDATE, seq(2), "t"),
        (None, None, OP_TRUNCATE, seq(3), "t"),
        (2, 20, OP_INSERT, seq(4), "t"),
    ]
    batch = spark.createDataFrame(
        rows, "id long, v long, operation string, sequence string, table string"
    )
    applier.apply_batch(batch)

    # merge target: only the post-truncate row survives
    silver = {(r["id"], r["v"]) for r in applier.target("t").read().collect()}
    assert silver == {(2, 20)}

    # history: pre-truncate versions recorded, closed at the truncate
    h = {
        (r["id"], r["valid_from_seq"]): (r["valid_to_seq"], r["is_current"])
        for r in hist.read().collect()
    }
    assert h[(1, seq(1))] == (seq(2), False)
    assert h[(1, seq(2))] == (seq(3), False)  # closed BY the truncate
    assert h[(2, seq(4))] == (None, True)


def test_compact_closed_shrinks_files_preserves_history(spark, tmp_path):
    t = Scd2Table(spark, str(tmp_path / "t"), keys=["id"], num_buckets=2)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "id long, v long, operation string, sequence string"
    )
    for i in range(1, 5):  # 4 batches → 4 append rounds of closed files
        t.apply_batch(mk([(1, i, OP_UPDATE if i > 1 else OP_INSERT, seq(i))]))
    before = {
        (r["id"], r["valid_from_seq"], r["valid_to_seq"]) for r in t.read().collect()
    }
    from etl_stream_spark.plans.compaction import parquet_files

    n_before = len(parquet_files(t.closed_path))
    out = t.compact_closed(target_file_bytes=1 << 30)
    assert not out["skipped"]
    assert out["files_after"] < n_before
    after = {
        (r["id"], r["valid_from_seq"], r["valid_to_seq"]) for r in t.read().collect()
    }
    assert after == before


def test_schema_evolution_through_history(spark, tmp_path):
    """A later batch adds a column: old closed versions read as NULL for
    it, the new version carries it; a narrower batch afterwards carries
    the stored value forward (merge-engine evolution semantics)."""
    t = Scd2Table(spark, str(tmp_path / "t"), keys=["id"], num_buckets=2)
    t.apply_batch(
        spark.createDataFrame(
            [(1, 10, OP_INSERT, seq(1))],
            "id long, v long, operation string, sequence string",
        )
    )
    t.apply_batch(
        spark.createDataFrame(
            [(1, 11, "a@x", OP_UPDATE, seq(2))],
            "id long, v long, email string, operation string, sequence string",
        )
    )
    t.apply_batch(
        spark.createDataFrame(
            [(1, 12, OP_UPDATE, seq(3))],
            "id long, v long, operation string, sequence string",
        )
    )
    rows = {r["valid_from_seq"]: r for r in t.read().collect()}
    assert rows[seq(1)]["email"] is None and rows[seq(1)]["valid_to_seq"] == seq(2)
    assert rows[seq(2)]["email"] == "a@x" and rows[seq(2)]["valid_to_seq"] == seq(3)
    # narrow batch: open version carries the stored email forward
    assert rows[seq(3)]["email"] == "a@x" and rows[seq(3)]["is_current"]


def test_as_of_reads_match_log_replay(spark, tmp_path):
    """History-indexed AS OF must agree with the sequential oracle's
    state at every sequence point of the log."""
    events = [
        (OP_INSERT, 1, 10, seq(1)),
        (OP_INSERT, 2, 20, seq(2)),
        (OP_UPDATE, 1, 11, seq(3)),
        (OP_DELETE, 2, 0, seq(4)),
        (OP_INSERT, 3, 30, seq(5)),
        (OP_UPDATE, 1, 12, seq(6)),
    ]
    t = replay(spark, str(tmp_path), events, [2, 4])

    def oracle_state(upto: str):
        state = {}
        for op, k, p, s in events:
            if s > upto:
                break
            if op == OP_DELETE:
                state.pop(k, None)
            else:
                state[k] = (p, s)
        return state

    for i in range(1, 7):
        got = {
            r["id"]: (r["v"], r["valid_from_seq"])
            for r in t.as_of(seq(i)).collect()
        }
        assert got == oracle_state(seq(i)), f"as_of({i})"


def test_streaming_scd2_maintenance(spark, tmp_path):
    """History maintenance under the real streaming runtime: two source
    files → two micro-batches through foreachBatch with a checkpoint;
    the history equals the sequential oracle over the full log."""
    import json

    src = tmp_path / "src"
    src.mkdir()
    b1 = [
        {"id": 1, "v": 10, "operation": OP_INSERT, "sequence": seq(1)},
        {"id": 1, "v": 11, "operation": OP_UPDATE, "sequence": seq(2)},
    ]
    b2 = [
        {"id": 1, "v": 12, "operation": OP_UPDATE, "sequence": seq(3)},
        {"id": 2, "v": 20, "operation": OP_INSERT, "sequence": seq(4)},
    ]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in b1))
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in b2))

    hist = Scd2Table(spark, str(tmp_path / "hist"), keys=["id"], num_buckets=4)
    stream = (
        spark.readStream.schema("id long, v long, operation string, sequence string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(lambda df, _eid: hist.apply_batch(df))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["id"], r["valid_from_seq"]): (r["valid_to_seq"], r["is_current"])
        for r in hist.read().collect()
    }
    assert got == {
        (1, seq(1)): (seq(2), False),
        (1, seq(2)): (seq(3), False),
        (1, seq(3)): (None, True),
        (2, seq(4)): (None, True),
    }
