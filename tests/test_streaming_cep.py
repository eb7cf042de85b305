"""Streaming CEP (streaming/cep.py): keyed pattern state across
micro-batches, out-of-order repair, and parity with the batch
operator."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from etl_stream_spark.operators.cep import match_pattern
from etl_stream_spark.sources.file_source import read_cdc_file_stream
from etl_stream_spark.streaming.cep import pattern_matches

SYMS = {"signup": "s", "purchase": "p", "error": "e"}
PATTERNS = {"conv": "s[^e]*p", "pe": "pe"}
SCHEMA = "uid long, seq long, et string"


def _run(stream, tmp_path, name):
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)


def _latest(spark, name):
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    out = {}
    for r in rows:
        if r.uid not in out or r.events_seen > out[r.uid].events_seen:
            out[r.uid] = r
    return out


def test_out_of_order_events_repair_counts(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    # batch 1: signup .. purchase with a GAP at seq 2
    (src / "a.json").write_text(
        "\n".join(
            json.dumps(d)
            for d in [
                {"uid": 1, "seq": 1, "et": "signup"},
                {"uid": 1, "seq": 3, "et": "purchase"},
            ]
        )
    )
    # batch 2: the late seq-2 event is an ERROR — it must slot BETWEEN
    # the earlier events and retract the conversion a forward-only
    # matcher would have kept
    (src / "b.json").write_text(
        json.dumps({"uid": 1, "seq": 2, "et": "error"})
    )
    stream = read_cdc_file_stream(spark, str(src), SCHEMA, max_files_per_trigger=1)
    _run(
        pattern_matches(stream, "uid", "seq", "et", SYMS, PATTERNS),
        tmp_path,
        "cep1",
    )
    gens = sorted(
        (r.events_seen, r.conv_matches)
        for r in spark.sql("SELECT * FROM cep1").collect()
    )
    # first emission saw 'sp' (1 conversion); the late error makes 'sep' (0)
    assert gens == [(2, 1), (3, 0)]


def test_max_buffer_bounds_state_and_windows_counts(spark, tmp_path):
    """With max_buffer, only the trailing window of (order, symbol)
    pairs is retained: counts become windowed, events_seen stays
    cumulative (strictly increasing), and a late event older than the
    window is dropped, not repaired."""
    src = tmp_path / "evb"
    src.mkdir()
    # batch 1: s p s p  (seqs 1-4); batch 2: one late error at seq 2
    (src / "a.json").write_text(
        "\n".join(
            json.dumps({"uid": 1, "seq": q, "et": t})
            for q, t in [(1, "signup"), (2, "purchase"), (3, "signup"), (4, "purchase")]
        )
    )
    (src / "b.json").write_text(json.dumps({"uid": 1, "seq": 2, "et": "error"}))
    stream = read_cdc_file_stream(spark, str(src), SCHEMA, max_files_per_trigger=1)
    _run(
        pattern_matches(
            stream, "uid", "seq", "et", SYMS, {"pe": "pe"}, max_buffer=2
        ),
        tmp_path,
        "cepb",
    )
    gens = {r.events_seen: r.pe_matches for r in spark.sql("SELECT * FROM cepb").collect()}
    # batch 1: buffer trails to 'sp' (seqs 3,4) → no 'pe'; the late
    # seq-2 error predates the retained window → dropped, counts stay
    assert gens == {4: 0, 5: 0}


def test_state_survives_stream_restart(spark, tmp_path):
    """Keyed pattern state must persist across SEPARATE stream runs
    sharing one checkpoint — the crash/redeploy recovery contract: the
    second run resumes from the stored (order, symbol) buffers, so its
    counts reflect the whole history, not just the new file."""
    src = tmp_path / "ev3"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(
            json.dumps(d)
            for d in [
                {"uid": 1, "seq": 1, "et": "signup"},
                {"uid": 1, "seq": 2, "et": "purchase"},
            ]
        )
    )

    out = tmp_path / "out"

    def run_once():
        # parquet sink: the memory sink refuses checkpoint recovery
        stream = read_cdc_file_stream(spark, str(src), SCHEMA)
        q = (
            pattern_matches(stream, "uid", "seq", "et", SYMS, PATTERNS)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt_shared"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    def latest():
        rows = spark.read.parquet(str(out)).collect()
        best = {}
        for r in rows:
            if r.uid not in best or r.events_seen > best[r.uid].events_seen:
                best[r.uid] = r
        return best

    run_once()
    assert latest()[1].conv_matches == 1
    # stream stops; a later file arrives; a NEW run resumes the state
    (src / "b.json").write_text(
        "\n".join(
            json.dumps(d)
            for d in [
                {"uid": 1, "seq": 3, "et": "signup"},
                {"uid": 1, "seq": 4, "et": "purchase"},
            ]
        )
    )
    run_once()
    final = latest()[1]
    # events_seen == 4 proves the first run's buffer was recovered from
    # the checkpoint (a fresh state would report 2); greedy 's[^e]*p'
    # spans the whole 'spsp' → still one non-overlapping match, exactly
    # as the batch operator counts it
    assert (final.events_seen, final.conv_matches) == (4, 1)


def test_snapshot_equals_batch_operator(spark, tmp_path):
    src = tmp_path / "ev2"
    src.mkdir()
    rows = [
        {"uid": u, "seq": s, "et": ["signup", "purchase", "error"][(u + s) % 3]}
        for u in range(6)
        for s in range(9)
    ]
    # split across two files → two micro-batches
    (src / "a.json").write_text("\n".join(json.dumps(d) for d in rows[::2]))
    (src / "b.json").write_text("\n".join(json.dumps(d) for d in rows[1::2]))
    stream = read_cdc_file_stream(spark, str(src), SCHEMA, max_files_per_trigger=1)
    _run(
        pattern_matches(stream, "uid", "seq", "et", SYMS, PATTERNS),
        tmp_path,
        "cep2",
    )
    got = {
        uid: (r.conv_matches, r.pe_matches) for uid, r in _latest(spark, "cep2").items()
    }
    batch = spark.createDataFrame([(d["uid"], d["seq"], d["et"]) for d in rows], SCHEMA)
    want = {
        r.uid: (r.conv_matches, r.pe_matches)
        for r in match_pattern(
            batch, ["uid"], ["seq"], "et", SYMS, PATTERNS
        ).collect()
    }
    assert got == want
