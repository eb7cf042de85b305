"""Streaming trending items: keyed MG state across micro-batches and
the survival guarantee under decrement pressure."""

from __future__ import annotations

import json

from etl_stream_spark.sources.file_source import read_cdc_file_stream
from etl_stream_spark.streaming.trending import trending_items


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


def test_state_accumulates_across_batches(spark, tmp_path):
    src = tmp_path / "items"
    src.mkdir()
    # two files → two micro-batches under maxFilesPerTrigger=1
    (src / "a.json").write_text(
        "\n".join(json.dumps({"item": "x"}) for _ in range(5))
    )
    (src / "b.json").write_text(
        "\n".join(json.dumps({"item": it}) for it in ["x"] * 3 + ["y"] * 2)
    )
    stream = read_cdc_file_stream(
        spark, str(src), "item string", max_files_per_trigger=1
    )
    _run(trending_items(stream, "item", capacity=8, num_shards=1), tmp_path, "t1")
    rows = spark.sql("SELECT * FROM t1").collect()
    # one snapshot per batch; the LAST x row carries the cumulative count
    xs = sorted(r.est for r in rows if r.item == "x")
    assert xs[-1] == 8  # 5 + 3 across the two batches
    final = {r.item: r.est for r in rows if r.shard_rows == 10}
    assert final == {"x": 8, "y": 2}


def test_hot_item_survives_decrement_pressure(spark, tmp_path):
    src = tmp_path / "skewed"
    src.mkdir()
    # 40% hot item over a 50-key tail, capacity 8 << 51 distinct
    items = (["hot"] * 200) + [f"t{i % 50}" for i in range(300)]
    (src / "s.json").write_text("\n".join(json.dumps({"item": it}) for it in items))
    stream = read_cdc_file_stream(spark, str(src), "item string")
    _run(trending_items(stream, "item", capacity=8, num_shards=1), tmp_path, "t2")
    rows = {r.item: r for r in spark.sql("SELECT * FROM t2").collect()}
    assert len(rows) <= 8
    assert "hot" in rows  # 200 > 500/(8+1): guaranteed to survive
    hot = rows["hot"]
    assert 0 < hot.est <= 200 and 200 - hot.est <= 500 // 9
    assert hot.shard_rows == 500
