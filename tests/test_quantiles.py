"""Binned-quantile sketch: mergeability (histogram of union == sum of
part histograms), the error bound vs exact quantiles, and edge cases."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_stream_spark.operators.quantiles import binned_histogram, binned_quantiles


def _vals(spark, rows, schema="g string, v double"):
    return spark.createDataFrame(rows, schema)


class TestBinnedHistogram:
    def test_merge_property(self, spark):
        # histogram(A ∪ B) == histogram(A) + histogram(B) under a
        # PINNED domain — the property that makes the summary
        # incremental (each batch bins against the same edges, however
        # the rows are split).
        rows = [("a", float(i % 97)) for i in range(500)] + [
            ("b", float((i * 7) % 97)) for i in range(300)
        ]
        df = _vals(spark, rows)
        dom = (0.0, 96.0)
        whole = {
            (r.g, r.bin): r.cnt
            for r in binned_histogram(df, "v", 32, ["g"], domain=dom).collect()
        }
        h1 = df.filter(F.crc32(F.col("v").cast("string")) % 2 == 0)
        h2 = df.filter(F.crc32(F.col("v").cast("string")) % 2 == 1)
        merged: dict = {}
        for half in (h1, h2):
            for r in binned_histogram(half, "v", 32, ["g"], domain=dom).collect():
                merged[(r.g, r.bin)] = merged.get((r.g, r.bin), 0) + r.cnt
        assert merged == whole

    def test_pinned_domain_clamps_outliers(self, spark):
        df = _vals(spark, [("a", -5.0), ("a", 50.0), ("a", 500.0)])
        hist = {
            r.bin: r.cnt
            for r in binned_histogram(
                df, "v", 10, ["g"], domain=(0.0, 100.0)
            ).collect()
        }
        assert hist == {0: 1, 5: 1, 9: 1}

    def test_counts_cover_all_rows(self, spark):
        df = _vals(spark, [("a", float(i)) for i in range(100)] + [("a", None)])
        hist = binned_histogram(df, "v", 8, ["g"])
        assert hist.agg(F.sum("cnt")).first()[0] == 100  # null excluded


class TestBinnedQuantiles:
    def test_error_bound_vs_exact(self, spark):
        import random

        rng = random.Random(7)
        vals = [rng.uniform(0.0, 1000.0) for _ in range(2000)]
        df = _vals(spark, [("a", v) for v in vals])
        bins = 256
        width = (max(vals) - min(vals)) / bins
        got = {
            r.prob: r.q_est
            for r in binned_quantiles(df, "v", [0.1, 0.5, 0.9], bins, ["g"]).collect()
        }
        s = sorted(vals)
        for p in (0.1, 0.5, 0.9):
            exact = s[math.ceil(p * len(s)) - 1]  # lower (disc) quantile
            assert abs(got[p] - exact) <= width / 2 + 1e-9, (p, got[p], exact)

    def test_degenerate_single_value_domain(self, spark):
        df = _vals(spark, [("a", 42.0)] * 10 + [("b", 42.0)] * 3)
        rows = binned_quantiles(df, "v", [0.5], 64, ["g"]).collect()
        assert {(r.g, r.prob, r.q_est) for r in rows} == {
            ("a", 0.5, 42.0),
            ("b", 0.5, 42.0),
        }

    def test_histogram_store_split_invariance(self, spark, tmp_path):
        from etl_stream_spark.operators.quantiles import HistogramStore

        rows = [("a", float(i % 97)) for i in range(600)] + [
            ("b", float((i * 11) % 97)) for i in range(400)
        ]
        df = _vals(spark, rows)
        dom = (0.0, 96.0)
        store = HistogramStore(
            spark, str(tmp_path / "h"), ["g"], "v", domain=dom, num_bins=32
        )
        # three uneven batches; counts must equal the one-shot histogram
        for lo, hi in ((0, 100), (100, 350), (350, len(rows))):
            store.update(_vals(spark, rows[lo:hi]))
        got = {
            (r.g, r.bin): r.cnt for r in store.histogram().collect()
        }
        want = {
            (r.g, r.bin): r.cnt
            for r in binned_histogram(df, "v", 32, ["g"], domain=dom).collect()
        }
        assert got == want
        # quantile read-off equals the one-shot sketch, across a restart
        reopened = HistogramStore(
            spark, str(tmp_path / "h"), ["g"], "v", domain=dom, num_bins=32
        )
        got_q = {
            (r.g, r.prob): r.q_est for r in reopened.quantiles([0.5, 0.9]).collect()
        }
        want_q = {
            (r.g, r.prob): r.q_est
            for r in binned_quantiles(df, "v", [0.5, 0.9], 32, ["g"]).collect()
        }
        # note: binned_quantiles derives its domain from the data, which
        # here coincides with the pinned [0, 96]
        assert got_q == want_q

    def test_global_ungrouped(self, spark):
        df = _vals(spark, [("x", float(i)) for i in range(1, 101)])
        rows = binned_quantiles(df, "v", [0.5], 1000).collect()
        assert len(rows) == 1
        assert abs(rows[0].q_est - 50.0) <= (99.0 / 1000) / 2 + 1e-9


def test_streaming_histogram_maintenance(spark, tmp_path):
    """HistogramStore under the streaming runtime: micro-batches via
    foreachBatch yield the same bin counts and quantiles as the
    one-shot histogram of the full data."""
    import json

    from etl_stream_spark.operators.quantiles import HistogramStore

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(json.dumps({"g": "x", "v": float(i % 97)}) for i in range(300))
    )
    (src / "b.json").write_text(
        "\n".join(json.dumps({"g": "x", "v": float((i * 3) % 97)}) for i in range(200))
    )
    dom = (0.0, 96.0)
    store = HistogramStore(
        spark, str(tmp_path / "h"), ["g"], "v", domain=dom, num_bins=16
    )
    stream = (
        spark.readStream.schema("g string, v double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(lambda df, _eid: store.update(df))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)

    full = spark.createDataFrame(
        [("x", float(i % 97)) for i in range(300)]
        + [("x", float((i * 3) % 97)) for i in range(200)],
        "g string, v double",
    )
    want = {
        (r.g, r.bin): r.cnt
        for r in binned_histogram(full, "v", 16, ["g"], domain=dom).collect()
    }
    got = {(r.g, r.bin): r.cnt for r in store.histogram().collect()}
    assert got == want
    want_q = {
        (r.g, r.prob): r.q_est
        for r in binned_quantiles(full, "v", [0.5], 16, ["g"]).collect()
    }
    got_q = {(r.g, r.prob): r.q_est for r in store.quantiles([0.5]).collect()}
    assert got_q == want_q


def test_empty_store_quantiles_returns_empty(spark, tmp_path):
    from etl_stream_spark.operators.quantiles import HistogramStore

    store = HistogramStore(
        spark, str(tmp_path / "never"), ["g"], "v", domain=(0.0, 1.0), num_bins=8
    )
    assert store.quantiles([0.5]).count() == 0
