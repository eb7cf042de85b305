#!/usr/bin/env python
"""Per-batch cost curves for the persisted incremental stores.

The small-file hazard in store form: if per-batch cost GROWS with batch
index, accumulated state (file count, index tail, history length) is
leaking into the hot path and the store is O(state) per batch, not
O(changes). This probe drives 50+ micro-batches through each store and
prints the per-batch seconds curve plus a first-half/second-half ratio
— flat (ratio ≈ 1) or compaction-sawtooth is a pass; monotone growth is
a fail.

Stores probed (one section each):

* ``ParquetMergeTable(merge_on_read=True)`` — the round-4 streaming
  engine: L0 appends + counter-gated compaction (sawtooth expected).
* ``Scd2Table.apply_batch``                — history grows forever; the
  per-batch merge must stay O(changes).
* ``PostingsIndex.upsert``                 — postings append + fwd merge.
* ``ChecksumStore.refresh``                — bucket-pruned recompute.

Usage: python scripts/store_cost_probe.py [--batches 50] [--rows 2000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def curve_stats(times: list[float]) -> dict:
    half = len(times) // 2
    first, second = times[:half], times[half:]
    return {
        "n": len(times),
        "mean_first_half_s": round(sum(first) / len(first), 3),
        "mean_second_half_s": round(sum(second) / len(second), 3),
        "growth_ratio": round((sum(second) / len(second)) / (sum(first) / len(first)), 2),
        "max_s": round(max(times), 3),
        "curve": [round(t, 3) for t in times],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=50)
    ap.add_argument("--rows", type=int, default=2000)
    ap.add_argument(
        "--deep-mor",
        action="store_true",
        help="depth probe: 500 batches into a 32-bucket merge-on-read "
        "table only — shows whether the compaction sawtooth period and "
        "drain cost stay bounded as bucket dirs accumulate generations",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_stream_spark.session import get_spark

    spark = get_spark(app_name="store_cost_probe")
    root = tempfile.mkdtemp(prefix="storeprobe_")
    B, R = args.batches, args.rows
    results: dict[str, dict] = {}

    def batch_df(i: int, keys: int = 500):
        # R rows, `keys` distinct ids, update-heavy — every batch touches
        # the same key space so state churns rather than only growing
        return spark.range(R).select(
            (F.col("id") % keys + 1).alias("id"),
            F.concat(F.lit(f"v{i}_"), F.col("id").cast("string")).alias("v"),
            (F.col("id") + i).cast("double").alias("x"),
            F.lit("UPDATE").alias("operation"),
            F.lpad((F.lit(i * R) + F.col("id")).cast("string"), 20, "0").alias(
                "sequence"
            ),
        )

    # -- merge-on-read streaming engine -------------------------------------
    from etl_stream_spark.cdc import ParquetMergeTable

    if args.deep_mor:
        # 10× batch count, 2× buckets: does the drain stay a bounded
        # sawtooth as every bucket dir accumulates compaction
        # generations of files? Drain cost must track L0 volume
        # (bounded by threshold × batch), not table age.
        B = 500 if args.batches == 50 else args.batches
        mor = ParquetMergeTable(
            spark, os.path.join(root, "mor_deep"), keys=["id"], num_buckets=32,
            merge_on_read=True, compact_threshold=8,
        )
        times = []
        for i in range(B):
            t0 = time.time()
            mor.merge(batch_df(i))
            times.append(time.time() - t0)
        st = curve_stats(times)
        # split the sawtooth: a drain batch pays the compaction rewrite
        med = sorted(times)[len(times) // 2]
        drains = [t for t in times if t > 3 * med]
        appends = [t for t in times if t <= 3 * med]
        half = len(times) // 2
        st["drain_batches"] = len(drains)
        st["drain_mean_s"] = round(sum(drains) / len(drains), 3) if drains else None
        st["drain_mean_first_half_s"] = round(
            sum(t for t in times[:half] if t > 3 * med)
            / max(1, len([t for t in times[:half] if t > 3 * med])), 3)
        st["drain_mean_second_half_s"] = round(
            sum(t for t in times[half:] if t > 3 * med)
            / max(1, len([t for t in times[half:] if t > 3 * med])), 3)
        st["append_mean_s"] = round(sum(appends) / len(appends), 3)
        results["merge_on_read_deep"] = st
        print(json.dumps(results, indent=2))
        print(
            f"# merge_on_read_deep: {B} batches, 32 buckets — append mean "
            f"{st['append_mean_s']}s, {st['drain_batches']} drains "
            f"(1st-half mean {st['drain_mean_first_half_s']}s → 2nd-half "
            f"{st['drain_mean_second_half_s']}s), overall ratio {st['growth_ratio']}",
            file=sys.stderr,
        )
        return 0

    mor = ParquetMergeTable(
        spark, os.path.join(root, "mor"), keys=["id"], num_buckets=16,
        merge_on_read=True, compact_threshold=8,
    )
    times = []
    for i in range(B):
        t0 = time.time()
        mor.merge(batch_df(i))
        times.append(time.time() - t0)
    results["merge_on_read"] = curve_stats(times)

    # -- SCD2 history --------------------------------------------------------
    from etl_stream_spark.cdc.scd2 import Scd2Table

    scd2 = Scd2Table(spark, os.path.join(root, "scd2"), keys=["id"], num_buckets=16)
    times = []
    for i in range(B):
        t0 = time.time()
        scd2.apply_batch(batch_df(i))
        times.append(time.time() - t0)
    results["scd2_apply_batch"] = curve_stats(times)

    # -- lexical postings index ----------------------------------------------
    from etl_stream_spark.operators.retrieval import PostingsIndex

    idx = PostingsIndex(spark, os.path.join(root, "lex"), num_term_buckets=16)
    docs0 = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma doc "), F.col("id").cast("string")).alias("text"),
    )
    idx.build(docs0)
    times = []
    for i in range(B):
        docs = spark.range(50).select(
            (F.col("id") + (i % 4) * 50).alias("doc_id"),
            F.concat(F.lit(f"round {i} delta epsilon "), F.col("id").cast("string")).alias(
                "text"
            ),
        )
        t0 = time.time()
        idx.upsert(docs)
        times.append(time.time() - t0)
    results["postings_upsert"] = curve_stats(times)

    # -- incremental IVF vector index ------------------------------------------
    from etl_stream_spark.operators.vector_index import IvfIndex

    def vec_batch(i: int, n: int = 500, dims: int = 16):
        # deterministic synthetic embeddings: churn the same id space so
        # upserts exercise moved-cell tombstones, not only inserts
        return spark.range(n).select(
            (F.col("id") + (i % 4) * n).alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dims - 1)),
                lambda p: ((F.col("id") * 31 + p * 17 + i * 7) % 97).cast("float") / 97,
            ).alias("embedding"),
        )

    ivf = IvfIndex(spark, os.path.join(root, "ivf"), nlist=8)
    ivf.build(vec_batch(0, n=2000), rounds=1)
    times = []
    for i in range(B):
        b = vec_batch(i)
        t0 = time.time()
        ivf.upsert(b)
        times.append(time.time() - t0)
    results["ivf_upsert"] = curve_stats(times)

    # -- replication checksum store ------------------------------------------
    from etl_stream_spark.operators.checksum import ChecksumStore

    tgt = ParquetMergeTable(spark, os.path.join(root, "ck_t"), keys=["id"], num_buckets=16)
    store = ChecksumStore(
        spark, os.path.join(root, "ck"), tgt, fingerprint_cols=["id", "v", "x"]
    )
    times = []
    for i in range(B):
        b = batch_df(i)
        tgt.merge(b)
        t0 = time.time()
        store.update(b)
        times.append(time.time() - t0)
    results["checksum_update"] = curve_stats(times)

    print(json.dumps(results, indent=2))
    for name, st in results.items():
        verdict = "FLAT" if st["growth_ratio"] < 1.35 else "GROWING"
        print(
            f"# {name}: first-half {st['mean_first_half_s']}s → "
            f"second-half {st['mean_second_half_s']}s (ratio {st['growth_ratio']}) {verdict}",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
