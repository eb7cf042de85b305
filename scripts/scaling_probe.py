#!/usr/bin/env python
"""Strong-scaling probe: run a representative query set at sf0.1 under
several local[N] core counts (fresh session each), print one JSON line
per N. Evidence that the plans parallelize rather than serialize —
local mode shares one JVM, so speedups are bounded by scheduling
overhead and the probe is a smoke signal, not a cluster benchmark.

Usage: python scripts/scaling_probe.py [--cpus 4,16,32] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "q1_pricing_summary",
    "q21_waiting_suppliers",
    "cdc_final_state",
    "dedup_lsh_pairs",
    "corpus_curation_funnel",
    "knn_bruteforce",
]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from etl_stream_spark.catalog import CATALOG
from etl_stream_spark.session import get_spark
spark = get_spark(app_name="scaling_probe")
sf_dir = {sf_dir!r}
out = {{}}
for name in {queries!r}:
    CATALOG[name].fn(spark, sf_dir).count()  # warm-up: JIT, footers, plans
    t = time.time()
    CATALOG[name].fn(spark, sf_dir).count()
    out[name] = round(time.time() - t, 3)
print("PROBE_RESULT " + json.dumps(out))
spark.stop()
"""


_AMPLIFIED = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from etl_stream_spark.session import get_spark, load_table
from etl_stream_spark.cdc.dedup import last_writer_wins_agg

spark = get_spark(app_name="scaling_probe_amp")
path = {path!r}
out = {{}}

li = spark.read.parquet(path)
li.count()  # warm: footers + JIT

# scan + 2-key aggregate (the q1 shape)
t = time.time()
(li.groupBy("l_returnflag", "l_linestatus")
   .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
        F.count(F.lit(1)).alias("n"))).count()
out["scan_agg"] = round(time.time() - t, 3)

# full-log LWW replay (the flagship shape) on the amplified log
ev = li.select(F.col("l_orderkey").alias("k"),
               F.lpad((F.col("l_orderkey") * 7 + F.col("l_linenumber")).cast("string"), 20, "0").alias("sequence"),
               F.col("l_extendedprice").alias("v"))
t = time.time()
last_writer_wins_agg(ev, ["k"]).count()
out["lww_replay"] = round(time.time() - t, 3)

print("PROBE_RESULT " + json.dumps(out))
spark.stop()
"""


def _materialize_amplified(sf_dir: str, factor: int, dest: str) -> None:
    code = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from etl_stream_spark.session import get_spark, load_table
spark = get_spark(app_name="amplify")
li = load_table(spark, {sf_dir!r}, "lineitem")
big = (li.crossJoin(spark.range({factor}).select(F.col("id").alias("_rep")))
         .withColumn("l_orderkey", F.col("l_orderkey") * {factor} + F.col("_rep"))
         .drop("_rep"))
big.repartition(64).write.mode("overwrite").parquet({dest!r})
print("AMPLIFIED", spark.read.parquet({dest!r}).count())
spark.stop()
""".format(repo=REPO, sf_dir=sf_dir, factor=factor, dest=dest)
    subprocess.run([sys.executable, "-c", code], check=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", default="4,16,32")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--amplify",
        type=int,
        default=0,
        help="materialize lineitem×N to /tmp and probe scan-agg + LWW on it "
        "(sf0.1 alone is too small for parallelism to pay — per-task "
        "overhead dominates under ~1 GB)",
    )
    args = ap.parse_args()

    if args.amplify:
        dest = f"/tmp/scaling_lineitem_x{args.amplify}"
        if not os.path.exists(dest):
            _materialize_amplified(args.sf_dir, args.amplify, dest)
        for n in [int(c) for c in args.cpus.split(",")]:
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(n))
            code = _AMPLIFIED.format(repo=REPO, path=dest)
            proc = subprocess.run(
                [sys.executable, "-c", code], env=env, capture_output=True, text=True
            )
            line = next(
                (l for l in proc.stdout.splitlines() if l.startswith("PROBE_RESULT ")),
                None,
            )
            if line is None:
                print(json.dumps({"cpus": n, "error": proc.stderr[-500:]}))
                continue
            times = json.loads(line[len("PROBE_RESULT "):])
            print(json.dumps({"cpus": n, **times}))
        return

    for n in [int(c) for c in args.cpus.split(",")]:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(n))
        code = _CHILD.format(repo=REPO, sf_dir=args.sf_dir, queries=QUERIES)
        proc = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True, text=True
        )
        line = next(
            (l for l in proc.stdout.splitlines() if l.startswith("PROBE_RESULT ")),
            None,
        )
        if line is None:
            print(json.dumps({"cpus": n, "error": proc.stderr[-500:]}))
            continue
        times = json.loads(line[len("PROBE_RESULT "):])
        print(
            json.dumps(
                {"cpus": n, "total_sec": round(sum(times.values()), 3), "queries": times}
            )
        )


if __name__ == "__main__":
    main()
