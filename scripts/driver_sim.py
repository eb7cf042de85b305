#!/usr/bin/env python
"""Clean-environment driver simulation: run the __spark_entry__ contract
the way the grading driver does — a host-built SparkSession, the module
imported by file path, NO repo PYTHONPATH in the environment.

This catches env-dependence the oracle gate can't (round-2 example: the
pandas-path operators failed with ModuleNotFoundError in executor
workers until session.ensure_worker_imports shipped the package zip).

Usage:  env -u PYTHONPATH python scripts/driver_sim.py [--sf DIR] [--first N]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--first", type=int, default=None, help="only the first N entries")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    # driver posture: repo importable for the DRIVER process only; the
    # executor side must be covered by the package's own shipping
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("driver_sim")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rows = mod.entry(spark).collect()
    print(f"ENTRY: {len(rows)} rows")

    only = set(args.only.split(",")) if args.only else None
    fails: list[str] = []
    for i, (name, fn) in enumerate(mod.queries().items()):
        if args.first is not None and i >= args.first:
            break
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            n = len(fn(spark, args.sf).collect())
            print(f"OK   {name}: {n} rows [{time.time() - t0:.1f}s]", flush=True)
        except Exception as e:  # noqa: BLE001
            fails.append(name)
            print(f"FAIL {name}: {str(e)[:200]}", flush=True)
    print(f"DONE: {len(fails)} failures {fails}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
