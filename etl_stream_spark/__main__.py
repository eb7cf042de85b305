"""Command-line entry point: drive the engine without writing a script.

    python -m etl_stream_spark list [--grep SUBSTR]
    python -m etl_stream_spark run ENTRY [--sf DIR] [--limit N] [--explain]
    python -m etl_stream_spark oracle ENTRY
    python -m etl_stream_spark check ENTRY[,ENTRY...] [--sf DIR]

`run` executes one catalog entry against an sf directory and prints the
result (driver-side display only — the query itself stays distributed);
`--explain` prints the formatted physical plan instead of rows. `oracle`
prints the entry's DuckDB oracle SQL. `check` delegates to the same
compare `scripts/check_correctness.py` runs (row count, column names,
order-insensitive value hash) for a comma-separated subset.
"""

from __future__ import annotations

import argparse
import os
import sys


def _parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="python -m etl_stream_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list catalog entries")
    p_list.add_argument("--grep", default=None, help="substring filter")

    p_run = sub.add_parser("run", help="run one entry and print rows")
    p_run.add_argument("entry")
    p_run.add_argument("--sf", default="/root/testdata/sf0.01")
    p_run.add_argument("--limit", type=int, default=20)
    p_run.add_argument(
        "--explain", action="store_true", help="print the plan, not rows"
    )

    p_or = sub.add_parser("oracle", help="print an entry's DuckDB oracle SQL")
    p_or.add_argument("entry")

    p_chk = sub.add_parser("check", help="oracle-compare a subset of entries")
    p_chk.add_argument("entries", help="comma-separated entry names")
    p_chk.add_argument("--sf", default="/root/testdata/sf0.01")
    return ap


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)
    from etl_stream_spark.catalog import CATALOG

    if args.cmd == "list":
        for name, qd in CATALOG.items():
            if args.grep and args.grep not in name:
                continue
            doc = (qd.fn.__doc__ or "").strip().split("\n")[0]
            print(f"{name:34s} {doc}")
        return 0

    if args.cmd == "oracle":
        qd = CATALOG.get(args.entry)
        if qd is None:
            print(f"unknown entry {args.entry!r}", file=sys.stderr)
            return 1
        if qd.oracle is None:
            print(f"-- {args.entry}: no oracle (rows-only entry)")
            return 0
        print(qd.oracle.strip())
        return 0

    if args.cmd == "check":
        # delegate to the canonical compare so the CLI cannot drift
        # from what the driver actually verifies
        import subprocess

        script = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "check_correctness.py",
        )
        return subprocess.call(
            [sys.executable, script, "--sf", args.sf, "--only", args.entries]
        )

    # run
    qd = CATALOG.get(args.entry)
    if qd is None:
        print(f"unknown entry {args.entry!r}", file=sys.stderr)
        return 1
    from etl_stream_spark.session import get_spark

    spark = get_spark(app_name=f"cli_{args.entry}")
    try:
        df = qd.fn(spark, args.sf)
        if args.explain:
            jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
            print(
                df._jdf.queryExecution().explainString(
                    jmode.fromString("formatted")
                )
            )
        else:
            df.show(args.limit, truncate=False)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
