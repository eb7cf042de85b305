#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()``
on DuckDB over the same parquet tables; compares row count, sorted column
names, and an order-insensitive value hash (values stringified with
stable formatting, columns sorted by name, rows sorted).

Usage: python scripts/check_correctness.py [--sf DIR] [--only name,...]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_value(v) -> str:
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from etl_stream_spark.session import get_spark

    spark = get_spark(app_name="check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{spark_s:.1f}s]")
            if len(srows) == 0:
                print(f"  WARN {name}: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            sh = table_hash([c.lower() for c in scols], srows)
            oh = table_hash([c.lower() for c in ocols], orows)
            if sh != oh:
                problems.append(f"hash {sh} vs {oh}")
                # show first diffs
                so = sorted(
                    "|".join(
                        norm_value(r[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i].lower())
                    )
                    for r in srows
                )
                oo = sorted(
                    "|".join(
                        norm_value(r[i])
                        for i in sorted(range(len(ocols)), key=lambda i: ocols[i].lower())
                    )
                    for r in orows
                )
                diffs = [(a, b) for a, b in zip(so, oo) if a != b][:3]
                for a, b in diffs:
                    print(f"    spark: {a}\n    duck : {b}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{spark_s:.1f}s]")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(srows)} rows match [{spark_s:.1f}s]")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
