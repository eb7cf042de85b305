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


def _spark_type_problems(schema) -> list[str]:
    """Round-1 lesson (CORRECTNESS_r01): the driver's hash normalizer is
    stricter than ``norm_value`` — every query that emitted a DECIMAL
    column (or whose oracle returned HUGEINT) failed ``hash_match``
    despite byte-identical local values.  Enforce the boundary-type
    convention mechanically: integral outputs are 64-bit, fractional
    outputs are DOUBLE, nothing else crosses the driver boundary.
    """
    from pyspark.sql import types as T

    bad: list[str] = []

    def walk(name: str, dt) -> None:
        if isinstance(dt, T.DecimalType):
            bad.append(f"{name}:{dt.simpleString()}")
        elif isinstance(dt, (T.FloatType, T.IntegerType, T.ShortType, T.ByteType)):
            bad.append(f"{name}:{dt.simpleString()}")
        elif isinstance(dt, T.ArrayType):
            walk(name + "[]", dt.elementType)
        elif isinstance(dt, T.MapType):
            walk(name + ".key", dt.keyType)
            walk(name + ".val", dt.valueType)
        elif isinstance(dt, T.StructType):
            for f in dt.fields:
                walk(f"{name}.{f.name}", f.dataType)

    for f in schema.fields:
        walk(f.name, f.dataType)
    return bad


_DUCK_BAD_TYPES = ("DECIMAL", "HUGEINT", "INT128", "REAL", "FLOAT4")
_DUCK_NARROW_INTS = ("TINYINT", "SMALLINT", "INTEGER", "UTINYINT", "USMALLINT", "UINTEGER")


def _duck_type_problems(cols: list[str], types) -> list[str]:
    bad: list[str] = []
    for c, t in zip(cols, types):
        s = str(t).upper()
        if any(b in s for b in _DUCK_BAD_TYPES):
            bad.append(f"{c}:{s}")
            continue
        # exact-token match so BIGINT inside e.g. UINTEGER doesn't confuse
        import re

        toks = set(re.findall(r"[A-Z0-9_]+", s))
        if toks & set(_DUCK_NARROW_INTS):
            bad.append(f"{c}:{s}")
    return bad


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
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"FAIL  unknown --only entries: {sorted(unknown)}")
            return 1
    failures = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            stype_bad = _spark_type_problems(sdf.schema)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            line = f"ROWS  {name}: {len(srows)} rows (no oracle) [{spark_s:.1f}s]"
            if stype_bad:
                line += f"  TYPE(spark): {stype_bad}"
                failures.append(name)
            print(line)
            if len(srows) == 0:
                print(f"  WARN {name}: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            otype_bad = _duck_type_problems(ocols, rel.types)
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue
        problems = []
        if stype_bad:
            problems.append(f"TYPE(spark) {stype_bad}")
        if otype_bad:
            problems.append(f"TYPE(duck) {otype_bad}")
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
    print(f"\n{checked - len(failures)}/{checked} queries OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
