#!/usr/bin/env python
"""Capture ``explain("formatted")`` output for catalog queries into
``plans/<round>/<query>_<tag>.txt`` — the judge-facing plan artifacts.

Usage::

    python scripts/capture_plans.py --out plans/r08 --tag after \
        --only customer_rfm_segments,corpus_difficulty_deciles

AQE is disabled for the capture (the pre-execution AdaptiveSparkPlan
shell hides codegen spans and the statically chosen join strategy), the
same convention as ``scripts/explain_audit.py``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--tag", required=True, help="before | after")
    ap.add_argument("--only", required=True, help="comma-separated query names")
    args = ap.parse_args()

    from etl_stream_spark.catalog import CATALOG
    from etl_stream_spark.session import get_spark

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    fmt = jmode.fromString("formatted")
    for name in args.only.split(","):
        df = CATALOG[name].fn(spark, args.sf_dir)
        text = df._jdf.queryExecution().explainString(fmt)
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
