#!/usr/bin/env python
"""Capture the PLAIN-path physical plans the round-8 layout entries are
measured against, as ``plans/r08/<query>_before.txt``.

The four layout entries are NEW in round 8, so their "before" is not an
older catalog plan — it is the same aggregate computed WITHOUT the
write-once layout lever (exactly the semantics of each entry's DuckDB
oracle):

* ``orders_pruned_read`` / ``orders_compacted_read``  — full scan of the
  orders parquet + filter (no z-order clustering, no manifest pruning).
* ``orders_bucketed_join``  — plain orders ⋈ customer on the customer
  key over the raw parquet (no storage bucketing, so the equi-join must
  shuffle; broadcast is disabled for the capture to show the big-big
  regime the bucketing removes, matching
  ``tests/test_bucketed_join.py``'s plan pin).
* ``customer_dpp_read``  — the star join over an UNPARTITIONED fact
  copy (no directory layout, so no dynamic partition pruning can fire).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08")


def main() -> None:
    from pyspark.sql import functions as F

    from etl_stream_spark.catalog import DEC, _dbl, _t
    from etl_stream_spark.session import get_spark

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="capture_layout_baselines")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    fmt = jmode.fromString("formatted")

    def dump(name: str, df) -> None:
        path = os.path.join(OUT, f"{name}_before.txt")
        with open(path, "w") as fh:
            fh.write(df._jdf.queryExecution().explainString(fmt))
        print(f"wrote {path}")

    def orders_slice(ck_lo, ck_hi, d_lo, d_hi):
        o = _t(spark, SF_DIR, "orders").select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_totalprice").cast(DEC).alias("_price"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.to_date(F.lit("1970-01-01"))
            ).cast("long").alias("_day"),
        )
        return (
            o.filter(
                F.col("o_custkey").between(ck_lo, ck_hi)
                & F.col("_day").between(d_lo, d_hi)
            )
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                _dbl(F.sum("_price")).alias("total_revenue"),
            )
        )

    dump("orders_pruned_read", orders_slice(30, 90, 9500, 10200))
    dump("orders_compacted_read", orders_slice(40, 110, 9800, 10500))

    # plain join, big-big regime (broadcast off, as in the bucketed pin)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    o = _t(spark, SF_DIR, "orders").select(
        "o_custkey", F.col("o_totalprice").cast(DEC).alias("_price")
    )
    c = _t(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    dump(
        "orders_bucketed_join",
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            _dbl(F.sum("_price")).alias("total_revenue"),
        ),
    )
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    fact = _t(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey", F.col("c_acctbal").cast(DEC).alias("_bal")
    )
    dim = (
        _t(spark, SF_DIR, "nation")
        .join(
            _t(spark, SF_DIR, "region").filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    dump(
        "customer_dpp_read",
        fact.join(dim, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            _dbl(F.sum("_bal")).alias("total_acctbal"),
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
