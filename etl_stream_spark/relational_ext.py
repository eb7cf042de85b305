"""Extended relational query shapes (TPC-H Q2/Q4/Q7/Q8/Q9/Q12/Q13/Q15/
Q16/Q17/Q19/Q22 adapted to the driver's star schema) + rollup and
window-frame analytics.

The reference engine has no relational query surface of its own — its
generated SQL covers only the dedup-window MERGE (SURVEY §2.4-2.7,
``etl-snowflake-py/etl_snowflake/task.py:154-190``) — so these queries
exist to prove the Spark substrate the rebuild stands on: every classic
OLAP shape (multi-way joins, correlated aggregates, disjunctive
pushdown, scalar subqueries, rollups, window frames) expressed
declaratively so Catalyst plans them (broadcast dims, partial aggs,
pushed filters).

Determinism follows the catalog conventions: exact decimal sums,
IEEE-double expressions only when both engines evaluate the identical
tree, 6-dp rounding on ratios, explicit tie-breaks under every LIMIT,
64-bit integral outputs.

Exports ``EXTRA_QUERIES: list[tuple[name, fn, oracle_sql]]`` consumed by
:mod:`etl_stream_spark.catalog` (no import cycle: this module never
imports the catalog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_stream_spark.session import load_table

DEC = "decimal(18,2)"
DECSUM = "decimal(38,2)"

_REV_SQL = (
    "(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(9,4))))"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_table(spark, sf_dir, name)


def _rev() -> F.Column:
    return F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast("decimal(9,4)"))


def _rev_sum() -> F.Column:
    return F.sum(_rev()).cast("decimal(38,6)")


def _dbl(col: F.Column, nd: int = 2) -> F.Column:
    """Terminal boundary cast (driver convention): ROUND the exact
    decimal, THEN cast DOUBLE — mirrored in the oracle as
    ``CAST(ROUND(x, nd) AS DOUBLE)``. Round-after-cast is
    engine-divergent on halfway values (see catalog._dbl); internal
    arithmetic and filters/sorts stay on the exact decimal."""
    return F.round(col, nd).cast("double")


# --------------------------------------------------------------------------
# Q2-style: min-per-group via window, join-free
# --------------------------------------------------------------------------


def q2_cheapest_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts priced at the minimum retail price of their (type, size)
    group — the Q2 correlated-min shape as a single window (one shuffle,
    no self-join)."""
    part = _t(spark, sf_dir, "part")
    price = F.col("p_retailprice").cast(DEC)
    w = Window.partitionBy("p_type", "p_size")
    return (
        part.withColumn("min_price", F.min(price).over(w))
        .filter(price == F.col("min_price"))
        .select(
            "p_partkey",
            "p_name",
            "p_type",
            "p_size",
            _dbl(price).alias("retail_price"),
        )
    )


Q2_SQL = """
SELECT p_partkey, p_name, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(ROUND(CAST(p_retailprice AS DECIMAL(18,2)), 2) AS DOUBLE) AS retail_price
FROM (
  SELECT *, MIN(CAST(p_retailprice AS DECIMAL(18,2)))
              OVER (PARTITION BY p_type, p_size) AS min_price
  FROM part
)
WHERE CAST(p_retailprice AS DECIMAL(18,2)) = min_price
"""


# --------------------------------------------------------------------------
# Q4-style: EXISTS semi-join + aggregation
# --------------------------------------------------------------------------


def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders (per priority) having at least one line shipped after the
    order date — Q4's EXISTS shape as a left-semi join; the count is a
    partial agg after the semi-join output."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Q7-style: nation-pair trade volume by year
# --------------------------------------------------------------------------


def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue flow between nation pairs (3-nation trade bloc, self-pairs
    excluded) by ship year (Q7). Scale shape: the bounded nation dim is
    filtered to the trio FIRST and joined into supplier/customer, so the
    lineitem side is cut to the ~3/25 of rows that can contribute
    *before* the lineitem⋈orders exchange; only the self-pair exclusion
    remains after the joins. supplier/customer scale with SF, so they
    carry no broadcast hint — AQE still picks broadcast when the
    filtered side is genuinely small (sf0.1), and falls back to a
    shuffle join at the 100 TB point where broadcast would OOM."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    trio = ("NATION_1", "NATION_2", "NATION_3")
    n1 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*trio))
        .select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*trio))
        .select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .select("c_custkey", "cust_nation")
    )
    return (
        li.join(supp, li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(_dbl(_rev_sum()).alias("revenue"))
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, ship_year,
       CAST(ROUND(CAST(SUM(rev) AS DECIMAL(38,6)), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         {_REV_SQL} AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_1','NATION_2','NATION_3')
    AND n2.n_name IN ('NATION_1','NATION_2','NATION_3')
    AND n1.n_name <> n2.n_name
)
GROUP BY supp_nation, cust_nation, ship_year
"""


# --------------------------------------------------------------------------
# Q8-style: market share (conditional sum / total ratio)
# --------------------------------------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_5 suppliers' share of PROMO-part revenue per order year —
    sum(CASE)/sum ratio from exact decimal sums, one double division.

    Scale shape: the selective PROMO part join runs FIRST so the
    lineitem⋈orders exchange only carries PROMO lines; part/supplier
    scale with SF so neither carries a broadcast hint (AQE promotes them
    at small SF, shuffle-joins at 100 TB); nation is bounded (25 rows)
    and stays hinted."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    rev = _rev()
    nation_rev = F.sum(F.when(F.col("n_name") == "NATION_5", rev).otherwise(F.lit(0).cast(DEC)))
    total_rev = F.sum(rev)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.round(nation_rev.cast("double") / total_rev.cast("double"), 6).alias(
                "market_share"
            )
        )
    )


Q8_SQL = f"""
SELECT order_year,
       ROUND(CAST(SUM(CASE WHEN n_name = 'NATION_5' THEN rev
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE), 6) AS market_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year, n_name,
         {_REV_SQL} AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_type = 'PROMO'
)
GROUP BY order_year
"""


# --------------------------------------------------------------------------
# Q9-style: profit by nation x year with a decimal cost model
# --------------------------------------------------------------------------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per supplier nation per year; cost modeled as 60% of part
    retail price (the schema has no partsupp), all decimal-exact."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    cost = (
        F.expr("CAST(0.6 AS DECIMAL(2,1))")
        * F.col("p_retailprice").cast(DEC)
        * F.col("l_quantity").cast("decimal(9,2)")
    )
    amount = _rev() - cost
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(_dbl(F.sum(amount).cast("decimal(38,6)")).alias("profit"))
    )


Q9_SQL = f"""
SELECT nation, ship_year, CAST(ROUND(CAST(SUM(amount) AS DECIMAL(38,6)), 2) AS DOUBLE) AS profit
FROM (
  SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         {_REV_SQL}
           - CAST(0.6 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(18,2))
             * CAST(l_quantity AS DECIMAL(9,2)) AS amount
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
)
GROUP BY nation, ship_year
"""


# --------------------------------------------------------------------------
# Q12-style: conditional counts (sum of CASE)
# --------------------------------------------------------------------------


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11's HAVING-against-scalar shape: parts whose revenue exceeds
    1/1500 of total revenue — per-part aggregate filtered against a
    broadcast single-row aggregate. The threshold is exact decimal
    cross-multiplication (rev * 1500 > total), no division."""
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(_rev_sum().alias("part_revenue"))
    total = per_part.agg(
        F.sum("part_revenue").cast("decimal(38,6)").alias("total_revenue")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_revenue") * 1500 > F.col("total_revenue"))
        .select("l_partkey", _dbl(F.col("part_revenue")).alias("part_revenue"))
    )


Q11_SQL = f"""
WITH per_part AS (
  SELECT l_partkey, CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS part_revenue
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(ROUND(part_revenue, 2) AS DOUBLE) AS part_revenue
FROM per_part
WHERE part_revenue * 1500 > (
  SELECT CAST(SUM(part_revenue) AS DECIMAL(38,6)) FROM per_part)
"""


def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's nested-IN shape: suppliers who shipped more than half of
    any single part's total shipped quantity in a year — supplier keys
    come from a subquery over an aggregated join, then semi-join the
    supplier dim. Halving is exact: 2*supplier_qty > part_qty."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(F.sum(qty).alias("ps_qty"))
    per_p = li.groupBy(F.col("l_partkey").alias("p_key")).agg(
        F.sum(qty).alias("p_qty")
    )
    heavy = (
        per_ps.join(per_p, per_ps.l_partkey == F.col("p_key"))
        .filter(F.col("ps_qty") * 2 > F.col("p_qty"))
        .select("l_suppkey")
        .distinct()
    )
    supp = _t(spark, sf_dir, "supplier")
    return supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


Q20_SQL = """
WITH y AS (
  SELECT l_partkey, l_suppkey, CAST(l_quantity AS DECIMAL(18,2)) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
),
per_ps AS (SELECT l_partkey, l_suppkey, SUM(qty) AS ps_qty FROM y GROUP BY 1, 2),
per_p AS (SELECT l_partkey, SUM(qty) AS p_qty FROM y GROUP BY 1)
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per_ps JOIN per_p USING (l_partkey)
  WHERE ps_qty * 2 > p_qty)
"""


def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High/low-priority line counts per return flag for one ship year —
    Q12's dual conditional count; the orders side of the join carries
    only two columns after pruning."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# Q13-style: two-level aggregation over a left outer join
# --------------------------------------------------------------------------


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of customers by order count (urgent orders excluded):
    left-outer join so zero-order customers survive, then a second
    aggregation over the per-customer counts."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count skips nulls
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# Q15-style: aggregate + join back on the maximum
# --------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum quarterly revenue: the revenue CTE is
    aggregated once, its max computed as a single-row broadcast, and the
    equality join-back is exact (decimal, not float)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(_rev_sum().alias("total_revenue"))
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", _dbl(F.col("total_revenue")).alias("total_revenue"))
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey, CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(ROUND(total_revenue, 2) AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


# --------------------------------------------------------------------------
# Q16-style: anti-filtered distinct-count per group
# --------------------------------------------------------------------------


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, type, size) for observed
    part-supplier pairs, excluding negative-balance suppliers (NOT IN)
    and one brand — lineitem stands in for partsupp."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(bad_supp, pairs.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(part, pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Q17-style: correlated average via exact cross-multiplication
# --------------------------------------------------------------------------


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lines whose quantity is below 20% of their part's
    average. ``qty < 0.2 * sum/cnt`` is evaluated as
    ``qty * 5 * cnt < sum`` — exact decimal integer arithmetic, no
    engine-dependent division or rounding on the comparison boundary."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    qty = F.col("l_quantity").cast("decimal(9,2)")
    per_part = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum(qty).alias("sum_qty"), F.count(F.lit(1)).cast("decimal(9,0)").alias("cnt")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("agg_partkey"))
        .filter(qty * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            _dbl(F.sum(F.col("l_extendedprice").cast(DEC)).cast(DECSUM)).alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q17_SQL = """
WITH per_part AS (
  SELECT l_partkey AS agg_partkey,
         SUM(CAST(l_quantity AS DECIMAL(9,2))) AS sum_qty,
         CAST(COUNT(*) AS DECIMAL(9,0)) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)), 2) AS DOUBLE) AS small_qty_revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN per_part ON l_partkey = agg_partkey
WHERE p_brand = 'Brand#3'
  AND CAST(l_quantity AS DECIMAL(9,2)) * 5 * cnt < sum_qty
"""


# --------------------------------------------------------------------------
# Q19-style: disjunction of conjunctive ranges
# --------------------------------------------------------------------------


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs predicate across the part join (Q19): Catalyst extracts
    the common join key and pushes brand/size bounds into both scans."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & qty.between(20, 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(_dbl(_rev_sum()).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


Q19_SQL = f"""
SELECT CAST(ROUND(CAST(SUM({_REV_SQL}) AS DECIMAL(38,6)), 2) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------------------
# Q22-style: scalar-subquery threshold + anti join
# --------------------------------------------------------------------------


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above the positive-balance average with no orders in
    the final data year (lapsed), by market segment. The average is a
    broadcast single row; the threshold compare is the identical double
    expression on both engines."""
    cust = _t(spark, sf_dir, "customer")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dbl(F.sum(F.col("c_acctbal").cast(DEC)).cast(DECSUM)).alias("totacctbal"),
        )
    )


Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)), 2) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# Multi-level aggregation: ROLLUP
# --------------------------------------------------------------------------


def rollup_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order totals rolled up over (priority, status) with subtotal and
    grand-total rows — Spark's partial-agg rollup in one pass."""
    orders = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dbl(F.sum(F.col("o_totalprice").cast(DEC)).cast(DECSUM)).alias("total_price"),
    )


ROLLUP_SQL = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
       CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)), 2) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


# --------------------------------------------------------------------------
# Window frames: running totals, lag deltas, inter-order gaps
# --------------------------------------------------------------------------


def customer_order_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order history analytics: running decimal total
    (ROWS UNBOUNDED PRECEDING), previous order price (lag), and days
    since the previous order — frame specs beyond the reference's lone
    row_number (SURVEY §2.5)."""
    orders = _t(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast(DEC)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        _dbl(F.sum(price).over(run).cast(DECSUM)).alias("running_total"),
        _dbl(F.lag(price).over(w)).alias("prev_price"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("days_since_prev"),
    )


HISTORY_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,2)), 2) AS DOUBLE) AS running_total,
       CAST(ROUND(LAG(CAST(o_totalprice AS DECIMAL(18,2)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS DOUBLE) AS prev_price,
       CAST(date_diff('day',
              LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey),
              o_orderdate) AS BIGINT) AS days_since_prev
FROM orders
"""


def customer_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frames (the one frame family
    `customer_order_history` doesn't cover): per-customer trailing
    7-day revenue and order count at every order. The frame is a RANGE
    over exact µs epochs, so same-day orders fall into each other's
    windows symmetrically — no tie-break, per RANGE semantics — and
    both engines see identical frames."""
    orders = _t(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast(DEC)
    tus = F.unix_micros(F.col("o_orderdate"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(tus)
        .rangeBetween(-7 * 86_400 * 1_000_000, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        _dbl(F.sum(price).over(w).cast(DECSUM)).alias("rev_7d"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_orders_7d"),
    )


ROLLING_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                       AS DECIMAL(38,2)), 2) AS DOUBLE) AS rev_7d,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_7d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)
             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# Exact percentiles (interpolated) per group
# --------------------------------------------------------------------------


def order_value_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-function family beyond row_number (§2.5): quartile
    ntile, percent_rank, cume_dist, dense_rank per priority — one sort
    per partition serves all four. Tie-break on orderkey keeps every
    rank deterministic."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        _dbl(F.col("o_totalprice").cast(DEC)).alias("total_price"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.dense_rank().over(w).cast("long").alias("drank"),
    )


RANKINGS_SQL = """
SELECT o_orderpriority, o_orderkey,
       CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)), 2) AS DOUBLE) AS total_price,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drank
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
"""


def order_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median / p90 of order value per priority —
    Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the
    sorted-interpolation definition; both sides round to 6 dp."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
    )


QUANTILES_SQL = """
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90_price
FROM orders GROUP BY o_orderpriority
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21's double-correlated EXISTS/NOT-EXISTS shape (suppliers who
    were the *sole* late shipper on a multi-supplier order), rewritten
    Spark-first: instead of two self-joins of lineitem (the literal SQL
    plan), one pass builds per-(order, supplier) lateness, a second
    per-order aggregate counts suppliers and late suppliers, and the
    EXISTS pair becomes a filter on those counts — two shuffles on
    l_orderkey total, and AQE coalesces the tiny tail. "Late" adapts
    the reference-less schema: shipped >60 days after order date."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")
    # One groupBy on the *join key* so the aggregation reuses the join's
    # hash partitioning (no second exchange of the fat intermediate);
    # per-order supplier sets are computed in array land — safe because
    # lines-per-order is naturally bounded (TPC-H ≤ 7), independent of SF.
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.array_distinct(F.collect_list("l_suppkey")).alias("sups"),
            F.array_distinct(
                F.collect_list(F.when(late, F.col("l_suppkey")))
            ).alias("late_sups"),
        )
    )
    sole_late = per_order.filter(
        (F.size("sups") >= 2) & (F.size("late_sups") == 1)
    ).select(F.element_at("late_sups", 1).alias("l_suppkey"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
WITH per_pair AS (
  SELECT l_orderkey, l_suppkey,
         MAX(l_shipdate > o_orderdate + INTERVAL 60 DAY) AS sup_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey, l_suppkey
),
per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_supp,
         SUM(CASE WHEN sup_late THEN 1 ELSE 0 END) AS n_late
  FROM per_pair GROUP BY l_orderkey
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_pair
JOIN per_order USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE sup_late AND n_supp >= 2 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def cube_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (priority, status) with the grouping-id bitmask —
    the grouping-sets surface beyond ROLLUP. One partial-agg + exchange;
    Spark expands grouping sets before the shuffle so the exchange
    carries pre-aggregated rows."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            _dbl(F.sum(F.col("o_totalprice").cast(DEC)).cast(DECSUM)).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


CUBE_SQL = """
SELECT o_orderpriority, o_orderstatus,
       CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)), 2) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


def setops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation surface: customers who bought in BOTH halves of the
    order history (INTERSECT), only in the early half (EXCEPT), and the
    respective counts — `intersect`/`exceptAll` plan as hash
    semi/anti-joins after partial distinct, not as full sorts."""
    orders = _t(spark, sf_dir, "orders")
    early = orders.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    late = orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    e_keys = early.select("o_custkey")
    l_keys = late.select("o_custkey")
    both = e_keys.intersect(l_keys).select(
        F.lit("both_halves").alias("segment"), F.col("o_custkey")
    )
    only_early = e_keys.distinct().exceptAll(l_keys.distinct()).select(
        F.lit("early_only").alias("segment"), F.col("o_custkey")
    )
    return both.unionByName(only_early).groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.min("o_custkey").cast("long").alias("min_key"),
        F.max("o_custkey").cast("long").alias("max_key"),
    )


SETOPS_SQL = """
WITH e AS (SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'),
l AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'),
seg AS (
  SELECT 'both_halves' AS segment, o_custkey
  FROM (SELECT o_custkey FROM e INTERSECT SELECT o_custkey FROM l)
  UNION ALL
  SELECT 'early_only', o_custkey
  FROM (SELECT DISTINCT o_custkey FROM e EXCEPT SELECT DISTINCT o_custkey FROM l)
)
SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(MIN(o_custkey) AS BIGINT) AS min_key,
       CAST(MAX(o_custkey) AS BIGINT) AS max_key
FROM seg GROUP BY segment
"""


#: (name, spark_fn, duckdb_oracle) consumed by the catalog registry.
def lineitem_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics (stddev, Pearson correlation) computed
    the engine's way: exact DECIMAL sums of x, x², y, xy per group, then
    ONE closed-form double expression at the end.

    ``F.stddev``/``F.corr`` merge float Welford states in partition
    order — nondeterministic run-to-run, and never bit-equal across
    engines. Exact integer-decimal moments are partition-order
    independent and reproduce identically in any engine, which is what
    makes a 100 TB statistics job auditable. Same single-shuffle
    map-side-combine shape as any other aggregation.
    """
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(9,2)")
    y = F.col("l_extendedprice").cast(DEC)
    n = F.count(F.lit(1))
    agg = li.groupBy("l_returnflag").agg(
        n.cast("long").alias("n_lines"),
        F.sum(x).cast("decimal(38,2)").alias("_sx"),
        F.sum(y).cast(DECSUM).alias("_sy"),
        F.sum(x * x).cast("decimal(38,4)").alias("_sxx"),
        F.sum(y * y).cast("decimal(38,4)").alias("_syy"),
        F.sum(x * y).cast("decimal(38,4)").alias("_sxy"),
    )
    nn = F.col("n_lines").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx, syy, sxy = (
        F.col("_sxx").cast("double"),
        F.col("_syy").cast("double"),
        F.col("_sxy").cast("double"),
    )
    var_y = (syy - sy * sy / nn) / (nn - 1)
    cov = (sxy - sx * sy / nn) / (nn - 1)
    var_x = (sxx - sx * sx / nn) / (nn - 1)
    return agg.select(
        "l_returnflag",
        "n_lines",
        F.round(F.sqrt(var_y), 6).alias("stddev_price"),
        F.round(cov / F.sqrt(var_x * var_y), 6).alias("corr_qty_price"),
    )


MOMENTS_SQL = """
WITH m AS (
  SELECT l_returnflag, COUNT(*) AS n_lines,
         CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DECIMAL(38,2)) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(9,2))) AS DECIMAL(38,4)) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS syy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n_lines,
       ROUND(sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n_lines) / (n_lines - 1)), 6) AS stddev_price,
       ROUND(((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n_lines) / (n_lines - 1))
             / sqrt(((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n_lines) / (n_lines - 1))
                    * ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n_lines) / (n_lines - 1))), 6)
         AS corr_qty_price
FROM m
"""


EXTRA_QUERIES: list[tuple] = [
    ("lineitem_moment_stats", lineitem_moment_stats, MOMENTS_SQL),
    ("setops_customer_segments", setops_customer_segments, SETOPS_SQL),
    ("q21_waiting_suppliers", q21_waiting_suppliers, Q21_SQL),
    ("cube_order_revenue", cube_order_revenue, CUBE_SQL),
    ("q2_cheapest_parts", q2_cheapest_parts, Q2_SQL),
    ("q4_late_shipment_priority", q4_late_shipment_priority, Q4_SQL),
    ("q7_nation_trade", q7_nation_trade, Q7_SQL),
    ("q8_market_share", q8_market_share, Q8_SQL),
    ("q9_product_profit", q9_product_profit, Q9_SQL),
    ("q11_important_parts", q11_important_parts, Q11_SQL),
    ("q20_heavy_suppliers", q20_heavy_suppliers, Q20_SQL),
    ("q12_priority_lines", q12_priority_lines, Q12_SQL),
    ("q13_customer_distribution", q13_customer_distribution, Q13_SQL),
    ("q15_top_supplier", q15_top_supplier, Q15_SQL),
    ("q16_part_supplier_counts", q16_part_supplier_counts, Q16_SQL),
    ("q17_small_quantity_revenue", q17_small_quantity_revenue, Q17_SQL),
    ("q19_disjunctive_revenue", q19_disjunctive_revenue, Q19_SQL),
    ("q22_idle_rich_customers", q22_idle_rich_customers, Q22_SQL),
    ("rollup_order_revenue", rollup_order_revenue, ROLLUP_SQL),
    ("customer_order_history", customer_order_history, HISTORY_SQL),
    ("customer_rolling_revenue", customer_rolling_revenue, ROLLING_SQL),
    ("order_price_quantiles", order_price_quantiles, QUANTILES_SQL),
    ("order_value_rankings", order_value_rankings, RANKINGS_SQL),
]
