"""Extended TPC-H-style coverage: correlated/scalar subqueries, outer
joins, distribution aggregations. Same adaptation rules as
plans/tpch.py (lineitem stands in for partsupp; shipdate lag stands in
for commit/receipt dates).

Float discipline: thresholds derived from averages of integer-valued
doubles (l_quantity) are exact across engines (integer sums are exact
in IEEE doubles); money averages are only compared against, never
emitted unrounded.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from wally_spark.plans.registry import register
from wally_spark.tables import load_tables


def _t(spark: SparkSession, sf_dir: str):
    return load_tables(spark, sf_dir)


def _r2(c):
    return F.round(c, 2)


# --- Q2 shape: best supplier per part (correlated min) ---
@register(
    "q2_best_supplier",
    oracle="""
WITH ps AS (
  SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem
), ranked AS (
  SELECT p_partkey, p_brand, s_suppkey, s_name, round(s_acctbal, 2) AS acctbal,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY s_acctbal DESC, s_suppkey) AS rk
  FROM part
  JOIN ps ON p_partkey = partkey
  JOIN supplier ON s_suppkey = suppkey
  WHERE p_size = 15 AND p_type = 'LARGE'
)
SELECT p_partkey, p_brand, s_suppkey, s_name, acctbal
FROM ranked WHERE rk = 1
""",
    tags=("tpch", "subquery"),
)
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic q2's min-supplycost correlated subquery, re-shaped over
    the lineitem part↔supplier relation with acctbal as the rank key."""
    t = _t(spark, sf_dir)
    ps = t["lineitem"].select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    part = t["part"].where((F.col("p_size") == 15) & (F.col("p_type") == "LARGE"))
    w = Window.partitionBy("p_partkey").orderBy(F.desc("s_acctbal"), "s_suppkey")
    return (
        ps.join(F.broadcast(part), F.col("partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("suppkey") == F.col("s_suppkey"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            _r2(F.col("s_acctbal")).alias("acctbal"),
        )
    )


# --- Q8: market share (conditional ratio over multi-join, by year) ---
@register(
    "q8_market_share",
    oracle="""
SELECT o_year,
       floor(10000.0 * sum(CASE WHEN supp_nation = 0 THEN volume ELSE 0 END)
             / sum(volume))::BIGINT AS share_bp
FROM (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         s_nationkey AS supp_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE n_regionkey = 1
)
GROUP BY o_year
""",
    tags=("tpch", "agg"),
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    nat = t["nation"].where(F.col("n_regionkey") == 1)
    vol = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            F.col("s_nationkey").alias("supp_nation"),
        )
    )
    return vol.groupBy("o_year").agg(
        F.floor(
            10000.0
            * F.sum(F.when(F.col("supp_nation") == 0, F.col("volume")).otherwise(0.0))
            / F.sum("volume")
        )
        .cast("bigint")
        .alias("share_bp")
    )


# --- Q9: product profit by nation and year ---
@register(
    "q9_product_profit",
    oracle="""
SELECT n_name AS nation, o_year, floor(sum(amount))::BIGINT AS sum_profit
FROM (
  SELECT n_name, year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount)
           - p_retailprice * 0.6 * l_quantity AS amount
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE contains(p_name, 'a')
)
GROUP BY nation, o_year
""",
    tags=("tpch", "agg"),
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply cost proxied by 0.6×retailprice (no partsupp table)."""
    t = _t(spark, sf_dir)
    part = t["part"].where(F.contains(F.col("p_name"), F.lit("a")))
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * 0.6 * F.col("l_quantity")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        # whole-dollar floor: round(,2) of an engine-jittered float sum
        # can straddle a .xx5 boundary (seen at sf0.01)
        .agg(F.floor(F.sum("amount")).cast("bigint").alias("sum_profit"))
    )


# --- Q11 shape: important volume per part (scalar-subquery threshold) ---
@register(
    "q11_important_parts",
    oracle="""
WITH pv AS (
  SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_regionkey = 0
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey, round(value, 2) AS part_value
FROM pv
WHERE value > (SELECT 0.001 * sum(value) FROM pv)
""",
    tags=("tpch", "subquery"),
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    nat = t["nation"].where(F.col("n_regionkey") == 0)
    pv = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    total = pv.agg((0.001 * F.sum("value")).alias("threshold"))
    return (
        pv.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("partkey"), _r2(F.col("value")).alias("part_value")
        )
    )


# --- Q13: customer order-count distribution (outer join histogram) ---
@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    tags=("tpch", "outerjoin"),
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    orders = t["orders"].where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --- Q15: top supplier(s) by quarterly revenue (scalar max) ---
@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
    tags=("tpch", "subquery"),
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    rev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", _r2(F.col("total_revenue")).alias("total_revenue"))
    )


# --- Q17: small-quantity orders vs 20% of part average ---
@register(
    "q17_small_quantity",
    oracle="""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p_partkey)
""",
    tags=("tpch", "subquery"),
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact across engines: l_quantity is integer-valued, so the
    per-part average (exact integer sum / count) is bit-identical."""
    t = _t(spark, sf_dir)
    avg_per_part = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("apk"))
        .agg((0.2 * F.avg("l_quantity")).alias("qty_threshold"))
    )
    part = t["part"].where(F.col("p_brand") == "Brand#23")
    return (
        t["lineitem"]
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(avg_per_part), F.col("apk") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(_r2(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


# --- Q20 shape: suppliers with significant shipped volume ---
@register(
    "q20_significant_suppliers",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE contains(p_name, 'b')
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > 400)
ORDER BY s_suppkey
""",
    tags=("tpch", "semijoin"),
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    part = t["part"].where(F.contains(F.col("p_name"), F.lit("b")))
    big = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 400)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(big, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --- Q22: customers with above-average balance and no recent orders ---
@register(
    "q22_global_sales_opportunity",
    oracle="""
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey AS cntry, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY cntry
""",
    tags=("tpch", "antijoin", "subquery"),
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir)
    avg_bal = (
        t["customer"].where(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    )
    recent = t["orders"].where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        t["customer"]
        .crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _r2(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )
