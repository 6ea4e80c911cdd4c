"""Bucketed fact-fact joins: the repeated-query scale path.

q3/q10/q18/q21 all shuffle lineitem↔orders on orderkey every run. A
warehouse that serves those queries repeatedly should pay that shuffle
ONCE: write both facts bucketed on the join key, after which every
orderkey join is a zipped per-bucket sort-merge with NO exchange —
at 100 TB the difference between re-shuffling two fact tables per
query and a pure scan-side merge. Reference analog: key_by once, then
all downstream state is co-partitioned
(/root/reference/machida/lib/wallaroo/__init__.py:144).

tests/test_plans.py asserts the Exchange-free plan for the registered
query below.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from wally_spark.operators.bucketing import write_bucketed
from wally_spark.plans.registry import register
from wally_spark.plans.tpch import _r2
from wally_spark.tables import dataset_tag, load_tables

N_BUCKETS = 32


def bucketed_facts(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Build (once per session + sf_dir) lineitem/orders bucketed on
    orderkey; returns the two table names. Column-pruned to the
    q3/q10/q18 working set — a real warehouse would bucket the full
    tables. The `2` in the table tag versions the column set: bumping
    it invalidates any stale warehouse directory from an older schema.
    The tag itself fingerprints the source files (size + mtime), so
    regenerated data under the same sf_dir forces a rebuild."""
    tag = dataset_tag(spark, sf_dir, ("lineitem", "orders"))
    li_t, ord_t = f"li_bkt2_{tag}", f"ord_bkt2_{tag}"
    if not (spark.catalog.tableExists(li_t) and spark.catalog.tableExists(ord_t)):
        t = load_tables(spark, sf_dir)
        write_bucketed(
            t["lineitem"].select(
                "l_orderkey",
                "l_extendedprice",
                "l_discount",
                "l_shipdate",
                "l_quantity",
            ),
            li_t,
            "l_orderkey",
            N_BUCKETS,
            sort_col="l_orderkey",
        )
        write_bucketed(
            t["orders"].select(
                "o_orderkey",
                "o_custkey",
                "o_orderdate",
                "o_orderpriority",
                "o_totalprice",
            ),
            ord_t,
            "o_orderkey",
            N_BUCKETS,
            sort_col="o_orderkey",
        )
    return li_t, ord_t


@register(
    "q3_bucketed",
    oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       epoch(o_orderdate)::BIGINT AS o_orderdate_epoch,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate_epoch, l_orderkey
LIMIT 10
""",
    tags=("tpch", "join", "bucketed"),
)
def q3_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3_shipping_priority over pre-bucketed facts: identical result
    (same oracle as q3), but the lineitem↔orders join and the orderkey
    groupBy reuse the write-time bucketing — no Exchange anywhere in
    the fact path (plan-asserted)."""
    li_t, ord_t = bucketed_facts(spark, sf_dir)
    cust = load_tables(spark, sf_dir)["customer"].where(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1998-03-15").cast("timestamp")
    li = spark.table(li_t).where(F.col("l_shipdate") > cutoff)
    orders = spark.table(ord_t).where(F.col("o_orderdate") < cutoff)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_timestamp("o_orderdate").alias("o_orderdate_epoch"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "o_orderdate_epoch", "l_orderkey")
        .limit(10)
    )


@register(
    "q18_bucketed",
    oracle="""
SELECT c_custkey, c_name, o_orderkey,
       epoch(o_orderdate)::BIGINT AS o_orderdate_epoch,
       round(o_totalprice, 2) AS totalprice,
       round(sum(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 150)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY totalprice DESC, o_orderkey
LIMIT 50
""",
    tags=("tpch", "bucketed", "having"),
)
def q18_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18_large_customers over pre-bucketed facts (same oracle as
    q18). EVERY keyed stage reuses write-time bucketing on orderkey:
    the HAVING pre-aggregation, the semi-join against it, the
    orders join, and the final groupBy (whose key set includes
    o_orderkey, so hash(o_orderkey) partitioning satisfies its
    clustering) — zero Exchange in the fact path, plan-asserted in
    tests/test_plans.py."""
    from wally_spark.plans.tpch import _r2

    li_t, ord_t = bucketed_facts(spark, sf_dir)
    li = spark.table(li_t)
    orders = spark.table(ord_t)
    cust = load_tables(spark, sf_dir)["customer"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .where(F.col("_sq") > 150)
        .select(F.col("l_orderkey").alias("_big_ok"))
    )
    return (
        li.join(big, F.col("l_orderkey") == F.col("_big_ok"), "left_semi")
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_r2(F.sum("l_quantity")).alias("sum_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("o_orderdate_epoch"),
            _r2(F.col("o_totalprice")).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(50)
    )
