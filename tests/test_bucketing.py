from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from wally_spark.operators.bucketing import bucketed_join, write_bucketed
from wally_spark.tables import load_tables


def test_bucketed_join_has_no_exchange(spark):
    import shutil

    t = load_tables(spark, SF_SMALL)
    for tbl in ("li_bucketed", "ord_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"spark-warehouse/{tbl}", ignore_errors=True)
    write_bucketed(
        t["lineitem"].select("l_orderkey", "l_quantity", "l_extendedprice"),
        "li_bucketed",
        "l_orderkey",
        n_buckets=8,
        sort_col="l_orderkey",
    )
    write_bucketed(
        t["orders"]
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"),
        "ord_bucketed",
        "l_orderkey",
        n_buckets=8,
        sort_col="l_orderkey",
    )
    # force the sort-merge path (tiny test tables would broadcast and
    # hide the property under test: no shuffle exchange on either side)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "li_bucketed", "ord_bucketed", "l_orderkey")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "simple"
        )
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join still shuffles:\n{plan}"
        )
        assert "SortMergeJoin" in plan
        expected = (
            t["lineitem"]
            .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
