"""operators/baskets: the self-join-free pair build must emit the
IDENTICAL pair multiset as the classic distinct + basket self-join
(r13 optimization — guide §2.4)."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from wally_spark.operators.baskets import (
    basket_item_sets,
    basket_pair_counts,
    basket_pairs,
)
from wally_spark.tables import load_tables


def _selfjoin_counts(df, basket_col, item_col):
    op = df.select(
        F.col(basket_col).alias("o"), F.col(item_col).alias("p")
    ).distinct()
    a, b = op.alias("a"), op.alias("b")
    return (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def test_pair_counts_match_selfjoin(spark):
    li = load_tables(spark, SF_SMALL)["lineitem"]
    old = _selfjoin_counts(li, "l_orderkey", "l_partkey")
    new = basket_pair_counts(li, "l_orderkey", "l_partkey")
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0
    assert new.count() > 0


def test_pairs_are_ordered_and_distinct_per_basket(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 7), (1, 10), (1, 3), (2, 5), (2, 5), (3, 9)],
        ["b", "i"],
    )
    got = sorted(
        map(tuple, basket_pairs(basket_item_sets(df, "b", "i")).collect())
    )
    # basket 1 has distinct items {3, 7, 10} -> 3 ordered pairs;
    # basket 2 collapses to one item (no pair); basket 3 is a singleton
    assert got == [(3, 7), (3, 10), (7, 10)]


def test_pair_counts_count_baskets_not_rows(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2), (2, 2), (3, 1)], ["b", "i"]
    )
    rows = basket_pair_counts(df, "b", "i").collect()
    assert [(r.pa, r.pb, r.c) for r in rows] == [(1, 2, 2)]


def test_empty_input(spark):
    df = spark.createDataFrame([], "b INT, i INT")
    assert basket_pair_counts(df, "b", "i").count() == 0
