"""Basket pair mining without a self-join (guide §2.4).

The classic co-occurrence edge build is

    op    = SELECT DISTINCT basket, item FROM t
    pairs = op a JOIN op b ON a.basket = b.basket AND a.item < b.item
    edges = SELECT pa, pb, count(*) FROM pairs GROUP BY pa, pb

which costs an Exchange for the distinct, an Exchange per join side
(the distinct's (basket, item) partitioning does not satisfy the
basket-keyed join) and the pair-keyed aggregate Exchange — four
full-relation shuffles plus a sort-merge join.

``basket_pair_counts`` produces the IDENTICAL pair multiset with two
shuffles and no join: collect each basket's distinct item set (one
basket-keyed aggregate, map-side combined; ``collect_set`` is the
DISTINCT), sort it, and emit the ordered pairs with an array HOF —
for the item at 0-based position i, pair it with every later item.
Sortedness makes pair order (a < b) structural. Per-basket fanout is
O(k²) with k = items per basket — the same bound the self-join had.

Measured (r13, sf0.1, min-of-3 noop): 1.548 -> 1.444 s on the bare
edge build, exact-equal output; the win at scale is the two removed
full-relation exchanges, not the local 7%.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_PAIR_HOF = (
    "flatten(transform(ps, (x, i) -> "
    "transform(slice(ps, i + 2, size(ps) - i - 1), "
    "y -> struct(x AS pa, y AS pb))))"
)


def basket_item_sets(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    """(basket, sorted distinct-item array ``ps``) — one exchange."""
    return df.groupBy(F.col(basket_col).alias("basket")).agg(
        F.sort_array(F.collect_set(item_col)).alias("ps")
    )


def basket_pairs(sets_df: DataFrame) -> DataFrame:
    """Explode a ``basket_item_sets`` result into ordered (pa, pb)
    pairs — one row per (basket, unordered item pair), pa < pb."""
    return sets_df.select(F.explode(F.expr(_PAIR_HOF)).alias("e")).select(
        "e.pa", "e.pb"
    )


def basket_pair_counts(
    df: DataFrame, basket_col: str, item_col: str, count_col: str = "c"
) -> DataFrame:
    """(pa, pb, count) over distinct per-basket item pairs — the
    self-join-free spelling of the co-occurrence edge build."""
    return (
        basket_pairs(basket_item_sets(df, basket_col, item_col))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias(count_col))
    )
