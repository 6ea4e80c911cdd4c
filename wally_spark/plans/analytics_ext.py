"""Round-3 analytics extensions: lag-window time-series deltas and
triangle counting over the co-purchase graph (SURVEY §2.4/§2.7
extensions); round-8 adds graph_degree_assortativity (Newman r over
the same support-pruned edge set), orders_grouping_sets (explicit
GROUPING SETS), heavy_hitters_report (TakeOrdered skew profiler) and
price_index_laspeyres (fixed-basket monthly price index, cents×units
int64 discipline). Registered after plans.quality so the driver
window is not displaced (see plans/__init__.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from wally_spark.operators.checkpoint import pin
from wally_spark.plans.registry import register
from wally_spark.tables import load_tables

EDGE_SUPPORT = 2  # co-purchase edge: parts sharing >= this many orders


@register(
    "revenue_dod_delta",
    oracle="""
WITH daily AS (
  SELECT o_orderdate AS day, round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY o_orderdate)
SELECT day, revenue,
       round(revenue - lag(revenue) OVER (ORDER BY day), 2) AS dod_delta
FROM daily
""",
    tags=("analytics", "timeseries", "windows"),
)
def revenue_dod_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day revenue delta: daily aggregate then a LAG window.

    The unpartitioned window runs over the POST-aggregation table —
    one row per calendar day, bounded by date range (a few thousand
    rows at any corpus size), so the single-task window is safe at
    100 TB; the heavy lifting is the partial-aggregating groupBy."""
    orders = load_tables(spark, sf_dir)["orders"]
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w = Window.orderBy("day")
    return daily.select(
        "day",
        "revenue",
        F.round(
            F.col("revenue") - F.lag("revenue").over(w), 2
        ).alias("dod_delta"),
    )


@register(
    "graph_triangle_count",
    oracle=f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (
  SELECT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= {EDGE_SUPPORT})
SELECT (SELECT count(*) FROM e)::BIGINT AS n_edges,
       count(*)::BIGINT AS n_triangles
FROM e e1
JOIN e e2 ON e2.pa = e1.pb
JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
""",
    tags=("analytics", "graph"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the co-purchase graph: edges are part pairs
    sharing >= EDGE_SUPPORT orders (the same support-thresholded edge
    set as part_cooccurrence), triangles enumerated by the standard
    oriented two-join (a<b<c, so each triangle counted once).

    Scale shape: the edge build is bounded by items-per-order fanout
    (O(k²) per order, k ≤ 7 in TPC-H-like data); the support threshold
    then prunes the edge set, and orientation by part id bounds the
    wedge join. The wedge join keys on a SINGLE part id (the wedge
    center), so a hub part would funnel all its wedges through one
    reducer — it runs through operators/skew.salted_join (deterministic
    row salt on the e1 side, e2 replicated n_salts×), spreading each
    hub across 8 reducers for 8× replication of the sparse edge set.
    The closing join keys on the composite (pa, pb) pair — far less
    skew-prone — and stays a plain shuffle join. No broadcast
    assumption, no driver materialization. Raising EDGE_SUPPORT is the
    knob that keeps the edge set sparse at 100 TB.
    """
    from wally_spark.operators.baskets import basket_pair_counts
    from wally_spark.operators.skew import salted_join

    li = load_tables(spark, sf_dir)["lineitem"]
    # r13: operators/baskets self-join-free edge build (identical pair
    # multiset; two exchanges instead of four, no SMJ — see baskets.py)
    edges = (
        basket_pair_counts(li, "l_orderkey", "l_partkey")
        .where(F.col("c") >= EDGE_SUPPORT)
        .select("pa", "pb")
    )
    # the support-pruned edge set is referenced 4× (e1/e2/e3 +
    # n_edges); materialize once instead of recomputing the distinct +
    # basket pair build per reference. pin() upgrades to a RELIABLE
    # checkpoint when spark.wally.checkpointDir / WALLY_CHECKPOINT_DIR
    # is set — at 100 TB an executor-pinned copy dies with its executor
    edges = pin(edges)
    wedges = salted_join(
        edges.select(F.col("pa").alias("w_pa"), F.col("pb").alias("k")),
        edges.select(F.col("pa").alias("k"), F.col("pb").alias("w_pb")),
        on="k",
        n_salts=8,
    )
    e3 = edges.alias("e3")
    tri = wedges.join(
        e3,
        (F.col("e3.pa") == F.col("w_pa")) & (F.col("e3.pb") == F.col("w_pb")),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    n_edges = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    # 1-row × 1-row combine: broadcast-NL over two single-row aggregate
    # sides (allow-listed in tests/test_plans.py::test_no_cartesian_anywhere).
    return n_edges.crossJoin(F.broadcast(tri))


# --- PageRank over the customer-part co-purchase graph ----------------------
PR_ITERS = 3
PR_INIT = 1000  # milli-rank units


def _pr_round_sql(prev: str, r: int) -> str:
    """One exact-integer PageRank round as DuckDB CTEs: per-node share
    = rank div degree (bigint floor division), neighbor sum, then
    r' = 150 + (85 * sum) div 100 — the 0.15/0.85 damping in integer
    milli-rank, identical on any engine."""
    return f"""
s{r} AS (
  SELECT p.node, p.rank // d.deg AS share
  FROM {prev} p JOIN deg d USING (node)
),
c{r} AS (
  SELECT e.dst AS node, sum(s.share)::BIGINT AS insum
  FROM edges e JOIN s{r} s ON s.node = e.src
  GROUP BY e.dst
),
r{r} AS (
  SELECT n.node,
         (150 + (85 * coalesce(c.insum, 0)) // 100)::BIGINT AS rank
  FROM nodes n LEFT JOIN c{r} c USING (node)
)"""


@register(
    "graph_pagerank",
    oracle=f"""
WITH cp AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT 2 * c AS src, 2 * p + 1 AS dst FROM cp
  UNION ALL
  SELECT 2 * p + 1, 2 * c FROM cp
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src AS node, count(*)::BIGINT AS deg FROM edges GROUP BY src),
r0 AS (SELECT node, {PR_INIT}::BIGINT AS rank FROM nodes)
{"".join("," + _pr_round_sql(f"r{r-1}", r) for r in range(1, PR_ITERS + 1))}
SELECT CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'part' END AS side,
       (node // 2)::BIGINT AS key, rank AS rank_milli
FROM r{PR_ITERS}
""",
    tags=("graph", "analytics", "iterative"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite customer-part co-purchase graph —
    the importance/centrality signal curation pipelines use for
    source- or domain-level quality weighting (the classic link-based
    quality prior). Exact integer milli-rank arithmetic: each round is
    share = rank div degree (bigint floor division), an in-neighbor
    sum, and r' = 150 + (85*sum) div 100 — engine- and
    partitioning-independent by construction, so the unrolled-CTE
    DuckDB oracle is hash-exact (the embedding_kmeans technique).

    Scale shape: the edge list (distinct co-purchase pairs, symmetrized)
    is pinned once — PR_ITERS static rounds build ONE lazy plan with no
    driver actions or collects; per round one edge-keyed join + one
    dst-keyed aggregate (map-side combined), both shuffles keyed on
    uniform ids. Rank state is one row per node, never materialized on
    the driver. Damping in integers keeps every round's output exact —
    floats would drift across partitionings at 100 TB."""
    from wally_spark.tables import fan_out

    t = load_tables(spark, sf_dir)
    cp = (
        fan_out(t["lineitem"].select("l_orderkey", "l_partkey"), "l_orderkey")
        .join(t["orders"].select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (2 * F.col("o_custkey")).alias("c"),
            (2 * F.col("l_partkey") + 1).alias("p"),
        )
        .distinct()
    )
    # r14: the r13 pre-partition-inside-the-pin claim was falsified
    # (VERDICT r13 #1): under AQE localCheckpoint yields a LogicalRDD
    # with UnknownPartitioning, so every round still plans its own
    # edge Exchange and the pin-time repartition was a pure ADDED
    # exchange. Default off (see components._prepartition_on); AQE's
    # runtime stage cache dedupes the canonically-identical per-round
    # edge exchanges into one materialized shuffle anyway.
    from wally_spark.operators.components import (
        _prepartition_on,
        _shuffle_width,
    )

    edge_plan = cp.select(F.col("c").alias("src"), F.col("p").alias("dst")).union(
        cp.select(F.col("p").alias("src"), F.col("c").alias("dst"))
    )
    if _prepartition_on(spark):
        edge_plan = edge_plan.repartition(_shuffle_width(spark), "src")
    edges = pin(edge_plan)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    rank = nodes.withColumn("rank", F.lit(PR_INIT).cast("bigint"))
    for _ in range(PR_ITERS):
        share = rank.join(deg, "node").select(
            "node", F.expr("rank div deg").alias("share")
        )
        contrib = (
            edges.join(share, edges["src"] == share["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").cast("bigint").alias("insum"))
        )
        rank = nodes.join(contrib, "node", "left").select(
            "node",
            (150 + F.expr("(85 * coalesce(insum, 0)) div 100"))
            .cast("bigint")
            .alias("rank"),
        )
    return rank.select(
        F.when(F.col("node") % 2 == 0, "cust").otherwise("part").alias("side"),
        F.expr("node div 2").cast("bigint").alias("key"),
        F.col("rank").alias("rank_milli"),
    )


# --- interval-overlap timeline: open order lines per day (r7) ---------------
@register(
    "open_order_lines_daily",
    oracle="""
WITH iv AS (
  SELECT date_trunc('day', o.o_orderdate) AS d0,
         date_trunc('day', l.l_shipdate) + INTERVAL 1 DAY AS d1
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
deltas AS (
  SELECT d0 AS day, 1 AS delta FROM iv
  UNION ALL
  SELECT d1 AS day, -1 AS delta FROM iv
),
daily AS (
  SELECT day,
         sum(delta)::BIGINT AS net,
         sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END)::BIGINT AS n_opened,
         sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END)::BIGINT AS n_closed
  FROM deltas GROUP BY day
)
SELECT day,
       sum(net) OVER (ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ::BIGINT AS open_lines,
       n_opened, n_closed
FROM daily
""",
    tags=("analytics", "timeseries", "intervals"),
)
def open_order_lines_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap timeline: how many order lines are in flight
    (ordered, not yet shipped) on each calendar day — the classic
    sweep-line counting query (concurrent sessions / active intervals)
    over [o_orderdate, l_shipdate] intervals. Each interval becomes a
    +1 event at its start day and a -1 the day after its end; the
    running sum of the per-day net is the open count.

    Scale shape: the fact-fact orderkey join shuffles on its natural
    key (bucket-ready — plans/bucketed.py shows the Exchange-free
    variant shape); the +1/-1 expansion is a flat generator whose mass
    collapses immediately in a map-side-combined per-day aggregate, so
    the global cumulative window runs over one row per calendar day —
    bounded by date range, not data rate (revenue_dod_delta
    precedent)."""
    t = load_tables(spark, sf_dir)
    iv = t["lineitem"].join(
        t["orders"], t["lineitem"]["l_orderkey"] == t["orders"]["o_orderkey"]
    ).select(
        F.date_trunc("day", "o_orderdate").alias("d0"),
        (F.date_trunc("day", "l_shipdate") + F.expr("interval 1 day")).alias(
            "d1"
        ),
    )
    deltas = iv.select(
        F.explode(
            F.array(
                F.struct(F.col("d0").alias("day"), F.lit(1).alias("delta")),
                F.struct(F.col("d1").alias("day"), F.lit(-1).alias("delta")),
            )
        ).alias("e")
    ).select("e.day", "e.delta")
    daily = deltas.groupBy("day").agg(
        F.sum("delta").cast("bigint").alias("net"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_opened"),
        F.sum(F.when(F.col("delta") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_closed"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        F.sum("net").over(w).cast("bigint").alias("open_lines"),
        "n_opened",
        "n_closed",
    )


# --- RFM segmentation over the events stream (r7) ---------------------------
@register(
    "user_rfm_segments",
    oracle="""
WITH per_user AS (
  SELECT user_id, max(ts) AS last_ts, count(*)::BIGINT AS freq,
         sum(floor(1000 * value)::BIGINT)::BIGINT AS monetary_milli
  FROM events GROUP BY user_id
),
ref AS (SELECT max(ts) AS ref_ts FROM events),
scored AS (
  SELECT date_diff('day', date_trunc('day', p.last_ts),
                   date_trunc('day', r.ref_ts))::BIGINT AS recency_days,
         p.freq, p.monetary_milli, p.user_id
  FROM per_user p CROSS JOIN ref r
),
tiles AS (
  SELECT ntile(4) OVER (ORDER BY recency_days DESC, user_id) AS r_score,
         ntile(4) OVER (ORDER BY freq, user_id) AS f_score,
         ntile(4) OVER (ORDER BY monetary_milli, user_id) AS m_score,
         monetary_milli
  FROM scored
)
SELECT r_score::BIGINT AS r_score, f_score::BIGINT AS f_score,
       m_score::BIGINT AS m_score,
       count(*)::BIGINT AS n_users,
       sum(monetary_milli)::BIGINT AS monetary_milli_total
FROM tiles GROUP BY r_score, f_score, m_score
""",
    tags=("analytics", "segmentation", "events"),
)
def user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation — the
    standard customer-analytics quartile grid: per user, days since
    last event, event count, and exact integer monetary mass, each
    scored into quartiles (4 = best; ties broken by user_id so the
    binning is deterministic), then rolled up to the 4×4×4 segment
    cells a campaign targets.

    Scale shape: the raw stream collapses FIRST into one row per user
    (map-side combined; monetary integerized per row so the sum is
    associative). The user relation is UNBOUNDED at 100 TB, so the
    three quartile scores do NOT use a global ntile window (one task
    holding every user) — each runs the exact two-phase distributed
    ntile (operators/prefix.py global_ntile: deterministic-sample
    cuts → per-bucket rank → driver-prefix-summed offsets), which is
    partition-parallel with n_buckets-longs driver state and matches
    SQL ntile's uneven-bucket rule bit-for-bit. 1-row reference-date
    broadcast side; output is at most 64 cells."""
    ev = load_tables(spark, sf_dir)["events"]
    per_user = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.floor(1000 * F.col("value")).cast("bigint"))
        .cast("bigint")
        .alias("monetary_milli"),
    )
    return rfm_grid(per_user)


def rfm_grid(per_user: DataFrame, pinned_out: list | None = None) -> DataFrame:
    """Scoring tail shared by ``user_rfm_segments`` and its streaming
    twin (streaming/ops.rfm_foreach_batch): given the per-user profile
    relation ``(user_id, last_ts, freq, monetary_milli)`` — which is
    what the twin's persistent corpus merges to — score the three
    quartiles with the distributed exact ntile and roll up the 4×4×4
    grid. The reference date is max(last_ts), identical to max(ts)
    over the underlying events.

    ``pinned_out``: callers that materialize the result repeatedly (a
    long-running foreachBatch stream) pass a list to receive the
    internally pinned frame and free_blocks() it after their write —
    otherwise one localCheckpoint block set per call waits on GC."""
    ref = per_user.agg(F.max("last_ts").alias("ref_ts"))
    scored = per_user.crossJoin(F.broadcast(ref)).select(
        F.datediff(
            F.date_trunc("day", "ref_ts"), F.date_trunc("day", "last_ts")
        )
        .cast("bigint")
        .alias("recency_days"),
        "freq",
        "monetary_milli",
        "user_id",
    )
    from wally_spark.operators.prefix import global_ntile_multi

    scored = pin(scored)
    if pinned_out is not None:
        pinned_out.append(scored)
    n_users = scored.count()
    tiles = global_ntile_multi(
        scored,
        [
            # ntile(ORDER BY recency_days DESC, user_id) == ascending
            # order on -recency_days with the same tiebreak
            (-F.col("recency_days"), ["user_id"], "r_score"),
            (F.col("freq"), ["user_id"], "f_score"),
            (F.col("monetary_milli"), ["user_id"], "m_score"),
        ],
        4,
        "user_id",
        total_rows=n_users,
    )
    return tiles.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("monetary_milli").cast("bigint").alias("monetary_milli_total"),
    ).select(
        F.col("r_score").cast("bigint").alias("r_score"),
        F.col("f_score").cast("bigint").alias("f_score"),
        F.col("m_score").cast("bigint").alias("m_score"),
        "n_users",
        "monetary_milli_total",
    )


# --- association rules over co-purchase pairs (r7) --------------------------
BASKET_MIN_SUP = 2  # pair must co-occur in >= this many orders
BASKET_TOPK = 20


@register(
    "basket_rules",
    oracle=f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n_orders FROM op),
item AS (SELECT l_partkey, count(*)::BIGINT AS c FROM op GROUP BY l_partkey),
pair AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*)::BIGINT AS c_ab
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {BASKET_MIN_SUP}
),
rules AS (
  SELECT pa AS antecedent, pb AS consequent, c_ab FROM pair
  UNION ALL
  SELECT pb AS antecedent, pa AS consequent, c_ab FROM pair
)
SELECT r.antecedent::BIGINT AS antecedent, r.consequent::BIGINT AS consequent,
       r.c_ab AS support_n,
       ((1000000 * r.c_ab) // ia.c)::BIGINT AS conf_ppm,
       ((1000000 * r.c_ab * n.n_orders) // (ia.c * ic.c))::BIGINT AS lift_ppm
FROM rules r
JOIN item ia ON ia.l_partkey = r.antecedent
JOIN item ic ON ic.l_partkey = r.consequent
CROSS JOIN n
ORDER BY lift_ppm DESC, antecedent, consequent
LIMIT {BASKET_TOPK}
""",
    tags=("analytics", "basket", "rules"),
)
def basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over co-purchase pairs (the Apriori output
    layer part_cooccurrence stops short of): for each supported pair,
    both directed rules with exact integer confidence
    (ppm of antecedent baskets also containing the consequent) and
    lift (observed/expected co-occurrence) — the two numbers a
    recommender or mix auditor actually thresholds. Pure bigint
    arithmetic end-to-end: 10⁶·c_ab div c_a — no float ever enters,
    so the oracle is exact by construction.

    Scale shape: identical pair generation to part_cooccurrence
    (r13: the operators/baskets self-join-free spelling — per-order
    item sets + array-HOF pair explode, fanout still bounded by
    items-per-order); item counts join on single part ids with no
    broadcast hint (the part dimension scales with SF; AQE broadcasts
    when actually small); the basket total is a 1-row broadcast side;
    final ranking is a distributed top-k."""
    from wally_spark.operators.baskets import basket_item_sets, basket_pairs

    li = load_tables(spark, sf_dir)["lineitem"]
    sets = basket_item_sets(li, "l_orderkey", "l_partkey")
    n = sets.agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    item = (
        sets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    pair = (
        basket_pairs(sets)
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
        .where(F.col("c_ab") >= BASKET_MIN_SUP)
    )
    rules = pair.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("pa").alias("antecedent"),
                    F.col("pb").alias("consequent"),
                    F.col("c_ab"),
                ),
                F.struct(
                    F.col("pb").alias("antecedent"),
                    F.col("pa").alias("consequent"),
                    F.col("c_ab"),
                ),
            )
        ).alias("r")
    ).select("r.antecedent", "r.consequent", "r.c_ab")
    return (
        # item counts are part-DIMENSION-sized, which still scales with
        # SF (no broadcast hint — AQE broadcasts when actually small;
        # the join keys are single part ids either way)
        rules.join(
            item.withColumnRenamed("c", "ca"),
            F.col("antecedent") == F.col("l_partkey"),
        )
        .drop("l_partkey")
        .join(
            item.withColumnRenamed("c", "cc"),
            F.col("consequent") == F.col("l_partkey"),
        )
        .drop("l_partkey")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("antecedent").cast("bigint").alias("antecedent"),
            F.col("consequent").cast("bigint").alias("consequent"),
            F.col("c_ab").alias("support_n"),
            F.expr("(1000000 * c_ab) div ca").cast("bigint").alias("conf_ppm"),
            F.expr("(1000000 * c_ab * n_orders) div (ca * cc)")
            .cast("bigint")
            .alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "antecedent", "consequent")
        .limit(BASKET_TOPK)
    )


# --- open-order aging snapshot ----------------------------------------------
AGING_SNAPSHOT = "1998-01-01"  # mid-range of the o_orderdate span
AGING_EDGES = (30, 90, 180)  # band upper bounds in days


@register(
    "orders_aging_bands",
    oracle=f"""
WITH open_o AS (
  SELECT o.o_orderkey, o.o_totalprice,
         date_diff('day', o.o_orderdate, TIMESTAMP '{AGING_SNAPSHOT}')
           AS age_days
  FROM orders o
  WHERE o.o_orderdate <= TIMESTAMP '{AGING_SNAPSHOT}'
    AND EXISTS (SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > TIMESTAMP '{AGING_SNAPSHOT}')),
banded AS (
  SELECT CASE WHEN age_days <= {AGING_EDGES[0]} THEN 0
              WHEN age_days <= {AGING_EDGES[1]} THEN 1
              WHEN age_days <= {AGING_EDGES[2]} THEN 2
              ELSE 3 END AS band_id,
         o_totalprice
  FROM open_o),
agg AS (
  SELECT band_id, count(*)::BIGINT AS n_orders,
         sum(floor(100 * o_totalprice)::BIGINT)::BIGINT AS total_cents
  FROM banded GROUP BY band_id)
SELECT s.band_id::BIGINT AS band_id,
       CASE s.band_id WHEN 0 THEN '0-{AGING_EDGES[0]}d'
                      WHEN 1 THEN '{AGING_EDGES[0] + 1}-{AGING_EDGES[1]}d'
                      WHEN 2 THEN '{AGING_EDGES[1] + 1}-{AGING_EDGES[2]}d'
                      ELSE '{AGING_EDGES[2]}d+' END AS band,
       coalesce(a.n_orders, 0)::BIGINT AS n_orders,
       coalesce(a.total_cents, 0)::BIGINT AS total_cents
FROM (SELECT unnest(range(0, 4)) AS band_id) s
LEFT JOIN agg a USING (band_id)
""",
    tags=("orders", "analytics", "snapshot"),
)
def orders_aging_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging report at a snapshot date: orders placed on or
    before AGING_SNAPSHOT and not yet fully shipped then, bucketed by
    age into standard AR-style aging bands with order counts and value
    mass (exact floored cents, the rfm monetary protocol) — the
    warehouse backlog report open_order_lines_daily's
    sweep-line generalizes over all days, answered exactly for one
    audit date.

    Scale shape: "not fully shipped" ≡ EXISTS a lineitem shipping
    after the snapshot, so the probe side is lineitem FILTERED to
    l_shipdate > snapshot at the parquet scan (pushed predicate) and
    deduped to order keys — a semi-join against the date-filtered
    orders scan, never a max-per-order aggregate over all of lineitem.
    The rollup is 4 bands joined to a generated spine so empty bands
    report zeros (resample_1h protocol)."""
    t = load_tables(spark, sf_dir)
    snap = F.lit(AGING_SNAPSHOT).cast("timestamp")
    still_open = (
        t["lineitem"].where(F.col("l_shipdate") > snap).select("l_orderkey")
    )
    open_o = (
        t["orders"]
        .where(F.col("o_orderdate") <= snap)
        .join(still_open, F.col("o_orderkey") == F.col("l_orderkey"), "semi")
        .select(
            F.datediff(snap, F.col("o_orderdate")).alias("age_days"),
            "o_totalprice",
        )
    )
    e0, e1, e2 = AGING_EDGES
    banded = open_o.select(
        F.when(F.col("age_days") <= e0, 0)
        .when(F.col("age_days") <= e1, 1)
        .when(F.col("age_days") <= e2, 2)
        .otherwise(3)
        .alias("band_id"),
        "o_totalprice",
    )
    agg = banded.groupBy("band_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.floor(100 * F.col("o_totalprice")).cast("bigint"))
        .cast("bigint")
        .alias("total_cents"),
    )
    spine = spark.range(4).select(F.col("id").cast("int").alias("band_id"))
    label = (
        F.when(F.col("band_id") == 0, f"0-{e0}d")
        .when(F.col("band_id") == 1, f"{e0 + 1}-{e1}d")
        .when(F.col("band_id") == 2, f"{e1 + 1}-{e2}d")
        .otherwise(f"{e2}d+")
    )
    return spine.join(agg, "band_id", "left").select(
        F.col("band_id").cast("bigint").alias("band_id"),
        label.alias("band"),
        F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
        F.coalesce("total_cents", F.lit(0)).cast("bigint").alias("total_cents"),
    )


# --- supplier fulfillment-latency report (r8) ---------------------------------
LATE_DAYS = 60  # ship lag beyond this counts as a late line


@register(
    "supplier_latency_report",
    oracle=f"""
SELECT l.l_suppkey AS suppkey,
       count(*)::BIGINT AS n_lines,
       floor(avg(date_diff('day', o.o_orderdate, l.l_shipdate)))::BIGINT
         AS avg_lag_days,
       max(date_diff('day', o.o_orderdate, l.l_shipdate))::BIGINT
         AS max_lag_days,
       sum(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                     > {LATE_DAYS} THEN 1 ELSE 0 END)::BIGINT AS n_late,
       (10000 * sum(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              > {LATE_DAYS} THEN 1 ELSE 0 END)
         // count(*))::BIGINT AS late_bp
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY l.l_suppkey
""",
    tags=("tpch-ext", "analytics", "report"),
)
def supplier_latency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier fulfillment-latency rollup — the operational twin of
    Q21's "suppliers who kept waiting": per supplier, the order-to-ship
    lag distribution (avg floored to whole days, max, and the share of
    lines beyond LATE_DAYS in basis points). Q21 finds the guilty
    multi-supplier orders; this scores EVERY supplier continuously —
    the vendor-SLA dashboard a fulfillment pipeline actually monitors.

    Scale shape: one lineitem⋈orders equi-join on orderkey (both fact
    tables — the shuffle is inherent and co-partitions with the
    bucketed q3/q18 layout when present), then a supplier-bounded
    aggregate, map-side combined. date_diff in whole days keeps every
    output bigint-exact."""
    t = load_tables(spark, sf_dir)
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    j = t["lineitem"].join(
        t["orders"], F.col("l_orderkey") == F.col("o_orderkey")
    )
    return j.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.floor(F.avg(lag)).cast("bigint").alias("avg_lag_days"),
        F.max(lag).cast("bigint").alias("max_lag_days"),
        F.sum((lag > LATE_DAYS).cast("bigint")).cast("bigint").alias("n_late"),
        F.expr(
            f"10000 * sum(cast(datediff(l_shipdate, o_orderdate) > {LATE_DAYS}"
            " as bigint)) div count(1)"
        )
        .cast("bigint")
        .alias("late_bp"),
    )


# --- fact-table data-quality audit (r8) ----------------------------------------
@register(
    "fact_dq_audit",
    oracle="""
WITH j AS (
  SELECT l.l_quantity, l.l_extendedprice, l.l_discount, l.l_tax,
         l.l_shipdate, o.o_orderdate
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT r.rule, r.n_violations, r.n_rows FROM (
  SELECT 'nonpositive_quantity' AS rule,
         sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)::BIGINT
           AS n_violations,
         count(*)::BIGINT AS n_rows FROM j
  UNION ALL
  SELECT 'nonpositive_price',
         sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)::BIGINT,
         count(*)::BIGINT FROM j
  UNION ALL
  SELECT 'discount_out_of_range',
         sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
           ::BIGINT,
         count(*)::BIGINT FROM j
  UNION ALL
  SELECT 'tax_out_of_range',
         sum(CASE WHEN l_tax < 0 OR l_tax > 1 THEN 1 ELSE 0 END)::BIGINT,
         count(*)::BIGINT FROM j
  UNION ALL
  SELECT 'ship_before_order',
         sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)::BIGINT,
         count(*)::BIGINT FROM j
) r
""",
    tags=("analytics", "quality", "audit"),
)
def fact_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-table data-quality audit — the ingest gate a warehouse
    pipeline runs before facts reach queries (Deequ/expectations
    shape): five constraint rules (non-positive quantity/price,
    discount/tax out of [0,1], ship-before-order) evaluated in ONE
    pass over lineitem⋈orders, reported as (rule, violations, rows) so
    a scheduler can diff against yesterday's audit and block the load
    on a new violation class.

    Scale shape: every rule is a conditional-sum aggregate over the
    same join (one inherent orderkey shuffle, map-side combined to a
    single partial row per task); rules UNPIVOT from one aggregate row
    via a literal stack — never five scans. Output bounded at 5
    rows."""
    t = load_tables(spark, sf_dir)
    j = t["lineitem"].join(
        t["orders"], F.col("l_orderkey") == F.col("o_orderkey")
    )
    agg = j.agg(
        F.sum((F.col("l_quantity") <= 0).cast("bigint")).alias("v1"),
        F.sum((F.col("l_extendedprice") <= 0).cast("bigint")).alias("v2"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast(
                "bigint"
            )
        ).alias("v3"),
        F.sum(
            ((F.col("l_tax") < 0) | (F.col("l_tax") > 1)).cast("bigint")
        ).alias("v4"),
        F.sum(
            (F.col("l_shipdate") < F.col("o_orderdate")).cast("bigint")
        ).alias("v5"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return agg.selectExpr(
        """stack(5,
          'nonpositive_quantity', v1,
          'nonpositive_price', v2,
          'discount_out_of_range', v3,
          'tax_out_of_range', v4,
          'ship_before_order', v5) as (rule, n_violations)""",
        "n as n_rows",
    )


# --- OLS price elasticity (r8) -----------------------------------------------
@register(
    "price_quantity_elasticity",
    oracle="""
WITH xy AS (
  SELECT p.p_brand AS brand,
         CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
           // CAST(l.l_quantity AS BIGINT) // 100 AS x,
         CAST(l.l_quantity AS BIGINT) AS y
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
m AS (
  SELECT brand, count(*)::BIGINT AS n,
         sum(x) // count(*) AS mx, sum(y) // count(*) AS my
  FROM xy GROUP BY brand),
s AS (
  SELECT xy.brand, any_value(m.n) AS n,
         any_value(m.mx) AS mx, any_value(m.my) AS my,
         sum((x - mx) * (y - my))::BIGINT AS sxy,
         sum((x - mx) * (x - mx))::BIGINT AS sxx,
         sum((y - my) * (y - my))::BIGINT AS syy
  FROM xy JOIN m ON m.brand = xy.brand GROUP BY xy.brand)
SELECT brand, n, mx::BIGINT AS mean_price_dollars, my::BIGINT AS mean_qty,
       CAST(floor(1000000.0 * sxy / sxx) AS BIGINT) AS slope_micro,
       CAST(floor(10000.0 * (sxy::DOUBLE * sxy::DOUBLE)
                  / (sxx::DOUBLE * syy::DOUBLE)) AS BIGINT) AS r2_bp
FROM s
""",
    tags=("analytics", "regression"),
)
def price_quantity_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS slope of order quantity on unit price (dollars) —
    regression AS AN AGGREGATE, no ML library: slope = S_xy / S_xx
    over mean-centered integer deviations, reported in micro-units of
    quantity per dollar, plus r² in basis points.

    Two-pass centering is the 100 TB design, not a convenience: raw
    second moments (n·Σxy − ΣxΣy) overflow int64 near 10^9 rows
    (n·Σxy ~ 10^22), while centered deviation products stay ~10^15.
    Pass 1 computes floored integer means per brand (map-side
    combined, |brands| rows); pass 2 re-scans with the means joined
    back BROADCAST (a dimension-sized relation) and accumulates exact
    bigint deviation sums. The only floats are the final two display
    divisions — each one IEEE op, identical on both engines. The
    fact⋈part join keys on partkey (uniform); nothing shuffles twice.
    """
    t = load_tables(spark, sf_dir)
    li, part = t["lineitem"], t["part"]
    xy = li.join(part, li.l_partkey == part.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.expr(
            "cast(floor(l_extendedprice * 100.0 + 0.5) as bigint)"
            " div cast(l_quantity as bigint) div 100"
        ).alias("x"),
        F.col("l_quantity").cast("bigint").alias("y"),
    )
    m = xy.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("sum(x) div count(1)").alias("mx"),
        F.expr("sum(y) div count(1)").alias("my"),
    )
    s = (
        xy.join(F.broadcast(m), "brand")
        .groupBy("brand")
        .agg(
            F.first("n").alias("n"),
            F.first("mx").alias("mx"),
            F.first("my").alias("my"),
            F.sum((F.col("x") - F.col("mx")) * (F.col("y") - F.col("my")))
            .cast("bigint")
            .alias("sxy"),
            F.sum((F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx")))
            .cast("bigint")
            .alias("sxx"),
            F.sum((F.col("y") - F.col("my")) * (F.col("y") - F.col("my")))
            .cast("bigint")
            .alias("syy"),
        )
    )
    return s.select(
        "brand",
        "n",
        F.col("mx").alias("mean_price_dollars"),
        F.col("my").alias("mean_qty"),
        F.floor(1000000.0 * F.col("sxy") / F.col("sxx"))
        .cast("bigint")
        .alias("slope_micro"),
        F.floor(
            10000.0
            * (F.col("sxy").cast("double") * F.col("sxy").cast("double"))
            / (F.col("sxx").cast("double") * F.col("syy").cast("double"))
        )
        .cast("bigint")
        .alias("r2_bp"),
    )


# --- supplier concentration HHI (r8) -----------------------------------------
HHI_CONCENTRATED = 25_000_000  # DOJ 0.25 on the bp² (0..10^8) scale
HHI_MODERATE = 15_000_000


@register(
    "supplier_concentration_hhi",
    oracle=f"""
WITH sq AS (
  SELECT l_partkey AS part, l_suppkey AS supp,
         sum(CAST(l_quantity AS BIGINT))::BIGINT AS q
  FROM lineitem GROUP BY 1, 2),
sh AS (
  SELECT part, supp, q,
         (10000 * q) // sum(q) OVER (PARTITION BY part) AS share_bp
  FROM sq)
SELECT part,
       count(*)::BIGINT AS n_suppliers,
       max(share_bp)::BIGINT AS top_share_bp,
       sum(share_bp * share_bp)::BIGINT AS hhi,
       CASE WHEN sum(share_bp * share_bp) >= {HHI_CONCENTRATED}
              THEN 'concentrated'
            WHEN sum(share_bp * share_bp) >= {HHI_MODERATE}
              THEN 'moderate'
            ELSE 'competitive' END AS band
FROM sh GROUP BY part
""",
    tags=("analytics", "procurement"),
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain concentration per part: each supplier's share of
    the part's shipped quantity in basis points, Herfindahl index =
    Σ share_bp² (0..10^8 scale), banded at the DOJ 0.25 / 0.15
    thresholds — the procurement-risk report flagging parts that
    depend on one vendor. All-integer: floored bp shares square and
    sum exactly on any engine.

    Scale shape: one (part, supp)-keyed aggregate (map-side combined)
    collapses the fact table to at most |part|×|suppliers-per-part|
    rows; the share window partitions by PART — millions of parallel
    partitions each a handful of rows, never global; the final
    part-keyed aggregate reuses the same partitioning (no extra
    shuffle under AQE). Output is |part|-bounded."""
    li = load_tables(spark, sf_dir)["lineitem"]
    sq = li.groupBy(
        F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("supp")
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q"))
    w = Window.partitionBy("part")
    sh = sq.select(
        "part",
        F.expr("10000 * q").alias("qq"),
        F.sum("q").over(w).alias("tot"),
    ).select("part", F.expr("qq div tot").alias("share_bp"))
    hhi = F.sum(F.col("share_bp") * F.col("share_bp"))
    return sh.groupBy("part").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.max("share_bp").cast("bigint").alias("top_share_bp"),
        hhi.cast("bigint").alias("hhi"),
        F.when(hhi >= HHI_CONCENTRATED, "concentrated")
        .when(hhi >= HHI_MODERATE, "moderate")
        .otherwise("competitive")
        .alias("band"),
    )


# --- degree assortativity over the co-purchase graph (r8) --------------------
@register(
    "graph_degree_assortativity",
    oracle=f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
edges AS (
  SELECT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= {EDGE_SUPPORT}),
deg AS (
  SELECT node, count(*)::BIGINT AS d FROM (
    SELECT pa AS node FROM edges UNION ALL SELECT pb FROM edges)
  GROUP BY node),
sym AS (
  SELECT da.d AS x, db.d AS y
  FROM edges e JOIN deg da ON da.node = e.pa JOIN deg db ON db.node = e.pb
  UNION ALL
  SELECT db.d, da.d
  FROM edges e JOIN deg da ON da.node = e.pa JOIN deg db ON db.node = e.pb),
m AS (
  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx
  FROM sym)
SELECT n, sx, sxy, sxx,
       CAST(floor(1000.0 * (n * sxy - sx * sx)
                  / nullif(n * sxx - sx * sx, 0)) AS BIGINT) AS r_milli
FROM m
""",
    tags=("graph", "analytics"),
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph — Newman's r: do
    well-connected parts co-sell with other hubs (r>0, catalog has a
    'core basket') or with niche parts (r<0, hub-and-spoke)? Pearson
    correlation of endpoint degrees over the symmetrized edge list,
    exact integer moment sums (sym makes Σx=Σy and Σx²=Σy², so r =
    (nΣxy−(Σx)²)/(nΣx²−(Σx)²)); the single float division is
    display-only (the price_quantity_elasticity convention).

    Scale shape: same support-pruned edge build as
    graph_triangle_count (per-order O(k²) fanout, k small); degrees
    via one union+aggregate; two uniform node-keyed equi-joins attach
    endpoint degrees; ONE 1-row moment aggregate — no windows, no
    driver state. Moment sums are int64: |r| bounds need deg²·E <
    2^63, i.e. safe to ~10^6-degree hubs on 10^10-edge graphs;
    beyond that, mean-center first (two-pass) before squaring."""
    from wally_spark.operators.baskets import basket_pair_counts

    li = load_tables(spark, sf_dir)["lineitem"]
    # r13: operators/baskets self-join-free edge build (see baskets.py)
    edges = pin(
        basket_pair_counts(li, "l_orderkey", "l_partkey")
        .where(F.col("c") >= EDGE_SUPPORT)
        .select("pa", "pb")
    )
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    da = deg.select(F.col("node").alias("pa"), F.col("d").alias("x"))
    db = deg.select(F.col("node").alias("pb"), F.col("d").alias("y"))
    attached = edges.join(da, "pa").join(db, "pb")
    sym = attached.select("x", "y").unionAll(
        attached.select(F.col("y").alias("x"), F.col("x").alias("y"))
    )
    return sym.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    ).selectExpr(
        "n", "sx", "sxy", "sxx",
        "CAST(floor(1000.0 * (n * sxy - sx * sx)"
        " / nullif(n * sxx - sx * sx, 0)) AS BIGINT) AS r_milli",
    )


# --- GROUPING SETS revenue summary (r8) --------------------------------------
@register(
    "orders_grouping_sets",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status_label,
       coalesce(o_orderpriority, 'ALL') AS priority_label,
       count(*)::BIGINT AS n_orders,
       sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))::BIGINT
         AS revenue_cents
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), (o_orderpriority), ())
""",
    tags=("orders", "analytics", "groupingsets"),
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS lane (cube_pricing and rollup_orders
    cover the CUBE/ROLLUP shorthands; this is the general form a BI
    layer emits): order counts and exact cent revenue at (status,
    priority), each single dimension, and the grand total, with
    grouped-out dimensions labeled 'ALL' (both columns are non-null in
    the data, so the label is unambiguous).

    Scale shape: Spark expands grouping sets into one Expand + a
    single map-side-combined aggregate — one shuffle regardless of how
    many sets; output bounded by |statuses|×|priorities|."""
    o = load_tables(spark, sf_dir)["orders"]
    return (
        o.groupingSets(
            [
                ["o_orderstatus", "o_orderpriority"],
                ["o_orderstatus"],
                ["o_orderpriority"],
                [],
            ],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status_label"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority_label"),
            "n_orders",
            "revenue_cents",
        )
    )


# --- heavy-hitter / skew profiling report (r8) -------------------------------
HH_TOP_K = 5


@register(
    "heavy_hitters_report",
    oracle=f"""
WITH u AS (
  SELECT 'events.user_id' AS col_name, CAST(user_id AS VARCHAR) AS key,
         count(*)::BIGINT AS n FROM events GROUP BY 2
  ORDER BY n DESC, key LIMIT {HH_TOP_K}),
et AS (
  SELECT 'events.event_type', event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 2 ORDER BY n DESC, event_type LIMIT {HH_TOP_K}),
pk AS (
  SELECT 'lineitem.l_partkey', CAST(l_partkey AS VARCHAR),
         count(*)::BIGINT AS n
  FROM lineitem GROUP BY 2 ORDER BY n DESC, 2 LIMIT {HH_TOP_K}),
ck AS (
  SELECT 'orders.o_custkey', CAST(o_custkey AS VARCHAR),
         count(*)::BIGINT AS n
  FROM orders GROUP BY 2 ORDER BY n DESC, 2 LIMIT {HH_TOP_K}),
tot AS (
  SELECT 'events.user_id' AS col_name, count(*)::BIGINT AS total FROM events
  UNION ALL SELECT 'events.event_type', count(*) FROM events
  UNION ALL SELECT 'lineitem.l_partkey', count(*) FROM lineitem
  UNION ALL SELECT 'orders.o_custkey', count(*) FROM orders),
hh AS (
  SELECT * FROM u UNION ALL SELECT * FROM et
  UNION ALL SELECT * FROM pk UNION ALL SELECT * FROM ck)
SELECT hh.col_name, hh.key, hh.n,
       ((10000 * hh.n) // tot.total)::BIGINT AS share_bp
FROM hh JOIN tot ON tot.col_name = hh.col_name
""",
    tags=("analytics", "profiling", "skew"),
)
def heavy_hitters_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-diagnosis profiling report — the tool that tells an
    operator WHICH keys need salting before a big join: exact top-K
    heavy hitters (count + share bp) for the join/group columns the
    engine shuffles on most (events.user_id, events.event_type,
    lineitem.l_partkey, orders.o_custkey). Deterministic tie-break
    (count desc, key asc).

    Scale shape: each column is one map-side-combined count aggregate
    followed by orderBy().limit(K) — Spark compiles that to
    TakeOrderedAndProject, a distributed partial top-K with NO
    single-partition window and no full sort; per-table totals are
    1-row aggregates joined on the 8-row report. Unioned plans share
    nothing, so AQE runs the four pipelines independently."""
    t = load_tables(spark, sf_dir)
    specs = [
        ("events.user_id", t["events"], F.col("user_id").cast("string")),
        ("events.event_type", t["events"], F.col("event_type")),
        ("lineitem.l_partkey", t["lineitem"], F.col("l_partkey").cast("string")),
        ("orders.o_custkey", t["orders"], F.col("o_custkey").cast("string")),
    ]
    hh = None
    tot = None
    for name, df, keycol in specs:
        top = (
            df.groupBy(keycol.alias("key"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .orderBy(F.col("n").desc(), F.col("key"))
            .limit(HH_TOP_K)
            .select(F.lit(name).alias("col_name"), "key", "n")
        )
        one_tot = df.agg(F.count(F.lit(1)).cast("bigint").alias("total")).select(
            F.lit(name).alias("col_name"), "total"
        )
        hh = top if hh is None else hh.unionAll(top)
        tot = one_tot if tot is None else tot.unionAll(one_tot)
    return hh.join(F.broadcast(tot), "col_name").selectExpr(
        "col_name", "key", "n",
        "CAST((10000 * n) div total AS BIGINT) AS share_bp",
    )


# --- Laspeyres monthly price index (r8) --------------------------------------
@register(
    "price_index_laspeyres",
    oracle="""
WITH pm AS (
  SELECT l_partkey AS pk, date_trunc('month', l_shipdate) AS m,
         (sum(CAST(floor(100.0 * l_extendedprice / l_quantity) AS BIGINT))
          // count(*))::BIGINT AS p_cents,
         sum(CAST(floor(l_quantity + 0.5) AS BIGINT))::BIGINT AS q_units
  FROM lineitem GROUP BY 1, 2),
base AS (SELECT min(m) AS m0 FROM pm),
b AS (
  SELECT pm.pk, pm.p_cents AS p0, pm.q_units AS q0
  FROM pm, base WHERE pm.m = base.m0)
SELECT epoch(pm.m)::BIGINT AS month_epoch,
       count(*)::BIGINT AS n_parts,
       ((10000 * sum(b.q0 * pm.p_cents)) // nullif(sum(b.q0 * b.p0), 0))
         ::BIGINT AS index_bp
FROM pm JOIN b ON b.pk = pm.pk
GROUP BY 1
""",
    tags=("analytics", "pricing", "index"),
)
def price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres monthly price index — the fixed-basket inflation
    measure: basket = base-month (first month) quantities; per month,
    index_bp = 10000 · Σ q0·p_m / Σ q0·p0 over parts priced in both
    the base month and month m. Unit prices integerized per line
    (floor(100·ext/qty) cents, both engines' IEEE double division
    agrees bit-for-bit), then averaged per (part, month) with integer
    div — no float accumulation anywhere.

    Scale shape: ONE (part, month)-keyed aggregate over lineitem (one
    shuffle, uniform keys); the base-month relation joins back on
    partkey (plain equi-join — |parts| is unbounded, so no broadcast);
    the month rollup is |months|-bounded. Weighted sums are int64 on
    cents × whole units (the milli×milli spelling overflowed at the
    sf1 scale record): q_units·p_cents per part ≤ ~10^11 at TPC-H
    magnitudes, so the 10^4-scaled numerator stays under 2^63 up to
    ~10^3-line part-months on 10^5-part baskets; pre-scale p to
    dollars beyond that."""
    li = load_tables(spark, sf_dir)["lineitem"]
    pm = (
        li.selectExpr(
            "l_partkey AS pk",
            "date_trunc('month', l_shipdate) AS m",
            "CAST(floor(100.0 * l_extendedprice / l_quantity) AS BIGINT)"
            " AS up_cents",
            "CAST(floor(l_quantity + 0.5) AS BIGINT) AS lq_units",
        )
        .groupBy("pk", "m")
        .agg(
            F.expr("CAST(sum(up_cents) div count(1) AS BIGINT)").alias(
                "p_cents"
            ),
            F.sum("lq_units").cast("bigint").alias("q_units"),
        )
    )
    base = pm.agg(F.min("m").alias("m0"))
    b = (
        pm.join(F.broadcast(base), pm["m"] == base["m0"])
        .select(
            F.col("pk"),
            F.col("p_cents").alias("p0"),
            F.col("q_units").alias("q0"),
        )
    )
    return (
        pm.join(b, "pk")
        .groupBy(F.unix_timestamp("m").cast("bigint").alias("month_epoch"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.expr(
                "CAST((10000 * sum(q0 * p_cents))"
                " div nullif(sum(q0 * p0), 0) AS BIGINT)"
            ).alias("index_bp"),
        )
    )


# --- local clustering coefficient (r9) ---------------------------------------
@register(
    "graph_clustering_coeff",
    oracle=f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (
  SELECT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= {EDGE_SUPPORT}),
deg AS (
  SELECT node, count(*)::BIGINT AS deg FROM (
    SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
  GROUP BY node),
tri AS (
  SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
  FROM e e1
  JOIN e e2 ON e2.pa = e1.pb
  JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
pt AS (
  SELECT node, count(*)::BIGINT AS n_tri FROM (
    SELECT a AS node FROM tri UNION ALL
    SELECT b FROM tri UNION ALL
    SELECT c FROM tri)
  GROUP BY node)
SELECT d.node, d.deg, coalesce(pt.n_tri, 0)::BIGINT AS n_tri,
       ((10000 * 2 * coalesce(pt.n_tri, 0))
        // (d.deg * (d.deg - 1)))::BIGINT AS cc_bp
FROM deg d LEFT JOIN pt USING (node)
WHERE d.deg >= 2
ORDER BY d.node
""",
    tags=("analytics", "graph"),
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node of the co-purchase graph
    — the classic "how clique-like is this part's neighborhood"
    community signal (cc = 2*triangles / deg*(deg-1), in basis
    points): same support-pruned edge set as graph_triangle_count,
    triangles enumerated ONCE by the oriented two-join, then each
    triangle credits all three corners via one 3-wide explode.

    Scale shape (graph_triangle_count's discipline, this file:73): the
    wedge join keys on the single wedge-center id and runs through
    operators/skew.salted_join (hubs scatter across 8 reducers); the
    closing join keys on the composite pair; degrees come from one
    explode + count; the final deg⋈tri join is uniform on node id.
    Per-node output is parts-bounded (the graph's node set), never
    pair- or wedge-sized. int64 bounds: deg*(deg-1) <= |parts|² and
    2*10^4*tri fit comfortably (tri per node <= deg² <= 10^12 would
    need deg ~10^6 — a support-pruned co-purchase graph caps far
    below; raise EDGE_SUPPORT if a corpus ever approaches it)."""
    from wally_spark.operators.baskets import basket_pair_counts
    from wally_spark.operators.skew import salted_join

    li = load_tables(spark, sf_dir)["lineitem"]
    # r13: operators/baskets self-join-free edge build (see baskets.py)
    edges = (
        basket_pair_counts(li, "l_orderkey", "l_partkey")
        .where(F.col("c") >= EDGE_SUPPORT)
        .select("pa", "pb")
    )
    edges = pin(edges)  # referenced 4x: wedge sides, closer, degrees
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    wedges = salted_join(
        edges.select(F.col("pa").alias("w_pa"), F.col("pb").alias("k")),
        edges.select(F.col("pa").alias("k"), F.col("pb").alias("w_pb")),
        on="k",
        n_salts=8,
    )
    e3 = edges.alias("e3")
    tri = wedges.join(
        e3,
        (F.col("e3.pa") == F.col("w_pa")) & (F.col("e3.pb") == F.col("w_pb")),
    ).select(F.col("w_pa").alias("a"), F.col("k").alias("b"), F.col("w_pb").alias("c"))
    pt = (
        tri.select(
            F.explode(F.array("a", "b", "c")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tri"))
    )
    return (
        deg.join(pt, "node", "left")
        .where(F.col("deg") >= 2)
        .select(
            "node",
            "deg",
            F.coalesce("n_tri", F.lit(0)).cast("bigint").alias("n_tri"),
            # exact bigint div (not floor(a/b) double division): keeps
            # hash parity with the oracle's // past the 2^53 mantissa
            F.expr("(20000 * coalesce(n_tri, 0)) div (deg * (deg - 1))")
            .cast("bigint")
            .alias("cc_bp"),
        )
        .orderBy("node")
    )


# --- per-column null/distinct profile (r9) -----------------------------------
_DQ_PROFILE_COLS = (
    "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
    "o_orderpriority",
)


@register(
    "dq_null_profile",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name,
       count(*)::BIGINT AS n_rows,
       (count(*) - count({c}))::BIGINT AS n_nulls,
       count(DISTINCT {c})::BIGINT AS n_distinct,
       ((10000 * (count(*) - count({c}))) // count(*))::BIGINT AS null_bp
FROM orders"""
        for c in _DQ_PROFILE_COLS
    )
    + "\nORDER BY col_name",
    tags=("analytics", "quality", "profile"),
)
def dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile of the orders fact — the
    schema-health dashboard every ingest pipeline refreshes (null
    rate + exact cardinality per column; a custkey whose distinct
    count collapses, or a status column suddenly 30% null, is an
    upstream break caught before it poisons joins).

    Scale shape: one single-column aggregate PER PROFILED COLUMN,
    unioned — each branch's parquet scan reads exactly one column
    (column pruning; verified by the ReadSchema plan gate pattern),
    and exact distinct is a per-branch two-phase aggregate on that
    column alone, so no branch ever carries another column's shuffle.
    The profile column set is fixed and dimension-sized; output is
    |columns| rows. (At 100 TB swap exact n_distinct for HLL the way
    approx_distinct_users shadows distinct_users_exact — the profile
    SHAPE is what this lane pins.)"""
    orders = load_tables(spark, sf_dir)["orders"]
    parts = []
    for c in _DQ_PROFILE_COLS:
        parts.append(
            orders.select(c).agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias("n_nulls"),
                F.countDistinct(c).cast("bigint").alias("n_distinct"),
                F.expr(f"(10000 * (count(1) - count({c}))) div count(1)")
                .cast("bigint")
                .alias("null_bp"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("col_name")


# --- event-mix drift between month halves (r9) -------------------------------
@register(
    "schema_drift_report",
    oracle="""
WITH c AS (
  SELECT event_type,
         sum(CASE WHEN extract(day FROM ts) <= 15 THEN 1 ELSE 0 END)
           ::BIGINT AS n_early,
         sum(CASE WHEN extract(day FROM ts) <= 15 THEN 0 ELSE 1 END)
           ::BIGINT AS n_late,
         sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_value
  FROM events GROUP BY event_type)
SELECT event_type, n_early, n_late, n_null_value,
       ((10000 * n_early) // sum(n_early) OVER ())::BIGINT AS share_early_bp,
       ((10000 * n_late) // nullif(sum(n_late) OVER (), 0))::BIGINT
         AS share_late_bp,
       (((10000 * n_late) // nullif(sum(n_late) OVER (), 0))
        - ((10000 * n_early) // sum(n_early) OVER ()))::BIGINT AS drift_bp
FROM c ORDER BY event_type
""",
    tags=("analytics", "quality", "drift"),
)
def schema_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-drift report — the batch sibling of the streaming
    mix-drift monitor (streaming/ops.mix_drift_foreach_batch): event
    mix of the month's FIRST half vs SECOND half, per type — early and
    late counts, null-value count (the schema-decay signal), each
    half's share in basis points, and the signed share drift. A type
    whose share moves 500 bp between halves, or whose values go null,
    is an upstream contract change caught by one query.

    Scale shape: ONE codegen scan with conditional integer sums into a
    types-bounded aggregate; the share windows run over that
    |types|-row relation (documented single-partition by construction
    — the attribution_last_touch convention). Divisions after the
    sums; the late-half divisor is nullif'd (a corpus ending on day 15
    yields NULL late shares in both engines)."""
    early = F.dayofmonth("ts") <= 15
    ev = load_tables(spark, sf_dir)["events"]
    c = ev.groupBy("event_type").agg(
        F.sum(F.when(early, 1).otherwise(0)).cast("bigint").alias("n_early"),
        F.sum(F.when(early, 0).otherwise(1)).cast("bigint").alias("n_late"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_value"),
    )
    share_e = F.expr("(10000 * n_early) div (sum(n_early) over ())").cast(
        "bigint"
    )
    share_l = F.expr(
        "(10000 * n_late) div nullif(sum(n_late) over (), 0)"
    ).cast("bigint")
    return c.select(
        "event_type",
        "n_early",
        "n_late",
        "n_null_value",
        share_e.alias("share_early_bp"),
        share_l.alias("share_late_bp"),
        (share_l - share_e).cast("bigint").alias("drift_bp"),
    ).orderBy("event_type")


# --- common-neighbor link prediction (r9) ------------------------------------
LINKPRED_TOP = 100
# Wedge-center degree cap: a center of degree d spawns d(d-1)/2
# candidate pairs, so hub centers dominate wedge mass quadratically
# while carrying ~zero link-prediction signal (the Adamic-Adar insight:
# a neighbor shared through a hub is weighted 1/log d → ~0; dropping
# hub centers is the binary form of that downweighting). Measured on
# the 10x dup-stress sf1: 298M wedges uncapped → 513k at cap 64 (the
# uncapped lane ran 96.9 s; the sf0.1 graph's max degree is 6, so the
# cap is inert at record scale). Mirrored in the oracle.
LINKPRED_HUB_CAP = 64


@register(
    "graph_link_prediction",
    oracle=f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (
  SELECT a.p AS pa, b.p AS pb
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= {EDGE_SUPPORT}),
deg AS (
  SELECT node, count(*)::BIGINT AS deg FROM (
    SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
  GROUP BY node),
adj AS (
  SELECT pa AS ctr, pb AS leaf FROM e
  UNION ALL SELECT pb AS ctr, pa AS leaf FROM e),
w AS (
  SELECT l1.leaf AS a, l2.leaf AS c, count(*)::BIGINT AS cn
  FROM adj l1
  JOIN deg dk ON dk.node = l1.ctr AND dk.deg <= {LINKPRED_HUB_CAP}
  JOIN adj l2 ON l2.ctr = l1.ctr AND l1.leaf < l2.leaf
  GROUP BY 1, 2),
nonedge AS (
  SELECT w.a, w.c, w.cn FROM w
  LEFT JOIN e ON e.pa = w.a AND e.pb = w.c
  WHERE e.pa IS NULL)
SELECT a, c, cn,
       ((10000 * cn) // (da.deg + dc.deg - cn))::BIGINT AS jaccard_bp
FROM nonedge JOIN deg da ON da.node = a JOIN deg dc ON dc.node = c
ORDER BY cn DESC, a, c
LIMIT {LINKPRED_TOP}
""",
    tags=("analytics", "graph", "linkpred"),
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction over the co-purchase graph —
    the "customers who bought these also buy..." candidate generator:
    for every NON-edge pair joined by at least one wedge, the common
    neighbor count and neighborhood Jaccard (cn / (deg_a + deg_c −
    cn)) in basis points; top-{LINKPRED_TOP} by score with
    deterministic tie-break. Wedges enumerate from the SYMMETRIZED
    adjacency, so cn counts every common neighbor regardless of its id
    relative to the endpoints (the r9 spelling oriented both edges
    pa<pb and missed neighbors outside the (a, c) id interval — r10
    advice fix); the leaf_a < leaf_c canonical filter forms each
    unordered candidate pair once per center.

    Scale shape: same support-pruned edge set and salted wedge join as
    graph_triangle_count (hubs scatter across 8 reducers); candidate
    mass is wedge-bounded and collapses by (a, c) BEFORE the degree
    joins; the existing-edge check is a composite-key anti-join; final
    cut is orderBy+limit → TakeOrderedAndProject (distributed partial
    top-K, no global sort). Raising EDGE_SUPPORT is the 100 TB dial."""
    from wally_spark.operators.baskets import basket_pair_counts
    from wally_spark.operators.skew import salted_join

    li = load_tables(spark, sf_dir)["lineitem"]
    # r13: operators/baskets self-join-free edge build (see baskets.py)
    edges = (
        basket_pair_counts(li, "l_orderkey", "l_partkey", "cnt")
        .where(F.col("cnt") >= EDGE_SUPPORT)
        .select("pa", "pb")
    )
    edges = pin(edges)  # wedge sides + anti-join + degrees
    deg = (
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    # symmetrized adjacency (ctr, leaf): every common neighbor is a
    # wedge center whatever its id — both edge orientations fan out
    adj = edges.select(
        F.col("pa").alias("ctr"), F.col("pb").alias("leaf")
    ).unionAll(
        edges.select(F.col("pb").alias("ctr"), F.col("pa").alias("leaf"))
    )
    # hub-center cap (see LINKPRED_HUB_CAP): only non-hub wedge
    # centers enumerate pairs — a left-semi join on the center key
    # before the wedge join, so hub wedges are never materialized
    ok_centers = deg.where(F.col("deg") <= LINKPRED_HUB_CAP).select("node")
    left = adj.select(F.col("leaf").alias("wa"), F.col("ctr").alias("k")).join(
        ok_centers.withColumnRenamed("node", "k"), "k", "left_semi"
    )
    wedges = salted_join(
        left,
        adj.select(F.col("ctr").alias("k"), F.col("leaf").alias("wc")),
        on="k",
        n_salts=8,
    ).where(F.col("wa") < F.col("wc"))
    cand = wedges.groupBy(
        F.col("wa").alias("a"), F.col("wc").alias("c")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cn"))
    nonedge = cand.join(
        edges,
        (F.col("pa") == F.col("a")) & (F.col("pb") == F.col("c")),
        "left_anti",
    )
    da, dc = deg.alias("da"), deg.alias("dc")
    return (
        nonedge.join(da, F.col("da.node") == F.col("a"))
        .join(dc, F.col("dc.node") == F.col("c"))
        .select(
            "a",
            "c",
            "cn",
            F.expr("(10000 * cn) div (da.deg + dc.deg - cn)")
            .cast("bigint")
            .alias("jaccard_bp"),
        )
        .orderBy(F.desc("cn"), "a", "c")
        .limit(LINKPRED_TOP)
    )


# --- per-brand return-rate report (r9) ---------------------------------------
@register(
    "brand_return_rate",
    oracle="""
WITH j AS (
  SELECT p.p_brand,
         l.l_returnflag,
         l.l_quantity,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
              AS BIGINT) AS net_cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey)
SELECT p_brand,
       count(*)::BIGINT AS n_lines,
       sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::BIGINT
         AS n_returned,
       ((10000 * sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END))
        // count(*))::BIGINT AS return_bp,
       sum(CASE WHEN l_returnflag = 'R' THEN net_cents ELSE 0 END)::BIGINT
         AS returned_cents,
       sum(net_cents)::BIGINT AS net_cents,
       ((10000 * sum(CASE WHEN l_returnflag = 'R' THEN net_cents ELSE 0 END))
        // nullif(sum(net_cents), 0))::BIGINT AS returned_value_bp
FROM j GROUP BY p_brand
ORDER BY p_brand
""",
    tags=("analytics", "tpch", "returns"),
)
def brand_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand return-rate report — the merchandising QA view
    (which brands come back?): line and value return shares in basis
    points over discounted net revenue in exact cents (the
    round(×100) convention of q1's oracle family).

    Scale shape: lineitem⋈part is a uniform equi-join on partkey
    (part is dimension-sized — Catalyst broadcasts it under AQE; the
    plan works either way), ONE conditional-sum aggregate bounded by
    |brands|; divisions after the sums, value divisor nullif'd (an
    all-zero-price brand yields NULL share in both engines)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    part = load_tables(spark, sf_dir)["part"]
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li["l_partkey"] == F.col("p_partkey"),
    ).select(
        "p_brand",
        "l_returnflag",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("net_cents"),
    )
    ret = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    ret_cents = F.when(
        F.col("l_returnflag") == "R", F.col("net_cents")
    ).otherwise(F.lit(0))
    return (
        j.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(ret).cast("bigint").alias("n_returned"),
            F.expr(
                "CAST((10000 * sum(CASE WHEN l_returnflag = 'R' THEN 1"
                " ELSE 0 END)) div count(1) AS BIGINT)"
            ).alias("return_bp"),
            F.sum(ret_cents).cast("bigint").alias("returned_cents"),
            F.sum("net_cents").cast("bigint").alias("net_cents"),
            F.expr(
                "CAST((10000 * sum(CASE WHEN l_returnflag = 'R' THEN net_cents"
                " ELSE 0 END)) div nullif(sum(net_cents), 0) AS BIGINT)"
            ).alias("returned_value_bp"),
        )
        .orderBy("p_brand")
    )


# --- full nation-to-nation trade matrix (r9) ---------------------------------
@register(
    "nation_trade_matrix",
    oracle="""
SELECT supp_nation, cust_nation,
       count(*)::BIGINT AS n_lines,
       sum(net_cents)::BIGINT AS revenue_cents,
       ((10000 * sum(net_cents))
        // sum(sum(net_cents)) OVER ())::BIGINT AS share_bp
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS net_cents
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey) t
GROUP BY supp_nation, cust_nation
ORDER BY supp_nation, cust_nation
""",
    tags=("analytics", "tpch", "join"),
)
def nation_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full nation→nation trade-flow matrix — q7's bilateral query
    generalized to EVERY (supplier nation, customer nation) cell: line
    counts, exact-cent discounted revenue, and each corridor's share
    of world trade in basis points — the world-trade heatmap a supply
    analytics team keeps, and the skew census for planning
    nation-keyed joins.

    Scale shape: the lineitem fact joins orders on orderkey (uniform),
    then BROADCASTS the three dimension sides (customer at TPC-H scale
    is fact-like — it joins on the uniform o_custkey key first and
    only the |nations|-wide name columns broadcast); the rollup is
    |nations|²-bounded (625 cells) and the share window runs over that
    bounded relation. Division after the sums."""
    t = {
        n: load_tables(spark, sf_dir)[n]
        for n in ("lineitem", "orders", "customer", "supplier", "nation")
    }
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"),
    )
    j = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .select(
            "supp_nation",
            "cust_nation",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
            .alias("net_cents"),
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("net_cents").cast("bigint").alias("revenue_cents"),
        )
        .select(
            "supp_nation",
            "cust_nation",
            "n_lines",
            "revenue_cents",
            F.expr("(10000 * revenue_cents) div (sum(revenue_cents) over ())")
            .cast("bigint")
            .alias("share_bp"),
        )
        .orderBy("supp_nation", "cust_nation")
    )


# --- year-over-year revenue growth (r9) --------------------------------------
@register(
    "orders_yoy_growth",
    oracle="""
WITH r AS (
  SELECT n_name AS nation, year(o_orderdate)::BIGINT AS yr,
         count(*)::BIGINT AS n_orders,
         sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))::BIGINT
           AS revenue_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2)
SELECT nation, yr, n_orders, revenue_cents,
       ((revenue_cents - lag(revenue_cents) OVER w) * 10000
        // nullif(lag(revenue_cents) OVER w, 0))::BIGINT AS yoy_bp
FROM r WINDOW w AS (PARTITION BY nation ORDER BY yr)
ORDER BY nation, yr
""",
    tags=("analytics", "tpch", "timeseries"),
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per customer nation — the board
    deck's growth table: exact-cent annual revenue per nation with the
    YoY delta in basis points (negative in shrinking years; NULL for a
    nation's first year — both engines' truncating division agrees on
    negative deltas, verified (-7)//2 == -7 div 2 == -3).

    Scale shape: the orders fact joins customer on the uniform custkey
    (customer is fact-like; only the |nations|-wide dim broadcasts),
    the rollup is |nations|×|years|-bounded, and the lag window runs
    per-nation over that bounded relation — no global ordering.

    Reference parity: multi-year keyed state evolution
    (machida/lib/wallaroo state_computation over keyed partitions)
    re-expressed as a lag window over a bounded rollup."""
    t = load_tables(spark, sf_dir)
    j = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("bigint")
            .alias("cents"),
        )
    )
    r = j.groupBy("nation", "yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )
    return r.select(
        "nation",
        "yr",
        "n_orders",
        "revenue_cents",
        F.expr(
            "CAST((revenue_cents - lag(revenue_cents) OVER"
            " (PARTITION BY nation ORDER BY yr)) * 10000"
            " div nullif(lag(revenue_cents) OVER"
            " (PARTITION BY nation ORDER BY yr), 0) AS BIGINT)"
        ).alias("yoy_bp"),
    ).orderBy("nation", "yr")


# --- join-key skew audit (r9) ------------------------------------------------
@register(
    "join_skew_audit",
    oracle="""
WITH k AS (
  SELECT user_id, count(*)::BIGINT AS n_rows FROM events GROUP BY 1),
t AS (
  SELECT sum(n_rows)::BIGINT AS total, count(*)::BIGINT AS n_keys FROM k)
SELECT user_id, n_rows,
       ((10000 * n_rows) // total)::BIGINT AS share_bp,
       ((10000 * n_rows * n_keys) // total)::BIGINT AS x_avg_bp,
       ((n_rows * 32 + total - 1) // total)::BIGINT AS salt_factor
FROM k, t
ORDER BY n_rows DESC, user_id
LIMIT 10
""",
    tags=("analytics", "skew", "ops"),
)
def join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit — the pre-flight report for any user-keyed
    shuffle at 100 TB: the 10 heaviest user_id keys with their row
    counts, corpus share (bp), multiple-of-average load (bp, =
    n_rows / (total/n_keys)), and the salt factor a 32-way salted join
    would need so this key's largest sub-split carries <= 1/32 of the
    corpus (ceil(n_rows*32/total)) — exactly the parameter
    operators/skew.salted_aggregate takes.

    Scale shape: ONE user-keyed count (map-side combined), a 1-row
    broadcast total, and a TakeOrdered top-10 — never a global sort.
    Int64 bound: 10^4 * n_rows * n_keys <= 10^4 * 10^9 * 10^9 would
    overflow, but n_rows * n_keys <= total * max_key_share keeps real
    corpora under 2^63 through petabyte scale (documented; at 10^12
    events split the product's factors)."""
    e = load_tables(spark, sf_dir)["events"]
    k = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    t = k.agg(
        F.sum("n_rows").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    return (
        k.crossJoin(F.broadcast(t))
        .selectExpr(
            "user_id",
            "n_rows",
            "CAST((10000 * n_rows) div total AS BIGINT) AS share_bp",
            "CAST((10000 * n_rows * n_keys) div total AS BIGINT) AS x_avg_bp",
            "CAST((n_rows * 32 + total - 1) div total AS BIGINT)"
            " AS salt_factor",
        )
        .orderBy(F.col("n_rows").desc(), "user_id")
        .limit(10)
    )


# --- within-brand price dispersion + SKU outliers (r9) -----------------------
@register(
    "brand_price_dispersion",
    oracle="""
WITH c AS (
  SELECT p_brand, p_partkey,
         CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM part),
s AS (
  SELECT p_brand,
         count(*)::BIGINT AS n_parts,
         sum(cents)::BIGINT AS sum_cents,
         sum(cents * cents)::BIGINT AS sumsq_cents
  FROM c GROUP BY 1),
v AS (
  SELECT p_brand, n_parts, sum_cents,
         (sum_cents // n_parts)::BIGINT AS mean_cents,
         round((sumsq_cents::DOUBLE
                - (sum_cents::DOUBLE * sum_cents::DOUBLE)
                  / n_parts::DOUBLE) / n_parts::DOUBLE, 2) AS var_cents2
  FROM s)
SELECT v.p_brand AS brand, v.n_parts, v.mean_cents, v.var_cents2,
       CAST(floor(10000.0 * sqrt(v.var_cents2) / v.mean_cents) AS BIGINT)
         AS cv_bp,
       sum(CASE WHEN abs(c.cents - v.mean_cents)::DOUBLE
                     > 2.0 * sqrt(v.var_cents2)
                THEN 1 ELSE 0 END)::BIGINT AS n_outlier_skus
FROM v JOIN c ON c.p_brand = v.p_brand
GROUP BY 1, 2, 3, 4, 5
ORDER BY brand
""",
    tags=("analytics", "pricing", "quality"),
)
def brand_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-brand price-dispersion report with SKU outlier counts —
    the pricing-integrity audit: per brand, exact-cent price variance
    (population), coefficient of variation in basis points, and the
    number of SKUs priced more than 2 standard deviations from the
    brand mean (mispriced/miscoded listings).

    Float discipline: moments (n, sum, sum-of-squares) are EXACT int64
    in cents (sumsq <= 10^5-cent prices squared x 10^8 parts < 2^63
    through sf100); the variance/sqrt finish is ONE fixed-shape double
    expression per brand row evaluated identically in both engines —
    no cross-row double summation anywhere, so IEEE determinism gives
    hash-exact agreement.

    Scale shape: one |brands|-bounded moment aggregate, then the
    bounded stats BROADCAST back onto parts for the outlier pass —
    two scans, zero wide shuffles."""
    c = load_tables(spark, sf_dir)["part"].select(
        "p_brand",
        F.floor(F.col("p_retailprice") * 100.0 + 0.5)
        .cast("bigint")
        .alias("cents"),
    )
    s = c.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
        F.sum(F.col("cents") * F.col("cents"))
        .cast("bigint")
        .alias("sumsq_cents"),
    )
    v = s.selectExpr(
        "p_brand AS brand",
        "n_parts",
        "CAST(sum_cents div n_parts AS BIGINT) AS mean_cents",
        "round((CAST(sumsq_cents AS DOUBLE)"
        " - (CAST(sum_cents AS DOUBLE) * CAST(sum_cents AS DOUBLE))"
        "   / CAST(n_parts AS DOUBLE)) / CAST(n_parts AS DOUBLE), 2)"
        " AS var_cents2",
    )
    joined = c.join(
        F.broadcast(v), c["p_brand"] == v["brand"], "inner"
    ).select("brand", "n_parts", "mean_cents", "var_cents2", "cents")
    return (
        joined.groupBy("brand", "n_parts", "mean_cents", "var_cents2")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("mean_cents")).cast("double")
                    > 2.0 * F.sqrt(F.col("var_cents2")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outlier_skus")
        )
        .selectExpr(
            "brand",
            "n_parts",
            "mean_cents",
            "var_cents2",
            "CAST(floor(10000.0 * sqrt(var_cents2) / mean_cents) AS BIGINT)"
            " AS cv_bp",
            "n_outlier_skus",
        )
        .orderBy("brand")
    )


# --- observed supply redundancy (r9) -----------------------------------------
@register(
    "supplier_redundancy",
    oracle="""
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
pc AS (
  SELECT l_partkey, count(*)::BIGINT AS n_suppliers FROM ps GROUP BY 1)
SELECT p_brand AS brand,
       count(*)::BIGINT AS n_parts,
       sum(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END)::BIGINT
         AS single_source,
       sum(CASE WHEN n_suppliers = 2 THEN 1 ELSE 0 END)::BIGINT
         AS dual_source,
       sum(CASE WHEN n_suppliers >= 3 THEN 1 ELSE 0 END)::BIGINT
         AS multi_source,
       ((10000 * sum(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END))
        // count(*))::BIGINT AS single_source_bp,
       max(n_suppliers)::BIGINT AS max_suppliers
FROM pc JOIN part ON l_partkey = p_partkey
GROUP BY 1
ORDER BY brand
""",
    tags=("analytics", "supply", "risk"),
)
def supplier_redundancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed supply-redundancy audit — the supply-chain risk report:
    from the distinct (part, supplier) pairs actually seen in order
    lines, each part's supplier count, banded single/dual/multi-source,
    rolled up per brand with the single-source share in basis points
    (single-sourced parts are the fragile ones).

    Scale shape: DISTINCT on the composite (partkey, suppkey) key is
    one uniform shuffle (map-side partial distinct first), the per-part
    count rides the same partitioning, the part dim joins on the
    uniform partkey, and the rollup is |brands|-bounded."""
    li = load_tables(spark, sf_dir)["lineitem"]
    part = load_tables(spark, sf_dir)["part"]
    pc = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_suppliers"))
    )
    j = pc.join(part, F.col("l_partkey") == F.col("p_partkey"))
    one = F.when(F.col("n_suppliers") == 1, 1).otherwise(0)
    return (
        j.groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum(one).cast("bigint").alias("single_source"),
            F.sum(F.when(F.col("n_suppliers") == 2, 1).otherwise(0))
            .cast("bigint")
            .alias("dual_source"),
            F.sum(F.when(F.col("n_suppliers") >= 3, 1).otherwise(0))
            .cast("bigint")
            .alias("multi_source"),
            F.expr(
                "(10000 * sum(case when n_suppliers = 1 then 1 else 0 end))"
                " div count(1)"
            )
            .cast("bigint")
            .alias("single_source_bp"),
            F.max("n_suppliers").cast("bigint").alias("max_suppliers"),
        )
        .orderBy("brand")
    )


# --- discount-band effectiveness (r9) ----------------------------------------
@register(
    "discount_band_report",
    oracle="""
WITH l AS (
  SELECT CAST(round(l_discount * 100) AS BIGINT) AS band,
         CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
           AS net_cents,
         CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)
           AS given_cents,
         l_quantity
  FROM lineitem),
b AS (
  SELECT band, count(*)::BIGINT AS n_lines,
         sum(net_cents)::BIGINT AS revenue_cents,
         sum(given_cents)::BIGINT AS discount_cents,
         CAST(sum(l_quantity) AS BIGINT) AS total_qty
  FROM l GROUP BY 1)
SELECT band, n_lines, revenue_cents, discount_cents, total_qty,
       ((10000 * revenue_cents) // sum(revenue_cents) OVER ())::BIGINT
         AS revenue_share_bp,
       (revenue_cents // n_lines)::BIGINT AS rev_per_line_cents,
       (((revenue_cents // n_lines) - first_value(revenue_cents // n_lines)
           OVER (ORDER BY band)) * 10000
        // first_value(revenue_cents // n_lines) OVER (ORDER BY band))::BIGINT
         AS lift_vs_zero_bp
FROM b ORDER BY band
""",
    tags=("analytics", "pricing"),
)
def discount_band_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-effectiveness report — the pricing team's question "do
    discounts buy volume?": per whole-percent discount band, line
    count, exact-cent net revenue, discount dollars given away, unit
    volume, revenue share (bp), revenue per line, and the
    revenue-per-line lift vs the undiscounted band (signed bp; both
    engines truncate toward zero).

    Scale shape: ONE codegen scan → an 11-bounded band aggregate
    (map-side combined); the share/lift windows run over that bounded
    relation. Division after the sums throughout."""
    li = load_tables(spark, sf_dir)["lineitem"]
    l = li.select(
        F.round(F.col("l_discount") * 100).cast("bigint").alias("band"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("net_cents"),
        F.round(F.col("l_extendedprice") * F.col("l_discount") * 100)
        .cast("bigint")
        .alias("given_cents"),
        "l_quantity",
    )
    b = l.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("net_cents").cast("bigint").alias("revenue_cents"),
        F.sum("given_cents").cast("bigint").alias("discount_cents"),
        F.round(F.sum("l_quantity")).cast("bigint").alias("total_qty"),
    )
    return b.selectExpr(
        "band",
        "n_lines",
        "revenue_cents",
        "discount_cents",
        "total_qty",
        "CAST((10000 * revenue_cents) div sum(revenue_cents) OVER ()"
        " AS BIGINT) AS revenue_share_bp",
        "CAST(revenue_cents div n_lines AS BIGINT) AS rev_per_line_cents",
        "CAST(((revenue_cents div n_lines)"
        " - first_value(revenue_cents div n_lines) OVER (ORDER BY band))"
        " * 10000 div first_value(revenue_cents div n_lines)"
        " OVER (ORDER BY band) AS BIGINT) AS lift_vs_zero_bp",
    ).orderBy("band")


# --- referential-integrity audit (r9) ----------------------------------------
@register(
    "dq_referential_audit",
    oracle="""
SELECT 'lineitem->orders' AS check_name,
       (SELECT count(*) FROM lineitem l LEFT JOIN orders o
          ON l.l_orderkey = o.o_orderkey
         WHERE o.o_orderkey IS NULL)::BIGINT AS n_orphans,
       (SELECT count(*) FROM lineitem)::BIGINT AS n_rows
UNION ALL
SELECT 'lineitem->part',
       (SELECT count(*) FROM lineitem l LEFT JOIN part p
          ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL)::BIGINT,
       (SELECT count(*) FROM lineitem)::BIGINT
UNION ALL
SELECT 'lineitem->supplier',
       (SELECT count(*) FROM lineitem l LEFT JOIN supplier s
          ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL)::BIGINT,
       (SELECT count(*) FROM lineitem)::BIGINT
UNION ALL
SELECT 'orders->customer',
       (SELECT count(*) FROM orders o LEFT JOIN customer c
          ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)::BIGINT,
       (SELECT count(*) FROM orders)::BIGINT
UNION ALL
SELECT 'customer->nation',
       (SELECT count(*) FROM customer c LEFT JOIN nation n
          ON c.c_nationkey = n.n_nationkey
         WHERE n.n_nationkey IS NULL)::BIGINT,
       (SELECT count(*) FROM customer)::BIGINT
ORDER BY check_name
""",
    tags=("analytics", "quality", "dq"),
)
def dq_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — the warehouse's foreign-key sweep
    (no FK enforcement exists at 100 TB; this query IS the check):
    orphan counts for every fact→dim edge (lineitem→orders/part/
    supplier, orders→customer, customer→nation) with the scanned row
    count per check. Zero orphans on a consistent corpus; any nonzero
    cell names the broken ingest.

    Scale shape: each check is a LEFT ANTI join counted — the two big
    checks join on uniform keys (orderkey, custkey); part/supplier/
    nation sides broadcast. Each branch scans ONLY its join key
    (column pruning reaches the parquet scan); the union is 5 rows."""
    t = load_tables(spark, sf_dir)

    def check(name, fact, fk, dim, pk, broadcast_dim):
        d = t[dim].select(pk)
        if broadcast_dim:
            d = F.broadcast(d)
        orphans = (
            t[fact]
            .select(fk)
            .join(d, F.col(fk) == F.col(pk), "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
        )
        total = t[fact].agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        return (
            orphans.crossJoin(F.broadcast(total))
            .select(
                F.lit(name).alias("check_name"), "n_orphans", "n_rows"
            )
        )

    checks = [
        check("lineitem->orders", "lineitem", "l_orderkey", "orders",
              "o_orderkey", False),
        check("lineitem->part", "lineitem", "l_partkey", "part",
              "p_partkey", True),
        check("lineitem->supplier", "lineitem", "l_suppkey", "supplier",
              "s_suppkey", True),
        check("orders->customer", "orders", "o_custkey", "customer",
              "c_custkey", False),
        check("customer->nation", "customer", "c_nationkey", "nation",
              "n_nationkey", True),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check_name")


# --- order-priority shipping SLA (r9) ----------------------------------------
@register(
    "priority_sla_report",
    oracle="""
WITH fs AS (
  SELECT l_orderkey, min(l_shipdate) AS first_ship FROM lineitem GROUP BY 1),
j AS (
  SELECT o_orderpriority,
         date_diff('day', o_orderdate::DATE, first_ship::DATE)::BIGINT AS days
  FROM orders JOIN fs ON o_orderkey = l_orderkey)
SELECT o_orderpriority AS priority,
       count(*)::BIGINT AS n_orders,
       sum(CASE WHEN days <= 7 THEN 1 ELSE 0 END)::BIGINT AS within_7d,
       ((10000 * sum(CASE WHEN days <= 7 THEN 1 ELSE 0 END))
        // count(*))::BIGINT AS within_7d_bp,
       sum(CASE WHEN days <= 30 THEN 1 ELSE 0 END)::BIGINT AS within_30d,
       ((10000 * sum(CASE WHEN days <= 30 THEN 1 ELSE 0 END))
        // count(*))::BIGINT AS within_30d_bp,
       (sum(days) // count(*))::BIGINT AS avg_days_floor
FROM j GROUP BY 1 ORDER BY 1
""",
    tags=("analytics", "tpch", "sla"),
)
def priority_sla_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-SLA report per order priority — the ops question q4
    gestures at, answered operationally: for each priority class, how
    many orders had their FIRST line shipped within 7 / 30 days of
    order placement (counts + bp), plus the floored mean days to first
    shipment. An URGENT class missing its 7-day bp is the pager alert.

    Scale shape: one orderkey-keyed min aggregate over lineitem
    (map-side combined), an orderkey equi-join (uniform), and a
    |priorities|-bounded rollup. date_diff on DATE-truncated
    timestamps is exact integer days in both engines."""
    t = load_tables(spark, sf_dir)
    fs = t["lineitem"].groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship")
    )
    j = (
        t["orders"]
        .join(fs, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_orderpriority",
            F.datediff(F.to_date("first_ship"), F.to_date("o_orderdate"))
            .cast("bigint")
            .alias("days"),
        )
    )
    w7 = F.when(F.col("days") <= 7, 1).otherwise(0)
    w30 = F.when(F.col("days") <= 30, 1).otherwise(0)
    return (
        j.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(w7).cast("bigint").alias("within_7d"),
            F.expr(
                "(10000 * sum(case when days <= 7 then 1 else 0 end))"
                " div count(1)"
            )
            .cast("bigint")
            .alias("within_7d_bp"),
            F.sum(w30).cast("bigint").alias("within_30d"),
            F.expr(
                "(10000 * sum(case when days <= 30 then 1 else 0 end))"
                " div count(1)"
            )
            .cast("bigint")
            .alias("within_30d_bp"),
            F.expr("CAST(sum(days) div count(*) AS BIGINT)").alias(
                "avg_days_floor"
            ),
        )
        .orderBy("priority")
    )


# --- round 10: UNPIVOT / melt surface ------------------------------------------
@register(
    "lineitem_charges_unpivot",
    oracle="""
WITH c AS (
  SELECT l_returnflag, l_linestatus, charge, amount_c FROM (
    SELECT l_returnflag, l_linestatus, 'gross' AS charge,
           floor(100 * l_extendedprice)::BIGINT AS amount_c
    FROM lineitem
    UNION ALL
    SELECT l_returnflag, l_linestatus, 'discount',
           floor(100 * (l_extendedprice * l_discount))::BIGINT
    FROM lineitem
    UNION ALL
    SELECT l_returnflag, l_linestatus, 'tax',
           floor(100 * (l_extendedprice * (1 - l_discount) * l_tax))::BIGINT
    FROM lineitem)
)
SELECT l_returnflag, l_linestatus, charge,
       count(*)::BIGINT AS n_lines,
       sum(amount_c)::BIGINT AS total_c,
       (sum(amount_c) // count(*))::BIGINT AS avg_c,
       max(amount_c)::BIGINT AS max_c
FROM c GROUP BY l_returnflag, l_linestatus, charge
""",
    tags=("analytics", "unpivot", "relational"),
)
def lineitem_charges_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt of the lineitem charge components (gross /
    discount / tax, floored cents per row) via ``stack`` — the UNPIVOT
    surface, the inverse of pivot_user_event_totals' PIVOT. One scan;
    stack expands rows 3× INSIDE the scan stage (no shuffle added —
    Generate feeds the partial aggregate directly), then one map-side
    combined aggregate bounded by flags × statuses × 3. The oracle
    spells the same melt as UNION ALL so both engines see identical
    per-row cent arithmetic."""
    li = load_tables(spark, sf_dir)["lineitem"]
    melted = li.selectExpr(
        "l_returnflag",
        "l_linestatus",
        """stack(3,
            'gross',    cast(floor(100 * l_extendedprice) as bigint),
            'discount', cast(floor(100 * (l_extendedprice * l_discount))
                             as bigint),
            'tax',      cast(floor(100 * (l_extendedprice * (1 - l_discount)
                                          * l_tax)) as bigint)
          ) as (charge, amount_c)""",
    )
    return melted.groupBy("l_returnflag", "l_linestatus", "charge").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("amount_c").cast("bigint").alias("total_c"),
        F.expr("cast(sum(amount_c) div count(1) as bigint)").alias("avg_c"),
        F.max("amount_c").cast("bigint").alias("max_c"),
    )


# --- round 10: first/last/nth value window surface -----------------------------
@register(
    "customer_first_last_orders",
    oracle="""
WITH w AS (
  SELECT o_custkey,
         count(*) OVER (PARTITION BY o_custkey) AS n_orders,
         min(o_orderdate) OVER (PARTITION BY o_custkey) AS first_date,
         max(o_orderdate) OVER (PARTITION BY o_custkey) AS last_date,
         first_value(o_totalprice) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS first_price,
         last_value(o_totalprice) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS last_price,
         nth_value(o_totalprice, 2) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS second_price,
         row_number() OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders)
SELECT o_custkey, n_orders::BIGINT AS n_orders, first_date,
       floor(100 * first_price)::BIGINT AS first_price_c,
       floor(100 * last_price)::BIGINT AS last_price_c,
       floor(100 * second_price)::BIGINT AS second_price_c,
       date_diff('day', first_date, last_date)::BIGINT AS span_days
FROM w WHERE rn = 1
""",
    tags=("analytics", "windows", "relational"),
)
def customer_first_last_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-lifecycle frame: first / last / second order
    value over the full partition frame — the first_value / last_value
    / nth_value window surface (user_rfm_segments scores recency;
    this exposes the raw frame functions a lifecycle model reads).
    second_price_c is NULL for single-order customers (nth_value
    semantics, kept nullable on both engines).

    One customer-keyed window pass (uniform key: customers, no skew) +
    a rn=1 cut — shuffle count 1; the frame is ROWS UNBOUNDED both
    directions so first/last/nth are frame-exact, not
    running-frame defaults. Money floors to cents per row; span_days
    is exact date arithmetic."""
    o = load_tables(spark, sf_dir)["orders"]
    wd = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = wd.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = o.select(
        "o_custkey",
        F.count(F.lit(1)).over(frame).cast("bigint").alias("n_orders"),
        F.min("o_orderdate").over(frame).alias("first_date"),
        F.max("o_orderdate").over(frame).alias("last_date"),
        F.first("o_totalprice").over(frame).alias("first_price"),
        F.last("o_totalprice").over(frame).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(frame).alias("second_price"),
        F.row_number().over(wd).alias("rn"),
    )
    return w.where(F.col("rn") == 1).select(
        "o_custkey",
        "n_orders",
        "first_date",
        F.floor(100 * F.col("first_price")).cast("bigint").alias(
            "first_price_c"
        ),
        F.floor(100 * F.col("last_price")).cast("bigint").alias(
            "last_price_c"
        ),
        F.floor(100 * F.col("second_price")).cast("bigint").alias(
            "second_price_c"
        ),
        F.datediff("last_date", "first_date").cast("bigint").alias(
            "span_days"
        ),
    )


# --- round 10: percent_rank / cume_dist window surface -------------------------
@register(
    "orders_value_percentile_bands",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       date_part('month', o_orderdate)::BIGINT AS mon,
       floor(100 * o_totalprice)::BIGINT AS price_c,
       floor(10000 * percent_rank() OVER w)::BIGINT AS pr_bp,
       floor(10000 * cume_dist() OVER w)::BIGINT AS cume_bp
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority, date_part('month', o_orderdate)
             ORDER BY o_totalprice, o_orderkey)
""",
    tags=("analytics", "windows", "relational"),
)
def orders_value_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order value percentile within its (priority, month) cell —
    the percent_rank / cume_dist window surface (rank/ntile/row_number
    are covered elsewhere; these are the two remaining rank-family
    functions a migrating user reaches for). The deterministic
    (o_totalprice, o_orderkey) order makes both functions exact:
    percent_rank = (rank−1)/(n−1) and cume_dist = peers≤/n are pure
    integer ratios through one double division, floored to bp
    identically on both engines.

    Scale: the window partitions by (priority, month) — bounded cells
    that shrink as the date range grows, never the 5-priority hot
    window a bare PARTITION BY priority would plan. One shuffle."""
    o = load_tables(spark, sf_dir)["orders"]
    mon = F.month("o_orderdate").cast("bigint")
    w = Window.partitionBy("o_orderpriority", mon).orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        mon.alias("mon"),
        F.floor(100 * F.col("o_totalprice")).cast("bigint").alias("price_c"),
        F.floor(10000 * F.percent_rank().over(w)).cast("bigint").alias("pr_bp"),
        F.floor(10000 * F.cume_dist().over(w)).cast("bigint").alias("cume_bp"),
    )
