"""User-behavior analytics lanes — round-8 additions (SURVEY §2.4).

  attribution_last_touch  marketing attribution: each purchase credits
                          the user's most recent PRIOR non-purchase
                          event type (the "channel"); per-channel
                          revenue report in exact cents
  user_survival_curve     Kaplan-Meier-style lifetime survival: for
                          each observed lifetime d, how many users
                          lived >= d days
  events_peak_concurrency per-day peak number of simultaneously open
                          activity intervals via the classic +1/-1
                          boundary sweep
  revenue_decile_gains    gains/lift table over the distributed exact
                          ntile operator
  user_churn_features     8-feature churn export over the associative
                          (user, day, type) churn_profile grain (its
                          streaming twin persists exactly those rows)
  cohort_revenue_ltv      first-order-month cohort LTV curve over the
                          associative (custkey, month) ltv_profile
  user_purchase_intervals inter-purchase whole-day gap histogram
  session_conversion_lag  session start → first purchase lag histogram
                          (600 s inactivity sessions)

Reference parity: the reference keeps per-key last-state on a stream
(lib/wallaroo/core/state/state.pony via machida state_computation) —
attribution is the batch face of a last-state lookup; the concurrency
sweep is the batch face of a gauge the reference's metrics hub
(monitoring_hub/) maintains incrementally. All outputs integer-exact
(cents / counts / basis points), so the driver value hash is stable
under any partitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from wally_spark.plans.registry import register
from wally_spark.tables import load_tables

CONCURRENCY_HOLD_S = 300  # an event holds its user "active" this long


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["events"]


# --- last-touch attribution --------------------------------------------------
@register(
    "attribution_last_touch",
    oracle="""
WITH a AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS channel
  FROM events),
c AS (
  SELECT coalesce(channel, 'direct') AS channel,
         count(*)::BIGINT AS n_purchases,
         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::BIGINT
           AS revenue_cents
  FROM a WHERE event_type = 'purchase' GROUP BY 1)
SELECT channel, n_purchases, revenue_cents,
       ((10000 * revenue_cents) // sum(revenue_cents) OVER ())::BIGINT
         AS revenue_share_bp
FROM c
""",
    tags=("events", "behavior", "attribution"),
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase credits its user's most
    recent STRICTLY PRIOR non-purchase event type (order = (ts,
    event_id), so ties are deterministic); purchases with no prior
    touch go to 'direct'. Per channel: purchase count, revenue in
    exact cents (floor(value*100 + 0.5) — one identical IEEE multiply
    on both engines, then bigint sums), and the revenue share in basis
    points.

    Scale shape: ONE window partitioned by user_id (bounded per-user
    partitions, never a global order) carrying the last-non-null
    frame, then a channel-keyed aggregate (map-side combined, channel
    cardinality = event-type vocabulary). The share window runs over
    that |channels|-bounded aggregate output — a dimension-sized
    relation, documented single-partition by construction."""
    e = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touched = e.select(
        "event_type",
        "value",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        )
        .over(w)
        .alias("channel"),
    )
    per_channel = (
        touched.where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum(
                F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )
    share_w = Window.partitionBy()
    return per_channel.select(
        "channel",
        "n_purchases",
        "revenue_cents",
        F.floor(
            (10000 * F.col("revenue_cents"))
            / F.sum("revenue_cents").over(share_w)
        )
        .cast("bigint")
        .alias("revenue_share_bp"),
    )


# --- lifetime survival curve -------------------------------------------------
@register(
    "user_survival_curve",
    oracle="""
WITH lt AS (
  SELECT user_id,
         date_diff('day', date_trunc('day', min(ts)),
                   date_trunc('day', max(ts)))::BIGINT AS lifetime_days
  FROM events GROUP BY user_id),
h AS (
  SELECT lifetime_days, count(*)::BIGINT AS n_users
  FROM lt GROUP BY lifetime_days)
SELECT lifetime_days, n_users,
       sum(n_users) OVER (ORDER BY lifetime_days DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ::BIGINT AS n_surviving,
       ((10000 * sum(n_users) OVER (ORDER BY lifetime_days DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        // sum(n_users) OVER ())::BIGINT AS survival_bp
FROM h
""",
    tags=("events", "behavior", "retention"),
)
def user_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier-style survival: a user's lifetime is the whole-day
    span between their first and last event; for each OBSERVED
    lifetime d the curve reports how many users survived >= d days and
    that count in basis points of all users (the standard step-curve
    evaluation points — days nobody died on add no information).

    Scale shape: one user-keyed min/max aggregate (map-side combined),
    then a histogram keyed by lifetime_days whose cardinality is
    bounded by the corpus time SPAN IN DAYS — the reverse-cumulative
    window runs over that bounded aggregate output (a few thousand
    rows at any corpus size), documented single-partition by
    construction; the raw events never see a global window."""
    e = _events(spark, sf_dir)
    lt = e.groupBy("user_id").agg(
        F.datediff(
            F.date_trunc("day", F.max("ts")), F.date_trunc("day", F.min("ts"))
        )
        .cast("bigint")
        .alias("lifetime_days")
    )
    h = lt.groupBy("lifetime_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    wrev = (
        Window.partitionBy()
        .orderBy(F.desc("lifetime_days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy()
    return h.select(
        "lifetime_days",
        "n_users",
        F.sum("n_users").over(wrev).cast("bigint").alias("n_surviving"),
        F.floor(
            (10000 * F.sum("n_users").over(wrev)) / F.sum("n_users").over(wall)
        )
        .cast("bigint")
        .alias("survival_bp"),
    )


# --- peak concurrency sweep --------------------------------------------------
@register(
    "events_peak_concurrency",
    oracle=f"""
WITH iv AS (
  SELECT date_trunc('day', ts)::TIMESTAMP AS day, epoch_us(ts) AS s,
         least(epoch_us(ts) + {CONCURRENCY_HOLD_S} * 1000000,
               epoch_us(date_trunc('day', ts) + INTERVAL 1 DAY)) AS e
  FROM events),
b AS (
  SELECT day, s AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT day, e AS t, -1 AS delta FROM iv),
r AS (
  SELECT day,
         sum(delta) OVER (PARTITION BY day ORDER BY t, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS open_now
  FROM b)
SELECT day,
       (count(*) / 2)::BIGINT AS n_intervals,
       max(open_now)::BIGINT AS peak_concurrency
FROM r GROUP BY day
""",
    tags=("events", "behavior", "concurrency"),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day peak simultaneous activity: each event opens a
    CONCURRENCY_HOLD_S-second interval [ts, ts+hold) truncated at
    midnight (so every interval belongs to exactly one day); the
    classic +1/-1 boundary sweep — explode each interval into an open
    and a close row, running-sum within the day, take the max — yields
    the peak number of concurrently open intervals. Close rows sort
    BEFORE open rows at equal microseconds (ORDER BY t, delta with
    delta in {{-1,+1}}), the half-open [s,e) convention. The max is
    order-invariant among equal (t, delta) rows: a run of same-sign
    deltas produces the same prefix multiset in any order.

    Scale shape: the sweep window partitions by DAY — days process in
    parallel, each bounded by one day of boundary rows; at 100 TB
    partition further by (day, shard) with a per-shard carry-in pass
    (the two-phase prefix-sum machinery in operators/prefix.py) before
    maxing. Integer microsecond arithmetic end to end."""
    e = _events(spark, sf_dir).select(
        F.date_trunc("day", "ts").alias("day"),
        F.unix_micros("ts").alias("s"),
    )
    iv = e.select(
        "day",
        "s",
        F.least(
            F.col("s") + CONCURRENCY_HOLD_S * 1_000_000,
            F.unix_micros(F.col("day") + F.expr("interval 1 day")),
        ).alias("e"),
    )
    b = iv.select(
        "day",
        F.explode(
            F.array(
                F.struct(F.col("s").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("e").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("bd"),
    ).select("day", "bd.t", "bd.delta")
    w = (
        Window.partitionBy("day")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = b.select("day", F.sum("delta").over(w).alias("open_now"))
    return r.groupBy("day").agg(
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_intervals"),
        F.max("open_now").cast("bigint").alias("peak_concurrency"),
    )


# --- revenue decile gains table ----------------------------------------------
GAINS_K = 10


@register(
    "revenue_decile_gains",
    oracle=f"""
WITH pr AS (
  SELECT user_id,
         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::BIGINT AS rev
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
t AS (
  SELECT user_id, rev,
         ntile({GAINS_K}) OVER (ORDER BY rev DESC, user_id) AS decile
  FROM pr),
d AS (
  SELECT decile::BIGINT AS decile, count(*)::BIGINT AS n_users,
         sum(rev)::BIGINT AS revenue_cents
  FROM t GROUP BY 1)
SELECT decile, n_users, revenue_cents,
       ((10000 * sum(revenue_cents) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         // sum(revenue_cents) OVER ())::BIGINT AS cum_share_bp,
       CAST(floor(1000.0 * (revenue_cents * 1.0 / n_users)
                  / (sum(revenue_cents) OVER () * 1.0
                     / sum(n_users) OVER ())) AS BIGINT) AS lift_milli
FROM d
""",
    tags=("events", "behavior", "gains"),
)
def revenue_decile_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue gains/lift table — "the top decile drives X% of
    revenue": purchasers ranked by exact lifetime purchase cents into
    GAINS_K deciles (decile 1 = biggest spenders), reporting per
    decile the user count, revenue mass, CUMULATIVE revenue share in
    bp, and the lift (decile mean vs population mean, milli).

    The global decile rank is the scale trap this repo already
    engineered around for RFM: a bare ntile(10) window plans ONE task
    holding every purchaser. This lane is the second consumer of
    `operators/prefix.global_ntile_multi` — deterministic sample
    cuts + per-bucket rank + literal prefix offsets, bit-identical to
    SQL ntile including the uneven-bucket rule, fully parallel (the
    plan gate banning the global-window shape covers RFM;
    tests/test_plans.py). Descending order is spec'd as ascending on
    the negated key with the same user_id tiebreak. Per-decile math
    runs on a {GAINS_K}-row aggregate; lift divisions are
    display-only IEEE doubles, identical on both engines (the
    integer cross-product would overflow int64 at 100 TB revenue
    masses)."""
    from wally_spark.operators.prefix import global_ntile_multi

    e = _events(spark, sf_dir)
    pr = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
    )
    tiles = global_ntile_multi(
        pr,
        [(-F.col("rev"), ["user_id"], "decile")],
        GAINS_K,
        "user_id",
    )
    d = tiles.groupBy(F.col("decile").cast("bigint").alias("decile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("rev").cast("bigint").alias("revenue_cents"),
    )
    wcum = (
        Window.partitionBy()
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy()
    return d.select(
        "decile",
        "n_users",
        "revenue_cents",
        F.floor(
            (10000 * F.sum("revenue_cents").over(wcum))
            / F.sum("revenue_cents").over(wall)
        )
        .cast("bigint")
        .alias("cum_share_bp"),
        F.floor(
            1000.0
            * (F.col("revenue_cents") * 1.0 / F.col("n_users"))
            / (
                F.sum("revenue_cents").over(wall) * 1.0
                / F.sum("n_users").over(wall)
            )
        )
        .cast("bigint")
        .alias("lift_milli"),
    )


# --- churn-model feature export ----------------------------------------------
def churn_profile(events_df: DataFrame) -> DataFrame:
    """(user_id, day, event_type) partial aggregates — the ASSOCIATIVE
    profile the churn features derive from: n, rev_cents, max_ts all
    merge by sum/sum/max, so a streaming corpus can persist per-batch
    partials and fold at read time (streaming/ops.churn_foreach_batch
    persists exactly these rows)."""
    return events_df.groupBy(
        "user_id",
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents"),
        F.max("ts").alias("max_ts"),
    )


def churn_profile_fold(df: DataFrame) -> DataFrame:
    """Associative merge of churn profile partials (the ``fold=`` for
    compact_corpus and the read-time merge of the streaming twin)."""
    return df.groupBy("user_id", "day", "event_type").agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("rev_cents").cast("bigint").alias("rev_cents"),
        F.max("max_ts").alias("max_ts"),
    )


def churn_features_from_profile(per: DataFrame) -> DataFrame:
    """Scoring tail shared by the batch lane and the streaming twin —
    identical answers over the same events by construction of the
    shared code path (the rfm_grid convention)."""
    frontier = per.agg(F.max("max_ts").alias("ref_ts"))
    return (
        per.crossJoin(F.broadcast(frontier))
        .groupBy("user_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("n")).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("n_purchases"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("rev_cents")
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("revenue_cents"),
            F.countDistinct("day").cast("bigint").alias("active_days"),
            F.datediff(
                F.date_trunc("day", F.first("ref_ts")),
                F.date_trunc("day", F.max("max_ts")),
            )
            .cast("bigint")
            .alias("recency_days"),
            F.expr(
                "10000 * sum(CASE WHEN event_type = 'error' THEN n ELSE 0 END)"
                " div sum(n)"
            )
            .cast("bigint")
            .alias("error_bp"),
            F.countDistinct("event_type").cast("bigint").alias("n_event_types"),
        )
    )


@register(
    "user_churn_features",
    oracle="""
WITH f AS (SELECT max(ts) AS ref_ts FROM events)
SELECT user_id,
       count(*)::BIGINT AS n_events,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
         AS n_purchases,
       sum(CASE WHEN event_type = 'purchase'
                THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                ELSE 0 END)::BIGINT AS revenue_cents,
       count(DISTINCT date_trunc('day', ts))::BIGINT AS active_days,
       date_diff('day', date_trunc('day', max(ts)),
                 date_trunc('day', any_value(f.ref_ts)))::BIGINT
         AS recency_days,
       ((10000 * sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END))
        // count(*))::BIGINT AS error_bp,
       count(DISTINCT event_type)::BIGINT AS n_event_types
FROM events, f
GROUP BY user_id
""",
    tags=("events", "behavior", "features"),
)
def user_churn_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-model feature export — the feature-store shape: ONE
    user-keyed aggregate scan producing the classic churn features
    (event volume, purchase count, exact cent revenue, distinct active
    days, recency vs the corpus frontier, error rate bp, event-type
    breadth). Everything a downstream trainer needs, nothing computed
    twice: eight features share one shuffle.

    Scale shape: a two-level pre-aggregation — the (user, day, type)
    churn_profile partial (map-side combined, exactly the rows the
    streaming twin persists per batch) followed by the user rollup in
    churn_features_from_profile with a 1-row corpus-frontier broadcast
    (the user_activity_gaps convention). The two DISTINCTs now run
    over the (user, day, type) profile grain — a relation bounded by
    active user-days, not raw event volume. Output is
    |users|-bounded; at 100 TB this lane IS the nightly feature-store
    refresh, and the streaming twin republishes it per micro-batch
    from the same scoring tail."""
    return churn_features_from_profile(churn_profile(_events(spark, sf_dir)))


# --- cohort revenue LTV ------------------------------------------------------
@register(
    "cohort_revenue_ltv",
    oracle="""
WITH o AS (
  SELECT o_custkey, date_trunc('month', o_orderdate) AS m,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders),
c AS (SELECT o_custkey, min(m) AS cohort FROM o GROUP BY o_custkey),
a AS (
  SELECT epoch(c.cohort)::BIGINT AS cohort_epoch,
         date_diff('month', c.cohort, o.m)::BIGINT AS age_months,
         count(*)::BIGINT AS n_orders,
         count(DISTINCT o.o_custkey)::BIGINT AS n_active,
         sum(o.cents)::BIGINT AS revenue_cents
  FROM o JOIN c ON c.o_custkey = o.o_custkey
  GROUP BY 1, 2)
SELECT cohort_epoch, age_months, n_orders, n_active, revenue_cents,
       sum(revenue_cents) OVER (PARTITION BY cohort_epoch
                                ORDER BY age_months)::BIGINT
         AS cum_revenue_cents
FROM a
""",
    tags=("orders", "behavior", "cohort"),
)
def cohort_revenue_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve — the growth-analytics staple: customers
    cohorted by first-order month, revenue accumulated by cohort age
    in months (exact cents). Per (cohort, age): orders, distinct
    active customers, period revenue, and the running cumulative that
    IS the LTV curve.

    Scale shape: the cohort relation is a customer-keyed aggregate
    joined back on o_custkey (uniform equi-join — NOT broadcast: the
    cohort side is |customers| and unbounded at 100 TB); the month
    grid aggregate is (months × months)-bounded, so the cumulative
    window runs over a tiny relation partitioned by cohort. The
    retention twin is events_cohort_retention; this is the
    revenue-weighted face. Routed through the (custkey, month)
    ltv_profile partial — the associative grain its streaming twin
    persists (streaming/ops.ltv_foreach_batch)."""
    return ltv_from_profile(
        ltv_profile(load_tables(spark, sf_dir)["orders"])
    )


def ltv_profile(orders_df: DataFrame) -> DataFrame:
    """(o_custkey, m) partial aggregates — ASSOCIATIVE (sum n, sum
    cents; the customer's cohort is min(m), itself associative), so a
    streaming corpus can persist per-batch partials and fold at read
    time."""
    return orders_df.groupBy(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )


def ltv_profile_fold(df: DataFrame) -> DataFrame:
    """Associative merge of LTV profile partials (the ``fold=`` for
    compact_corpus and the read-time merge of the streaming twin)."""
    return df.groupBy("o_custkey", "m").agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("cents"),
    )


def ltv_from_profile(per: DataFrame) -> DataFrame:
    """Scoring tail shared by the batch lane and the streaming twin."""
    cohort = per.groupBy("o_custkey").agg(F.min("m").alias("cohort"))
    a = (
        per.join(cohort, "o_custkey")
        .groupBy(
            F.unix_timestamp("cohort").cast("bigint").alias("cohort_epoch"),
            (
                (F.year("m") - F.year("cohort")) * 12
                + (F.month("m") - F.month("cohort"))
            )
            .cast("bigint")
            .alias("age_months"),
        )
        .agg(
            F.sum("n").cast("bigint").alias("n_orders"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_active"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
    )
    w = Window.partitionBy("cohort_epoch").orderBy("age_months")
    return a.select(
        "cohort_epoch", "age_months", "n_orders", "n_active", "revenue_cents",
        F.sum("revenue_cents").over(w).cast("bigint").alias("cum_revenue_cents"),
    )


# --- inter-purchase interval histogram ---------------------------------------
@register(
    "user_purchase_intervals",
    oracle="""
WITH p AS (
  SELECT user_id, date_trunc('day', ts) AS d,
         lag(date_trunc('day', ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_d
  FROM events WHERE event_type = 'purchase'),
g AS (
  SELECT date_diff('day', prev_d, d)::BIGINT AS gap_days
  FROM p WHERE prev_d IS NOT NULL),
h AS (SELECT gap_days, count(*)::BIGINT AS n_gaps FROM g GROUP BY gap_days),
t AS (SELECT sum(n_gaps)::BIGINT AS total FROM h)
SELECT gap_days, n_gaps,
       ((10000 * n_gaps) // total)::BIGINT AS share_bp,
       ((10000 * sum(n_gaps) OVER (ORDER BY gap_days)) // total)::BIGINT
         AS cum_share_bp
FROM h, t
""",
    tags=("events", "behavior", "intervals"),
)
def user_purchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase cadence histogram — the repeat-rate /
    replenishment-cycle report: whole-day gaps between a user's
    consecutive purchases, with share and cumulative share bp (read
    off "X% of repeat purchases happen within N days").

    Scale shape: the purchase filter is pushed to the scan; ONE
    user-keyed window computes the lag; the histogram aggregate is
    map-side combined down to at most max-gap-days rows, so the
    cumulative window runs over a day-span-bounded relation (the
    user_survival_curve convention) and the scalar total broadcasts."""
    e = load_tables(spark, sf_dir)["events"]
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.date_trunc("day", "ts").alias("d")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = p.select(F.datediff("d", F.lag("d").over(w)).alias("gap_days")).where(
        F.col("gap_days").isNotNull()
    )
    h = g.groupBy(F.col("gap_days").cast("bigint").alias("gap_days")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps")
    )
    t = h.agg(F.sum("n_gaps").alias("total"))
    return (
        h.crossJoin(F.broadcast(t))
        .select(
            "gap_days",
            "n_gaps",
            F.expr("CAST((10000 * n_gaps) div total AS BIGINT)").alias(
                "share_bp"
            ),
            F.expr(
                "CAST((10000 * sum(n_gaps) OVER (ORDER BY gap_days"
                " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"
                " div total AS BIGINT)"
            ).alias("cum_share_bp"),
        )
    )


# --- session time-to-conversion histogram (r8) -------------------------------
@register(
    "session_conversion_lag",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 10 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT user_id, ts, event_type,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM ordered
), lags AS (
  SELECT ((floor(epoch(min(CASE WHEN event_type = 'purchase' THEN ts END)))
                - floor(epoch(min(ts))))::BIGINT // 60)::BIGINT AS lag_min
  FROM sessioned
  GROUP BY user_id, session_idx
  HAVING count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
), h AS (SELECT lag_min, count(*)::BIGINT AS n_sessions FROM lags GROUP BY 1),
t AS (SELECT sum(n_sessions)::BIGINT AS total FROM h)
SELECT lag_min, n_sessions,
       ((10000 * n_sessions) // total)::BIGINT AS share_bp,
       ((10000 * sum(n_sessions) OVER (ORDER BY lag_min)) // total)::BIGINT
         AS cum_share_bp
FROM h, t
""",
    tags=("events", "behavior", "session"),
)
def session_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion within a session — for every session (600 s
    inactivity gap, the win_session semantics) that contains a
    purchase, the whole-minute lag from session start to the FIRST
    purchase, rolled into a histogram with share and cumulative share
    bp ("X% of converting sessions convert within N minutes" — the
    checkout-friction report).

    Second truncation happens PER TIMESTAMP on both sides
    (unix_timestamp semantics = floor(epoch(ts)) each), never floor of
    the difference — the two disagree by 1 s on fractional-second
    data, so agreement is by construction, not luck.

    Scale shape: gaps-and-islands sessionization runs in user-keyed
    windows (one shuffle); the per-session reduction is a conditional
    min aggregate on the same partitioning; the histogram is bounded
    by the session-duration span, so the cumulative window and scalar
    total follow the user_purchase_intervals convention."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = e.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
                > 600.0
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    ).select(
        "user_id", "ts", "event_type",
        F.sum("is_new").over(wrun).alias("session_idx"),
    )
    lags = (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("first_purchase"),
            F.min("ts").alias("start_ts"),
        )
        .where(F.col("first_purchase").isNotNull())
        .selectExpr(
            "CAST(CAST(floor(unix_timestamp(first_purchase)"
            " - unix_timestamp(start_ts)) AS BIGINT) div 60 AS BIGINT)"
            " AS lag_min"
        )
    )
    h = lags.groupBy("lag_min").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    t = h.agg(F.sum("n_sessions").alias("total"))
    return h.crossJoin(F.broadcast(t)).selectExpr(
        "lag_min", "n_sessions",
        "CAST((10000 * n_sessions) div total AS BIGINT) AS share_bp",
        "CAST((10000 * sum(n_sessions) OVER (ORDER BY lag_min"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"
        " div total AS BIGINT) AS cum_share_bp",
    )


# --- A/B experiment analysis (r9) --------------------------------------------
@register(
    "ab_test_report",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted,
         sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                  ELSE 0 END)::BIGINT AS revenue_cents
  FROM events GROUP BY user_id),
v AS (
  SELECT CASE WHEN substr(md5(user_id::VARCHAR), 1, 1)
                   BETWEEN '0' AND '7'
              THEN 'A' ELSE 'B' END AS variant,
         count(*)::BIGINT AS n_users,
         sum(converted)::BIGINT AS n_converters,
         sum(revenue_cents)::BIGINT AS revenue_cents
  FROM per_user GROUP BY 1)
SELECT variant, n_users, n_converters,
       ((10000 * n_converters) // n_users)::BIGINT AS conv_bp,
       revenue_cents,
       (revenue_cents // n_users)::BIGINT AS arpu_cents,
       (((10000 * n_converters) // n_users)
        - (sum((10000 * n_converters) // n_users) OVER ()
           - ((10000 * n_converters) // n_users)))::BIGINT
         AS conv_lift_bp
FROM v ORDER BY variant
""",
    tags=("events", "behavior", "experiment"),
)
def ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout — the analysis every growth team runs on
    the events stream: users split 50/50 by a DETERMINISTIC hash of
    user_id (md5 first nibble — the industry-standard sticky
    assignment: no assignment table to join, same variant on every
    device), then per variant: exposed users, converters (>=1
    purchase), conversion rate in basis points, exact-cent revenue,
    ARPU, and the conversion lift vs the other arm.

    Scale shape: ONE user-keyed aggregate collapses the event stream
    to a per-user row (map-side combined), the variant rollup is
    2-bounded, and the lift window runs over that 2-row aggregate —
    documented single-partition by construction. Integer division
    AFTER the sums keeps the driver hash exact; n_users >= 1 per
    emitted variant group so no divisor guard is needed."""
    e = _events(spark, sf_dir).select("user_id", "event_type", "value")
    is_p = F.col("event_type") == "purchase"
    per_user = e.groupBy("user_id").agg(
        F.max(F.when(is_p, 1).otherwise(0)).alias("converted"),
        F.sum(
            F.when(
                is_p, F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("revenue_cents"),
    )
    v = (
        per_user.groupBy(
            F.when(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
                .between("0", "7"),
                "A",
            )
            .otherwise("B")
            .alias("variant")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("converted").cast("bigint").alias("n_converters"),
            F.sum("revenue_cents").cast("bigint").alias("revenue_cents"),
        )
    )
    # exact bigint div (not floor(a/b) double division): keeps hash
    # parity with the oracle's // past the 2^53 mantissa
    conv_bp = F.expr("(10000 * n_converters) div n_users").cast("bigint")
    w = Window.partitionBy()
    out = v.select(
        "variant",
        "n_users",
        "n_converters",
        conv_bp.alias("conv_bp"),
        "revenue_cents",
        F.expr("revenue_cents div n_users")
        .cast("bigint")
        .alias("arpu_cents"),
    )
    return out.select(
        "variant",
        "n_users",
        "n_converters",
        "conv_bp",
        "revenue_cents",
        "arpu_cents",
        (F.col("conv_bp") - (F.sum("conv_bp").over(w) - F.col("conv_bp")))
        .cast("bigint")
        .alias("conv_lift_bp"),
    ).orderBy("variant")


# --- session entry/exit matrix (r9) ------------------------------------------
@register(
    "session_entry_exit",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 10 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessioned AS (
  SELECT user_id, ts, event_id, event_type,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered),
ranked AS (
  SELECT user_id, sid, event_type,
         row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY ts, event_id) AS rf,
         row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY ts DESC, event_id DESC) AS rl,
         count(*) OVER (PARTITION BY user_id, sid) AS n
  FROM sessioned),
ps AS (
  SELECT user_id, sid,
         max(CASE WHEN rf = 1 THEN event_type END) AS entry_type,
         max(CASE WHEN rl = 1 THEN event_type END) AS exit_type,
         max(n)::BIGINT AS n_events
  FROM ranked GROUP BY 1, 2)
SELECT entry_type, exit_type,
       count(*)::BIGINT AS n_sessions,
       sum(n_events)::BIGINT AS total_events,
       sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounce,
       ((10000 * sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END))
        // count(*))::BIGINT AS bounce_bp
FROM ps GROUP BY 1, 2
ORDER BY 1, 2
""",
    tags=("events", "behavior", "session"),
)
def session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session entry/exit matrix — the landing/leaving report product
    analytics reads daily ("sessions that start with an error and end
    with an error are rage-quits; view→purchase sessions convert"):
    10-minute-gap sessions (win_session's gap rule), each classified
    by its first and last event type (deterministic (ts, event_id)
    rank — never first(), which is shuffle-order-dependent), rolled up
    to per-(entry, exit) session counts, event mass, single-event
    bounce count, and bounce rate in basis points.

    Scale shape: all four windows (lag, running session id, two
    ranks) partition by user_id or (user_id, sid) — bounded per-user
    state, one Exchange reused; the rollup output is |types|²-bounded.
    Division after the sums."""
    e = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
                > 600.0
            ),
            1,
        ).otherwise(0),
    )
    sessioned = ordered.withColumn(
        "sid",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ws = Window.partitionBy("user_id", "sid")
    ranked = sessioned.select(
        "user_id",
        "sid",
        "event_type",
        F.row_number().over(ws.orderBy("ts", "event_id")).alias("rf"),
        F.row_number()
        .over(ws.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rl"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    ps = ranked.groupBy("user_id", "sid").agg(
        F.max(F.when(F.col("rf") == 1, F.col("event_type"))).alias("entry_type"),
        F.max(F.when(F.col("rl") == 1, F.col("event_type"))).alias("exit_type"),
        F.max("n").cast("bigint").alias("n_events"),
    )
    return (
        ps.groupBy("entry_type", "exit_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("n_events").cast("bigint").alias("total_events"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_bounce"),
            F.expr(
                "CAST((10000 * sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END))"
                " div count(1) AS BIGINT)"
            ).alias("bounce_bp"),
        )
        .orderBy("entry_type", "exit_type")
    )


# --- user activity concentration (r9) ----------------------------------------
@register(
    "user_activity_gini",
    oracle="""
WITH per_user AS (
  SELECT event_type, user_id, count(*)::BIGINT AS x
  FROM events GROUP BY 1, 2),
r AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY x, user_id) AS i
  FROM per_user)
SELECT event_type,
       count(*)::BIGINT AS n_users,
       sum(x)::BIGINT AS n_events,
       ((10000 * (2 * sum(i * x) - (count(*) + 1) * sum(x)))
        // (count(*) * sum(x)))::BIGINT AS gini_bp
FROM r GROUP BY event_type
ORDER BY event_type
""",
    tags=("events", "behavior", "concentration"),
)
def user_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type user-activity concentration (Gini, basis points) — the
    power-user curve compressed to one number per event type: G≈0 means
    uniform engagement, G→1 means a few users generate everything (the
    signal that a type's volume is bot- or whale-driven, read next to
    user_burst_minutes). Exact integers via the sorted-rank identity
    (source_length_gini's formula) with deterministic (count, user_id)
    tie-break.

    Scale shape: one (type, user) aggregate (map-side combined), one
    rank window per type feeding a types-bounded moment aggregate;
    division after the sums — per-user counts are >= 1 so the divisor
    is never zero. int64 bound: Σi·x ≤ |users|²·max_count."""
    per_user = (
        _events(spark, sf_dir)
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    r = per_user.select(
        "event_type",
        "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("x", "user_id"))
        .cast("bigint")
        .alias("i"),
    )
    return (
        r.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("x").cast("bigint").alias("n_events"),
            F.expr(
                "CAST((10000 * (2 * sum(i * x) - (count(1) + 1) * sum(x)))"
                " div (count(1) * sum(x)) AS BIGINT)"
            ).alias("gini_bp"),
        )
        .orderBy("event_type")
    )


# --- bot / automation detector (r9) ------------------------------------------
@register(
    "user_bot_score",
    oracle="""
WITH g AS (
  SELECT user_id, event_type,
         floor(epoch(ts))::BIGINT AS es,
         floor(epoch(ts))::BIGINT
           - lag(floor(epoch(ts))::BIGINT)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
  FROM events),
u AS (
  SELECT user_id,
         count(*)::BIGINT AS n_events,
         (max(es) - min(es))::BIGINT AS span_s,
         count(DISTINCT event_type)::BIGINT AS n_types,
         max(gap_s)::BIGINT AS max_gap_s,
         min(gap_s)::BIGINT AS min_gap_s
  FROM g GROUP BY 1
  HAVING count(*) >= 10),
f AS (
  SELECT user_id, n_events, span_s, n_types,
         ((60000 * n_events) // greatest(span_s, 1))::BIGINT
           AS rate_per_min_milli,
         max_gap_s, min_gap_s,
         CASE WHEN (60000 * n_events) // greatest(span_s, 1) >= 10000
                   AND n_events >= 20 THEN 1 ELSE 0 END AS high_rate,
         CASE WHEN n_types <= 2 AND n_events >= 20 THEN 1 ELSE 0 END
           AS low_diversity,
         CASE WHEN max_gap_s - min_gap_s <= 2 THEN 1 ELSE 0 END
           AS metronomic
  FROM u)
SELECT user_id, n_events, span_s, n_types, rate_per_min_milli,
       max_gap_s, min_gap_s, high_rate::BIGINT AS high_rate,
       low_diversity::BIGINT AS low_diversity,
       metronomic::BIGINT AS metronomic,
       (high_rate + low_diversity + metronomic)::BIGINT AS bot_score
FROM f ORDER BY user_id
""",
    tags=("events", "behavior", "quality"),
)
def user_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/automation detector — the traffic-quality gate a training
    pipeline runs before trusting behavioral data: per user (>= 10
    events), sustained event rate (milli-events/min over the activity
    span), type diversity, and inter-event-gap regularity (max-min gap
    spread in whole seconds — metronomic clients are scripts), folded
    into three integer rule flags and a 0-3 bot score. All integer
    (floor-epoch seconds, milli rates), engine-exact.

    Scale shape: ONE user-keyed Exchange carries the lag window and
    the per-user aggregate (same-partitioning reuse); output is
    user-bounded. The rate flag divides AFTER the multiplication."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    es = F.floor(F.expr("unix_timestamp(ts)")).cast("bigint")
    g = e.select(
        "user_id",
        "event_type",
        es.alias("es"),
        (es - F.lag(es).over(w)).alias("gap_s"),
    )
    u = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (F.max("es") - F.min("es")).cast("bigint").alias("span_s"),
            F.countDistinct("event_type").cast("bigint").alias("n_types"),
            F.max("gap_s").cast("bigint").alias("max_gap_s"),
            F.min("gap_s").cast("bigint").alias("min_gap_s"),
        )
        .where(F.col("n_events") >= 10)
    )
    return u.selectExpr(
        "user_id",
        "n_events",
        "span_s",
        "n_types",
        "CAST((60000 * n_events) div greatest(span_s, 1) AS BIGINT)"
        " AS rate_per_min_milli",
        "max_gap_s",
        "min_gap_s",
        "CAST(CASE WHEN (60000 * n_events) div greatest(span_s, 1) >= 10000"
        " AND n_events >= 20 THEN 1 ELSE 0 END AS BIGINT) AS high_rate",
        "CAST(CASE WHEN n_types <= 2 AND n_events >= 20 THEN 1 ELSE 0 END"
        " AS BIGINT) AS low_diversity",
        "CAST(CASE WHEN max_gap_s - min_gap_s <= 2 THEN 1 ELSE 0 END"
        " AS BIGINT) AS metronomic",
    ).selectExpr(
        "*",
        "CAST(high_rate + low_diversity + metronomic AS BIGINT) AS bot_score",
    ).orderBy("user_id")
