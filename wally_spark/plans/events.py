"""Event-time windowing and keyed-state queries over the `events`
table — the batch expression of the reference's windowing semantics
(`/root/reference/lib/wallaroo/core/windows/windows.pony`,
`panes_range_windows.pony`): tumbling/sliding range windows, count
windows, session (ephemeral) windows, and per-key running state.

The streaming expression of the same operators lives in
``wally_spark.streaming``; batch queries here are oracle-checkable,
and both share window-assignment semantics (epoch-aligned, identical
to ``F.window``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from wally_spark.plans.registry import register
from wally_spark.tables import load_tables


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["events"]


# --- tumbling range windows (range_windows(r)) ---
@register(
    "win_tumbling",
    oracle="""
SELECT (floor(epoch(ts) / 3600) * 3600)::BIGINT AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY window_start, event_type
""",
    tags=("window", "events"),
)
def win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """wallaroo.range_windows(hours(1)).over(agg) per event_type."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# --- sliding range windows (range_windows(r).with_slide(s)) ---
@register(
    "win_sliding",
    oracle="""
SELECT ((floor(epoch(ts) / 900) - k) * 900)::BIGINT AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events, range(4) t(k)
GROUP BY window_start, event_type
""",
    tags=("window", "events"),
)
def win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h windows sliding every 15min: each event lands in exactly
    range/slide = 4 windows (epoch-aligned), matching F.window
    semantics; oracle enumerates the same 4 via a range join."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# --- session (ephemeral) windows: 10-minute inactivity gap ---
_SESSION_CTE = """
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 10 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM ordered
)
"""


@register(
    "win_session",
    oracle=_SESSION_CTE
    + """
SELECT user_id, session_idx::BIGINT AS session_idx,
       floor(epoch(min(ts)))::BIGINT AS session_start,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM sessioned
GROUP BY user_id, session_idx
""",
    tags=("window", "events", "session"),
)
def win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ephemeral/session windows (ref: ephemeral_window.pony) via
    gaps-and-islands; the streaming twin uses F.session_window."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_ts").isNull()
                | (
                    F.col("ts").cast("double") - F.col("prev_ts").cast("double")
                    > 600.0
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("session_idx", F.sum("is_new").over(wrun))
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.floor(F.min(F.unix_timestamp("ts"))).cast("bigint").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_idx").cast("bigint").alias("session_idx"),
            "session_start",
            "n_events",
            "sum_value",
        )
    )


# --- count windows (count_windows(n).over(agg)) ---
@register(
    "win_count",
    oracle="""
WITH numbered AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, ((rn - 1) // 20)::BIGINT AS win_id,
       round(sum(value), 2) AS sum_value,
       count(*) AS n_events
FROM numbered
GROUP BY user_id, win_id
HAVING count(*) = 20
""",
    tags=("window", "events", "count_windows"),
)
def win_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """wallaroo.count_windows(20).over(agg): fires only when the
    window fills (partial trailing windows unfired), hence HAVING=20."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("win_id", F.floor((F.col("rn") - 1) / 20).cast("bigint"))
        .groupBy("user_id", "win_id")
        .agg(
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .where(F.col("n_events") == 20)
    )


# --- per-key running state (state_computation) ---
@register(
    "running_total",
    oracle="""
WITH cum AS (
  SELECT user_id, event_id, ts, value,
         sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS running
  FROM events
)
SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS ts_epoch,
       round(running, 2) AS running_value
FROM cum
WHERE running > 2000
""",
    tags=("state", "events"),
)
def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key running total with threshold alert — the batch twin of
    a Wallaroo state_computation (examples/python/alerts_stateful)."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("running", F.sum("value").over(w))
        .where(F.col("running") > 2000)
        .select(
            "user_id",
            "event_id",
            F.floor(F.unix_timestamp("ts")).cast("bigint").alias("ts_epoch"),
            F.round("running", 2).alias("running_value"),
        )
    )


# --- top-k per key (rank over partition) ---
@register(
    "topk_per_key",
    oracle="""
SELECT event_type, event_id, round(value, 2) AS value
FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rk
  FROM events)
WHERE rk <= 3
""",
    tags=("rank", "events"),
)
def topk_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("event_type", "event_id", F.round("value", 2).alias("value"))
    )


# --- session statistics rollup ---
@register(
    "event_sessionize_stats",
    oracle=_SESSION_CTE
    + """
, per_session AS (
  SELECT user_id, session_idx, count(*) AS n_events,
         epoch(max(ts)) - epoch(min(ts)) AS dur
  FROM sessioned GROUP BY user_id, session_idx
)
SELECT user_id, count(*) AS n_sessions,
       sum(n_events)::BIGINT AS total_events,
       round(sum(dur), 1) AS total_duration_s
FROM per_session GROUP BY user_id
""",
    tags=("window", "events", "session"),
)
def event_sessionize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_ts").isNull()
                | (F.col("ts").cast("double") - F.col("prev_ts").cast("double") > 600.0),
                1,
            ).otherwise(0),
        )
        .withColumn("session_idx", F.sum("is_new").over(wrun))
    )
    per_session = sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.max("ts").cast("double") - F.min("ts").cast("double")
        ).alias("dur"),
    )
    # Totals rather than averages: a rounded float ratio can land on an
    # exact .xx5 half-way point where Spark (HALF_UP on decimal string)
    # and other engines (binary) disagree; totals are hash-stable.
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("total_events"),
        F.round(F.sum("dur"), 1).alias("total_duration_s"),
    )


# --- JSON property extraction (decoder analog) ---
@register(
    "events_json_extract",
    oracle="""
SELECT json_extract(props, '$.k')::INT % 10 AS k_bucket,
       count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY k_bucket
""",
    tags=("decode", "events"),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read decode of the JSON props column — the engine's
    analog of Wallaroo's source decoders (machida __init__.py:496)."""
    ev = _events(spark, sf_dir)
    return (
        ev.withColumn(
            "k_bucket", (F.get_json_object("props", "$.k").cast("int") % 10)
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# --- as-of join: latest view state at each purchase ---
@register(
    "asof_purchase_view",
    oracle="""
WITH views AS (
  SELECT user_id, ts, arg_max(value, event_id) AS view_value
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, ts
), purchases AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, round(p.value, 2) AS purchase_value,
       round(v.view_value, 2) AS asof_view_value
FROM purchases p
ASOF LEFT JOIN views v
  ON p.user_id = v.user_id AND v.ts <= p.ts
""",
    tags=("asof", "events"),
)
def asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (union-and-carry, operators/asof.py): each purchase
    picks up the most recent prior view's value per user — the
    market_spread pattern (orders checked against latest market state)
    as a first-class relational operator."""
    from wally_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("view_value"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(purchases, views, on="user_id", ts="ts", right_cols=("view_value",))
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("asof_view_value", 2).alias("asof_view_value"),
    )


@register(
    "asof_next_view",
    oracle="""
WITH views AS (
  SELECT user_id, ts, -epoch(ts) AS nts, arg_max(value, event_id) AS view_value
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, ts
), purchases AS (
  SELECT event_id, user_id, ts, -epoch(ts) AS nts, value FROM events
  WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, round(p.value, 2) AS purchase_value,
       round(v.view_value, 2) AS next_view_value
FROM purchases p
ASOF LEFT JOIN views v
  ON p.user_id = v.user_id AND v.nts <= p.nts
""",
    tags=("asof", "events"),
)
def asof_next_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each purchase picks up the EARLIEST view at
    or after it per user (post-purchase behavior attribution) — the
    mirror of asof_purchase_view, same union-and-carry operator
    traversed in reverse (operators/asof.py direction="forward"). The
    oracle flips DuckDB's backward-only ASOF JOIN by negating the
    epoch timestamps."""
    from wally_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("view_value"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases, views, on="user_id", ts="ts",
        right_cols=("view_value",), direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("asof_view_value", 2).alias("next_view_value"),
    )


# --- range join: events within a bounded time window of each other ---
@register(
    "range_join_views_before_purchase",
    oracle="""
SELECT p.event_id AS purchase_id,
       count(v.event_id) AS n_recent_views,
       round(coalesce(sum(v.value), 0), 2) AS recent_view_value
FROM (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase') p
LEFT JOIN (SELECT event_id, user_id, ts, value FROM events
           WHERE event_type = 'view') v
  ON v.user_id = p.user_id
 AND v.ts >= p.ts - INTERVAL 30 MINUTE
 AND v.ts < p.ts
GROUP BY p.event_id
""",
    tags=("events", "range_join"),
)
def range_join_views_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-interval range join: each purchase aggregates the same
    user's views in the preceding 30 minutes. The equi-key (user_id)
    carries the shuffle; the range predicate evaluates inside the
    joined key group, so cost is O(events per user window), never a
    cartesian — the plan keeps a SortMergeJoin/hash join on user_id
    with the time bounds as post-join codegen filters. At 100 TB,
    skewed users would take the salted-join path (operators/skew.py)."""
    ev = _events(spark, sf_dir)
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("value").alias("v_value"),
        F.col("event_id").alias("v_id"),
    )
    joined = p.join(
        v,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("v_ts") < F.col("p_ts")),
        "left",
    )
    return joined.groupBy("purchase_id").agg(
        F.count("v_id").alias("n_recent_views"),
        F.round(F.coalesce(F.sum("v_value"), F.lit(0.0)), 2).alias(
            "recent_view_value"
        ),
    )


# --- funnel: view -> later click -> later purchase, per user ---
@register(
    "events_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v)::BIGINT AS n_viewed,
       (SELECT count(*) FROM c)::BIGINT AS n_clicked_after_view,
       (SELECT count(*) FROM p)::BIGINT AS n_purchased_after_click
""",
    tags=("events", "funnel"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked
    strictly after their first view, then purchased strictly after
    that first qualifying click. Each stage is one groupBy + one
    user-keyed join of the previous stage's (small) survivor table —
    at 100 TB the stage tables are per-user rows, broadcast-sized
    relative to raw events, and the event scan is filtered by type
    before any join."""
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after_click")))
    )


# --- weekly cohort retention ---
@register(
    "events_cohort_retention",
    oracle="""
WITH first AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort, date_trunc('week', e.ts) AS wk
  FROM events e JOIN first f USING (user_id)
)
SELECT epoch(cohort)::BIGINT AS cohort_week,
       ((epoch(wk) - epoch(cohort)) // 604800)::BIGINT AS weeks_since,
       count(*) AS n_users
FROM activity GROUP BY cohort, weeks_since
""",
    tags=("events", "retention", "cohort"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by the week of their
    first event, counted once per later week they stay active — the
    triangle every growth dashboard draws. Shapes: one user-keyed
    groupBy for cohorts (small — one row per user), joined back
    user-keyed, then a distinct + count on (cohort, week) — all
    map-side combinable; nothing scales with raw event count except
    the first scan."""
    ev = _events(spark, sf_dir).select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = (
        ev.join(first, "user_id")
        .select(
            "user_id", "cohort", F.date_trunc("week", "ts").alias("wk")
        )
        .distinct()
    )
    return activity.groupBy(
        F.unix_timestamp("cohort").alias("cohort_week"),
        F.expr("(unix_timestamp(wk) - unix_timestamp(cohort)) div 604800")
        .cast("bigint")
        .alias("weeks_since"),
    ).agg(F.count(F.lit(1)).alias("n_users"))


# --- as-of join with match tolerance (r9) ---
@register(
    "asof_purchase_view_1h",
    oracle="""
WITH views AS (
  SELECT user_id, ts, arg_max(value, event_id) AS view_value
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, ts
), purchases AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, round(p.value, 2) AS purchase_value,
       round(CASE WHEN p.ts - v.ts <= INTERVAL 1 HOUR THEN v.view_value END,
             2) AS asof_view_value
FROM purchases p
ASOF LEFT JOIN views v
  ON p.user_id = v.user_id AND v.ts <= p.ts
""",
    tags=("asof", "events", "tolerance"),
)
def asof_purchase_view_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOLERANCED as-of join — asof_purchase_view with a 1-hour match
    window (pandas merge_asof's ``tolerance``): a purchase only picks
    up the latest prior view if it happened within the hour; staler
    state is NULLed, not carried. The semantics a market-data join
    actually needs (a quote from last Tuesday must not price today's
    order) — exercised through the SAME union-and-carry operator
    (operators/asof.py tolerance_s), one user-keyed shuffle, no
    windows over unbounded partitions."""
    from wally_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("view_value"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases, views, on="user_id", ts="ts",
        right_cols=("view_value",), tolerance_s=3600.0,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("asof_view_value", 2).alias("asof_view_value"),
    )
