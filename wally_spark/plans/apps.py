"""Wallaroo example-app parity: each reference app from
`/root/reference/examples/python/` re-expressed as a Spark plan over
the `events` table (the test corpus' stream analog), with a DuckDB
oracle. The streaming twins (same logical plan on readStream) are in
``wally_spark.streaming`` tests.

App → query mapping:
  celsius-kafka         → app_celsius          (stateless map ×2)
  alerts_stateless      → app_alerts_stateless (filter → alert)
  alerts_stateful       → app_alerts_stateful  (per-key running total crossing)
  alerts_windowed       → app_alerts_windowed  (9s/3s sliding sum alerts → scaled to 1h/20min)
  alphabet              → app_alphabet         (keyed running vote totals, final state)
  word_count            → app_word_count       (split → key_by word → count)
  word_count + collect  → app_word_count_collect (un-keyed global rollup)
  market_spread         → app_market_spread    (joined streams, reject check)
  merge (Pipeline.merge)→ pipeline_merge       (union of two pipelines)
  alphabet_partitioned  → app_alphabet_partitioned (fixed partition routing)
  celsius_connectors    → app_celsius_connectors (float32 wire decode chain)
  passthrough (pony)    → app_passthrough        (identity decode→asis→encode)
  alerts_local_aggregations (pony) → app_alerts_local_agg (local_key_by two-phase)
  multi_worker_forwarding (pony)   → app_multi_worker_forwarding (key routing)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from wally_spark.plans.registry import register
from wally_spark.tables import load_tables


def _t(spark: SparkSession, sf_dir: str):
    return load_tables(spark, sf_dir)


# --- celsius: stateless computation chain (multiply, then add) ---
@register(
    "app_celsius",
    oracle="""
SELECT event_id, round(value * 1.8 + 32.0, 2) AS fahrenheit
FROM events WHERE event_type = 'view'
""",
    tags=("app", "stateless"),
)
def app_celsius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref: examples/python/celsius-kafka/celsius.py — two chained
    @wallaroo.computation stages (multiply, add) on a decoded float."""
    ev = _t(spark, sf_dir)["events"]
    return (
        ev.where(F.col("event_type") == "view")
        .select(
            "event_id",
            F.round(F.col("value") * 1.8 + 32.0, 2).alias("fahrenheit"),
        )
    )


# --- alerts_stateless: threshold filter → alert objects ---
@register(
    "app_alerts_stateless",
    oracle="""
SELECT event_id, user_id,
       CASE WHEN event_type = 'purchase' THEN 'DepositAlert'
            ELSE 'WithdrawalAlert' END AS alert_type,
       round(value, 2) AS amount
FROM events
WHERE value > 300 AND event_type IN ('purchase', 'error')
""",
    tags=("app", "stateless"),
)
def app_alerts_stateless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref: examples/python/alerts_stateless/alerts.py — emit an alert
    object when a transaction exceeds a threshold."""
    ev = _t(spark, sf_dir)["events"]
    return (
        ev.where((F.col("value") > 300) & F.col("event_type").isin("purchase", "error"))
        .select(
            "event_id",
            "user_id",
            F.when(F.col("event_type") == "purchase", "DepositAlert")
            .otherwise("WithdrawalAlert")
            .alias("alert_type"),
            F.round("value", 2).alias("amount"),
        )
    )


# --- alerts_stateful: running-total threshold crossing per key ---
@register(
    "app_alerts_stateful",
    oracle="""
WITH cum AS (
  SELECT user_id, event_id, ts,
         sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS running
  FROM events
), crossings AS (
  SELECT user_id, event_id, running,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM cum WHERE running > 2500
)
SELECT user_id, event_id AS first_alert_event, round(running, 2) AS total
FROM crossings WHERE rn = 1
""",
    tags=("app", "state"),
)
def app_alerts_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref: examples/python/alerts_stateful/alerts.py — a
    state_computation keeps a per-user TransactionTotal and fires on
    crossing the threshold; batch twin = first crossing row."""
    ev = _t(spark, sf_dir)["events"]
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = ev.withColumn("running", F.sum("value").over(wcum)).where(
        F.col("running") > 2500
    )
    wrank = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        cum.withColumn("rn", F.row_number().over(wrank))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("first_alert_event"),
            F.round("running", 2).alias("total"),
        )
    )


# --- alerts_windowed: sliding-window sum alert ---
@register(
    "app_alerts_windowed",
    oracle="""
SELECT ((floor(epoch(ts) / 1200) - k) * 1200)::BIGINT AS window_start,
       user_id,
       round(sum(value), 2) AS total
FROM events, range(3) t(k)
GROUP BY window_start, user_id
HAVING sum(value) > 350
""",
    tags=("app", "window"),
)
def app_alerts_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref: examples/python/alerts_windowed/alerts.py —
    range_windows(9s).with_slide(3s).over(TotalAggregation), alert
    when a window's total crosses the threshold (scaled: 1h/20min)."""
    ev = _t(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.window("ts", "1 hour", "20 minutes").alias("w"), "user_id")
        .agg(F.round(F.sum("value"), 2).alias("total"), F.sum("value").alias("_raw"))
        .where(F.col("_raw") > 350)
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "user_id",
            "total",
        )
    )


# --- alphabet: keyed running totals, final state per key ---
@register(
    "app_alphabet",
    oracle="""
SELECT event_type AS key, count(*) AS votes, round(sum(value), 2) AS weight
FROM events GROUP BY event_type
""",
    tags=("app", "state"),
)
def app_alphabet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref: examples/python/alphabet/alphabet.py — add_votes keyed by
    letter; final per-key state is the grand total."""
    ev = _t(spark, sf_dir)["events"]
    return ev.groupBy(F.col("event_type").alias("key")).agg(
        F.count(F.lit(1)).alias("votes"),
        F.round(F.sum("value"), 2).alias("weight"),
    )


# --- word_count: computation_multi (flat-map) → key_by → count ---
@register(
    "app_word_count",
    oracle="""
SELECT word, count(*) AS cnt
FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
""",
    tags=("app", "flatmap"),
)
def app_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref: examples/python/word_count/word_count.py — split into
    words (computation_multi), key_by word, stateful count."""
    docs = _t(spark, sf_dir)["documents"]
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# --- word_count + collect(): un-keyed global rollup ---
@register(
    "app_word_count_collect",
    oracle="""
SELECT count(*) AS total_tokens, count(DISTINCT word) AS distinct_words
FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
WHERE word <> ''
""",
    tags=("app", "collect"),
)
def app_word_count_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline.collect() (machida __init__.py:151) un-keys the stream;
    the batch twin is a global (single-group) aggregate."""
    docs = _t(spark, sf_dir)["documents"]
    words = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).where(F.col("word") != "")
    return words.agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.countDistinct("word").alias("distinct_words"),
    )


# --- market_spread: two keyed streams joined, reject check ---
@register(
    "app_market_spread",
    oracle="""
WITH market AS (
  SELECT user_id, avg(value) AS avg_view, sum(value) AS sum_view,
         count(*) AS n_views
  FROM events WHERE event_type = 'view'
  GROUP BY user_id
)
SELECT e.event_id, e.user_id, round(e.value, 2) AS order_value,
       round(m.sum_view, 2) AS sum_view, m.n_views AS n_views
FROM events e JOIN market m ON e.user_id = m.user_id
WHERE e.event_type = 'purchase'
  AND m.n_views >= 3
  AND e.value > 2.0 * m.avg_view
""",
    tags=("app", "join", "state"),
)
def app_market_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref: examples/python/market_spread — market data stream updates
    per-symbol state; order stream checks against it and emits
    rejections. Here: purchases checked against per-user view state."""
    ev = _t(spark, sf_dir)["events"]
    market = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(
            F.avg("value").alias("avg_view"),
            F.sum("value").alias("sum_view"),
            F.count(F.lit(1)).alias("n_views"),
        )
        .where(F.col("n_views") >= 3)
    )
    orders = ev.where(F.col("event_type") == "purchase")
    return (
        orders.alias("e")
        .join(market.alias("m"), "user_id")
        .where(F.col("e.value") > 2.0 * F.col("m.avg_view"))
        .select(
            "e.event_id",
            "user_id",
            F.round("e.value", 2).alias("order_value"),
            F.round("m.sum_view", 2).alias("sum_view"),
            "m.n_views",
        )
    )


# --- alphabet_partitioned: keyed state split across a FIXED partition set ---
@register(
    "app_alphabet_partitioned",
    oracle="""
SELECT (ascii(substring(event_type, 1, 1)) % 8)::BIGINT AS partition_id,
       event_type AS key, count(*) AS votes, round(sum(value), 2) AS weight
FROM events GROUP BY 1, 2
""",
    tags=("app", "state", "partition"),
)
def app_alphabet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref: examples/python/alphabet_partitioned (_expected.json — the
    source app used wallaroo.partition with a fixed letter-partition
    list; each partition owns the vote state for the keys routed to
    it). Batch twin: a deterministic first-letter routing function maps
    each key to one of 8 fixed partitions, the frame is explicitly
    repartitioned on that id (the Spark analog of Wallaroo's fixed
    state-partition routing), and per-key totals are aggregated within
    their partition — same per-key answer as app_alphabet, plus the
    partition assignment surfaced."""
    ev = _t(spark, sf_dir)["events"]
    routed = ev.withColumn(
        "partition_id",
        F.pmod(F.ascii(F.substring("event_type", 1, 1)), F.lit(8)).cast("bigint"),
    )
    return (
        routed.repartition(8, "partition_id")
        .groupBy("partition_id", F.col("event_type").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("votes"),
            F.round(F.sum("value"), 2).alias("weight"),
        )
    )


# --- celsius_connectors: framed float32 wire decode → compute chain ---
@register(
    "app_celsius_connectors",
    oracle="""
SELECT event_id,
       round(CAST(CAST(value AS REAL) AS DOUBLE) * 1.8 + 32.0, 2) AS fahrenheit
FROM events
""",
    tags=("app", "stateless", "connector"),
)
def app_celsius_connectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref: examples/python/celsius_connectors/celsius.py — a
    SourceConnectorConfig decodes a big-endian float32 wire frame
    (struct.unpack('>f')), two chained computations (multiply 1.8,
    add 32), TCP sink encode. Batch twin: the float32 wire decode is
    cast('float') — bit-identical to unpacking a >f frame — then the
    same computation chain over every event (the connector feed is
    unfiltered, unlike app_celsius's view-only stream). The real framed
    wire codec is exercised byte-for-byte against live sockets in
    tests/test_sources_sinks.py; this key is its driver-checkable
    arithmetic twin."""
    ev = _t(spark, sf_dir)["events"]
    return ev.select(
        "event_id",
        F.round(F.col("value").cast("float") * 1.8 + 32.0, 2).alias("fahrenheit"),
    )


# --- passthrough: identity decode → asis step → encode ---
@register(
    "app_passthrough",
    oracle="""
SELECT event_id, event_type, round(value, 2) AS value
FROM events
""",
    tags=("app", "stateless"),
)
def app_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref: examples/pony/passthrough/passthrough.pony — framed source
    → asis step(s) → sink, the throughput-harness identity pipeline
    (its --parallelism knob is Spark's partition count; identity stays
    a zero-shuffle narrow plan)."""
    ev = _t(spark, sf_dir)["events"]
    return ev.select("event_id", "event_type", F.round("value", 2).alias("value"))


# --- alerts_local_aggregations: local_key_by partial agg → global merge ---
@register(
    "app_alerts_local_agg",
    oracle="""
WITH local AS (
  SELECT event_id % 4 AS shard, user_id,
         sum(value) AS s, count(*) AS n
  FROM events GROUP BY 1, 2)
SELECT user_id, round(sum(s), 2) AS total,
       sum(n)::BIGINT AS n_events, count(*)::BIGINT AS n_shards
FROM local GROUP BY user_id
""",
    tags=("app", "state", "local-agg"),
)
def app_alerts_local_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref: examples/pony/alerts_local_aggregations/alerts.pony —
    `.local_key_by(ExtractUser)` builds WORKER-LOCAL per-user partials
    before the global `.key_by` tallies them across workers. The Spark
    engine does this implicitly for every algebraic agg (map-side
    partial + final merge); this key surfaces the two-phase shape
    explicitly: shard = receiving worker (event_id % 4, deterministic),
    local (shard, user) partials, then the cross-worker merge with the
    per-user contributing-shard count."""
    ev = _t(spark, sf_dir)["events"]
    local = (
        ev.withColumn("shard", F.col("event_id") % 4)
        .groupBy("shard", "user_id")
        .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    return local.groupBy("user_id").agg(
        F.round(F.sum("s"), 2).alias("total"),
        F.sum("n").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_shards"),
    )


# --- multi_worker_forwarding: key-routed forwarding matrix ---
@register(
    "app_multi_worker_forwarding",
    oracle="""
SELECT 'worker-' || (ascii(substring(event_type, 1, 1)) % 4) AS worker,
       event_type, count(*) AS n_forwarded
FROM events GROUP BY 1, 2
""",
    tags=("app", "routing"),
)
def app_multi_worker_forwarding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref: examples/pony/multi_worker_forwarding — messages key_by'd
    on their first byte and forwarded to the owning worker (asis
    steps). Batch twin: the same first-byte routing function assigns
    each message a worker; output is the forwarding matrix (worker ×
    message type × count) that the app's verbose mode prints."""
    ev = _t(spark, sf_dir)["events"]
    return (
        ev.withColumn(
            "worker",
            F.concat(
                F.lit("worker-"),
                F.pmod(F.ascii(F.substring("event_type", 1, 1)), F.lit(4)).cast(
                    "string"
                ),
            ),
        )
        .groupBy("worker", "event_type")
        .agg(F.count(F.lit(1)).alias("n_forwarded"))
    )


# --- Pipeline.merge: union of two pipelines into one ---
@register(
    "pipeline_merge",
    oracle="""
SELECT src, count(*) AS n, round(sum(amount), 2) AS total
FROM (
  SELECT 'purchases' AS src, value AS amount FROM events
  WHERE event_type = 'purchase'
  UNION ALL
  SELECT 'signups' AS src, value * 10.0 AS amount FROM events
  WHERE event_type = 'signup'
)
GROUP BY src
""",
    tags=("app", "merge"),
)
def pipeline_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline.merge (machida __init__.py:158): two source pipelines
    with their own computations merged before a shared sink stage."""
    ev = _t(spark, sf_dir)["events"]
    a = ev.where(F.col("event_type") == "purchase").select(
        F.lit("purchases").alias("src"), F.col("value").alias("amount")
    )
    b = ev.where(F.col("event_type") == "signup").select(
        F.lit("signups").alias("src"), (F.col("value") * 10.0).alias("amount")
    )
    return (
        a.unionByName(b)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("amount"), 2).alias("total"))
    )
