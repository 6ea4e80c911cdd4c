"""Time-series operators over the events hypertable — round-7
extensions (SURVEY §2.4; hypertable family begun by hypertable_rollup /
resample_1h in analytics.py).

  events_ohlc         per (type, hour) open/high/low/close candlestick
  time_weighted_avg   LOCF time-weighted mean per type (TimescaleDB
                      ``time_weight('locf', ...)`` semantics)
  gap_fill_locf       dense hourly grid with last-observation-carried-
                      forward fill (TimescaleDB ``locf(gapfill(...))``)
  events_anomaly_mad  robust outlier report: median/MAD per type
  events_ewma         (r8) per-user trailing EWMA spend baseline at the
                      last event — exact integer weights 2^(K-1-j),
                      unrolled SQL shared verbatim with the oracle; the
                      streaming twin (streaming/ops.ewma_stream) holds
                      the same ring as per-key state

All lanes have full DuckDB oracles. Monetary/value sums are integerized
per row (``floor(1000 * value)`` — exact per-row, then bigint sums are
associative) so the value hash is exact regardless of summation order;
the MAD lane compares doubles only through deterministic selection
(nearest-rank) and IEEE multiplication, never float accumulation.
Reference parity: the reference's market-spread app family
(examples/python/market_spread) maintains per-symbol last-state over a
price stream; these lanes are the batch analytics face of that state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from wally_spark.plans.registry import register
from wally_spark.tables import load_tables


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["events"]


# --- OHLC candlesticks ------------------------------------------------------
@register(
    "events_ohlc",
    oracle="""
WITH e AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_b, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_f,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_l
  FROM events
)
SELECT event_type, epoch(hour_b)::BIGINT AS hour_epoch,
       max(CASE WHEN rn_f = 1 THEN value END) AS open_v,
       max(value) AS high_v,
       min(value) AS low_v,
       max(CASE WHEN rn_l = 1 THEN value END) AS close_v,
       count(*)::BIGINT AS n_events,
       sum(floor(1000 * value)::BIGINT)::BIGINT AS vol_milli
FROM e GROUP BY event_type, hour_b
""",
    tags=("timeseries", "events", "ohlc"),
)
def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(type, hour) OHLC bars — the candlestick rollup every
    market-data pipeline keeps (the batch face of the reference's
    market-spread state, examples/python/market_spread/market_spread.py:
    per-symbol bid/offer last-state). Open/close are selected by
    deterministic (ts, event_id) rank, never ``first()`` (whose result
    is partition-order-dependent — wrong under shuffle); high/low are
    plain min/max; volume is an exact integer sum.

    Scale shape: one window + one aggregate, both partitioned by the
    SAME (event_type, hour) key, so Catalyst plans a single Exchange
    reused by both operators; per-partition state is one hour of one
    type — bounded regardless of corpus size."""
    ev = _events(spark, sf_dir)
    hour_b = F.date_trunc("hour", "ts")
    w_f = Window.partitionBy("event_type", "hour_b").orderBy("ts", "event_id")
    w_l = Window.partitionBy("event_type", "hour_b").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = ev.select(
        "event_type", hour_b.alias("hour_b"), "ts", "event_id", "value"
    ).select(
        "event_type",
        "hour_b",
        "value",
        F.row_number().over(w_f).alias("rn_f"),
        F.row_number().over(w_l).alias("rn_l"),
    )
    return ranked.groupBy("event_type", "hour_b").agg(
        F.max(F.when(F.col("rn_f") == 1, F.col("value"))).alias("open_v"),
        F.max("value").alias("high_v"),
        F.min("value").alias("low_v"),
        F.max(F.when(F.col("rn_l") == 1, F.col("value"))).alias("close_v"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(1000 * F.col("value")).cast("bigint")).alias("vol_milli"),
    ).select(
        "event_type",
        F.unix_timestamp("hour_b").alias("hour_epoch"),
        "open_v",
        "high_v",
        "low_v",
        "close_v",
        "n_events",
        "vol_milli",
    )


# --- time-weighted average --------------------------------------------------
@register(
    "time_weighted_avg",
    oracle="""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS us, floor(1000 * value)::BIGINT AS vmilli,
         lead(epoch_us(ts)) OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) AS next_us
  FROM events
)
SELECT event_type,
       count(*)::BIGINT AS n_events,
       (sum(vmilli * (next_us - us)) // sum(next_us - us))::BIGINT AS twa_milli,
       (sum(next_us - us) // 1000000)::BIGINT AS span_s
FROM e WHERE next_us IS NOT NULL
GROUP BY event_type
""",
    tags=("timeseries", "events"),
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF time-weighted average per type (TimescaleDB
    ``time_weight('locf', ...)``): each observation's value holds until
    the next observation, so the mean weights each value by its holding
    interval — the right average for irregularly-sampled gauges, where
    the arithmetic mean over-counts bursts. The last observation per
    type has no successor and carries zero weight (standard LOCF
    endpoint rule).

    Exactness: value is integerized per row (floor milli — exact) and
    interval weights are integer microseconds, so the weighted sum is
    pure bigint arithmetic — associative, identical in any partition
    order — and the final ratio is integer division. Scale shape: ONE
    lead-window + aggregate on the same event_type key (single
    Exchange); per-type ordering is the cost any time-weighted operator
    pays, bounded per partition by the type's slice."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    e = ev.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.floor(1000 * F.col("value")).cast("bigint").alias("vmilli"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    ).where(F.col("next_us").isNotNull())
    dt = F.col("next_us") - F.col("us")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("sum(vmilli * (next_us - us)) div sum(next_us - us)").alias(
            "twa_milli"
        ),
        F.expr("sum(next_us - us) div 1000000").alias("span_s"),
    ).select(
        "event_type",
        "n_events",
        F.col("twa_milli").cast("bigint").alias("twa_milli"),
        "span_s",
    )


# --- LOCF gap fill ----------------------------------------------------------
@register(
    "gap_fill_locf",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS h0,
         date_trunc('hour', max(ts)) AS h1
  FROM events
), grid AS (
  SELECT t.event_type,
         unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS h
  FROM (SELECT DISTINCT event_type FROM events) t, bounds b
), rep AS (
  SELECT event_type, hour_b AS h, vmilli
  FROM (SELECT event_type, date_trunc('hour', ts) AS hour_b,
               floor(1000 * value)::BIGINT AS vmilli,
               row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
  WHERE rn = 1
), filled AS (
  SELECT g.event_type, g.h, rep.vmilli,
         last_value(rep.vmilli IGNORE NULLS) OVER (
           PARTITION BY g.event_type ORDER BY g.h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill_milli
  FROM grid g LEFT JOIN rep ON rep.event_type = g.event_type AND rep.h = g.h
)
SELECT event_type, epoch(h)::BIGINT AS hour_epoch,
       fill_milli::BIGINT AS fill_milli,
       (vmilli IS NULL) AS is_gap
FROM filled
""",
    tags=("timeseries", "events", "gapfill"),
)
def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series with last-observation-carried-forward fill
    (TimescaleDB ``locf(time_bucket_gapfill(...))``): every (type,
    hour) cell in the observed range appears; empty hours inherit the
    last seen per-hour representative (the hour's LAST event by
    deterministic (ts, event_id) rank) and are flagged ``is_gap``.
    Hours before a type's first observation stay NULL — LOCF has
    nothing to carry.

    Scale shape: aggregate FIRST (per-hour representative via a
    (type, hour)-partitioned rank — bounded state), then densify
    against a generated grid whose size is hours × types — independent
    of raw volume, same shape as resample_1h — and fill with a
    per-type ordered window over that aggregate-sized relation. The
    fill window's partition is one type's calendar hours: bounded by
    the time range, not the data rate (revenue_dod_delta precedent)."""
    ev = _events(spark, sf_dir)
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h"),
    )
    w_rep = Window.partitionBy("event_type", "hour_b").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    rep = (
        ev.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("hour_b"),
            "ts",
            "event_id",
            F.floor(1000 * F.col("value")).cast("bigint").alias("vmilli"),
        )
        .select(
            "event_type",
            F.col("hour_b").alias("h"),
            "vmilli",
            F.row_number().over(w_rep).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    w_fill = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(rep, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            "vmilli",
            F.last("vmilli", ignorenulls=True).over(w_fill).alias("fill_milli"),
        )
        .select(
            "event_type",
            F.unix_timestamp("h").alias("hour_epoch"),
            F.col("fill_milli").cast("bigint").alias("fill_milli"),
            F.col("vmilli").isNull().alias("is_gap"),
        )
    )


# --- robust outliers: median absolute deviation -----------------------------
MAD_K_X10000 = 44478  # 3 * 1.4826 (consistency constant) * 10^4


@register(
    "events_anomaly_mad",
    oracle=f"""
WITH ranked AS (
  SELECT event_type, value, event_id,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
), med AS (
  SELECT event_type, max(CASE WHEN rn = ceil(0.5 * n) THEN value END) AS med,
         max(n)::BIGINT AS n
  FROM ranked GROUP BY event_type
), dev AS (
  SELECT e.event_type, e.value, m.med, m.n, abs(e.value - m.med) AS ad,
         row_number() OVER (PARTITION BY e.event_type
                            ORDER BY abs(e.value - m.med), e.event_id) AS rn
  FROM events e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, max(med) AS med, max(n)::BIGINT AS n,
         max(CASE WHEN rn = ceil(0.5 * n) THEN ad END) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type, max(d.med) AS med, max(m.mad) AS mad, max(d.n)::BIGINT AS n,
       sum(CASE WHEN 10000 * d.ad > {MAD_K_X10000} * m.mad
                THEN 1 ELSE 0 END)::BIGINT AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
""",
    tags=("timeseries", "events", "anomaly"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier report: median + MAD (median absolute
    deviation, the estimator that survives the very outliers it hunts
    — stddev-based z-scores don't), flagging values beyond
    3 · 1.4826 · MAD. Both medians are nearest-rank selections of
    STORED doubles (no interpolation arithmetic — engines agree
    bit-for-bit, quantiles_exact_check precedent) and the threshold
    compare is cross-multiplied to one deterministic IEEE multiply per
    side.

    Scale shape: two ranked passes partitioned by event_type with the
    tiny per-type medians rejoined by broadcast — the per-type sort is
    the audit-grade cost (the sketchable cousin is
    approx_quantiles_by_type); partitions are bounded by the type's
    slice, and the two window passes reuse one Exchange."""
    ev = _events(spark, sf_dir)
    w_v = Window.partitionBy("event_type").orderBy("value", "event_id")
    w_n = Window.partitionBy("event_type")
    ranked = ev.select("event_type", "value", "event_id").select(
        "event_type",
        "value",
        "event_id",
        F.row_number().over(w_v).alias("rn"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    med = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.ceil(0.5 * F.col("n")), F.col("value"))
        ).alias("med"),
        F.max("n").cast("bigint").alias("n"),
    )
    w_ad = Window.partitionBy("event_type").orderBy("ad", "event_id")
    dev = (
        ev.select("event_type", "value", "event_id")
        .join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            "value",
            "med",
            "n",
            F.abs(F.col("value") - F.col("med")).alias("ad"),
            "event_id",
        )
        .select(
            "event_type",
            "value",
            "med",
            "n",
            "ad",
            F.row_number().over(w_ad).alias("rn"),
        )
    )
    mad = dev.groupBy("event_type").agg(
        F.max("med").alias("med_"),
        F.max("n").cast("bigint").alias("n_"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.5 * F.col("n")), F.col("ad"))
        ).alias("mad"),
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.max("n").cast("bigint").alias("n"),
            F.sum(
                F.when(
                    10000 * F.col("ad") > MAD_K_X10000 * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


# --- CUSUM changepoint detection --------------------------------------------
@register(
    "events_cusum_changepoint",
    oracle="""
WITH e AS (
  SELECT event_type, ts, event_id, floor(1000 * value)::BIGINT AS vmilli,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS t,
         sum(floor(1000 * value)::BIGINT) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_t,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(floor(1000 * value)::BIGINT) OVER (PARTITION BY event_type) AS s_n
  FROM events
),
stat AS (
  SELECT event_type, ts, t, n,
         abs(s_t * n - t * s_n)::BIGINT AS d,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(s_t * n - t * s_n) DESC, t) AS rn
  FROM e
)
SELECT event_type, ts AS cp_ts, t::BIGINT AS cp_idx, n::BIGINT AS n, d AS d_max
FROM stat WHERE rn = 1
""",
    tags=("timeseries", "events", "changepoint"),
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per type: the index t maximizing
    |S_t·n − t·S_n| — the cumulative-sum statistic (Page/Pettitt shape)
    locating where a series' mean shifts, cross-multiplied so the
    classic |S_t − (t/n)·S_n| comparison is pure bigint arithmetic
    (values integerized per row; no division until never). The argmax
    is deterministic: ties break on the earliest index.

    Scale shape: one per-type ordered cumulative window (the same
    bounded-per-type sort contract as quantiles_exact_check — this is
    the audit-grade pass; a streaming CUSUM keeps (S_t, t) as running
    state instead), the per-type totals ride the same window Exchange,
    and the argmax is a rank-1 filter, not a sort of the statistic."""
    ev = _events(spark, sf_dir)
    w_o = Window.partitionBy("event_type").orderBy("ts", "event_id")
    w_cum = w_o.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("event_type")
    vmilli = F.floor(1000 * F.col("value")).cast("bigint")
    e = ev.select("event_type", "ts", "event_id", vmilli.alias("vmilli")).select(
        "event_type",
        "ts",
        F.row_number().over(w_o).alias("t"),
        F.sum("vmilli").over(w_cum).alias("s_t"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("vmilli").over(w_all).alias("s_n"),
    )
    d = F.abs(F.col("s_t") * F.col("n") - F.col("t") * F.col("s_n"))
    w_max = Window.partitionBy("event_type").orderBy(F.desc("d"), "t")
    stat = e.select(
        "event_type",
        "ts",
        "t",
        "n",
        d.cast("bigint").alias("d"),
    ).select(
        "event_type", "ts", "t", "n", "d", F.row_number().over(w_max).alias("rn")
    )
    return stat.where(F.col("rn") == 1).select(
        "event_type",
        F.col("ts").alias("cp_ts"),
        F.col("t").cast("bigint").alias("cp_idx"),
        F.col("n").cast("bigint").alias("n"),
        F.col("d").alias("d_max"),
    )


# --- diurnal seasonality profile --------------------------------------------
@register(
    "events_seasonality",
    oracle="""
WITH h AS (
  SELECT event_type, hour(ts)::BIGINT AS hod,
         count(*)::BIGINT AS n,
         sum(floor(1000 * value)::BIGINT)::BIGINT AS v_milli
  FROM events GROUP BY 1, 2)
SELECT event_type, hod, n,
       (v_milli // n)::BIGINT AS mean_value_milli,
       ((1000000 * n) // sum(n) OVER (PARTITION BY event_type))::BIGINT
         AS share_ppm
FROM h
""",
    tags=("events", "timeseries", "seasonality"),
)
def events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per event type: event share and
    mean value per (type, 0-23) cell — the diurnal baseline a
    monitoring pipeline subtracts before anomaly scoring (the
    seasonal term of an STL-style decomposition, computed exactly).

    One map-side-combining aggregate to a |types|×24 table; the
    normalising window runs over that aggregate, not the stream. All
    integer (milli values, ppm shares, bigint floor division) —
    hash-exact at any partitioning."""
    ev = _events(spark, sf_dir)
    h = ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hod")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.floor(F.lit(1000) * F.col("value")).cast("bigint"))
        .cast("bigint")
        .alias("v_milli"),
    )
    wt = Window.partitionBy("event_type")
    return h.select(
        "event_type",
        "hod",
        "n",
        F.floor(F.col("v_milli") / F.col("n")).cast("bigint").alias(
            "mean_value_milli"
        ),
        F.floor((F.lit(1000000) * F.col("n")) / F.sum("n").over(wt))
        .cast("bigint")
        .alias("share_ppm"),
    )


# --- autocorrelation of the hourly series ------------------------------------
AUTOCORR_LAGS = (1, 2, 3, 24)


@register(
    "events_autocorr",
    oracle=f"""
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS hb,
         (sum(floor(1000 * value)::BIGINT) // count(*))::BIGINT AS v
  FROM events GROUP BY 1, 2),
l AS (
  SELECT event_type, v,
         {", ".join(f"lag(v, {k}) OVER (PARTITION BY event_type ORDER BY hb) AS v_l{k}" for k in AUTOCORR_LAGS)}
  FROM h)
{" UNION ALL ".join(
    f"SELECT event_type, {k}::BIGINT AS lag_h, "
    f"round(corr(v, v_l{k}), 4) AS acf, count(v_l{k})::BIGINT AS n "
    f"FROM l WHERE v_l{k} IS NOT NULL GROUP BY event_type"
    for k in AUTOCORR_LAGS)}
""",
    tags=("events", "timeseries", "autocorr"),
)
def events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly mean-value series per event type
    at lags {AUTOCORR_LAGS} — the periodicity probe (lag 24 = diurnal
    cycle) behind seasonal-model selection.

    The hourly series is integerized FIRST (bigint floor-divided mean,
    exact), so both engines correlate identical integer inputs; `corr`
    itself is the codegen co-moment aggregate rounded to 4 dp, the
    registry convention set by event_value_hour_corr. All lag windows
    share one (type, hour)-sorted pass over the AGGREGATED series
    (calendar-bounded, thousands of rows at any corpus size), never
    the raw stream."""
    ev = _events(spark, sf_dir)
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hb")
    ).agg(
        F.floor(
            F.sum(F.floor(F.lit(1000) * F.col("value")).cast("bigint"))
            / F.count(F.lit(1))
        )
        .cast("bigint")
        .alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("hb")
    lagged = h.select(
        "event_type",
        "v",
        *[F.lag("v", k).over(w).alias(f"v_l{k}") for k in AUTOCORR_LAGS],
    )
    parts = [
        lagged.where(F.col(f"v_l{k}").isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(F.corr("v", f"v_l{k}"), 4).alias("acf"),
            F.count(f"v_l{k}").cast("bigint").alias("n"),
        )
        .select(
            "event_type",
            F.lit(k).cast("bigint").alias("lag_h"),
            "acf",
            "n",
        )
        for k in AUTOCORR_LAGS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- winsorized robust stats --------------------------------------------------
@register(
    "value_winsorized",
    oracle="""
WITH v AS (
  SELECT event_type, floor(1000 * value)::BIGINT AS vm,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events),
b AS (
  SELECT event_type,
         max(CASE WHEN rn = greatest((5 * n) // 100, 1) THEN vm END) AS lo,
         max(CASE WHEN rn = least((95 * n) // 100 + 1, n) THEN vm END) AS hi
  FROM v GROUP BY event_type)
SELECT v.event_type,
       count(*)::BIGINT AS n,
       b.lo AS p05_milli, b.hi AS p95_milli,
       sum(least(greatest(v.vm, b.lo), b.hi))::BIGINT AS wsum_milli,
       (sum(least(greatest(v.vm, b.lo), b.hi)) // count(*))::BIGINT
         AS wmean_milli
FROM v JOIN b ON b.event_type = v.event_type
GROUP BY v.event_type, b.lo, b.hi
""",
    tags=("events", "analytics", "robust"),
)
def value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type: clamp values to the exact
    nearest-rank [p05, p95] band, then average — the robust-mean twin
    of value_outliers (which drops outliers; winsorizing keeps and
    clamps them, the usual choice for reward/metric aggregation).

    Bounds are deterministic nearest-rank selections (same protocol as
    events_anomaly_mad — a rank-equality filter, never a sort-collect)
    broadcast back against the integerized stream; sums are bigint
    milli so the hash is exact. Two passes over one type-keyed
    Exchange at scale."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    v = ev.select(
        "event_type",
        F.floor(F.lit(1000) * F.col("value")).cast("bigint").alias("vm"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    b = v.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn")
                == F.greatest(F.floor((5 * F.col("n")) / 100), F.lit(1)),
                F.col("vm"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("rn")
                == F.least(
                    F.floor((95 * F.col("n")) / 100) + 1, F.col("n")
                ),
                F.col("vm"),
            )
        ).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("vm"), F.col("lo")), F.col("hi"))
    return (
        v.join(F.broadcast(b), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(clamped).cast("bigint").alias("wsum_milli"),
        )
        .select(
            "event_type",
            "n",
            F.col("lo").alias("p05_milli"),
            F.col("hi").alias("p95_milli"),
            "wsum_milli",
            F.floor(F.col("wsum_milli") / F.col("n"))
            .cast("bigint")
            .alias("wmean_milli"),
        )
    )


# --- out-of-order arrival audit (r8) -----------------------------------------
@register(
    "late_arrival_report",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us,
         max(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
  FROM events
)
SELECT user_id,
       count(*)::BIGINT AS n_events,
       sum(CASE WHEN us < hwm THEN 1 ELSE 0 END)::BIGINT AS n_late,
       (10000 * sum(CASE WHEN us < hwm THEN 1 ELSE 0 END) // count(*))::BIGINT
         AS late_bp,
       coalesce(max(CASE WHEN us < hwm THEN (hwm - us) // 1000 END), 0)::BIGINT
         AS max_lateness_ms
FROM e GROUP BY user_id
""",
    tags=("timeseries", "events", "streaming-audit"),
)
def late_arrival_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order arrival audit — the batch diagnostic that SIZES a
    streaming watermark (SURVEY §2.2 watermark delay): taking event_id
    as arrival order, an event is LATE when its event time is behind
    the per-user high-water mark of everything that arrived before it.
    Per user: event count, late count in basis points, and the worst
    lateness in ms — max_lateness_ms is exactly the smallest watermark
    delay that would have lost nothing, making this the lane an
    operator runs BEFORE choosing `.with_watermark()` (the reference's
    late-data policies, windows.pony) rather than after losing data.

    Scale shape: one running-max window partitioned by user_id
    (bounded per-user partitions — never a global order), then one
    user-keyed aggregate, map-side combined. Integer microsecond
    arithmetic floored to ms — hash-exact under any partitioning."""
    e = _events(spark, sf_dir).select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = e.select(
        "user_id",
        "us",
        F.max("us").over(w).alias("hwm"),
    )
    late = (F.col("us") < F.col("hwm")).cast("bigint")
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(late).cast("bigint").alias("n_late"),
        F.expr(
            "10000 * sum(cast(us < hwm as bigint)) div count(1)"
        )
        .cast("bigint")
        .alias("late_bp"),
        F.coalesce(
            F.max(F.when(F.col("us") < F.col("hwm"),
                         F.expr("(hwm - us) div 1000"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("max_lateness_ms"),
    )


# --- sliding-window rate-limit audit (r8) ------------------------------------
RATE_WINDOW_S = 60
RATE_LIMIT = 5  # events per window per user


@register(
    "events_rate_limit",
    oracle=f"""
WITH e AS (
  SELECT user_id, epoch(ts)::BIGINT AS s,
         count(*) OVER (
           PARTITION BY user_id ORDER BY epoch(ts)::BIGINT
           RANGE BETWEEN {RATE_WINDOW_S - 1} PRECEDING AND CURRENT ROW)
           AS rate
  FROM events
)
SELECT user_id,
       count(*)::BIGINT AS n_events,
       max(rate)::BIGINT AS peak_rate,
       sum(CASE WHEN rate > {RATE_LIMIT} THEN 1 ELSE 0 END)::BIGINT
         AS n_breaches
FROM e GROUP BY user_id
""",
    tags=("timeseries", "events", "streaming-audit"),
)
def events_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window rate-limit audit: for every event, the count of
    the same user's events in the trailing RATE_WINDOW_S seconds (a
    true RANGE frame over event-time seconds — equal timestamps are
    peers in both engines, so the count is order-independent by
    construction); per user, the peak rate and how many events were
    over RATE_LIMIT. The batch twin of a streaming throttle/abuse
    monitor, and the calibration table for setting the limit itself.

    Scale shape: one RANGE window partitioned by user_id (bounded
    per-user partitions), one user-keyed aggregate — map-side
    combined. All-bigint outputs."""
    e = _events(spark, sf_dir).select(
        "user_id", F.unix_timestamp("ts").alias("s")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s")
        .rangeBetween(-(RATE_WINDOW_S - 1), 0)
    )
    rated = e.select(
        "user_id", F.count(F.lit(1)).over(w).alias("rate")
    )
    return rated.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("rate").cast("bigint").alias("peak_rate"),
        F.sum((F.col("rate") > RATE_LIMIT).cast("bigint"))
        .cast("bigint")
        .alias("n_breaches"),
    )


# --- truncated EWMA (r8) ----------------------------------------------------
EWMA_K = 8  # lag horizon; alpha = 1/2 so weight(lag j) = 2^(K-1-j)

# Shared unrolled weighted-lag expressions: identical SQL text feeds
# Spark (selectExpr) and the DuckDB oracle, so the two engines compute
# the same integer arithmetic by construction.
_EWMA_WS = " + ".join(
    f"CASE WHEN lag(v_cents, {j}) OVER w IS NOT NULL THEN "
    f"{1 << (EWMA_K - 1 - j)} * lag(v_cents, {j}) OVER w ELSE 0 END"
    for j in range(EWMA_K)
)
_EWMA_W = " + ".join(
    f"CASE WHEN lag(v_cents, {j}) OVER w IS NOT NULL THEN "
    f"{1 << (EWMA_K - 1 - j)} ELSE 0 END"
    for j in range(EWMA_K)
)


@register(
    "events_ewma",
    oracle=f"""
WITH e AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_cents
  FROM events),
s AS (
  SELECT user_id, v_cents,
         (({_EWMA_WS}) // ({_EWMA_W}))::BIGINT AS ewma_cents,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_events
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, n_events::BIGINT AS n_events,
       ewma_cents::BIGINT AS ewma_cents,
       v_cents::BIGINT AS last_cents,
       ((10000 * v_cents) // nullif(ewma_cents, 0))::BIGINT AS ratio_bp
FROM s WHERE rn = 1
""",
    tags=("timeseries", "events", "ewma"),
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing EWMA of per-user spend at each user's LAST event — the
    smoothed-baseline feature a spend-spike alert compares against
    (ratio_bp = last vs baseline). alpha=1/2 EWMA truncated at EWMA_K
    lags, computed EXACTLY in integers: weight(lag j) = 2^(K-1-j), so
    ewma = Σ w_j·v_j div Σ w_j over the lags that exist — identical
    unrolled SQL text runs in both engines (no float accumulation, no
    recursion).

    Scale shape: one shuffle keyed by user_id serves both windows (the
    asc lag frame and the desc row_number share the partition key);
    output is |users|-bounded. The streaming face is a per-user
    last-K ring buffer — the same state shape as app_market_spread."""
    e = _events(spark, sf_dir).selectExpr(
        "user_id", "ts", "event_id",
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_cents",
    )
    e.createOrReplaceTempView("_ewma_e")
    return spark.sql(f"""
        WITH s AS (
          SELECT user_id, v_cents,
                 CAST(({_EWMA_WS}) div ({_EWMA_W}) AS BIGINT) AS ewma_cents,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn,
                 count(*) OVER (PARTITION BY user_id) AS n_events
          FROM _ewma_e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
               CAST(ewma_cents AS BIGINT) AS ewma_cents,
               CAST(v_cents AS BIGINT) AS last_cents,
               CAST((10000 * v_cents) div nullif(ewma_cents, 0) AS BIGINT)
                 AS ratio_bp
        FROM s WHERE rn = 1
    """)


# --- per-type daily-volume OLS trend (r9) ------------------------------------
@register(
    "event_volume_trend",
    oracle="""
WITH daily AS (
  SELECT event_type,
         (ts::DATE - DATE '1970-01-01')::BIGINT AS x,
         count(*)::BIGINT AS y
  FROM events GROUP BY 1, 2),
s AS (
  SELECT event_type,
         count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx
  FROM daily GROUP BY 1)
SELECT event_type, n AS n_days, sy AS n_events,
       ((1000 * sy) // n)::BIGINT AS mean_daily_milli,
       ((1000 * (n * sxy - sx * sy)) // nullif(n * sxx - sx * sx, 0))
         ::BIGINT AS slope_milli
FROM s ORDER BY event_type
""",
    tags=("timeseries", "events", "trend"),
)
def event_volume_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily-volume trend — the capacity-planning regression
    ("is error volume growing?"): ordinary least squares of daily
    event count against the epoch-day index, in EXACT integers via the
    closed form slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), reported in
    events-per-day millis alongside the mean daily volume. A one-day
    corpus has zero x-variance — the nullif'd divisor yields NULL
    slope in both engines instead of raising.

    Scale shape: ONE scan → (type, day) aggregate (map-side combined,
    bounded by types × date range) → one types-bounded moment
    aggregate; division AFTER the sums. Both engines truncate the
    signed quotient toward zero (Spark ``div`` == DuckDB ``//``).
    int64 bounds: x ≈ 2·10⁴ epoch days, so nΣx² ≈ |days|²·x² stays
    under 2⁶³ until |days| ≈ 10⁵ (300 years of dailies) even with
    10⁹-event days (Σxy ≈ |days|·x·y ≈ 10⁵·2·10⁴·10⁹ ≈ 2·10¹⁸ is the
    binding term — re-origin x to min(day) before that corpus)."""
    daily = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
            .cast("bigint")
            .alias("x"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    return s.selectExpr(
        "event_type",
        "n AS n_days",
        "sy AS n_events",
        "CAST((1000 * sy) div n AS BIGINT) AS mean_daily_milli",
        "CAST((1000 * (n * sxy - sx * sy))"
        " div nullif(n * sxx - sx * sx, 0) AS BIGINT) AS slope_milli",
    ).orderBy("event_type")


# --- exact per-day percentiles (r9) ------------------------------------------
@register(
    "daily_value_percentiles",
    oracle="""
WITH v AS (
  SELECT ts::DATE AS day, event_type,
         CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vm, event_id
  FROM events),
r AS (
  SELECT day, event_type, vm,
         row_number() OVER (PARTITION BY day, event_type
                            ORDER BY vm, event_id) AS rk,
         count(*) OVER (PARTITION BY day, event_type) AS n
  FROM v)
SELECT day, event_type, max(n)::BIGINT AS n_events,
       max(CASE WHEN rk = (50 * n + 99) // 100 THEN vm END)::BIGINT
         AS p50_milli,
       max(CASE WHEN rk = (90 * n + 99) // 100 THEN vm END)::BIGINT
         AS p90_milli,
       max(CASE WHEN rk = (99 * n + 99) // 100 THEN vm END)::BIGINT
         AS p99_milli
FROM r GROUP BY day, event_type
ORDER BY day, event_type
""",
    tags=("events", "timeseries", "percentiles"),
)
def daily_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank daily percentiles — the latency-dashboard
    shape (p50/p90/p99 per day per type) computed EXACTLY in integer
    millis: rank r_q = ceil(q·n) within each (day, type) group picks
    the percentile value, deterministic under the (value, event_id)
    tiebreak. The quantiles_by_type lane is global; this is the
    time-bucketed operational face.

    Scale shape: ONE shuffle on the composite (day, type) key carries
    both windows and the final rollup (partitioning reused across the
    rank, count, and groupBy stages — Catalyst plans a single
    Exchange); groups are day-sized so no partition exceeds one day's
    type slice. At 10⁹-row days swap the row_number for the
    distributed ntile (operators/prefix.py) — same rank semantics."""
    e = _events(spark, sf_dir).select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.floor(F.col("value") * 1000.0 + 0.5).cast("bigint").alias("vm"),
        "event_id",
    )
    wr = Window.partitionBy("day", "event_type").orderBy("vm", "event_id")
    wn = Window.partitionBy("day", "event_type")
    r = e.select(
        "day",
        "event_type",
        "vm",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def pick(q: int, name: str):
        idx = F.expr(f"({q} * n + 99) div 100")
        return (
            F.max(F.when(F.col("rk") == idx, F.col("vm")))
            .cast("bigint")
            .alias(name)
        )

    return (
        r.groupBy("day", "event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            pick(50, "p50_milli"),
            pick(90, "p90_milli"),
            pick(99, "p99_milli"),
        )
        .orderBy("day", "event_type")
    )


# --- multivariate OLS: value ~ hour + dow (r9) -------------------------------
@register(
    "events_ols_multi",
    oracle="""
WITH f AS (
  SELECT event_type,
         hour(ts)::BIGINT AS x1,
         (dayofweek(ts) + 1)::BIGINT AS x2,
         CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS y
  FROM events),
m AS (
  SELECT event_type,
         count(*)::BIGINT AS n,
         sum(x1)::BIGINT AS s1, sum(x2)::BIGINT AS s2,
         sum(y)::BIGINT AS sy,
         sum(x1 * x1)::BIGINT AS s11, sum(x2 * x2)::BIGINT AS s22,
         sum(x1 * x2)::BIGINT AS s12,
         sum(x1 * y)::BIGINT AS s1y, sum(x2 * y)::BIGINT AS s2y,
         sum(y * y)::BIGINT AS syy
  FROM f GROUP BY 1),
d AS (
  SELECT event_type, n, sy, s1y, s2y, syy,
         (n::DOUBLE * ((s11::DOUBLE * s22::DOUBLE) - (s12::DOUBLE * s12::DOUBLE))
          - s1::DOUBLE * ((s1::DOUBLE * s22::DOUBLE) - (s12::DOUBLE * s2::DOUBLE))
          + s2::DOUBLE * ((s1::DOUBLE * s12::DOUBLE) - (s11::DOUBLE * s2::DOUBLE)))
           AS det,
         (sy::DOUBLE * ((s11::DOUBLE * s22::DOUBLE) - (s12::DOUBLE * s12::DOUBLE))
          - s1::DOUBLE * ((s1y::DOUBLE * s22::DOUBLE) - (s12::DOUBLE * s2y::DOUBLE))
          + s2::DOUBLE * ((s1y::DOUBLE * s12::DOUBLE) - (s11::DOUBLE * s2y::DOUBLE)))
           AS det0,
         (n::DOUBLE * ((s1y::DOUBLE * s22::DOUBLE) - (s12::DOUBLE * s2y::DOUBLE))
          - sy::DOUBLE * ((s1::DOUBLE * s22::DOUBLE) - (s12::DOUBLE * s2::DOUBLE))
          + s2::DOUBLE * ((s1::DOUBLE * s2y::DOUBLE) - (s1y::DOUBLE * s2::DOUBLE)))
           AS det1,
         (n::DOUBLE * ((s11::DOUBLE * s2y::DOUBLE) - (s1y::DOUBLE * s12::DOUBLE))
          - s1::DOUBLE * ((s1::DOUBLE * s2y::DOUBLE) - (s1y::DOUBLE * s2::DOUBLE))
          + sy::DOUBLE * ((s1::DOUBLE * s12::DOUBLE) - (s11::DOUBLE * s2::DOUBLE)))
           AS det2
  FROM m)
SELECT event_type, n AS n_events,
       round(det0 / det, 4) AS beta0_milli,
       round(det1 / det, 4) AS beta1_milli,
       round(det2 / det, 4) AS beta2_milli,
       CAST(floor(10000.0
         * (((det0 / det) * sy::DOUBLE + (det1 / det) * s1y::DOUBLE
             + (det2 / det) * s2y::DOUBLE)
            - (sy::DOUBLE * sy::DOUBLE) / n::DOUBLE)
         / nullif(syy::DOUBLE - (sy::DOUBLE * sy::DOUBLE) / n::DOUBLE, 0.0))
         AS BIGINT) AS r2_bp
FROM d ORDER BY event_type
""",
    tags=("events", "timeseries", "regression"),
)
def events_ols_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate OLS — value_milli ~ hour-of-day + day-of-week per
    event type, solved in closed form (3×3 normal equations, Cramer's
    rule): the capacity/pricing model event_volume_trend's univariate
    slope can't fit. Emits betas (milli units, 4 dp) and R² in basis
    points.

    Float discipline: all ten moments are EXACT int64 (Σx₁y ≤
    23·10⁶·|rows| keeps sf1000 under 2⁶³ per type-day… the binding
    term Σy² ≈ |rows|·10¹² caps |rows| at ~9·10⁶ per type before the
    moment itself needs splitting — documented); every double enters
    by an exact BIGINT→DOUBLE cast (< 2⁵³) and the Cramer determinants
    are ONE fixed-parenthesization expression evaluated identically in
    both engines on the types-bounded 1-row-per-type relation — IEEE
    multiply/divide are exactly rounded, so the results are
    bit-identical and hash-exact.

    Scale shape: one codegen scan → types-bounded moment aggregate
    (map-side combined); the solve runs on |types| rows."""
    f = _events(spark, sf_dir).select(
        "event_type",
        F.hour("ts").cast("bigint").alias("x1"),
        F.dayofweek("ts").cast("bigint").alias("x2"),
        F.floor(F.col("value") * 1000.0 + 0.5).cast("bigint").alias("y"),
    )
    m = f.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum("x2").cast("bigint").alias("s2"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("s12"),
        F.sum(F.col("x1") * F.col("y")).cast("bigint").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("bigint").alias("s2y"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )

    def D(c):
        return f"CAST({c} AS DOUBLE)"

    det = (
        f"({D('n')} * (({D('s11')} * {D('s22')}) - ({D('s12')} * {D('s12')}))"
        f" - {D('s1')} * (({D('s1')} * {D('s22')}) - ({D('s12')} * {D('s2')}))"
        f" + {D('s2')} * (({D('s1')} * {D('s12')}) - ({D('s11')} * {D('s2')})))"
    )
    det0 = (
        f"({D('sy')} * (({D('s11')} * {D('s22')}) - ({D('s12')} * {D('s12')}))"
        f" - {D('s1')} * (({D('s1y')} * {D('s22')}) - ({D('s12')} * {D('s2y')}))"
        f" + {D('s2')} * (({D('s1y')} * {D('s12')}) - ({D('s11')} * {D('s2y')})))"
    )
    det1 = (
        f"({D('n')} * (({D('s1y')} * {D('s22')}) - ({D('s12')} * {D('s2y')}))"
        f" - {D('sy')} * (({D('s1')} * {D('s22')}) - ({D('s12')} * {D('s2')}))"
        f" + {D('s2')} * (({D('s1')} * {D('s2y')}) - ({D('s1y')} * {D('s2')})))"
    )
    det2 = (
        f"({D('n')} * (({D('s11')} * {D('s2y')}) - ({D('s1y')} * {D('s12')}))"
        f" - {D('s1')} * (({D('s1')} * {D('s2y')}) - ({D('s1y')} * {D('s2')}))"
        f" + {D('sy')} * (({D('s1')} * {D('s12')}) - ({D('s11')} * {D('s2')})))"
    )
    return m.selectExpr(
        "event_type",
        "n AS n_events",
        f"round({det0} / {det}, 4) AS beta0_milli",
        f"round({det1} / {det}, 4) AS beta1_milli",
        f"round({det2} / {det}, 4) AS beta2_milli",
        f"CAST(floor(10000.0"
        f" * ((({det0} / {det}) * {D('sy')} + ({det1} / {det}) * {D('s1y')}"
        f"     + ({det2} / {det}) * {D('s2y')})"
        f"    - ({D('sy')} * {D('sy')}) / {D('n')})"
        f" / nullif({D('syy')} - ({D('sy')} * {D('sy')}) / {D('n')}, 0.0D))"
        f" AS BIGINT) AS r2_bp",
    ).orderBy("event_type")
