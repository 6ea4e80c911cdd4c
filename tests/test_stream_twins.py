"""Streaming twins of the stateful §2.4 registry queries, asserted
equivalent to their batch answers (win_count, topk_per_key,
interarrival_stats). The reference is streaming-first — parity means
both modes produce the same result.

Delivery-order note: the order-sensitive twins (count windows,
interarrival) assume per-key in-order arrival, the same guarantee the
reference's key_by routing gives a state_computation; the source here
writes the events table as time-ordered files (global sort split into
sequential micro-batches, mtime-ordered)."""

from __future__ import annotations

import os
import uuid

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL
from wally_spark.streaming.ops import (
    count_windows_stream,
    interarrival_stream,
    topk_stream,
)
from wally_spark.tables import load_tables

N_FILES = 4


def _ordered_stream(spark, tmp_path):
    """events as a bounded file stream: globally (ts, event_id)-sorted,
    split into N_FILES sequential micro-batch files."""
    ev = (
        load_tables(spark, SF_SMALL)["events"]
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    pdf = ev.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    src = os.path.join(str(tmp_path), "events_ordered")
    os.makedirs(src, exist_ok=True)
    step = (len(pdf) + N_FILES - 1) // N_FILES
    for i in range(N_FILES):
        chunk = spark.createDataFrame(pdf.iloc[i * step : (i + 1) * step], ev.schema)
        stage = os.path.join(str(tmp_path), f"_stage{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"batch_{i:03d}.parquet")
        os.rename(os.path.join(stage, part), dst)
        os.utime(dst, (1_000_000 + i * 100, 1_000_000 + i * 100))
    return (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        ev,
    )


def _run_append(df, spark):
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}")


def _latest_per_key(df, key):
    from pyspark.sql import Window

    w = Window.partitionBy(key)
    return (
        df.withColumn("__mx", F.max("ver").over(w))
        .where(F.col("ver") == F.col("__mx"))
        .drop("ver", "__mx")
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_count_windows_stream_equivalence(spark, tmp_path):
    sdf, _ = _ordered_stream(spark, tmp_path)
    out = _run_append(count_windows_stream(sdf, n=20), spark)
    stream_rows = out.select(
        "user_id", "win_id", F.round("sum_value", 2).alias("sum_value"), "n_events"
    )
    from wally_spark.plans import REGISTRY

    batch_rows = REGISTRY["win_count"].spark_fn(spark, SF_SMALL)
    assert _rows(stream_rows) == _rows(batch_rows)


def test_topk_stream_equivalence(spark, tmp_path):
    sdf, _ = _ordered_stream(spark, tmp_path)
    out = _run_append(topk_stream(sdf, k=3), spark)
    stream_rows = _latest_per_key(out, "event_type").select(
        "event_type", "event_id", F.round("value", 2).alias("value")
    )
    from wally_spark.plans import REGISTRY

    batch_rows = REGISTRY["topk_per_key"].spark_fn(spark, SF_SMALL)
    assert _rows(stream_rows) == _rows(batch_rows)


def test_interarrival_stream_equivalence(spark, tmp_path):
    sdf, _ = _ordered_stream(spark, tmp_path)
    out = _run_append(interarrival_stream(sdf), spark)
    stream_rows = _latest_per_key(out, "user_id").select(
        "user_id",
        "n_gaps",
        F.round("total_gap_s", 1).alias("total_gap_s"),
        F.round("min_gap_s", 1).alias("min_gap_s"),
        F.round("max_gap_s", 1).alias("max_gap_s"),
    )
    from wally_spark.plans import REGISTRY

    batch_rows = REGISTRY["interarrival_stats"].spark_fn(spark, SF_SMALL)
    assert _rows(stream_rows) == _rows(batch_rows)


def _run_complete(df, spark):
    import uuid as _uuid

    name = f"t_{_uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}")


def test_running_total_stream_equivalence(spark, tmp_path):
    from wally_spark.plans import REGISTRY
    from wally_spark.streaming.ops import running_total_stream

    sdf, _ = _ordered_stream(spark, tmp_path)
    out = _run_append(running_total_stream(sdf, threshold=2000.0), spark)
    stream_rows = out.select(
        "user_id", "event_id", "ts_epoch",
        F.round("running_value", 2).alias("running_value"),
    )
    batch_rows = REGISTRY["running_total"].spark_fn(spark, SF_SMALL)
    assert _rows(stream_rows) == _rows(batch_rows)


def test_sliding_windows_stream_equivalence(spark, tmp_path):
    """Append + watermark (the bounded-state default): every emitted
    window matches the batch result exactly, and every window the
    watermark provably closed before the final micro-batch was
    emitted."""
    from wally_spark.plans import REGISTRY
    from wally_spark.streaming.ops import sliding_windows_stream

    sdf, ev = _ordered_stream(spark, tmp_path)
    out = _run_append(sliding_windows_stream(sdf, watermark="1 second"), spark)
    batch_rows = REGISTRY["win_sliding"].spark_fn(spark, SF_SMALL)
    stream, batch = _rows(out), _rows(batch_rows)
    assert set(stream) <= set(batch)
    # windows closed by the watermark as of the LAST batch's start
    # (emission uses the watermark advanced by the previous batch)
    pdf = ev.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    step = (len(pdf) + N_FILES - 1) // N_FILES
    wm = pdf.iloc[: (N_FILES - 1) * step]["ts"].max().timestamp() - 1.0
    must_emit = [r for r in batch if r[0] + 3600 <= wm]
    assert set(must_emit) <= set(stream)
    assert must_emit, "no closed windows — assertion would be vacuous"


def test_ohlc_stream_equivalence(spark, tmp_path):
    """Streaming OHLC bars equal the batch events_ohlc lane: every
    emitted bar matches the batch bar exactly (min_by/max_by state
    merges are order-independent), and every hour the watermark closed
    before the last micro-batch was emitted."""
    from wally_spark.plans import REGISTRY
    from wally_spark.streaming.ops import ohlc_stream

    sdf, ev = _ordered_stream(spark, tmp_path)
    out = _run_append(ohlc_stream(sdf, watermark="1 second"), spark)
    batch_rows = REGISTRY["events_ohlc"].spark_fn(spark, SF_SMALL).select(
        "event_type", "hour_epoch", "open_v", "high_v", "low_v",
        "close_v", "n_events", "vol_milli",
    )
    out = out.select(*batch_rows.columns)
    stream, batch = _rows(out), _rows(batch_rows)
    assert set(stream) <= set(batch)
    pdf = ev.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    step = (len(pdf) + N_FILES - 1) // N_FILES
    wm = pdf.iloc[: (N_FILES - 1) * step]["ts"].max().timestamp() - 1.0
    must_emit = [r for r in batch if r[1] + 3600 <= wm]
    assert set(must_emit) <= set(stream)
    assert must_emit, "no closed bars — assertion would be vacuous"


def test_session_windows_stream_equivalence(spark, tmp_path):
    """F.session_window over micro-batches merges to exactly the batch
    gaps-and-islands sessions (session_idx excluded: a merge-order
    artifact the batch numbering has and streaming doesn't)."""
    from wally_spark.plans import REGISTRY
    from wally_spark.streaming.ops import session_windows_stream

    sdf, _ = _ordered_stream(spark, tmp_path)
    out = _run_complete(session_windows_stream(sdf), spark)
    batch_rows = REGISTRY["win_session"].spark_fn(spark, SF_SMALL).select(
        "user_id", "session_start", "n_events", "sum_value"
    )
    assert _rows(out) == _rows(batch_rows)


def test_sessionize_stats_stream_equivalence(spark, tmp_path):
    """The event_sessionize_stats rollup over STREAMED sessions: the
    per-user totals computed from session_windows_stream's output match
    the registered batch query — the session detection runs streaming,
    the rollup is the downstream consumer's batch over the sink."""
    from wally_spark.plans import REGISTRY
    from wally_spark.streaming.ops import session_windows_stream

    sdf, ev = _ordered_stream(spark, tmp_path)
    sess = _run_complete(
        sdf.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.max("ts").cast("double") - F.min("ts").cast("double")
            ).alias("dur"),
        ),
        spark,
    )
    stream_rows = sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("total_events"),
        F.round(F.sum("dur"), 1).alias("total_duration_s"),
    )
    batch_rows = REGISTRY["event_sessionize_stats"].spark_fn(spark, SF_SMALL)
    assert _rows(stream_rows) == _rows(batch_rows)


def test_ann_probe_stream_equivalence(spark, tmp_path):
    """The streaming similarity service (persistent index probed per
    micro-batch of queries) returns exactly the batch probe's ranked
    neighbors, independent of how the query stream is batched."""
    import os

    from wally_spark.operators.ann_index import build_ann_index, query_ann_index
    from wally_spark.streaming.ops import ann_probe_foreach_batch
    from wally_spark.tables import load_tables

    emb = load_tables(spark, SF_SMALL)["embeddings"]
    table = "ann_idx_stream_twin"
    build_ann_index(spark, emb, table, n_buckets=16)

    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    src = os.path.join(str(tmp_path), "qstream")
    # 3 files -> 3 micro-batches of queries
    q.repartition(3).write.mode("overwrite").parquet(src)
    out = os.path.join(str(tmp_path), "probe_out")
    sq = (
        spark.readStream.schema(q.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(ann_probe_foreach_batch(spark, table, out))
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(180)

    got = _rows(spark.read.parquet(out).drop("batch_id"))
    want = _rows(query_ann_index(spark, table, q))
    assert got == want and len(got) == 50


def test_range_join_stream_equivalence(spark, tmp_path):
    """The batch range join (views in the 30 min before each purchase)
    re-expressed as a watermarked stream-stream interval join over the
    SAME events produces identical per-purchase aggregates — the
    streaming face of `range_join_views_before_purchase` (inner-match
    purchases; the batch query's unmatched LEFT rows are a bounded
    batch-side backfill, so the equivalence compares matched rows)."""
    from wally_spark.plans import REGISTRY
    from wally_spark.streaming.ops import stream_stream_join

    sdf, _ = _ordered_stream(spark, tmp_path)
    p = sdf.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    sdf2, _ = _ordered_stream(spark, f"{tmp_path}/v")
    v = sdf2.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("value").alias("v_value"),
        F.col("event_id").alias("v_id"),
    )
    joined = stream_stream_join(
        p,
        v,
        on=F.col("v_user") == F.col("p_user"),
        left_ts="p_ts",
        right_ts="v_ts",
        watermark="1 hour",
        condition=(
            (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("v_ts") < F.col("p_ts"))
        ),
    )
    out = _run_append(joined, spark)
    stream_rows = out.groupBy("purchase_id").agg(
        F.count("v_id").alias("n_recent_views"),
        F.round(F.sum("v_value"), 2).alias("recent_view_value"),
    )
    batch_rows = (
        REGISTRY["range_join_views_before_purchase"]
        .spark_fn(spark, SF_SMALL)
        .where(F.col("n_recent_views") > 0)
    )
    assert _rows(stream_rows) == _rows(batch_rows)


def test_hourly_dedup_stream_equivalence(spark, tmp_path):
    """Chained stateful aggregation (windowed dedup -> rollup) in
    append mode matches the batch events_dedup_hourly on every window
    the watermark closed (all of them: availableNow drains the stream,
    and the final watermark passes the last event)."""
    from wally_spark.streaming.ops import hourly_dedup_stream

    sdf, _ = _ordered_stream(spark, tmp_path)
    out = _run_append(hourly_dedup_stream(sdf), spark)
    from wally_spark.plans import REGISTRY

    batch = REGISTRY["events_dedup_hourly"].spark_fn(spark, SF_SMALL)
    # the final watermark cannot pass the maximum event time, so the
    # last open window never closes in the stream — compare on the
    # closed set and assert it is the whole batch answer minus at most
    # the final hour per type.
    stream_rows = _rows(out)
    batch_rows = _rows(batch)
    assert stream_rows, "no windows closed"
    missing = [r for r in batch_rows if r not in stream_rows]
    max_hour = max(r[0] for r in batch_rows)
    assert all(r[0] == max_hour for r in missing), missing
    assert [r for r in stream_rows if r not in batch_rows] == []


def test_transitions_stream_equivalence(spark, tmp_path):
    """The streaming previous-event state lane folds to exactly the
    batch event_transitions matrix: same (src, dst) counts and ppm
    probabilities over the same events."""
    from pyspark.sql import Window

    from wally_spark.plans import REGISTRY
    from wally_spark.streaming.ops import transitions_stream

    sdf, _ = _ordered_stream(spark, tmp_path)
    out = _run_append(transitions_stream(sdf), spark)
    pairs = out.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wsrc = Window.partitionBy("src")
    stream_rows = pairs.select(
        "src", "dst", "n",
        F.floor((F.lit(1000000) * F.col("n")) / F.sum("n").over(wsrc))
        .cast("bigint")
        .alias("prob_ppm"),
    )
    batch_rows = REGISTRY["event_transitions"].spark_fn(spark, SF_SMALL)
    assert _rows(stream_rows) == _rows(batch_rows)


def test_cusum_alarm_stream_matches_sequential_reference(spark, tmp_path):
    """The online Page-CUSUM alarm lane must reproduce an independent
    sequential Python implementation bit-for-bit over the same events
    (exact integer milli arithmetic), with state carried across
    micro-batches — including alarms whose run spans a batch
    boundary."""
    import math

    from wally_spark.streaming.ops import cusum_alarm_stream

    MU, KAPPA, H = 50_000, 5_000, 200_000
    sdf, ev = _ordered_stream(spark, tmp_path)
    out = _run_append(cusum_alarm_stream(sdf, MU, KAPPA, H), spark)
    got = sorted(
        (r["event_type"], r["ts"], r["t"], r["side"], r["s_milli"])
        for r in out.collect()
    )

    # independent reference: plain Python over the same global order
    pdf = (
        ev.toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    state = {}
    want = []
    for _, row in pdf.iterrows():
        et = row["event_type"]
        s_pos, s_neg, t = state.get(et, (0, 0, 0))
        x = int(math.floor(1000 * row["value"]))
        t += 1
        s_pos = max(0, s_pos + (x - MU - KAPPA))
        s_neg = max(0, s_neg + (MU - x - KAPPA))
        if s_pos > H:
            want.append((et, row["ts"], t, "up", s_pos))
            s_pos, s_neg = 0, 0
        elif s_neg > H:
            want.append((et, row["ts"], t, "down", s_neg))
            s_pos, s_neg = 0, 0
        state[et] = (s_pos, s_neg, t)
    want = sorted(want)
    assert got == want
    assert got, "fixture produced no alarms — tune MU/KAPPA/H"
    # alarms must span multiple micro-batches (state actually carried)
    ts_sorted = pdf["ts"].tolist()
    step = (len(pdf) + N_FILES - 1) // N_FILES
    first_batch_max = ts_sorted[step - 1]
    assert any(a[1] > first_batch_max for a in got), "all alarms in batch 0"


def test_attribution_stream_equivalence(spark, tmp_path):
    """The streaming last-touch state lane folds to exactly the batch
    attribution_last_touch report: same per-channel purchase counts,
    cent-exact revenue, and share bp over the same events — with
    last-touch state carried across micro-batch boundaries."""
    from pyspark.sql import Window

    from wally_spark.plans import REGISTRY
    from wally_spark.streaming.ops import attribution_stream

    sdf, _ = _ordered_stream(spark, tmp_path)
    out = _run_append(attribution_stream(sdf), spark)
    per_channel = out.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )
    w = Window.partitionBy()
    stream_rows = per_channel.select(
        "channel", "n_purchases", "revenue_cents",
        F.floor(
            (10000 * F.col("revenue_cents")) / F.sum("revenue_cents").over(w)
        )
        .cast("bigint")
        .alias("revenue_share_bp"),
    )
    batch_rows = REGISTRY["attribution_last_touch"].spark_fn(spark, SF_SMALL)
    assert _rows(stream_rows) == _rows(batch_rows)


def test_markov_stationary_incremental_matches_batch(spark, tmp_path):
    """transitions_stream → markov_foreach_batch count corpus: the
    per-batch republished stationary distribution equals the batch
    events_markov_stationary lane over the same events (shared
    stationary_from_transitions tail; per-user previous-event state
    makes the counts associative across micro-batches), and an
    at-least-once replay of the final increment leaves it unchanged."""
    from wally_spark.plans import REGISTRY
    from wally_spark.streaming.ops import markov_foreach_batch, transitions_stream

    sdf, _ = _ordered_stream(spark, tmp_path)
    counts, out = f"{tmp_path}/counts", f"{tmp_path}/pi"
    q = (
        transitions_stream(sdf)
        .writeStream.foreachBatch(markov_foreach_batch(spark, counts, out))
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(
        map(
            tuple,
            REGISTRY["events_markov_stationary"].spark_fn(spark, SF_SMALL).collect(),
        )
    )
    assert got == want

    # at-least-once replay: re-run the last batch's increments through
    # the same proc — identical dir rewritten, distribution unchanged
    import glob

    last_dir = sorted(glob.glob(f"{counts}/b*"))[-1]
    last_id = int(last_dir.rsplit("b", 1)[-1])
    # counts dir holds (src, dst, n); rebuild row-per-transition input
    rows = spark.read.parquet(last_dir).collect()
    data = [
        (r.src, r.dst) for r in rows for _ in range(r.n)
    ]
    replay_df = spark.createDataFrame(data, "src string, dst string")
    markov_foreach_batch(spark, counts, out)(replay_df, last_id)
    got2 = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got2 == want


def test_conversion_lag_stream_matches_batch(spark, tmp_path):
    """The per-user open-session state lane folds to exactly the batch
    session_conversion_lag histogram: same lag_min multiset, same
    share/cum-share bp over the same events — including sessions whose
    first purchase arrives in a later micro-batch than their start."""
    from pyspark.sql import Window

    from wally_spark.plans import REGISTRY
    from wally_spark.streaming.ops import conversion_lag_stream

    sdf, _ = _ordered_stream(spark, tmp_path)
    out = _run_append(conversion_lag_stream(sdf), spark)
    h = out.groupBy("lag_min").agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
    t = h.agg(F.sum("n_sessions").alias("total"))
    stream_rows = (
        h.crossJoin(F.broadcast(t))
        .selectExpr(
            "lag_min", "n_sessions",
            "CAST((10000 * n_sessions) div total AS BIGINT) AS share_bp",
            "CAST((10000 * sum(n_sessions) OVER (ORDER BY lag_min"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"
            " div total AS BIGINT) AS cum_share_bp",
        )
    )
    batch_rows = REGISTRY["session_conversion_lag"].spark_fn(spark, SF_SMALL)
    assert _rows(stream_rows) == _rows(batch_rows)


def test_session_entry_exit_stream_equivalence(spark, tmp_path):
    """The per-user open-session entry/exit state lane folds to exactly
    the batch session_entry_exit matrix: every 10-minute-gap session is
    emitted once (gap-close inside batches, EventTimeTimeout for idle
    tails), and the (entry_type, exit_type) rollup of the emitted rows
    matches the batch lane's counts, event mass, bounces, and
    bounce_bp. A far-future sentinel event (filtered from the compare)
    advances the watermark so tail sessions close via timeout."""
    import datetime
    import os

    from wally_spark.plans import REGISTRY
    from wally_spark.streaming.ops import session_entry_exit_stream

    sdf, ev = _ordered_stream(spark, tmp_path)
    # sentinel flush file, mtime-ordered after every real batch
    mx = ev.agg(F.max("ts")).collect()[0][0]
    flush = spark.createDataFrame(
        [(10**9, mx + datetime.timedelta(days=2), -1, "view", 0.0)],
        ev.schema,
    )
    stage = os.path.join(str(tmp_path), "_stage_flush")
    flush.coalesce(1).write.mode("overwrite").parquet(stage)
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
    src = os.path.join(str(tmp_path), "events_ordered")
    dst = os.path.join(src, "batch_zzz_flush.parquet")
    os.rename(os.path.join(stage, part), dst)
    os.utime(dst, (1_000_000 + 9_999, 1_000_000 + 9_999))

    out = _run_append(
        session_entry_exit_stream(sdf.withWatermark("ts", "1 second")), spark
    )
    sess = out.where(F.col("user_id") != -1)
    stream_rows = sess.groupBy("entry_type", "exit_type").agg(
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
    batch_rows = REGISTRY["session_entry_exit"].spark_fn(spark, SF_SMALL)
    assert _rows(stream_rows) == _rows(batch_rows)

    # replay a batch file's worth of duplicate input: append-mode state
    # emission already happened; a fresh run over the SAME corpus gives
    # the same matrix (determinism of the gap/timeout close rule)
    out2 = _run_append(
        session_entry_exit_stream(sdf.withWatermark("ts", "1 second")), spark
    )
    assert _rows(out2.where(F.col("user_id") != -1)) == _rows(sess)


def test_funnel_stage_stream_equivalence(spark, tmp_path):
    """The per-user funnel state machine (view -> later click ->
    later purchase, every step within the horizon of the first view —
    the reference's literal state_computation shape) folds to exactly
    the batch events_window_funnel histogram: latest-ver stage per
    user, counted over the 0..3 spine."""
    from wally_spark.plans import REGISTRY
    from wally_spark.plans.sequence import FUNNEL_HORIZON_S
    from wally_spark.streaming.ops import funnel_stage_stream

    sdf, _ = _ordered_stream(spark, tmp_path)
    out = _run_append(funnel_stage_stream(sdf, FUNNEL_HORIZON_S), spark)
    final = _latest_per_key(out, "user_id")
    spine = spark.range(4).select(F.col("id").cast("bigint").alias("stage"))
    counts = final.groupBy("stage").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    stream_rows = spine.join(counts, "stage", "left").select(
        "stage", F.coalesce("n_users", F.lit(0)).cast("bigint").alias("n_users")
    )
    batch_rows = REGISTRY["events_window_funnel"].spark_fn(spark, SF_SMALL)
    assert _rows(stream_rows) == _rows(batch_rows)
