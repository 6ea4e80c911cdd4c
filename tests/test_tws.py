from __future__ import annotations

import uuid

import pytest

from tests.test_api_stream import BASE, _run, _stream_df, _write_batches
from wally_spark.streaming.tws import (
    PROTOBUF_AVAILABLE,
    ROCKSDB_PROVIDER,
    inactivity_sessions,
)


@pytest.mark.skipif(
    not PROTOBUF_AVAILABLE,
    reason="transformWithState needs google.protobuf (no runtime found)",
)
def test_inactivity_sessions_tws(spark, tmp_path):
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        path = _write_batches(
            spark,
            str(tmp_path),
            [
                # session A: 01,05 for user a
                [(BASE + "01", "a", 1), (BASE + "05", "a", 2)],
                # 40s later: a's inactivity timer (gap 10s) fires once the
                # watermark passes 05+10; b opens a session
                [(BASE + "45", "b", 7)],
                # the batch watermark is derived from the PREVIOUS batch's
                # max event time, so b's 55s timer needs one more batch
                # after the 02:30 event to fire
                [("2024-01-01 00:02:30", "b", 1)],
                [("2024-01-01 00:03:30", "c", 1)],
            ],
        )
        sdf = _stream_df(spark, path).withWatermark("ts", "1 second")
        out_df = inactivity_sessions(sdf, gap_s=10)
        name = f"t_{uuid.uuid4().hex[:8]}"
        out = _run(
            out_df.writeStream.format("memory").queryName(name).outputMode("append"),
            spark,
            name,
        )
        got = {
            (r["user_id"], r["session_start_s"] % 3600, r["n_events"], r["total"])
            for r in out.collect()
        }
        # a's session closed by inactivity timer; b's first session closed
        # by the 02:30 event advancing the watermark past 45+10
        assert ("a", 1, 2, 3.0) in got
        assert ("b", 45, 1, 7.0) in got
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


@pytest.mark.skipif(
    not PROTOBUF_AVAILABLE,
    reason="transformWithState needs google.protobuf (no runtime found)",
)
def test_inactivity_sessions_match_batch_win_session(spark, tmp_path):
    """Timer-closed streaming sessions == the batch gaps-and-islands
    sessions (win_session, 600 s gap): every emitted streaming session
    appears in the batch result, and every session that provably closed
    (a successor event exists for that user) was emitted."""
    from tests.conftest import SF_SMALL
    from tests.test_stream_twins import _ordered_stream, _run_append
    from wally_spark.plans import REGISTRY

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        sdf, _ = _ordered_stream(spark, tmp_path)
        out = _run_append(
            inactivity_sessions(
                sdf.withWatermark("ts", "1 second"), gap_s=600, key_type="bigint"
            ),
            spark,
        )
        stream = {
            (r.user_id, r.session_start_s, r.n_events, round(r.total, 2))
            for r in out.collect()
        }
        batch_df = REGISTRY["win_session"].spark_fn(spark, SF_SMALL)
        batch_rows = [
            (r.user_id, r.session_start, r.n_events, float(r.sum_value))
            for r in batch_df.collect()
        ]
        batch = set(batch_rows)
        assert stream <= batch, f"streaming-only sessions: {sorted(stream - batch)[:5]}"
        # all but each user's LAST session close via successor events and
        # must have been emitted regardless of timer/watermark timing
        last_per_user = {}
        for u, start, n, tot in batch_rows:
            if u not in last_per_user or start > last_per_user[u][1]:
                last_per_user[u] = (u, start, n, tot)
        must_emit = batch - {
            (u, s, n, t) for (u, s, n, t) in last_per_user.values()
        }
        missing = must_emit - stream
        assert not missing, f"closed sessions not emitted: {sorted(missing)[:5]}"
        assert must_emit, "no multi-session users — assertion would be vacuous"
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
