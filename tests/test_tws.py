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
