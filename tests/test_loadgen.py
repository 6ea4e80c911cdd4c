"""CI-budget soak of the giles-style load generator (tools/loadgen.py)
against the native ALO listener: a pipelined credit-governed sender
must land every record exactly once at a sane rate. The full
measurement matrix (spool/spark/e2e modes) runs out-of-band and is
recorded in TUNING.md; this test pins the protocol-level contract so
sender or server regressions surface in CI."""

import sys
import threading

sys.path.insert(0, "tools")


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_pipelined_sender_soak_no_loss_no_dup():
    from loadgen import PipelinedALOSender

    from wally_spark.sources.native import _ALOListener

    port = _free_port()
    lst = _ALOListener("127.0.0.1", port, "soak", 4, initial_credits=256)
    try:
        sender = PipelinedALOSender(
            port, "soak", records=20_000, size=64, streams=2
        )
        stats = sender.run()
        assert stats["sent"] == 20_000
        # exactly once into the landing buffer: per-stream mids dense
        assert set(lst.buf) == {1, 2}
        for sid in (1, 2):
            mids = sorted(lst.buf[sid])
            assert mids == list(range(10_000)), (sid, len(mids))
        # every landed row carries the wire event_time (sender stamps
        # send-time ns) — the r13 full-frame landing
        some = lst.buf[1][17]
        assert some[2] > 1_000_000_000  # event_time = real time_ns
        # soak floor: far below any measured run (TUNING.md records
        # ~9.5k msgs/s in-process); catches order-of-magnitude breaks
        assert stats["send_msgs_per_s"] > 1_000, stats
        assert stats["ack_p99_ms"] < 5_000, stats
    finally:
        lst.stop()


def test_pipelined_sender_respects_small_credit_window():
    """The r13 coalesce-flush fix: with a credit window SMALLER than
    the sender's coalesce buffer the run must still complete (the
    original draft deadlocked holding unsent frames while blocking on
    credits)."""
    from loadgen import PipelinedALOSender

    from wally_spark.sources.native import _ALOListener

    port = _free_port()
    lst = _ALOListener("127.0.0.1", port, "soak", 4, initial_credits=8)
    try:
        stats = PipelinedALOSender(
            port, "soak", records=2_000, size=32, coalesce=64
        ).run()
        assert stats["sent"] == 2_000
        assert sorted(lst.buf[1]) == list(range(2_000))
    finally:
        lst.stop()
