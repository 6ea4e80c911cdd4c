"""Connector wire-format codec, as column expressions.

The reference frames messages as
``>I total_len | q event_time_ms | I key_len | key | payload``
(machida/lib/wallaroo/__init__.py:432-454, ConnectorEncoder). Here the
same frame is built/parsed with built-in binary functions so encode /
decode stay JVM-side — used when bridging to byte-oriented transports
(socket/kafka raw mode)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _be(col, n_bytes: int):
    """big-endian fixed-width binary from a non-negative long column."""
    return F.to_binary(F.lpad(F.hex(col.cast("long")), n_bytes * 2, "0"), F.lit("hex"))


def _unbe(col, pos: int, n_bytes: int):
    """long from big-endian bytes at 1-based pos."""
    return F.conv(F.hex(F.substring(col, pos, n_bytes)), 16, 10).cast("long")


def encode_frame(event_time_ms, key, payload):
    """binary frame from (long, string, binary) columns."""
    key_b = key.cast("binary")
    klen = F.length(key_b)
    total = F.length(payload) + klen + F.lit(12)
    return F.concat(_be(total, 4), _be(event_time_ms, 8), _be(klen, 4), key_b, payload)


def decode_frame(frame):
    """struct(event_time_ms long, key string, payload binary) from a
    frame column (pass F.col(...))."""
    # layout (1-based): [1-4 total][5-12 event_time][13-16 klen][key][payload]
    klen = _unbe(frame, 13, 4)
    payload_len = F.length(frame) - klen - 16
    return F.struct(
        _unbe(frame, 5, 8).alias("event_time_ms"),
        F.substring(frame, F.lit(17), klen).cast("string").alias("key"),
        F.substring(frame, klen + 17, payload_len).alias("payload"),
    )
