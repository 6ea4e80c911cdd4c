"""Native PySpark streaming DataSource for the ALO connector family.

The relay-family sources (UDP/Kinesis/RabbitMQ/Redis/ALO) reach Spark
via a disk spool (``SpoolRelay`` -> file stream source). PySpark 4.1
ships the Python streaming DataSource API
(``pyspark.sql.datasource.DataSource`` + ``SimpleDataSourceStreamReader``),
which removes the disk round-trip and the relay thread while keeping
exactly-once offsets: this module registers ``wally_alo``, so

    spark.dataSource.register(WallyALODataSource)
    df = (spark.readStream.format("wally_alo")
          .option("port", 7100).option("cookie", "...").load())

consumes the at-least-once connector wire protocol (reference
connectors.py / connector_wire_messages.py — see sources/alo.py for
the clean-room frame codec) directly into a streaming DataFrame with
schema (stream_id, message_id, event_time, key, value).

Offset model (the exactly-once contract):

- The reader owns an ``ALOIngestServer`` listener; accepted Messages
  land in an in-memory per-stream buffer keyed by (stream_id,
  message_id) — landing dedupes replays.
- Spark offsets are per-stream next-expected positions
  ``{str(stream_id): por}`` — exactly the protocol's point-of-ref
  convention (last accepted offset + 1).
- ``read(start)`` drains the buffer frontier; ``readBetweenOffsets``
  re-serves the RETAINED (uncommitted) slice deterministically.
- ``commit(end)`` prunes the buffer below ``end`` and publishes the
  committed positions as the server's resume state: a client that
  reconnects after a reader crash gets NotifyAck(por=committed) and
  replays everything Spark hasn't committed — the protocol's
  at-least-once replay is what makes the in-memory buffer safe, and
  Spark's checkpointed offsets turn it into exactly-once downstream.

SimpleDataSourceStreamReader runs in the query's long-lived driver-side
Python process — the documented fit for control-rate sources. The
spool path (sources/relay.py) stays as the fallback for high-rate
feeds where the listener must scale out separately from the driver.

Lifecycle note: Spark instantiates the Python DataSource (and so the
reader) more than once — at plan resolution, in the driver-side
streaming runner, and in EXECUTOR workers (each planned partition calls
``readBetweenOffsets``) — so (a) the listening socket opens LAZILY on
the first offset call, never in ``__init__``; (b) listeners are shared
through a per-process registry keyed by (host, port); and (c) each
``read()`` journals its batch slice into a tiny WAL of IN-FLIGHT
batches (``wal`` option; pruned at ``commit``), which is what executor
workers and post-restart replays read — the same role the offset/commit
log plays for Spark's own file source. On a multi-node cluster point
``wal`` at shared storage, exactly like a checkpointLocation.
"""

from __future__ import annotations

import base64
import json
import os
import socket
import tempfile
import threading

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)

__all__ = ["WallyALODataSource", "ALOStreamReader", "register_native"]

_SCHEMA = (
    "stream_id bigint, message_id bigint, event_time bigint,"
    " key binary, value binary"
)


class _ALOListener:
    """One ALO listening socket + in-memory landing buffer + committed
    positions; shared by every reader instance in this process that
    names the same (host, port)."""

    def __init__(self, host: str, port: int, cookie: str, ack_every: int):
        from wally_spark.sources.alo import ALOIngestServer

        self.lock = threading.Lock()
        # buf[sid] = {mid: (sid, mid, event_time, key, value)}
        self.buf: dict[int, dict[int, tuple]] = {}
        self.committed: dict[int, int] = {}
        self.server = ALOIngestServer(
            cookie=cookie, land=self._land, ack_every=ack_every
        )
        self._lsock = socket.socket()
        self._lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._lsock.bind((host, port))
        self._lsock.listen(8)
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._accept_loop, daemon=True
        )
        self._thread.start()

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._lsock.accept()
            except OSError:
                return
            threading.Thread(
                target=self._serve_one, args=(conn,), daemon=True
            ).start()

    def _serve_one(self, conn: socket.socket) -> None:
        # a reconnecting client must replay from the COMMITTED offset
        # (Spark may not have committed everything a previous session
        # landed), so resume state rewinds to committed before Notify
        # is answered; the buffer dedupes re-pushed uncommitted rows
        # by (stream_id, message_id)
        with self.lock:
            self.server.acked.clear()
            self.server.acked.update(self.committed)
        try:
            self.server.serve_connection(conn)
        except OSError:
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _land(self, sid: int, mid: int, payload: bytes | None) -> None:
        with self.lock:
            self.buf.setdefault(sid, {})[mid] = (
                sid,
                mid,
                0,
                None,
                payload or b"",
            )

    def stop(self) -> None:
        self._stop.set()
        try:
            self._lsock.close()
        except OSError:
            pass


_LISTENERS: dict[tuple, _ALOListener] = {}
_REGISTRY_LOCK = threading.Lock()


def _get_listener(host: str, port: int, cookie: str, ack_every: int):
    with _REGISTRY_LOCK:
        key = (host, port)
        lst = _LISTENERS.get(key)
        if lst is None:
            lst = _ALOListener(host, port, cookie, ack_every)
            _LISTENERS[key] = lst
        return lst


def _wal_key(start: dict, end: dict) -> str:
    import hashlib

    blob = json.dumps([start, end], sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:24]


class ALOStreamReader(SimpleDataSourceStreamReader):
    """Driver-side ALO listener + offset bookkeeping (see module doc)."""

    def __init__(self, options: dict):
        self._host = options.get("host", "127.0.0.1")
        self._port = int(options.get("port", "7100"))
        self._cookie = options.get("cookie", "")
        self._ack_every = int(options.get("ack_every", "4"))
        self._wal = options.get(
            "wal",
            os.path.join(
                tempfile.gettempdir(), f"wally_alo_wal_{self._port}"
            ),
        )
        self._listener: _ALOListener | None = None

    def _lst(self) -> _ALOListener:
        if self._listener is None:
            self._listener = _get_listener(
                self._host, self._port, self._cookie, self._ack_every
            )
        return self._listener

    # -- WAL of in-flight batches (executor + restart replay path) ----------
    def _wal_write(self, start: dict, end: dict, rows: list) -> None:
        os.makedirs(self._wal, exist_ok=True)
        entry = {
            "start": start,
            "end": end,
            "rows": [
                [
                    sid,
                    mid,
                    et,
                    base64.b64encode(key).decode() if key else None,
                    base64.b64encode(val or b"").decode(),
                ]
                for sid, mid, et, key, val in rows
            ],
        }
        path = os.path.join(self._wal, _wal_key(start, end))
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f)
        os.replace(tmp, path)  # atomic publish

    def _wal_read(self, start: dict, end: dict) -> list | None:
        path = os.path.join(self._wal, _wal_key(start, end))
        if not os.path.exists(path):
            return None
        with open(path) as f:
            entry = json.load(f)
        return [
            (
                sid,
                mid,
                et,
                base64.b64decode(key) if key else None,
                base64.b64decode(val),
            )
            for sid, mid, et, key, val in entry["rows"]
        ]

    def _wal_prune(self, committed: dict) -> None:
        if not os.path.isdir(self._wal):
            return
        for name in os.listdir(self._wal):
            path = os.path.join(self._wal, name)
            try:
                with open(path) as f:
                    entry = json.load(f)
                done = all(
                    int(por) <= committed.get(int(sid_s), 0)
                    for sid_s, por in entry["end"].items()
                )
                if done:
                    os.remove(path)
            except (OSError, ValueError, KeyError):
                continue

    # -- SimpleDataSourceStreamReader contract ------------------------------
    def initialOffset(self) -> dict:
        self._lst()
        return {}

    def _frontier(self, start: dict, buf: dict) -> dict:
        out = {k: int(v) for k, v in start.items()}
        for sid, rows in buf.items():
            if rows:
                out[str(sid)] = max(max(rows) + 1, out.get(str(sid), 0))
        return out

    def read(self, start: dict):
        lst = self._lst()
        with lst.lock:
            end = self._frontier(start, lst.buf)
            rows = self._slice(start, end, lst.buf)
        if json.dumps(end, sort_keys=True) != json.dumps(
            start, sort_keys=True
        ):
            self._wal_write(start, end, rows)
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        if json.dumps(end, sort_keys=True) == json.dumps(
            start, sort_keys=True
        ):
            return iter([])
        rows = self._wal_read(start, end)
        if rows is None:
            # same-process fallback only: NEVER create a listener here
            # (executor workers must not race the runner for the bind)
            with _REGISTRY_LOCK:
                lst = _LISTENERS.get((self._host, self._port))
            if lst is None:
                raise RuntimeError(
                    f"wally_alo: no WAL entry for batch {start}..{end} "
                    f"under {self._wal} and no in-process listener — "
                    "on a multi-node cluster the 'wal' option must point "
                    "at shared storage (like a checkpointLocation)"
                )
            with lst.lock:
                rows = self._slice(start, end, lst.buf)
        return iter(rows)

    def _slice(self, start: dict, end: dict, buf: dict) -> list:
        rows = []
        for sid_s, hi in end.items():
            lo = int(start.get(sid_s, 0))
            b = buf.get(int(sid_s), {})
            rows.extend(b[mid] for mid in sorted(b) if lo <= mid < int(hi))
        return rows

    def commit(self, end: dict) -> None:
        lst = self._lst()
        with lst.lock:
            for sid_s, por in end.items():
                sid = int(sid_s)
                lst.committed[sid] = max(
                    int(por), lst.committed.get(sid, 0)
                )
                b = lst.buf.get(sid)
                if b:
                    for mid in [m for m in b if m < int(por)]:
                        del b[mid]
            committed = dict(lst.committed)
        self._wal_prune(committed)

    def stop(self) -> None:
        if self._listener is not None:
            self._listener.stop()
            with _REGISTRY_LOCK:
                _LISTENERS.pop((self._host, self._port), None)
            self._listener = None


class WallyALODataSource(DataSource):
    """``readStream.format("wally_alo")`` — at-least-once connector
    wire protocol as a first-class streaming source. Options: host
    (default 127.0.0.1), port (default 7100), cookie, ack_every."""

    @classmethod
    def name(cls) -> str:
        return "wally_alo"

    def schema(self) -> str:
        return _SCHEMA

    def simpleStreamReader(self, schema) -> ALOStreamReader:
        return ALOStreamReader(self.options)


def register_native(spark) -> None:
    """Register every native Python DataSource face on the session."""
    spark.dataSource.register(WallyALODataSource)
