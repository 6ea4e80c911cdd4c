"""At-least-once (ALO) connector wire protocol + the ALO Kafka source.

The reference's experimental at-least-once connector family speaks a
length-framed big-endian TCP protocol between an external connector
process and the engine's source listener:

- frame layouts / tags: reference
  machida/lib/wallaroo/experimental/connector_wire_messages.py
  (Hello :41, Ok :96, Error :133, Notify :177, NotifyAck :230,
  Message :299, Ack :454, Restart :503, EosMessage :413, Frame :531)
- client state machine: reference
  machida/lib/wallaroo/experimental/connectors.py
  (MultiSourceConnector :270 — notify/open/ack/eos lifecycle,
  truncated-sha256 stream ids :388, round-robin sender :393)
- the Kafka face: reference connectors/experimental/alo_kafka_source
  (one stream per partition; stream name/key = str(partition);
  point_of_ref = consumer position; reset = seek).

Spark mapping: the engine side of the socket is `ALOIngestServer`,
which lands records into a SpoolRelay directory — the repo's standard
connector landing zone — deduplicating replays IN-PROCESS (acked
positions live in memory: across a server restart the landing is
at-least-once, and downstream consumers that need exactly-once get it
from Structured Streaming's checkpointed file tracking over the
spool); the client side is
`ALOKafkaClient`, the per-partition round-robin sender. Frames are
re-implemented clean-room from the wire layout.
"""

from __future__ import annotations

import hashlib
import json
import os
import socket
import struct
from dataclasses import dataclass, field


# --------------------------------------------------------------------------
# wire frames (tags 0-8; payloads big-endian, strings u16-length-prefixed)
# --------------------------------------------------------------------------


def _put_str(s: str | bytes) -> bytes:
    b = s if isinstance(s, bytes) else s.encode()
    return struct.pack(">H", len(b)) + b


class _Cursor:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def u16(self) -> int:
        return struct.unpack(">H", self.take(2))[0]

    def u32(self) -> int:
        return struct.unpack(">I", self.take(4))[0]

    def u64(self) -> int:
        return struct.unpack(">Q", self.take(8))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def lpstr(self) -> bytes:
        return self.take(self.u16())

    def rest(self) -> bytes:
        return self.take(len(self.buf) - self.pos)


@dataclass(frozen=True)
class Hello:
    """Handshake open: the connector identifies itself and proves the
    shared-secret cookie (four u16-prefixed strings)."""

    version: str
    cookie: str
    program_name: str
    instance_name: str

    TAG = 0

    def payload(self) -> bytes:
        return b"".join(
            _put_str(s)
            for s in (
                self.version,
                self.cookie,
                self.program_name,
                self.instance_name,
            )
        )

    @classmethod
    def parse(cls, b: bytes) -> "Hello":
        c = _Cursor(b)
        return cls(*(c.lpstr().decode() for _ in range(4)))


@dataclass(frozen=True)
class Ok:
    """Handshake accept: grants the client its initial credit budget
    (u32) — one credit is one in-flight Message."""

    initial_credits: int

    TAG = 1

    def payload(self) -> bytes:
        return struct.pack(">I", self.initial_credits)

    @classmethod
    def parse(cls, b: bytes) -> "Ok":
        return cls(_Cursor(b).u32())


@dataclass(frozen=True)
class Error:
    """Fatal protocol error (u16-prefixed message); sender closes."""

    message: str

    TAG = 2

    def payload(self) -> bytes:
        return _put_str(self.message)

    @classmethod
    def parse(cls, b: bytes) -> "Error":
        return cls(_Cursor(b).lpstr().decode())


@dataclass(frozen=True)
class Notify:
    """Stream announcement: u64 stream id, u16-prefixed name, u64
    client point-of-reference (resume position)."""

    stream_id: int
    stream_name: bytes
    point_of_ref: int

    TAG = 3

    def payload(self) -> bytes:
        return (
            struct.pack(">Q", self.stream_id)
            + _put_str(self.stream_name)
            + struct.pack(">Q", self.point_of_ref)
        )

    @classmethod
    def parse(cls, b: bytes) -> "Notify":
        c = _Cursor(b)
        return cls(c.u64(), c.lpstr(), c.u64())


@dataclass(frozen=True)
class NotifyAck:
    """Server's verdict on a Notify: bool success, u64 stream id, u64
    point-of-ref — the SERVER's durable resume position, which wins
    over the client's (the client must seek to it)."""

    success: bool
    stream_id: int
    point_of_ref: int

    TAG = 4

    def payload(self) -> bytes:
        return struct.pack(">?QQ", self.success, self.stream_id, self.point_of_ref)

    @classmethod
    def parse(cls, b: bytes) -> "NotifyAck":
        s, sid, por = struct.unpack(">?QQ", b)
        return cls(s, sid, por)


@dataclass(frozen=True)
class Message:
    """One record: u64 stream id, u64 message id (the source position
    of THIS record), i64 event time, u16-prefixed key (empty encodes
    None), payload = remainder (empty decodes None)."""

    stream_id: int
    message_id: int
    event_time: int = 0
    key: bytes | None = None
    message: bytes | None = None

    TAG = 5

    def payload(self) -> bytes:
        return (
            struct.pack(">QQq", self.stream_id, self.message_id, self.event_time)
            + _put_str(self.key or b"")
            + (self.message or b"")
        )

    @classmethod
    def parse(cls, b: bytes) -> "Message":
        c = _Cursor(b)
        sid, mid, et = c.u64(), c.u64(), c.i64()
        key = c.lpstr() or None
        msg = c.rest() or None
        return cls(sid, mid, et, key, msg)


@dataclass(frozen=True)
class Ack:
    """Credit replenishment + per-stream durable positions: u32
    credits, u32 count, then (u64 stream id, u64 point_of_ref) pairs."""

    credits: int
    acks: tuple = ()

    TAG = 6

    def payload(self) -> bytes:
        return struct.pack(">II", self.credits, len(self.acks)) + b"".join(
            struct.pack(">QQ", sid, por) for sid, por in self.acks
        )

    @classmethod
    def parse(cls, b: bytes) -> "Ack":
        c = _Cursor(b)
        credits, n = c.u32(), c.u32()
        return cls(credits, tuple((c.u64(), c.u64()) for _ in range(n)))


@dataclass(frozen=True)
class Restart:
    """Server asks the client to reconnect (optionally elsewhere):
    u32-prefixed address, zero length = same address."""

    address: str = ""

    TAG = 7

    def payload(self) -> bytes:
        b = self.address.encode()
        return struct.pack(">I", len(b)) + b

    @classmethod
    def parse(cls, b: bytes) -> "Restart":
        # the reference decoder tolerates a bare Restart (zero-length
        # payload => reconnect to the same address); mirror it rather
        # than raising struct.error on a conforming peer
        if not b:
            return cls("")
        c = _Cursor(b)
        return cls(c.take(c.u32()).decode())


@dataclass(frozen=True)
class EosMessage:
    """End of stream (u64 stream id): the client finished the stream
    and awaits the final Ack before closing it."""

    stream_id: int

    TAG = 8

    def payload(self) -> bytes:
        return struct.pack(">Q", self.stream_id)

    @classmethod
    def parse(cls, b: bytes) -> "EosMessage":
        return cls(_Cursor(b).u64())


_FRAMES = (Hello, Ok, Error, Notify, NotifyAck, Message, Ack, Restart, EosMessage)
_BY_TAG = {f.TAG: f for f in _FRAMES}


def encode_frame(msg) -> bytes:
    """u32 length (payload + 1 tag byte), u8 tag, payload."""
    data = msg.payload()
    return struct.pack(">IB", len(data) + 1, msg.TAG) + data


def decode_frame(body: bytes):
    """Decode tag byte + payload (length header already stripped)."""
    return _BY_TAG[body[0]].parse(body[1:])


def frame_length(header: bytes) -> int:
    return struct.unpack(">I", header[:4])[0]


def stream_id_of(name: bytes) -> int:
    """Repeatable stream id: first 16 hex chars of sha256(name) as an
    unsigned 64-bit int (reference connectors.py get_id :388)."""
    return int(hashlib.sha256(name).hexdigest()[:16], 16)


def send_frame(sock: socket.socket, msg) -> None:
    sock.sendall(encode_frame(msg))


def recv_frame(sock: socket.socket):
    """Blocking read of one length-framed message; None on EOF."""
    header = _recv_exact(sock, 4)
    if header is None:
        return None
    body = _recv_exact(sock, frame_length(header))
    return None if body is None else decode_frame(body)


def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


# --------------------------------------------------------------------------
# client: per-partition Kafka streams over the ALO protocol
# --------------------------------------------------------------------------


class ALOKafkaClient:
    """The alo_kafka_source shape: one reader per Kafka partition,
    round-robin Message sending under a credit budget, server-governed
    resume positions. Readers are duck-typed (the real KafkaConsumer
    wrapper and the test fake expose the same five members):

      name: bytes           stream name (str(partition) for Kafka)
      key: bytes            record key stamped on every Message
      point_of_ref() -> int next position the reader would emit
      reset(pos)            seek so the next record is at `pos`
      __next__() -> (bytes value, int offset)   raises StopIteration

    Lifecycle per stream: add_source -> Notify -> (NotifyAck success,
    server por wins: reader.reset if it disagrees) -> open -> Messages
    (message_id = record offset) -> EOS -> final Ack -> closed."""

    def __init__(
        self,
        version: str,
        cookie: str,
        program_name: str,
        instance_name: str,
        sock: socket.socket,
    ):
        self.hello = Hello(version, cookie, program_name, instance_name)
        self.sock = sock
        self.credits = 0
        self.sources: dict[int, object] = {}
        self.order: list[int] = []
        self.open: set[int] = set()
        self.pending_eos: dict[int, int] = {}
        self.closed: set[int] = set()
        self.acked: dict[int, int] = {}
        self._idx = -1

    # -- lifecycle ----------------------------------------------------------
    def connect(self) -> None:
        send_frame(self.sock, self.hello)
        reply = recv_frame(self.sock)
        if not isinstance(reply, Ok):
            raise ConnectionError(f"handshake rejected: {reply}")
        self.credits = reply.initial_credits

    def add_source(self, reader) -> int:
        sid = stream_id_of(reader.name)
        if sid in self.sources:
            raise ValueError(f"duplicate stream id for {reader.name!r}")
        self.sources[sid] = reader
        self.order.append(sid)
        send_frame(self.sock, Notify(sid, reader.name, reader.point_of_ref()))
        return sid

    # -- inbound ------------------------------------------------------------
    def handle(self, msg) -> None:
        if isinstance(msg, NotifyAck):
            reader = self.sources.get(msg.stream_id)
            if reader is None or not msg.success:
                return
            # the server's durable position wins: replay from there
            if msg.point_of_ref != reader.point_of_ref():
                reader.reset(msg.point_of_ref)
            self.open.add(msg.stream_id)
        elif isinstance(msg, Ack):
            self.credits += msg.credits
            for sid, por in msg.acks:
                self.acked[sid] = por
                eos_por = self.pending_eos.get(sid)
                if eos_por is not None and por >= eos_por:
                    del self.pending_eos[sid]
                    self.closed.add(sid)
                    reader = self.sources.pop(sid, None)
                    idx = self.order.index(sid)
                    self.order.pop(idx)
                    if self._idx >= idx:  # keep the round-robin fair
                        self._idx -= 1
                    if reader is not None:
                        reader.close()
        elif isinstance(msg, Restart):
            # all open streams fall back to joining; re-Notify on the
            # new connection (the caller re-dials and re-connect()s)
            self.open.clear()
        elif isinstance(msg, Error):
            raise ConnectionError(msg.message)

    # -- outbound -----------------------------------------------------------
    def pump_one(self) -> bool:
        """Advance the protocol by one lock-step exchange: send the
        next round-robin Message (or EOS) if a stream is open and
        credits remain, then read and handle the server's reply; with
        nothing sendable (joining streams, zero credits, pending EOS
        acks) just block on the next inbound frame. Returns False when
        every stream has closed.

        The reference client multiplexes these over a select() loop
        (connectors.py:270); the Spark-side face keeps the identical
        frame sequence and resume semantics but runs lock-step —
        ALOIngestServer answers every inbound frame with exactly one
        frame, so the exchange is deterministic and testable."""
        if not self.order:
            return False
        sent = False
        if self.credits > 0:
            self._idx = (self._idx + 1) % len(self.order)
            sid = self.order[self._idx]
            if sid in self.open:
                reader = self.sources[sid]
                try:
                    value, offset = next(reader)
                    send_frame(
                        self.sock, Message(sid, offset, 0, reader.key, value)
                    )
                    self.credits -= 1
                except StopIteration:
                    self.open.discard(sid)
                    self.pending_eos[sid] = reader.point_of_ref()
                    send_frame(self.sock, EosMessage(sid))
                sent = True
        reply = recv_frame(self.sock)
        if reply is None:
            if sent:
                raise ConnectionError("server closed mid-exchange")
            return False
        self.handle(reply)
        return bool(self.order)

    def join(self) -> None:
        while self.pump_one():
            pass


# --------------------------------------------------------------------------
# server: the engine-side listener landing into a spool directory
# --------------------------------------------------------------------------


@dataclass
class ALOIngestServer:
    """Engine side of the ALO socket: validates the Hello cookie,
    grants credits, answers Notify with its per-stream resume
    position (at-least-once resume: the server's ack state wins),
    dedupes replayed Messages by (stream_id, message_id), lands
    accepted records via ``land(stream_id, message_id, payload,
    event_time, key)`` — the full wire Message, so consumers of the
    advertised (event_time, key) columns see the real frame values,
    not zeros (r12 advice) — and replenishes one credit per processed
    Message, attaching the positions snapshot every ``ack_every``
    records. point-of-ref convention matches the Kafka face: acked
    por = last accepted record offset + 1 = next expected.

    ``resume`` (optional): callable(stream_id) -> committed por or
    None, consulted when a stream is (re-)announced via Notify — the
    per-stream rewind that replaces rewinding ALL streams on every new
    connection (r12 advice: a reconnect must not reset other clients'
    dedupe state mid-session).

    Durability: ``acked`` is IN-PROCESS state. Across a server
    restart the NotifyAck echoes the client's point_of_ref and
    replayed messages land again — the spool landing is
    at-least-once; exactly-once is provided downstream by Structured
    Streaming's checkpointed file tracking over the spool.
    ``txn_log`` (optional path) makes the 2PC ``txn_state`` durable
    the way the reference aloc_sink persists its txn log
    (aloc_sink_impl.py): Phase1 spans journal to disk before the
    commit vote goes out, so an abort arriving after a server restart
    still rolls the covered streams back instead of silently keeping
    the aborted span."""

    cookie: str
    land: object  # callable(stream_id, message_id, payload, event_time, key)
    initial_credits: int = 16
    ack_every: int = 4
    acked: dict = field(default_factory=dict)
    txn_state: dict = field(default_factory=dict)  # txn_id -> where_list
    resume: object = None  # callable(stream_id) -> committed por | None
    txn_log: str | None = None
    _since_ack: int = 0

    def __post_init__(self) -> None:
        if self.txn_log and os.path.exists(self.txn_log):
            try:
                with open(self.txn_log) as f:
                    raw = json.load(f)
                self.txn_state.update(
                    {
                        t: tuple(tuple(w) for w in ws)
                        for t, ws in raw.items()
                    }
                )
            except (OSError, ValueError):
                pass  # unreadable log: start empty, overwrite on next txn

    def _persist_txns(self) -> None:
        if not self.txn_log:
            return
        tmp = self.txn_log + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {t: [list(w) for w in ws] for t, ws in self.txn_state.items()},
                f,
            )
        os.replace(tmp, self.txn_log)  # atomic publish

    #: stream id 0 is reserved for 2PC control frames (reference:
    #: aloc_sink_impl.py handle_message dispatches stream 0 to the
    #: TwoPCFrame decoder; data streams use ids >= 1)
    TWOPC_STREAM = 0

    def serve_connection(self, sock: socket.socket) -> None:
        hello = recv_frame(sock)
        if not isinstance(hello, Hello) or hello.cookie != self.cookie:
            send_frame(sock, Error("bad cookie"))
            sock.close()
            return
        send_frame(sock, Ok(self.initial_credits))
        while True:
            msg = recv_frame(sock)
            if msg is None:
                return
            out = self.handle(msg)
            for frame in out:
                send_frame(sock, frame)

    def handle(self, msg) -> list:
        if isinstance(msg, Notify):
            if self.resume is not None:
                # per-stream rewind: a (re)announced stream replays from
                # the COMMITTED position (the consumer may not have
                # committed everything a previous session landed) —
                # other streams' dedupe state is untouched
                committed = self.resume(msg.stream_id)
                if committed is None:
                    self.acked.pop(msg.stream_id, None)
                else:
                    self.acked[msg.stream_id] = committed
            por = self.acked.get(msg.stream_id, msg.point_of_ref)
            return [NotifyAck(True, msg.stream_id, por)]
        if isinstance(msg, Message):
            if msg.stream_id == self.TWOPC_STREAM:
                return self._handle_twopc(msg)
            resume = self.acked.get(msg.stream_id, 0)
            if msg.message_id >= resume:  # not a replayed duplicate
                self.land(
                    msg.stream_id,
                    msg.message_id,
                    msg.message,
                    msg.event_time,
                    msg.key,
                )
                self.acked[msg.stream_id] = msg.message_id + 1
            self._since_ack += 1
            # every message replenishes exactly the ONE credit it
            # consumed (granting ack_every on the ack_every-th message
            # would hand out ~2x credits per message and let a
            # pipelined client's in-flight window grow without bound);
            # the ack_every-th also carries the positions snapshot
            if self._since_ack >= self.ack_every:
                self._since_ack = 0
                return [Ack(1, tuple(sorted(self.acked.items())))]
            return [Ack(1, ())]  # replenish the credit, positions later
        if isinstance(msg, EosMessage):
            por = self.acked.get(msg.stream_id, 0)
            return [Ack(0, ((msg.stream_id, por),))]
        return []

    def _handle_twopc(self, msg: "Message") -> list:
        """Minimal 2PC transaction lifecycle on the reserved control
        stream (reference: aloc_sink_impl.py handle_message_stream0):
        ListUncommitted answers with the txn ids still in Phase1 state,
        Phase1 records the txn's where_list and votes commit, Phase2
        resolves it — an abort rolls each covered stream's acked
        position back to the span start so the coordinator's replay
        re-lands the aborted span (the reference sink's
        truncate_and_seek_to, expressed in ack state). Replies travel
        as inner frames inside stream-0 Messages, exactly as received;
        every control Message also replenishes its one credit."""
        inner = decode_inner(msg.message or b"")
        credit = Ack(1, ())
        if isinstance(inner, ListUncommitted):
            reply = ReplyUncommitted(
                inner.rtag, tuple(sorted(self.txn_state))
            )
            return [
                Message(self.TWOPC_STREAM, 0, 0, None, encode_inner(reply)),
                credit,
            ]
        if isinstance(inner, TwoPCPhase1):
            # vote abort on a malformed prepare (a span naming the
            # control stream); otherwise remember it as uncommitted
            ok = all(
                sid != self.TWOPC_STREAM and s <= e
                for sid, s, e in inner.where_list
            )
            if ok:
                self.txn_state[inner.txn_id] = tuple(inner.where_list)
                self._persist_txns()  # journal BEFORE the commit vote
            reply = TwoPCReply(inner.txn_id, ok)
            return [
                Message(self.TWOPC_STREAM, 0, 0, None, encode_inner(reply)),
                credit,
            ]
        if isinstance(inner, TwoPCPhase2):
            if inner.txn_id not in self.txn_state:
                # unknown txn (never prepared here, or prepared by a
                # server whose txn log was lost): silently treating an
                # abort as a no-op would KEEP the aborted span — answer
                # with a protocol Error so the coordinator knows the
                # rollback did not happen (r12 advice; the reference
                # raises on an unknown txn)
                return [
                    Error(f"2PC phase2 for unknown txn {inner.txn_id!r}"),
                    credit,
                ]
            wheres = self.txn_state.pop(inner.txn_id)
            self._persist_txns()
            if not inner.commit:
                for sid, start, _end in wheres:
                    self.acked[sid] = min(
                        self.acked.get(sid, start), start
                    )
            return [credit]
        if isinstance(inner, WorkersLeft):
            return [credit]
        # TwoPCReply/ReplyUncommitted are coordinator-bound: a peer
        # sending one here is a protocol error (reference raises)
        return [Error(f"bad stream-0 frame: {type(inner).__name__}")]


# --------------------------------------------------------------------------
# 2PC inner frames (reference connector_wire_messages.py:563-807): the
# exactly-once extension carried INSIDE the ALO stream (tag byte, NO
# length prefix — the outer Message frame already delimits them).
# Clean-room from the documented layouts and decoders; two reference
# encoder bugs are deliberately NOT reproduced (ReplyUncommitted.decode
# there decodes an Ack — copy-paste — and TwoPCPhase1.encode drops the
# `self.` qualifiers, a NameError on any call): this codec implements
# the INTENDED symmetric layout its docstrings and decoders describe.
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class ListUncommitted:
    """Sink asks the connector for transactions not yet committed
    (u64 round tag)."""

    rtag: int

    TAG = 201

    def payload(self) -> bytes:
        return struct.pack(">Q", self.rtag)

    @classmethod
    def parse(cls, b: bytes) -> "ListUncommitted":
        return cls(_Cursor(b).u64())


@dataclass(frozen=True)
class ReplyUncommitted:
    """Connector's answer: u64 rtag, u32 count, u16-prefixed txn ids."""

    rtag: int
    txn_ids: tuple = ()

    TAG = 202

    def payload(self) -> bytes:
        return struct.pack(">QI", self.rtag, len(self.txn_ids)) + b"".join(
            _put_str(t) for t in self.txn_ids
        )

    @classmethod
    def parse(cls, b: bytes) -> "ReplyUncommitted":
        c = _Cursor(b)
        rtag, n = c.u64(), c.u32()
        return cls(rtag, tuple(c.lpstr().decode() for _ in range(n)))


@dataclass(frozen=True)
class TwoPCPhase1:
    """Prepare: u16-prefixed txn id, u32 count, then (u64 stream id,
    u64 start por, u64 end por) triples naming exactly which spans the
    transaction covers."""

    txn_id: str
    where_list: tuple = ()

    TAG = 203

    def payload(self) -> bytes:
        return (
            _put_str(self.txn_id)
            + struct.pack(">I", len(self.where_list))
            + b"".join(
                struct.pack(">QQQ", sid, s, e)
                for sid, s, e in self.where_list
            )
        )

    @classmethod
    def parse(cls, b: bytes) -> "TwoPCPhase1":
        c = _Cursor(b)
        txn = c.lpstr().decode()
        n = c.u32()
        return cls(txn, tuple((c.u64(), c.u64(), c.u64()) for _ in range(n)))


def _phase2r_payload(txn_id: str, commit: bool) -> bytes:
    return _put_str(txn_id) + (b"\x01" if commit else b"\x00")


def _phase2r_parse(b: bytes):
    c = _Cursor(b)
    return c.lpstr().decode(), c.take(1) == b"\x01"


@dataclass(frozen=True)
class TwoPCReply:
    """Connector's vote on a Phase1 (txn id + commit/abort bool)."""

    txn_id: str
    commit: bool

    TAG = 204

    def payload(self) -> bytes:
        return _phase2r_payload(self.txn_id, self.commit)

    @classmethod
    def parse(cls, b: bytes) -> "TwoPCReply":
        return cls(*_phase2r_parse(b))


@dataclass(frozen=True)
class TwoPCPhase2:
    """Coordinator's decision (txn id + commit/abort bool)."""

    txn_id: str
    commit: bool

    TAG = 205

    def payload(self) -> bytes:
        return _phase2r_payload(self.txn_id, self.commit)

    @classmethod
    def parse(cls, b: bytes) -> "TwoPCPhase2":
        return cls(*_phase2r_parse(b))


@dataclass(frozen=True)
class WorkersLeft:
    """Cluster-shrink notice: u64 rtag + u16-prefixed worker names."""

    rtag: int
    leaving_workers: tuple = ()

    TAG = 206

    def payload(self) -> bytes:
        return struct.pack(
            ">QI", self.rtag, len(self.leaving_workers)
        ) + b"".join(_put_str(w) for w in self.leaving_workers)

    @classmethod
    def parse(cls, b: bytes) -> "WorkersLeft":
        c = _Cursor(b)
        rtag, n = c.u64(), c.u32()
        return cls(rtag, tuple(c.lpstr().decode() for _ in range(n)))


_TWOPC_FRAMES = (
    ListUncommitted,
    ReplyUncommitted,
    TwoPCPhase1,
    TwoPCReply,
    TwoPCPhase2,
    WorkersLeft,
)
_TWOPC_BY_TAG = {f.TAG: f for f in _TWOPC_FRAMES}


def encode_inner(msg) -> bytes:
    """2PC inner framing: u8 tag + payload, NO length prefix (the
    outer ALO Message already delimits the bytes)."""
    return struct.pack(">B", msg.TAG) + msg.payload()


def decode_inner(body: bytes):
    return _TWOPC_BY_TAG[body[0]].parse(body[1:])
