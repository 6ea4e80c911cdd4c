"""Spool relay — the Spark-first bridge for push/poll message feeds.

The reference ships ~10 single-file connector scripts (reference
connectors/kinesis_source:1-21, udp_source:1-20, rabbitmq_source,
redis_subscriber_source, templates/postgres_notify_source), each a
single OS process that pulls messages from an external service and
pushes them into the engine over the connector protocol
(machida/lib/wallaroo/experimental/connectors.py). Spark's native
analog of "an external process feeding the engine" is the FILE STREAM
SOURCE: the relay drains the feed into line-framed text files published
ATOMICALLY (write to a hidden temp name, then rename — the file source
lists only completed files), and ``spark.readStream`` consumes the
spool with checkpointed exactly-once semantics from that point on.

Scale shape: one relay process per shard/queue/topic-partition (exactly
the reference's deployment unit — one connector script per shard),
all writing into the same spool root on shared storage; the file
source globs the root, so adding shards is adding writers, never a
replan. Upstream of the spool the guarantee is the reference's
at-least-once; downstream Spark's checkpoint + batch-id dedup make it
exactly-once (see IdempotentParquetSink).

Binary-safe framing: ``encoding="base64"`` wraps each message so
payloads may contain newlines; the matching reader decodes with
``unbase64``. Text mode writes messages as lines verbatim (the
reference's newline-framed text convention).

See also ``wally_spark.sources.native``: the PySpark 4.1 Python
streaming DataSource face (``readStream.format("wally_alo")``) that
consumes the ALO wire protocol without the disk spool; the spool path
here remains the fallback for high-rate feeds whose listener must
scale out separately from the driver.
"""

from __future__ import annotations

import base64
import os
import threading
import uuid
from collections import deque
from dataclasses import dataclass
from typing import Any, Callable, Iterable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from wally_spark.sources import SourceConfig


class SpoolRelay:
    """Drains pushed/polled messages into atomically-published line
    files under ``spool_dir``. Thread-safe ``push``; an optional
    ``poll`` callable is invoked once per tick and may return an
    iterable of messages (str or bytes)."""

    def __init__(
        self,
        spool_dir: str,
        poll: Callable[[], Iterable[Any]] | None = None,
        interval: float = 0.2,
        encoding: str = "text",
    ):
        if encoding not in ("text", "base64"):
            raise ValueError(f"unknown relay encoding {encoding!r}")
        self.spool_dir = spool_dir
        self.poll = poll
        self.interval = interval
        self.encoding = encoding
        self._pending: deque = deque()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._seq = 0
        os.makedirs(spool_dir, exist_ok=True)

    # -- framing ------------------------------------------------------------
    def _frame(self, msg: Any) -> str:
        raw = msg if isinstance(msg, (bytes, bytearray)) else str(msg).encode()
        if self.encoding == "base64":
            return base64.b64encode(bytes(raw)).decode("ascii")
        line = bytes(raw).decode("utf-8", errors="replace")
        # text mode is newline-framed: embedded newlines would split
        # one message into several rows — reject loudly, don't corrupt
        if "\n" in line or "\r" in line:
            raise ValueError(
                "text-mode relay message contains a newline; construct "
                "the relay with encoding='base64' for binary payloads"
            )
        return line

    def push(self, msg: Any) -> None:
        with self._lock:
            self._pending.append(msg)

    def _drain_once(self) -> int:
        msgs: list[Any] = []
        with self._lock:
            while self._pending:
                msgs.append(self._pending.popleft())
        if self.poll is not None:
            msgs.extend(self.poll())
        if not msgs:
            return 0
        lines = "".join(self._frame(m) + "\n" for m in msgs)
        self._seq += 1
        name = f"relay-{self._seq:08d}-{uuid.uuid4().hex[:8]}.txt"
        tmp = os.path.join(self.spool_dir, "." + name + ".tmp")
        with open(tmp, "w") as f:
            f.write(lines)
            f.flush()
            os.fsync(f.fileno())
        # rename is atomic on POSIX: the file source never lists the
        # dot-prefixed temp, so readers only ever see complete files
        os.rename(tmp, os.path.join(self.spool_dir, name))
        return len(msgs)

    # -- lifecycle ----------------------------------------------------------
    def start(self) -> "SpoolRelay":
        if self._thread is not None:
            return self

        def loop():
            while not self._stop.is_set():
                self._drain_once()
                self._stop.wait(self.interval)
            self._drain_once()  # final flush

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None

    def flush(self) -> int:
        """Synchronous drain (tests / unthreaded relays)."""
        return self._drain_once()


def _spool_stream(spark: SparkSession, spool_dir: str, encoding: str) -> DataFrame:
    os.makedirs(spool_dir, exist_ok=True)
    df = spark.readStream.text(spool_dir)
    if encoding == "base64":
        return df.select(F.unbase64("value").alias("value"))
    return df


def _spool_batch(spark: SparkSession, spool_dir: str, encoding: str) -> DataFrame:
    os.makedirs(spool_dir, exist_ok=True)
    df = spark.read.text(spool_dir)
    if encoding == "base64":
        return df.select(F.unbase64("value").alias("value"))
    return df


@dataclass
class RelaySourceConfig(SourceConfig):
    """Base for relay-backed sources: ``read_stream``/``read_batch``
    consume the spool; subclasses implement ``_make_relay`` wiring the
    external feed. ``start()``/``stop()`` manage the relay lifecycle —
    deploy one per shard/queue (the reference's one-script-per-shard
    unit), co-located with the data or on an ingest edge node."""

    name: str
    spool_dir: str
    encoding: str = "text"

    def _make_relay(self) -> SpoolRelay:  # pragma: no cover - abstract
        raise NotImplementedError

    def start(self):
        self._relay = self._make_relay().start()
        return self

    def stop(self):
        relay = getattr(self, "_relay", None)
        if relay is not None:
            relay.stop()
            self._relay = None

    def read_stream(self, spark):
        return _spool_stream(spark, self.spool_dir, self.encoding)

    def read_batch(self, spark):
        return _spool_batch(spark, self.spool_dir, self.encoding)


@dataclass
class UDPSourceConfig(RelaySourceConfig):
    """UDP datagram source (reference connectors/udp_source:1-20:
    a SocketServer.UDPServer pushing each datagram into the engine).
    Binds ``host:port``; every datagram becomes one spool message.
    UDP is lossy by nature — the reference offers no replay either —
    so the delivery floor is the wire's; from the spool on it is
    exactly-once. Datagrams are binary: default encoding is base64."""

    host: str = "127.0.0.1"
    port: int = 0
    encoding: str = "base64"
    buffer_bytes: int = 65536

    def _make_relay(self) -> SpoolRelay:
        import socket

        relay = SpoolRelay(self.spool_dir, encoding=self.encoding)
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sock.bind((self.host, self.port))
        sock.settimeout(0.2)
        self.bound_port = sock.getsockname()[1]
        self._sock = sock
        stop = threading.Event()
        self._listener_stop = stop

        def listen():
            while not stop.is_set():
                try:
                    data, _ = sock.recvfrom(self.buffer_bytes)
                except OSError:
                    continue
                relay.push(data)
            sock.close()

        t = threading.Thread(target=listen, daemon=True)
        t.start()
        self._listener = t
        return relay

    def stop(self):
        stop = getattr(self, "_listener_stop", None)
        if stop is not None:
            stop.set()
            self._listener.join(timeout=10)
        super().stop()


@dataclass
class KinesisSourceConfig(RelaySourceConfig):
    """Kinesis shard source (reference connectors/kinesis_source:1-21:
    get_shard_iterator(LATEST) then a get_records poll loop pushing
    record Data). ``client_factory`` returns a boto3-kinesis-shaped
    client (``boto3.client('kinesis')`` by default — boto3 is not in
    this sandbox, so tests inject a fake and a live run env-gates);
    request dicts are built by the golden-config methods below so the
    wire contract is pinned without the service. One config per shard
    (the reference's unit); a stream with N shards runs N relays into
    one spool root."""

    stream: str = ""
    shard: str = ""
    iterator_type: str = "LATEST"
    limit: int = 100
    poll_interval: float = 0.2
    client_factory: Callable[[], Any] | None = None
    encoding: str = "base64"

    # -- golden-config contract (mirrors the reference's boto3 calls) ------
    def iterator_request(self) -> dict:
        return {
            "StreamName": self.stream,
            "ShardId": self.shard,
            "ShardIteratorType": self.iterator_type,
        }

    def records_request(self, shard_iterator: str) -> dict:
        return {"ShardIterator": shard_iterator, "Limit": self.limit}

    def _client(self):
        if self.client_factory is not None:
            return self.client_factory()
        import boto3  # deployment dependency; env-gated in tests

        return boto3.client("kinesis")

    def _make_relay(self) -> SpoolRelay:
        client = self._client()
        it = client.get_shard_iterator(**self.iterator_request())[
            "ShardIterator"
        ]
        state = {"it": it}

        def poll():
            resp = client.get_records(**self.records_request(state["it"]))
            state["it"] = resp["NextShardIterator"]
            return [r["Data"] for r in resp.get("Records", [])]

        return SpoolRelay(
            self.spool_dir, poll=poll, interval=self.poll_interval,
            encoding=self.encoding,
        )


@dataclass
class RabbitMQSourceConfig(RelaySourceConfig):
    """RabbitMQ queue source (reference connectors/rabbitmq_source:
    a pika AsyncConsumer acking each delivery then pushing the body).
    ``consumer_factory(on_message) -> object with run()/stop()`` lets
    tests inject a fake; the default builds a blocking pika consumer
    (pika is a deployment dependency, not in this sandbox). Ack-then-
    spool mirrors the reference's ack-then-write: at-least-once into
    the spool, exactly-once after."""

    amqp_url: str = ""
    queue: str = ""
    consumer_factory: Callable[[Callable[[Any], None]], Any] | None = None
    encoding: str = "base64"

    def _default_consumer(self, on_message):
        import pika  # deployment dependency; env-gated in tests

        params = pika.URLParameters(self.amqp_url)

        class _Consumer:
            def __init__(self, params, queue):
                self._params, self._queue = params, queue
                self._conn = None

            def run(self):
                self._conn = pika.BlockingConnection(self._params)
                ch = self._conn.channel()
                ch.queue_declare(queue=self._queue)
                for _, _, body in ch.consume(self._queue, auto_ack=True):
                    on_message(body)

            def stop(self):
                if self._conn is not None:
                    self._conn.close()

        return _Consumer(params, self.queue)

    def _make_relay(self) -> SpoolRelay:
        relay = SpoolRelay(self.spool_dir, encoding=self.encoding)
        factory = self.consumer_factory or self._default_consumer
        consumer = factory(relay.push)
        self._consumer = consumer
        t = threading.Thread(target=consumer.run, daemon=True)
        t.start()
        self._consumer_thread = t
        return relay

    def stop(self):
        consumer = getattr(self, "_consumer", None)
        if consumer is not None:
            try:
                consumer.stop()
            except Exception:
                pass
        super().stop()


@dataclass
class RedisSubscriberSourceConfig(RelaySourceConfig):
    """Redis pub/sub source (reference connectors/
    redis_subscriber_source: pubsub.subscribe(topic), forwarding each
    ``message['data']``). ``client_factory`` returns a redis-py-shaped
    client; tests inject a fake pubsub, live runs need the redis
    package + server (env-gated). Pub/sub is fire-and-forget upstream
    (Redis drops messages for absent subscribers — the reference
    inherits that too); the spool is durable from arrival on."""

    topic: str = ""
    host: str = "localhost"
    port: int = 6379
    password: str | None = None
    client_factory: Callable[[], Any] | None = None
    encoding: str = "base64"

    def _client(self):
        if self.client_factory is not None:
            return self.client_factory()
        from redis import Redis  # deployment dependency

        return Redis(self.host, int(self.port), password=self.password)

    def _make_relay(self) -> SpoolRelay:
        relay = SpoolRelay(self.spool_dir, encoding=self.encoding)
        pubsub = self._client().pubsub()
        pubsub.subscribe(self.topic)
        self._pubsub = pubsub
        stop = threading.Event()
        self._listen_stop = stop

        def listen():
            for message in pubsub.listen():
                if stop.is_set():
                    break
                if message.get("type") == "message":
                    relay.push(message["data"])

        t = threading.Thread(target=listen, daemon=True)
        t.start()
        self._listener = t
        return relay

    def stop(self):
        stop = getattr(self, "_listen_stop", None)
        if stop is not None:
            stop.set()
            try:
                self._pubsub.unsubscribe()
                self._pubsub.close()
            except Exception:
                pass
        super().stop()


@dataclass
class PostgresNotifySourceConfig(RelaySourceConfig):
    """Postgres LISTEN/NOTIFY source (reference connectors/templates/
    postgres_notify_source: an AFTER INSERT trigger calls pg_notify
    with row_to_json; the script LISTENs and forwards
    ``payload['content']``). ``connection_factory`` returns a
    psycopg2-shaped connection (``poll()`` + ``notifies`` deque);
    tests inject a fake, live runs need psycopg2 (env-gated).
    ``setup_sql``/``listen_sql`` pin the trigger DDL contract."""

    connection: str = ""
    channel: str = "wallaroo_example"
    payload_field: str = "content"
    poll_interval: float = 0.2
    connection_factory: Callable[[], Any] | None = None
    encoding: str = "text"

    def setup_sql(self, table: str) -> list[str]:
        """The reference template's trigger DDL, parameterized."""
        fn = f"""CREATE OR REPLACE FUNCTION NOTIFY() RETURNS trigger AS
$BODY$
BEGIN
    PERFORM pg_notify('{self.channel}', row_to_json(NEW)::text);
    RETURN new;
END;
$BODY$
LANGUAGE 'plpgsql' VOLATILE COST 100;"""
        trg = (
            f"CREATE TRIGGER {table}_AFTER AFTER INSERT ON {table} "
            "FOR EACH ROW EXECUTE PROCEDURE NOTIFY();"
        )
        return [fn, trg]

    def listen_sql(self) -> str:
        return f"LISTEN {self.channel};"

    def _conn(self):
        if self.connection_factory is not None:
            return self.connection_factory()
        import psycopg2  # deployment dependency
        import psycopg2.extensions

        conn = psycopg2.connect(self.connection)
        conn.set_isolation_level(
            psycopg2.extensions.ISOLATION_LEVEL_AUTOCOMMIT
        )
        conn.cursor().execute(self.listen_sql())
        return conn

    def _make_relay(self) -> SpoolRelay:
        import json

        conn = self._conn()
        field_name = self.payload_field

        def poll():
            conn.poll()
            out = []
            while conn.notifies:
                notify = conn.notifies.pop(0)
                payload = json.loads(notify.payload)
                out.append(payload[field_name])
            return out

        return SpoolRelay(
            self.spool_dir, poll=poll, interval=self.poll_interval,
            encoding=self.encoding,
        )
