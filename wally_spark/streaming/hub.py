"""Metrics hub — an HTTP serving endpoint over MetricsListener.

The reference ships a monitoring hub web app (reference:
monitoring_hub/apps/metrics_reporter, monitoring_hub/apps/
metrics_reporter_ui) that aggregates per-pipeline / per-step
throughput and latency and serves it to a UI. This module is its
engine-side counterpart: a dependency-free HTTP endpoint (stdlib
``http.server`` on a daemon thread) that serves the same rollups the
listener already computes — overall throughput, per-operator state
detail, and recent batch history — as JSON. Any dashboard (or
``curl``) can poll it; the heavy lifting (per-batch metrics capture)
stays in MetricsListener, so the hub adds zero cost to the streaming
hot path.

Routes:
  GET /            -> {"queries": [...], "totals": {...}} index
  GET /totals      -> MetricsListener.totals()
  GET /operators   -> MetricsListener.per_operator()
  GET /history     -> most recent batches (?limit=N, default 100)

Scale note: the hub reads ONLY driver-local listener state (bounded by
history length); it never touches executors or query data, so it is
safe to leave running on a 1000-executor cluster's driver.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from wally_spark.streaming.metrics import MetricsListener


class MetricsHub:
    """Serve a MetricsListener's rollups over HTTP.

    ``port=0`` binds an ephemeral port (read it back from ``.port``
    after ``start()``) — tests and multi-tenant drivers never collide.
    """

    def __init__(self, listener: MetricsListener,
                 host: str = "127.0.0.1", port: int = 0):
        self.listener = listener
        self.host = host
        self._requested_port = port
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        if self._server is None:
            raise RuntimeError("hub not started")
        return self._server.server_address[1]

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def start(self) -> "MetricsHub":
        listener = self.listener

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # keep driver stdout clean
                pass

            def do_GET(self):
                parsed = urlparse(self.path)
                route = parsed.path.rstrip("/") or "/"
                if route == "/":
                    with listener._lock:
                        names = sorted({m.query_name
                                        for m in listener.history})
                    body = {"queries": names, "totals": listener.totals()}
                elif route == "/totals":
                    body = listener.totals()
                elif route == "/operators":
                    body = listener.per_operator()
                elif route == "/history":
                    qs = parse_qs(parsed.query)
                    try:
                        limit = int(qs.get("limit", ["100"])[0])
                    except ValueError:
                        limit = 100
                    with listener._lock:
                        recent = listener.history[-max(limit, 0):]
                        body = [vars(m) for m in recent]
                else:
                    self.send_response(404)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(b'{"error": "not found"}')
                    return
                payload = json.dumps(body).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        self._server = ThreadingHTTPServer(
            (self.host, self._requested_port), Handler
        )
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="wally-metrics-hub",
            daemon=True,
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self) -> "MetricsHub":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
