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
  GET /ui          -> minimal self-contained HTML dashboard (tables
                      over the JSON routes, auto-refresh; the
                      metrics_reporter_ui counterpart, zero deps)

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

# Self-contained dashboard page: three tables polling the JSON routes.
# Deliberately dependency-free (no JS libs, no external fetches) so it
# is safe to serve from a production driver; anything fancier should
# poll the JSON routes from its own stack.
_UI_HTML = """<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<title>wally_spark metrics</title>
<style>
 body { font: 14px/1.4 system-ui, sans-serif; margin: 2rem;
        color: #1a1a1a; background: #fbfaf9; }
 h1 { font-size: 1.2rem; } h2 { font-size: 1rem; margin-top: 1.5rem; }
 table { border-collapse: collapse; margin-top: .5rem; }
 th, td { border: 1px solid #d9d4cf; padding: .3rem .6rem;
          text-align: right; }
 th { background: #efebe7; } td:first-child, th:first-child
 { text-align: left; }
 #err { color: #a33; }
</style></head><body>
<h1>wally_spark metrics hub</h1>
<div id="err"></div>
<h2>Totals</h2><table id="totals"></table>
<h2>Per-operator state</h2><table id="operators"></table>
<h2>Recent batches</h2><table id="history"></table>
<script>
function fill(id, rows, cols) {
  const t = document.getElementById(id);
  t.innerHTML = "";
  if (!rows.length) { t.innerHTML = "<tr><td>(no data)</td></tr>"; return; }
  const hdr = t.insertRow();
  cols.forEach(c => { const th = document.createElement("th");
                      th.textContent = c; hdr.appendChild(th); });
  rows.forEach(r => { const tr = t.insertRow();
    cols.forEach(c => { tr.insertCell().textContent =
      (typeof r[c] === "number" && !Number.isInteger(r[c]))
        ? r[c].toFixed(2) : (r[c] ?? ""); }); });
}
async function refresh() {
  try {
    const [tot, ops, hist] = await Promise.all(
      ["/totals", "/operators", "/history?limit=20"].map(
        u => fetch(u).then(r => r.json())));
    fill("totals", [tot], Object.keys(tot));
    fill("operators", ops, ops.length ? Object.keys(ops[0]) : []);
    fill("history", hist.slice().reverse(),
         hist.length ? Object.keys(hist[0]) : []);
    document.getElementById("err").textContent = "";
  } catch (e) { document.getElementById("err").textContent = String(e); }
}
refresh(); setInterval(refresh, 2000);
</script></body></html>
"""


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
                if route == "/ui":
                    payload = _UI_HTML.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(payload)))
                    self.end_headers()
                    self.wfile.write(payload)
                    return
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
