"""S6: thin HTTP event collector in front of the streaming ingest
(reference cluster/storage/flume.yaml:12-20 — Flume's `http` source on
a port, feeding a memory channel drained by sinks).

Spark has no built-in HTTP streaming source, and a long-lived socket
does not belong inside an executor (tasks are transient and
re-schedulable), so the Flume topology maps onto Spark as:

    HTTP POST -> collector (this module, driver-side/edge process)
              -> spool dir of atomically-placed JSON files   (channel)
              -> spark.readStream file source (schema-applied)
              -> the standard ingest transforms + checkpointed sink

The spool directory IS the channel: each accepted request body becomes
ONE file, written to a hidden temp name and `os.rename`d into place,
because Spark's file source lists whole files — a half-written file
must never be visible (the same temp+rename discipline the sinks use).
Delivery is at-least-once end-to-end: the collector acks 204 only
after the rename, and the downstream content-hash dedup (T5/T6)
absorbs client retries, exactly like the reference's Redis-hash gate
behind its Flume front.

At scale this process is a stateless edge tier (N instances behind a
load balancer, each spooling to shared storage); capacity knobs map to
Flume's channel capacity via `max_body_bytes` + filesystem headroom
rather than an in-memory queue that loses events on crash.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class HttpCollector:
    """Minimal HTTP->spool collector (stdlib only).

    POST /ingest with a JSON body (one object, or NDJSON lines —
    Flume's http source also takes event batches per request) lands as
    one spool file; anything else is a 4xx. GET /healthz serves a
    load-balancer probe. Start/stop are idempotent; the server runs on
    a daemon thread so tests and drivers shut down cleanly.
    """

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        max_body_bytes: int = 1 << 20,
    ) -> None:
        self.spool_dir = spool_dir
        self.max_body_bytes = max_body_bytes
        os.makedirs(spool_dir, exist_ok=True)
        collector = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet: tests drive this
                pass

            def do_GET(self):
                if self.path == "/healthz":
                    self.send_response(200)
                    self.end_headers()
                    self.wfile.write(b"ok")
                else:
                    self.send_response(404)
                    self.end_headers()

            def do_POST(self):
                if self.path != "/ingest":
                    self.send_response(404)
                    self.end_headers()
                    return
                length = int(self.headers.get("Content-Length", 0))
                if length <= 0 or length > collector.max_body_bytes:
                    self.send_response(413 if length else 400)
                    self.end_headers()
                    return
                body = self.rfile.read(length)
                try:
                    lines = collector._validate(body)
                except ValueError:
                    self.send_response(400)
                    self.end_headers()
                    return
                collector._spool(lines)
                self.send_response(204)  # acked AFTER the rename
                self.end_headers()

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    @property
    def url(self) -> str:
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}/ingest"

    def _validate(self, body: bytes) -> list[bytes]:
        """JSON object or NDJSON of objects -> list of JSON lines;
        ValueError on anything else (the 400 path — a malformed event
        is the CLIENT's bug and must not reach the spool)."""
        lines = [ln for ln in body.strip().split(b"\n") if ln.strip()]
        if not lines:
            raise ValueError("empty body")
        for ln in lines:
            if not isinstance(json.loads(ln), dict):
                raise ValueError("each event must be a JSON object")
        return lines

    def _spool(self, lines: list[bytes]) -> None:
        """One request -> one atomically-placed NDJSON file. Hidden
        temp name first: Spark's file listing must never see a
        half-written file."""
        name = uuid.uuid4().hex + ".json"
        tmp = os.path.join(self.spool_dir, "." + name + ".tmp")
        with open(tmp, "wb") as fh:
            fh.write(b"\n".join(lines) + b"\n")
        os.rename(tmp, os.path.join(self.spool_dir, name))

    def start(self) -> "HttpCollector":
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._server.serve_forever, daemon=True
            )
            self._thread.start()
        return self

    def stop(self) -> None:
        if self._thread is not None:
            self._server.shutdown()
            self._server.server_close()
            self._thread = None
