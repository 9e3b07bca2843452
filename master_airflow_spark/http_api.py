"""HTTP serving layer — the reference's two price APIs over the engine.

Reference parity: FastAPI + Mongo serves today's high/low
(api/mongo/main.py:63-77) and Flask + Postgres serves the all-time
high/low (api/postgres/api.py:16-33), each opening a fresh DB
connection per request. Here both endpoints share ONE long-lived
SparkSession and call the serving functions in serve.py (single-pass
top-1 plans); the HTTP machinery is the standard library's threading
HTTP server, so the engine adds no web-framework dependency.

Endpoints (JSON, reference response shape):
    GET /prices/today    -> {"highest_price": {...}, "lowest_price": {...}}
    GET /prices/alltime  -> same shape over all dates
    GET /health          -> {"status": "ok"}

Serving note for real deployments: a SparkSession is a fine backend
for analytical endpoints at human request rates (each request is a
~100 ms pre-planned job on a warm session); for high-QPS serving the
same payloads should be periodically materialized to a key-value
store — the write path for that is sinks.writers.write_keyed_upsert.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote, urlsplit

from pyspark.sql import SparkSession

from master_airflow_spark.serve import get_prices_alltime, get_prices_today


def make_handler(spark: SparkSession, sf_dir: str):
    routes = {
        "/prices/today": lambda: get_prices_today(spark, sf_dir),
        "/prices/alltime": lambda: get_prices_alltime(spark, sf_dir),
        "/health": lambda: {"status": "ok"},
    }

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (http.server API)
            # Route on the decoded path component only — query strings
            # (/prices/today?x=1) and %-encoded paths must still match,
            # as the reference's FastAPI/Flask routing tolerates both.
            path = unquote(urlsplit(self.path).path)
            fn = routes.get(path.rstrip("/") or path)
            if fn is None:
                self._send(404, {"error": f"no route {self.path}"})
                return
            try:
                self._send(200, fn())
            except Exception as ex:  # surface, don't swallow
                self._send(500, {"error": repr(ex)})

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # keep test output quiet
            pass

    return Handler


class PriceServer:
    """Threaded HTTP server bound to an ephemeral (or given) port.
    Use as a context manager; ``.port`` is the bound port."""

    def __init__(self, spark: SparkSession, sf_dir: str, port: int = 0):
        self._httpd = ThreadingHTTPServer(
            ("127.0.0.1", port), make_handler(spark, sf_dir)
        )
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    def __enter__(self) -> "PriceServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)
