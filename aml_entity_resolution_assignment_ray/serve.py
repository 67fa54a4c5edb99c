"""Minimal online serving shim over the probe pipeline — the last
reference surface (reference api.py:219-394 FastAPI ``POST /resolve`` /
``GET /health`` + Prometheus middleware api.py:33-36, 376-378).

This environment ships no FastAPI/uvicorn, so the HTTP layer is stdlib
``http.server`` (ThreadingHTTPServer); the resolution semantics are the
SAME code path the batch engine uses — ``pipelines/probe.resolve_record``
(normalize -> blocking-key semi-join -> feature + cascade scoring ->
rank -> NID dedup -> identity-conflict flag) — and the response shape
mirrors the reference's Pydantic models exactly:

* ``ResolutionResponse``: status / matches / best_match /
  candidates_checked / processing_time_ms       (api.py:64-69)
* ``MatchResult``: candidate_id / match_type / confidence_score /
  ml_probability / scores / explanation list     (api.py:55-62)
* ``MatchScores``: name / national_id / email / phone / address
  (name = mean of first/last scores, api.py:331-337)
* ``GET /health`` -> {"status": "ok", "model_loaded": bool}
  (api.py:392-394)
* ``GET /metrics`` -> request count + latency sum in Prometheus text
  exposition (the ST3 counters, api.py:33-36).

A batch engine is not a service; this shim exists so a reference user
porting their deployment has a drop-in `/resolve` endpoint to point
smoke tests at.  It is deliberately single-process: real serving would
put the profiles/key Datasets behind replicated processes.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd

from .config import DEFAULT_CONFIG, EngineConfig
from .pipelines.probe import resolve_record


class ResolveService:
    """Holds the loaded state (normalized profiles + key table Datasets,
    config) once per process — the reference's startup hook (api.py:
    86-150 loads model + LSH pickle) — and serves resolve requests."""

    def __init__(self, norm_profiles, keys, cfg: EngineConfig = DEFAULT_CONFIG,
                 limit: int = 50):
        self.norm_profiles = norm_profiles.materialize()
        self.keys = keys.materialize()
        self.cfg = cfg
        self.limit = limit
        self.request_count = 0
        self.latency_sum = 0.0
        self._lock = threading.Lock()
        # Ray Data execution is not documented thread-safe, and
        # ThreadingHTTPServer gives each POST its own thread: serialize
        # the Ray-driving section so concurrent /resolve requests can't
        # race the streaming executor.  Metrics keep the finer _lock.
        self._resolve_lock = threading.Lock()

    # -- response assembly (reference api.py:297-385) --

    @staticmethod
    def _match_result(row: pd.Series) -> dict:
        expl = str(row.get("explanation") or "")
        return {
            "candidate_id": str(row["conv_id"]),
            "match_type": str(row["match_type"]),
            "confidence_score": float(row["confidence_score"]),
            "ml_probability": float(row.get("ml_prob", 0.0)),
            "scores": {
                "name": (float(row.get("first_name_score", 0.0))
                         + float(row.get("last_name_score", 0.0))) / 2,
                "national_id": float(row.get("nid_score", 0.0)),
                "email": float(row.get("email_score", 0.0)),
                "phone": float(row.get("phone_match", 0.0)),
                "address": float(row.get("addr_score", 0.0)),
            },
            "explanation": expl.split("; ") if expl else [],
        }

    def resolve(self, record: dict) -> dict:
        t0 = time.time()
        with self._resolve_lock:
            scored = resolve_record(record, self.norm_profiles, self.keys,
                                    self.cfg, limit=self.limit)
        if len(scored):
            potential = scored[scored["match_type"].isin(["match", "review"])]
            matches = [self._match_result(r) for _, r in potential.iterrows()]
        else:
            matches = []
        status = matches[0]["match_type"] if matches else "no_match"
        dt = time.time() - t0
        with self._lock:
            self.request_count += 1
            self.latency_sum += dt
        return {
            "status": status,
            "matches": matches,
            "best_match": matches[0] if matches else None,
            "candidates_checked": int(len(scored)),
            "processing_time_ms": dt * 1000.0,
        }

    def health(self) -> dict:
        return {"status": "ok", "model_loaded": bool(self.cfg.model_path)}

    def metrics_text(self) -> str:
        with self._lock:
            return (
                "# TYPE er_requests_total counter\n"
                f"er_requests_total {self.request_count}\n"
                "# TYPE er_request_latency_seconds_sum counter\n"
                f"er_request_latency_seconds_sum {self.latency_sum:.6f}\n"
            )


def _make_handler(service: ResolveService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet: tests drive this in-process
            pass

        def _send(self, code: int, body: bytes,
                  ctype: str = "application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, json.dumps(service.health()).encode())
            elif self.path == "/metrics":
                self._send(200, service.metrics_text().encode(),
                           ctype="text/plain; version=0.0.4")
            else:
                self._send(404, b'{"detail": "not found"}')

        def do_POST(self):
            if self.path != "/resolve":
                self._send(404, b'{"detail": "not found"}')
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                record = json.loads(self.rfile.read(n) or b"{}")
                resp = service.resolve(record)
                self._send(200, json.dumps(resp).encode())
            except Exception as e:  # reference api.py:388-390 -> HTTP 500
                self._send(500, json.dumps({"detail": str(e)}).encode())

    return Handler


def start_server(service: ResolveService, host: str = "127.0.0.1",
                 port: int = 0) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Bind and serve on a background thread; ``port=0`` picks a free
    port (``server.server_address[1]``).  Caller owns shutdown()."""
    server = ThreadingHTTPServer((host, port), _make_handler(service))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, thread
