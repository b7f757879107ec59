"""In-process observability HTTP service.

The reference runs an optional HTTP server inside the native engine for
live profiling and metrics (auron/src/http/mod.rs:58-80 random-port bind;
http/pprof.rs:51-90 CPU flamegraphs with seconds/frequency params;
http/memory_profiling.rs jemalloc heap dumps; metrics push-back
auron/src/metrics.rs:9-45). This is the TPU-native analog: the profiler
is jax.profiler (XLA traces viewable in TensorBoard/Perfetto — the
device-time truth, which a CPU pprof can't see), metrics are the
session's per-operator counters, and config is the typed registry.

Endpoints:
  GET /metrics            per-operator metrics (JSON)
  GET /config             every config option's current value (JSON)
  GET /profile?seconds=N  capture a jax.profiler trace; returns the
                          trace directory path (default 3 s)
  GET /status             liveness + device inventory

Usage:
    from auron_tpu.runtime.http import start_observability
    srv = start_observability(session)        # random free port
    ... srv.url, srv.shutdown()
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse


@dataclass
class ObservabilityServer:
    httpd: ThreadingHTTPServer
    thread: threading.Thread
    port: int

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.thread.join(timeout=5)
        self.httpd.server_close()


def _metrics_json(session) -> dict:
    out = {}
    for key, m in getattr(session, "metrics", {}).items():
        out[key] = {k: v for k, v in m.items()
                    if isinstance(v, (int, float, str))}
    return out


def _config_json() -> dict:
    from auron_tpu import config
    out = {}
    for key, opt in sorted(config._REGISTRY.items()):
        if key != opt.key:
            continue  # alt-key alias
        try:
            out[opt.key] = config.conf.get(opt)
        except Exception:
            out[opt.key] = None
    return out


def _profile(seconds: float, summary: bool = False):
    import tempfile
    import time

    import jax

    d = tempfile.mkdtemp(prefix="auron_tpu_trace_")
    jax.profiler.start_trace(d)
    time.sleep(min(max(seconds, 0.1), 60.0))
    jax.profiler.stop_trace()
    if not summary:
        return {"trace_dir": d}
    # measured feedback loop (runtime/roofline.py): fold the captured
    # device events onto plan operators and report against the STREAM-
    # measured peak, so the endpoint answers "which op, how far from
    # light" instead of handing back a directory
    from auron_tpu.runtime import roofline
    parsed = roofline.parse_trace_dir(d)
    return {"trace_dir": d,
            "measured_peak_gbps": round(
                roofline.measured_peak_bps() / 1e9, 2),
            "ops": roofline.op_summary(parsed)}


def start_observability(session=None, port: int = 0
                        ) -> ObservabilityServer:
    """Bind a random (or given) local port and serve observability
    endpoints from a daemon thread. Never blocks query execution."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload) -> None:
            body = json.dumps(payload, indent=2,
                              default=str).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API name)
            u = urlparse(self.path)
            try:
                if u.path == "/metrics":
                    self._send(200, _metrics_json(session)
                               if session is not None else {})
                elif u.path == "/config":
                    self._send(200, _config_json())
                elif u.path == "/profile":
                    q = parse_qs(u.query)
                    secs = float(q.get("seconds", ["3"])[0])
                    summ = q.get("summary", ["0"])[0] not in ("0", "")
                    self._send(200, _profile(secs, summary=summ))
                elif u.path == "/memory":
                    mb = getattr(session, "memory_budget", None)
                    self._send(200, {
                        "report": mb.dump_status() if mb else
                        "no memory budget registered"})
                elif u.path == "/status":
                    import jax
                    self._send(200, {
                        "ok": True,
                        "backend": jax.default_backend(),
                        "devices": [str(d) for d in jax.devices()]})
                elif u.path == "/cancel":
                    # task-kill endpoint (reference: Spark task kill ->
                    # native runtime teardown); cooperative, takes effect
                    # at the next plan-node / micro-batch boundary
                    if session is None:
                        self._send(400, {"error": "no session attached"})
                    else:
                        session.cancel("cancelled via /cancel")
                        self._send(200, {"cancelled": True})
                else:
                    self._send(404, {"error": "unknown endpoint"})
            except Exception as e:  # surface, don't kill the server
                self._send(500, {"error": repr(e)})

    httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True,
                         name="auron-observability")
    t.start()
    return ObservabilityServer(httpd, t, httpd.server_address[1])
