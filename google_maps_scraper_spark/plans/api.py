"""REST surface over JobRunner — the reference's web API re-expressed.

≙ /root/reference/web/web.go:54-116 route table (README.md:283-289):

    POST   /api/v1/jobs                create a job (201 + Location header)
    GET    /api/v1/jobs                list jobs
    GET    /api/v1/jobs/{id}           fetch one job
    DELETE /api/v1/jobs/{id}           delete job + its CSV artifact
    GET    /api/v1/jobs/{id}/download  stream the per-job CSV

Stdlib ``http.server`` only (no web framework in the sandbox) — the API is
driver-side control plane; all data work stays in Spark via JobRunner.  The
work loop (≙ webrunner.work's 1 s ticker) runs on a background thread when
the server is started with ``serve(..., work_interval=...)``; tests drive
``runner.run_pending()`` directly for determinism.
"""

from __future__ import annotations

import json
import re
import threading
from dataclasses import asdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .jobs import JobData, JobRunner

__all__ = ["make_server", "JobApiHandler"]

_JOB_RE = re.compile(r"^/api/v1/jobs/([0-9a-zA-Z-]+)$")
_DL_RE = re.compile(r"^/api/v1/jobs/([0-9a-zA-Z-]+)/download$")

# JobData fields accepted from the POST body (web/job.go:63-76; max_time is
# seconds here, proxies dropped — no live fetch).
_DATA_FIELDS = {
    "keywords", "lang", "zoom", "lat", "lon", "fast_mode", "radius",
    "depth", "email", "extra_reviews", "max_time_sec",
}


def _job_json(job) -> dict:
    d = asdict(job)
    return d


class JobApiHandler(BaseHTTPRequestHandler):
    runner: JobRunner  # injected by make_server
    lock: threading.Lock

    # --- helpers ------------------------------------------------------------

    def _send(self, code: int, payload=None, headers: dict | None = None) -> None:
        body = b"" if payload is None else json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        if body:
            self.wfile.write(body)

    def log_message(self, fmt, *args):  # silence default stderr noise
        pass

    # --- routes -------------------------------------------------------------

    def do_POST(self):
        if self.path.rstrip("/") != "/api/v1/jobs":
            return self._send(404, {"error": "not found"})
        try:
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
        except (ValueError, json.JSONDecodeError):
            return self._send(400, {"error": "invalid JSON"})
        data = {k: v for k, v in body.items() if k in _DATA_FIELDS}
        if not data.get("keywords"):
            # ≙ JobData.Validate (web/job.go:78-110): missing keywords
            return self._send(422, {"error": "missing keywords"})
        with self.lock:
            jid = self.runner.submit(JobData(**data), name=body.get("name", ""))
        return self._send(
            201, _job_json(self.runner.get(jid)),
            headers={"Location": f"/api/v1/jobs/{jid}"},
        )

    def do_GET(self):
        path = self.path.split("?")[0]
        if path.rstrip("/") == "/api/v1/jobs":
            with self.lock:
                return self._send(200, [_job_json(j) for j in self.runner.all()])
        m = _JOB_RE.match(path)
        if m:
            try:
                with self.lock:
                    return self._send(200, _job_json(self.runner.get(m.group(1))))
            except KeyError:
                return self._send(404, {"error": "no such job"})
        m = _DL_RE.match(path)
        if m:
            import os

            p = self.runner.csv_path(m.group(1))
            if not os.path.exists(p):
                return self._send(404, {"error": "no artifact"})
            data = open(p, "rb").read()
            self.send_response(200)
            self.send_header("Content-Type", "text/csv")
            self.send_header(
                "Content-Disposition", f'attachment; filename="{m.group(1)}.csv"'
            )
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
            return None
        return self._send(404, {"error": "not found"})

    def do_DELETE(self):
        m = _JOB_RE.match(self.path.split("?")[0])
        if not m:
            return self._send(404, {"error": "not found"})
        with self.lock:
            self.runner.delete(m.group(1))
        return self._send(204)


def make_server(
    runner: JobRunner, host: str = "127.0.0.1", port: int = 0,
    work_interval: float | None = None,
) -> tuple[ThreadingHTTPServer, threading.Event]:
    """Build (unstarted) HTTP server bound to the runner.  ``port=0`` picks a
    free port (server.server_address[1]).  With ``work_interval`` set, a
    daemon thread polls pending jobs like webrunner.work's ticker; the
    returned Event stops it."""
    handler = type(
        "BoundJobApiHandler",
        (JobApiHandler,),
        {"runner": runner, "lock": threading.Lock()},
    )
    srv = ThreadingHTTPServer((host, port), handler)
    stop = threading.Event()
    if work_interval:
        def loop():
            while not stop.wait(work_interval):
                with handler.lock:
                    pending = bool(runner.select_pending())
                if pending:
                    runner.run_pending()

        threading.Thread(target=loop, daemon=True).start()
    return srv, stop
