"""REST + HTML surface over JobRunner — the reference's web mode re-expressed.

≙ /root/reference/web/web.go:53-116 route table (README.md:283-289):

    GET    /                           HTML UI: job table + submit form
    POST   /scrape                     form submit → create job → 303 to /
    GET    /jobs                       HTML job-table fragment
    GET    /download?id={id}           HTML-side CSV download (web.go:55-59)
    GET    /delete?id={id}             HTML-side delete → 303 to / (web.go:60-64)
    GET    /api/docs                   OpenAPI document (JSON)
    POST   /api/v1/jobs                create a job (201 + Location header)
    GET    /api/v1/jobs                list jobs
    GET    /api/v1/jobs/{id}           fetch one job
    DELETE /api/v1/jobs/{id}           delete job + its CSV artifact
    GET    /api/v1/jobs/{id}/download  stream the per-job CSV

The reference's remaining HTML route, ``/static/`` (embedded asset files,
web.go:53), is intentionally out of scope: this surface embeds no static
assets — the page above is self-contained HTML.

Stdlib ``http.server`` only (no web framework in the sandbox) — the API is
driver-side control plane; all data work stays in Spark via JobRunner.  The
work loop (≙ webrunner.work's 1 s ticker) runs on a background thread when
the server is started with ``serve(..., work_interval=...)``; tests drive
``runner.run_pending()`` directly for determinism.  All handlers share the
RUNNER's store lock (round-3 ADVICE: a handler-local lock left the work
loop racing POST/DELETE against _persist's dict iteration), and the worker
thread survives per-tick errors.
"""

from __future__ import annotations

import html
import json
import logging
import re
import threading
import urllib.parse
from dataclasses import asdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .jobs import JobData, JobRunner

__all__ = ["make_server", "JobApiHandler"]

log = logging.getLogger(__name__)

_JOB_RE = re.compile(r"^/api/v1/jobs/([0-9a-zA-Z-]+)$")
_DL_RE = re.compile(r"^/api/v1/jobs/([0-9a-zA-Z-]+)/download$")

# JobData fields accepted from the POST body, with their required JSON types
# (web/job.go:63-76; max_time is seconds here, proxies dropped — no live
# fetch).  JobData is a plain dataclass (no runtime validation), so the
# handler type-checks here ≙ JobData.Validate (web/job.go:78-110).
_FIELD_TYPES = {
    "keywords": list, "lang": str, "zoom": int, "lat": str, "lon": str,
    "fast_mode": bool, "radius": int, "depth": int, "email": bool,
    "extra_reviews": bool, "max_time_sec": int,
}
_DATA_FIELDS = set(_FIELD_TYPES)


def _type_error(data: dict) -> str | None:
    for k, v in data.items():
        want = _FIELD_TYPES[k]
        if want is int and isinstance(v, bool):
            return f"{k}: expected int, got bool"
        if not isinstance(v, want):
            return f"{k}: expected {want.__name__}, got {type(v).__name__}"
    if any(not isinstance(x, str) for x in data.get("keywords", [])):
        return "keywords: every entry must be a string"
    return None


def _job_json(job) -> dict:
    d = asdict(job)
    return d


# --- HTML UI (≙ web/web.go:53-69 `/`, `/scrape`, `/jobs` + templates) -------

_PAGE = """<!doctype html>
<html><head><title>google maps scraper</title></head>
<body>
<h1>google maps scraper</h1>
<form action="/scrape" method="post">
  <label>Name <input name="name"></label><br>
  <label>Keywords (one per line)<br>
    <textarea name="keywords" rows="4" cols="40"></textarea></label><br>
  <label>Language <input name="lang" value="en" size="4"></label>
  <label>Depth <input name="depth" value="10" size="4"></label>
  <label>Zoom <input name="zoom" value="15" size="4"></label><br>
  <label>Email <input type="checkbox" name="email"></label>
  <label>Extra reviews <input type="checkbox" name="extra_reviews"></label>
  <label>Fast mode <input type="checkbox" name="fast_mode"></label><br>
  <label>Lat <input name="lat" size="10"></label>
  <label>Lon <input name="lon" size="10"></label>
  <label>Radius (m) <input name="radius" value="10000" size="8"></label><br>
  <button type="submit">Scrape</button>
</form>
<h2>Jobs</h2>
{jobs}
<p><a href="/api/docs">API docs</a></p>
</body></html>"""


def _jobs_table(jobs) -> str:
    rows = "".join(
        "<tr><td>{id}</td><td>{name}</td><td>{status}</td><td>{date}</td>"
        '<td><a href="/download?id={id}">csv</a></td>'
        '<td><a href="/delete?id={id}">delete</a></td></tr>'.format(
            id=html.escape(j.id), name=html.escape(j.name),
            status=html.escape(j.status), date=html.escape(j.date),
        )
        for j in jobs
    )
    return (
        '<table id="jobs" border="1"><tr><th>id</th><th>name</th>'
        "<th>status</th><th>date</th><th>artifact</th><th></th></tr>"
        f"{rows}</table>"
    )


_OPENAPI = {
    "openapi": "3.0.3",
    "info": {"title": "google maps scraper job API", "version": "1.0.0"},
    "paths": {
        "/api/v1/jobs": {
            "post": {"summary": "Create a scrape job",
                     "responses": {"201": {"description": "created"},
                                   "422": {"description": "missing keywords"}}},
            "get": {"summary": "List jobs",
                    "responses": {"200": {"description": "job list"}}},
        },
        "/api/v1/jobs/{id}": {
            "get": {"summary": "Fetch one job",
                    "responses": {"200": {"description": "job"},
                                  "404": {"description": "no such job"}}},
            "delete": {"summary": "Delete job + artifact",
                       "responses": {"204": {"description": "deleted"}}},
        },
        "/api/v1/jobs/{id}/download": {
            "get": {"summary": "Download the per-job CSV artifact",
                    "responses": {"200": {"description": "text/csv"},
                                  "404": {"description": "no artifact"}}},
        },
    },
}


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

    def _send_html(self, code: int, body: str, headers: dict | None = None) -> None:
        data = body.encode()
        self.send_response(code)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        if data:
            self.wfile.write(data)

    # --- routes -------------------------------------------------------------

    def do_POST(self):
        path = self.path.split("?")[0].rstrip("/")
        if path == "/scrape":
            return self._post_scrape_form()
        if path != "/api/v1/jobs":
            return self._send(404, {"error": "not found"})
        try:
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
        except (ValueError, json.JSONDecodeError):
            return self._send(400, {"error": "invalid JSON"})
        if not isinstance(body, dict):
            # valid JSON but not an object ([1], "x", ...) — a 400, not an
            # AttributeError that kills the handler thread (round-3 ADVICE)
            return self._send(400, {"error": "body must be a JSON object"})
        data = {k: v for k, v in body.items() if k in _DATA_FIELDS}
        if not data.get("keywords"):
            # ≙ JobData.Validate (web/job.go:78-110): missing keywords
            return self._send(422, {"error": "missing keywords"})
        err = _type_error(data)
        if err is not None:
            # type-mismatched fields ≙ JobData.Validate rejection → 422
            return self._send(422, {"error": f"invalid job data: {err}"})
        jid = self.runner.submit(JobData(**data), name=str(body.get("name") or ""))
        return self._send(
            201, _job_json(self.runner.get(jid)),
            headers={"Location": f"/api/v1/jobs/{jid}"},
        )

    def _post_scrape_form(self):
        """HTML form submit (≙ web.scrape handler, web/web.go:118-175):
        urlencoded fields → JobData → 303 See Other back to the job list."""
        try:
            n = int(self.headers.get("Content-Length", 0))
            form = urllib.parse.parse_qs(self.rfile.read(n).decode())
        except (ValueError, UnicodeDecodeError):
            return self._send_html(400, "<p>bad form</p>")
        kws = [
            k.strip()
            for k in form.get("keywords", [""])[0].splitlines()
            if k.strip()
        ]
        if not kws:
            return self._send_html(422, "<p>missing keywords</p>")

        def _num(field, cast, default):
            try:
                return cast(form.get(field, [default])[0] or default)
            except ValueError:
                return default

        data = JobData(
            keywords=kws,
            lang=form.get("lang", ["en"])[0] or "en",
            zoom=_num("zoom", int, 15),
            lat=form.get("lat", [""])[0],
            lon=form.get("lon", [""])[0],
            fast_mode="fast_mode" in form,
            radius=_num("radius", int, 10_000),
            depth=_num("depth", int, 10),
            email="email" in form,
            extra_reviews="extra_reviews" in form,
        )
        self.runner.submit(data, name=form.get("name", [""])[0])
        return self._send_html(303, "", headers={"Location": "/"})

    def do_GET(self):
        path = self.path.split("?")[0]
        if path == "/" or path.rstrip("/") == "":
            return self._send_html(
                200, _PAGE.format(jobs=_jobs_table(self.runner.all()))
            )
        if path.rstrip("/") == "/jobs":
            return self._send_html(200, _jobs_table(self.runner.all()))
        # HTML-side download/delete (≙ web.go:55-64: /download?id, /delete?id)
        if path.rstrip("/") in ("/download", "/delete"):
            q = urllib.parse.parse_qs(urllib.parse.urlsplit(self.path).query)
            jid = q.get("id", [""])[0]
            try:
                self.runner.get(jid)
            except KeyError:
                return self._send_html(404, "<p>no such job</p>")
            if path.rstrip("/") == "/delete":
                self.runner.delete(jid)
                return self._send_html(303, "", headers={"Location": "/"})
            return self._stream_csv(jid)
        if path.rstrip("/") == "/api/docs":
            return self._send(200, _OPENAPI)
        if path.rstrip("/") == "/api/v1/jobs":
            return self._send(200, [_job_json(j) for j in self.runner.all()])
        m = _JOB_RE.match(path)
        if m:
            try:
                return self._send(200, _job_json(self.runner.get(m.group(1))))
            except KeyError:
                return self._send(404, {"error": "no such job"})
        m = _DL_RE.match(path)
        if m:
            return self._stream_csv(m.group(1))
        return self._send(404, {"error": "not found"})

    def _stream_csv(self, jid: str):
        """Shared by GET /api/v1/jobs/{id}/download and GET /download?id=."""
        import os

        p = self.runner.csv_path(jid)
        if not os.path.exists(p):
            return self._send(404, {"error": "no artifact"})
        data = open(p, "rb").read()
        self.send_response(200)
        self.send_header("Content-Type", "text/csv")
        self.send_header(
            "Content-Disposition", f'attachment; filename="{jid}.csv"'
        )
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)
        return None

    def do_DELETE(self):
        m = _JOB_RE.match(self.path.split("?")[0])
        if not m:
            return self._send(404, {"error": "not found"})
        self.runner.delete(m.group(1))
        return self._send(204)


def make_server(
    runner: JobRunner, host: str = "127.0.0.1", port: int = 0,
    work_interval: float | None = None,
) -> tuple[ThreadingHTTPServer, threading.Event]:
    """Build (unstarted) HTTP server bound to the runner.  ``port=0`` picks a
    free port (server.server_address[1]).  With ``work_interval`` set, a
    daemon thread polls pending jobs like webrunner.work's ticker; the
    returned Event stops it.

    Store mutations are serialized by the RUNNER's own RLock (held inside
    submit/get/all/delete/_set_status), so handlers and the work loop can
    never interleave a dict mutation with _persist's iteration; the long
    Spark runs execute unlocked.  The loop body is exception-guarded —
    a failing tick logs and retries instead of silently killing the worker
    (round-3 ADVICE)."""
    handler = type(
        "BoundJobApiHandler",
        (JobApiHandler,),
        {"runner": runner, "lock": runner.lock},
    )
    srv = ThreadingHTTPServer((host, port), handler)
    stop = threading.Event()
    if work_interval:
        def loop():
            while not stop.wait(work_interval):
                try:
                    if runner.select_pending():
                        runner.run_pending()
                except Exception:  # keep the worker alive across bad ticks
                    log.exception("job work-loop tick failed; continuing")

        threading.Thread(target=loop, daemon=True).start()
    return srv, stop
