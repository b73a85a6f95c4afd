"""REST surface parity (≙ web/web.go:54-116 route table): submit via POST,
poll status, download the CSV artifact, delete."""

import json
import threading
import urllib.request

import pytest

from google_maps_scraper_spark.plans.api import make_server
from google_maps_scraper_spark.plans.jobs import JobRunner
from google_maps_scraper_spark.sources.corpus import corpus_to_spark, generate_corpus

NOW = 1786838400000000


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    corpus = generate_corpus(n_seeds=2, places_per_serp=4, seed=42)
    pages = corpus_to_spark(spark, corpus).localCheckpoint(eager=True)
    runner = JobRunner(
        spark, pages, str(tmp_path_factory.mktemp("apidata")), now_micros=NOW
    )
    srv, stop = make_server(runner)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    queries = [s["query"].split(" #!#")[0] for s in corpus.seeds]
    yield base, runner, queries
    stop.set()
    srv.shutdown()


def _req(method, url, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as r:
            raw = r.read()
            return r.status, raw, dict(r.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)


def test_rest_job_lifecycle(served):
    base, runner, queries = served
    code, raw, headers = _req(
        "POST", f"{base}/api/v1/jobs",
        {"name": "api-job", "keywords": queries, "email": True},
    )
    assert code == 201
    job = json.loads(raw)
    jid = job["id"]
    assert headers["Location"].endswith(jid)
    assert job["status"] == "pending"

    code, raw, _ = _req("GET", f"{base}/api/v1/jobs")
    assert code == 200 and any(j["id"] == jid for j in json.loads(raw))

    runner.run_pending()  # the work-loop tick

    code, raw, _ = _req("GET", f"{base}/api/v1/jobs/{jid}")
    assert code == 200 and json.loads(raw)["status"] == "ok"

    code, raw, headers = _req("GET", f"{base}/api/v1/jobs/{jid}/download")
    assert code == 200
    assert headers["Content-Type"] == "text/csv"
    assert raw.startswith(b"input_id,link,title,")

    code, _, _ = _req("DELETE", f"{base}/api/v1/jobs/{jid}")
    assert code == 204
    code, _, _ = _req("GET", f"{base}/api/v1/jobs/{jid}")
    assert code == 404
    code, _, _ = _req("GET", f"{base}/api/v1/jobs/{jid}/download")
    assert code == 404


def test_rest_validation(served):
    base, _, _ = served
    code, _, _ = _req("POST", f"{base}/api/v1/jobs", {"keywords": []})
    assert code == 422
    code, _, _ = _req("POST", f"{base}/api/v1/jobs/nope", {"keywords": ["x"]})
    assert code == 404
    code, _, _ = _req("GET", f"{base}/api/v1/jobs/unknown-id")
    assert code == 404


def test_html_ui_form_submit_and_job_table(served):
    """HTML UI slice (≙ web/web.go:53-69 `/`, `/scrape`, `/jobs`): the form
    path must create a real job that runs to ok and shows in the rendered
    job table, and /api/docs must serve an OpenAPI document."""
    import urllib.parse

    base, runner, queries = served

    # landing page renders the submit form + job table
    code, raw, headers = _req("GET", f"{base}/")
    assert code == 200 and headers["Content-Type"].startswith("text/html")
    assert b'action="/scrape"' in raw and b'<table id="jobs"' in raw

    # form POST → 303 back to the job list (no JSON client involved)
    form = urllib.parse.urlencode(
        {"name": "ui-job", "keywords": "\n".join(queries), "lang": "en",
         "depth": "10", "zoom": "15", "radius": "10000"}
    ).encode()
    req = urllib.request.Request(f"{base}/scrape", data=form, method="POST")
    req.add_header("Content-Type", "application/x-www-form-urlencoded")

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, *a, **k):
            return None

    opener = urllib.request.build_opener(_NoRedirect)
    try:
        r = opener.open(req)
        code, headers = r.status, dict(r.headers)
    except urllib.error.HTTPError as e:
        code, headers = e.code, dict(e.headers)
    assert code == 303 and headers["Location"] == "/"

    jobs = [j for j in runner.all() if j.name == "ui-job"]
    assert len(jobs) == 1 and jobs[0].data.keywords == queries

    runner.run_pending()
    code, raw, _ = _req("GET", f"{base}/jobs")
    assert code == 200
    assert b"ui-job" in raw and b">ok<" in raw

    # missing keywords → 422, no job created
    req = urllib.request.Request(
        f"{base}/scrape", data=b"keywords=", method="POST"
    )
    req.add_header("Content-Type", "application/x-www-form-urlencoded")
    try:
        r = opener.open(req)
        code = r.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 422

    code, raw, _ = _req("GET", f"{base}/api/docs")
    assert code == 200
    docs = json.loads(raw)
    assert docs["openapi"].startswith("3.") and "/api/v1/jobs" in docs["paths"]


def test_rest_body_validation_non_dict_and_bad_types(served):
    """Round-3 ADVICE: a valid-JSON non-object body or type-mismatched
    fields must come back 400/422, not kill the handler thread."""
    base, _, _ = served
    for bad in ([1], "x", 7, True):
        code, raw, _ = _req("POST", f"{base}/api/v1/jobs", bad)
        assert code == 400, (bad, raw)
    for payload in (
        {"keywords": "not-a-list"},
        {"keywords": ["ok"], "depth": "10"},
        {"keywords": ["ok"], "email": "yes"},
        {"keywords": ["ok"], "zoom": True},
        {"keywords": [1, 2]},
    ):
        code, raw, _ = _req("POST", f"{base}/api/v1/jobs", payload)
        assert code == 422, (payload, raw)
    # the server is still alive and serving after every rejection
    code, _, _ = _req("GET", f"{base}/api/v1/jobs")
    assert code == 200


def test_html_download_and_delete_routes(served):
    """≙ web.go:55-64: the HTML-side /download?id= and /delete?id= routes
    (round-3 ADVICE route-parity gap)."""
    base, runner, queries = served
    code, raw, _ = _req(
        "POST", f"{base}/api/v1/jobs", {"name": "dl-job", "keywords": queries[:1]}
    )
    assert code == 201
    jid = json.loads(raw)["id"]
    runner.run_pending()

    # job table links through the HTML routes
    code, raw, _ = _req("GET", f"{base}/jobs")
    assert f'/download?id={jid}'.encode() in raw
    assert f'/delete?id={jid}'.encode() in raw

    code, raw, headers = _req("GET", f"{base}/download?id={jid}")
    assert code == 200 and headers["Content-Type"] == "text/csv"
    assert raw.startswith(b"input_id,link,title,")
    code, _, _ = _req("GET", f"{base}/download?id=missing")
    assert code == 404

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, *a, **k):
            return None

    opener = urllib.request.build_opener(_NoRedirect)
    try:
        r = opener.open(f"{base}/delete?id={jid}")
        code, headers = r.status, dict(r.headers)
    except urllib.error.HTTPError as e:
        code, headers = e.code, dict(e.headers)
    assert code == 303 and headers["Location"] == "/"
    code, _, _ = _req("GET", f"{base}/api/v1/jobs/{jid}")
    assert code == 404
