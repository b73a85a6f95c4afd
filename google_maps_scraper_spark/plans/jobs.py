"""Multi-job web-runner analog: a job-parameters table driving engine passes.

≙ the reference's web/REST mode (runner/webrunner/webrunner.go:39-260 +
web/job.go:55-110): users submit job configs (keywords, lang, zoom, lat/lon,
fast_mode, radius, depth, email, extra_reviews, max_time), a work loop picks
up pending jobs oldest-first, flips status pending→working→ok/failed, and
writes one CSV artifact per job at ``<data_dir>/<job_id>.csv``
(webrunner.go:154).  The reference persists jobs in sqlite (web/sqlite.go);
here the store is a JSON file in the data dir — same driver-side metadata
role, no distributed state (job DATA flows through Spark; job METADATA is
a handful of rows).

Reference behaviors preserved:
  * empty keywords ⇒ immediate ``failed`` (webrunner.go:150-154);
  * radius ≤ 0 defaults to 10 km (webrunner.go:183-189);
  * per-job deadline ``max(60, seeds·10·depth/50 + 120)`` seconds, overridden
    by max_time (≥180 floor) — enforced as a wall-clock check between crawl
    rounds (webrunner.go:223-236; our rounds replace scrapemate's job loop);
  * jobs run one at a time, oldest pending first (SelectPending order).
"""

from __future__ import annotations

import datetime as dt
import glob
import json
import os
import shutil
import tempfile
import threading
import time
import uuid
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession

__all__ = ["JobData", "Job", "JobRunner", "STATUS_PENDING", "STATUS_WORKING",
           "STATUS_OK", "STATUS_FAILED"]

STATUS_PENDING = "pending"   # ≙ web/job.go:12-15
STATUS_WORKING = "working"
STATUS_OK = "ok"
STATUS_FAILED = "failed"


@dataclass
class JobData:
    """≙ web.JobData (web/job.go:63-76); proxies dropped (no live fetch)."""

    keywords: list[str] = field(default_factory=list)
    lang: str = "en"
    zoom: int = 15
    lat: str = ""
    lon: str = ""
    fast_mode: bool = False
    radius: int = 10_000
    depth: int = 10
    email: bool = False
    extra_reviews: bool = False
    max_time_sec: int = 0


@dataclass
class Job:
    id: str
    name: str
    status: str
    date: str            # ISO creation timestamp (ordering key)
    data: JobData

    def to_dict(self) -> dict:
        d = asdict(self)
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "Job":
        return cls(
            id=d["id"], name=d["name"], status=d["status"], date=d["date"],
            data=JobData(**d["data"]),
        )


class JobRunner:
    """Job store + work loop over a pages DataFrame."""

    def __init__(self, spark: SparkSession, pages: DataFrame, data_dir: str,
                 now_micros: int | None = None):
        self.spark = spark
        self.pages = pages
        self.data_dir = data_dir
        self.now_micros = now_micros
        # One lock guards ALL job-store mutations (the dict + jobs.json) —
        # shared with the HTTP handlers (round-3 ADVICE: the work loop used
        # to call run_pending() outside the handler lock, so a concurrent
        # POST/DELETE could mutate the dict while _persist iterated it,
        # killing the worker thread).  RLock: store methods call each other.
        # The long Spark runs themselves execute OUTSIDE the lock.
        self.lock = threading.RLock()
        os.makedirs(data_dir, exist_ok=True)
        self._store = os.path.join(data_dir, "jobs.json")
        self._jobs: dict[str, Job] = {}
        if os.path.exists(self._store):
            for d in json.load(open(self._store)):
                self._jobs[d["id"]] = Job.from_dict(d)

    # ---- store (≙ web.Service Create/Get/Delete/SelectPending/Update) -----

    def _persist(self) -> None:
        with self.lock:
            tmp = self._store + ".tmp"
            with open(tmp, "w") as f:
                json.dump([j.to_dict() for j in self._jobs.values()], f, indent=2)
            os.replace(tmp, self._store)

    def submit(self, data: JobData, name: str = "", job_id: str | None = None) -> str:
        jid = job_id or str(uuid.uuid4())
        with self.lock:
            self._jobs[jid] = Job(
                id=jid, name=name or jid[:8], status=STATUS_PENDING,
                date=dt.datetime.now(dt.timezone.utc).isoformat(), data=data,
            )
            self._persist()
        return jid

    def get(self, job_id: str) -> Job:
        with self.lock:
            return self._jobs[job_id]

    def delete(self, job_id: str) -> None:
        with self.lock:
            self._jobs.pop(job_id, None)
            self._persist()
        csv = self.csv_path(job_id)
        if os.path.exists(csv):
            os.remove(csv)

    def all(self) -> list[Job]:
        with self.lock:
            return sorted(self._jobs.values(), key=lambda j: j.date)

    def select_pending(self) -> list[Job]:
        return [j for j in self.all() if j.status == STATUS_PENDING]

    def csv_path(self, job_id: str) -> str:
        return os.path.join(self.data_dir, f"{job_id}.csv")

    # ---- work loop ---------------------------------------------------------

    def run_pending(self) -> list[Job]:
        """One pass over pending jobs, oldest first (≙ webrunner.work's tick
        body).  Returns the jobs it touched."""
        touched = []
        for job in self.select_pending():
            self._scrape_job(job)
            touched.append(job)
        return touched

    def _set_status(self, job: Job, status: str) -> None:
        with self.lock:
            job.status = status
            self._persist()

    def _scrape_job(self, job: Job) -> None:
        """≙ webrunner.scrapeJob (webrunner.go:140-260)."""
        self._set_status(job, STATUS_WORKING)
        if not job.data.keywords:
            self._set_status(job, STATUS_FAILED)
            return
        try:
            if job.data.fast_mode:
                self._run_fast(job)
            else:
                self._run_crawl(job)
        except Exception:
            self._set_status(job, STATUS_FAILED)
            return
        self._set_status(job, STATUS_OK)

    def _deadline_sec(self, job: Job, n_seeds: int) -> int:
        # webrunner.go:223-236
        allowed = max(60, n_seeds * 10 * job.data.depth // 50 + 120)
        if job.data.max_time_sec > 0:
            allowed = max(180, job.data.max_time_sec)
        return allowed

    def _run_crawl(self, job: Job) -> None:
        from .crawl import CrawlConfig, CrawlEngine

        seeds = [(kw, "") for kw in job.data.keywords]
        kwargs = dict(
            extract_email=job.data.email,
            extra_reviews=job.data.extra_reviews,
            max_depth=job.data.depth,
            lang=job.data.lang,
        )
        if self.now_micros is not None:
            kwargs["now_micros"] = self.now_micros
        cfg = CrawlConfig(**kwargs)
        deadline = time.monotonic() + self._deadline_sec(job, len(seeds))
        with tempfile.TemporaryDirectory(prefix=f"job-{job.id}-") as wd:
            eng = CrawlEngine(self.spark, self.pages, wd, cfg)
            eng.seed_from_queries(seeds)
            for _ in range(cfg.max_rounds):
                stats = eng.run_round()
                if stats.get("done"):
                    break
                if time.monotonic() > deadline:
                    break  # deadline hit: keep what completed (≙ ctx timeout)
            eng.finalize()
            write_single_csv(eng.results, self.csv_path(job.id))

    def _run_fast(self, job: Job) -> None:
        from .fast import FastSearchConfig, FastSearchEngine

        cfg = FastSearchConfig(
            lat=float(job.data.lat or 0.0),
            lon=float(job.data.lon or 0.0),
            zoom=float(job.data.zoom),
            # webrunner.go:183-189: radius ≤ 0 defaults to 10 km
            radius_m=float(job.data.radius if job.data.radius > 0 else 10_000),
            lang=job.data.lang,
        )
        from pyspark.sql import functions as F

        eng = FastSearchEngine(self.spark, self.pages, cfg)
        out = eng.run([(kw, "") for kw in job.data.keywords])
        # CSV cells are scalars: render array columns the way the reference's
        # stringSliceToString does (", " join — gmaps/entry.go:904-906)
        for f_ in out.schema.fields:
            if f_.dataType.typeName() == "array":
                out = out.withColumn(f_.name, F.array_join(f_.name, ", "))
        _write_single_file(
            out.orderBy("seed_id", "rank").coalesce(1)
            .write.option("header", "true").mode("overwrite"),
            "csv",
            self.csv_path(job.id),
        )


def write_single_csv(results: DataFrame, dest: str) -> None:
    """36-column CSV as ONE file at ``dest`` (≙ the per-job csv artifact the
    reference streams to data/<id>.csv).  Spark writes a directory of parts;
    per-job artifacts are small by construction, so coalesce(1) + move."""
    from ..operators.csv_sink import results_to_csv_df

    df = (
        results_to_csv_df(results)
        .orderBy("input_id", "_sort_url")
        .drop("_sort_url")
        .coalesce(1)
    )
    _write_single_file(
        df.write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false"),
        "csv",
        dest,
    )


def _write_single_file(writer, fmt: str, dest: str) -> None:
    tmpdir = dest + ".spark-tmp"
    getattr(writer, fmt)(tmpdir)
    parts = sorted(glob.glob(os.path.join(tmpdir, f"part-*.{fmt}")))
    if not parts:  # zero-row result still gets an artifact (header-less)
        open(dest, "wb").close()
    else:
        shutil.move(parts[0], dest)
    shutil.rmtree(tmpdir, ignore_errors=True)
