"""Web-job-mode analog: status transitions + per-job CSV artifacts
(≙ runner/webrunner/webrunner.go:92-260, web/job.go:55-110)."""

import pytest

from google_maps_scraper_spark.plans.jobs import (
    STATUS_FAILED,
    STATUS_OK,
    STATUS_PENDING,
    JobData,
    JobRunner,
    write_single_csv,
)
from google_maps_scraper_spark.sources.corpus import corpus_to_spark, generate_corpus

NOW = 1786838400000000


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(n_seeds=4, places_per_serp=6, seed=42)


@pytest.fixture(scope="module")
def pages_df(spark, corpus):
    return corpus_to_spark(spark, corpus).localCheckpoint(eager=True)


def _queries(corpus):
    return [s["query"].split(" #!#")[0] for s in corpus.seeds]


def test_two_jobs_statuses_and_artifacts(spark, corpus, pages_df, tmp_path):
    qs = _queries(corpus)
    runner = JobRunner(spark, pages_df, str(tmp_path / "data"), now_micros=NOW)
    j1 = runner.submit(JobData(keywords=qs[:2], email=True), name="first")
    j2 = runner.submit(JobData(keywords=qs[2:4]), name="second")
    assert [j.id for j in runner.select_pending()] == [j1, j2]

    touched = runner.run_pending()
    assert [j.status for j in touched] == [STATUS_OK, STATUS_OK]
    assert runner.select_pending() == []

    import os
    for jid in (j1, j2):
        p = runner.csv_path(jid)
        assert os.path.exists(p) and os.path.getsize(p) > 0

    # store survives a process restart (new runner over the same data dir)
    runner2 = JobRunner(spark, pages_df, str(tmp_path / "data"), now_micros=NOW)
    assert {j.id: j.status for j in runner2.all()} == {j1: STATUS_OK, j2: STATUS_OK}


def test_job_csv_byte_matches_direct_engine_run(spark, corpus, pages_df, tmp_path):
    """The per-job CSV must byte-match a direct single-engine run with the
    same config (the job layer adds orchestration, not semantics)."""
    import tempfile

    from google_maps_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine

    qs = _queries(corpus)
    runner = JobRunner(spark, pages_df, str(tmp_path / "data"), now_micros=NOW)
    jid = runner.submit(JobData(keywords=qs[:2], email=True))
    runner.run_pending()
    job_bytes = open(runner.csv_path(jid), "rb").read()

    with tempfile.TemporaryDirectory() as wd:
        eng = CrawlEngine(
            spark, pages_df, wd,
            CrawlConfig(extract_email=True, now_micros=NOW),
        )
        eng.seed_from_queries([(q, "") for q in qs[:2]])
        eng.run()
        direct = str(tmp_path / "direct.csv")
        write_single_csv(eng.results, direct)
    assert job_bytes == open(direct, "rb").read()
    assert job_bytes.startswith(b"input_id,link,title,")


def test_empty_keywords_fails(spark, pages_df, tmp_path):
    runner = JobRunner(spark, pages_df, str(tmp_path / "data"), now_micros=NOW)
    jid = runner.submit(JobData(keywords=[]))
    runner.run_pending()
    assert runner.get(jid).status == STATUS_FAILED


def test_fast_mode_job(spark, tmp_path):
    import os

    from google_maps_scraper_spark.sources.corpus import generate_fast_corpus

    corpus = generate_fast_corpus(n_seeds=2, seed=7)
    pages_df = corpus_to_spark(spark, corpus)
    runner = JobRunner(spark, pages_df, str(tmp_path / "data"))
    qs = [s["query"] for s in corpus.seeds]
    jid = runner.submit(
        JobData(keywords=qs, fast_mode=True, lat="37.9838", lon="23.7275", zoom=15)
    )
    runner.run_pending()
    job = runner.get(jid)
    assert job.status == STATUS_OK
    p = runner.csv_path(jid)
    assert os.path.exists(p) and os.path.getsize(p) > 0
