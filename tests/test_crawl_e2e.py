"""End-to-end crawl: Spark engine vs the sequential oracle.

The oracle enacts the reference's exact scheduling (priority queue drained
(priority ASC, created_at ASC), single-threaded deduper); the Spark engine
must reproduce its URL-seen decisions and its result set byte-identically
(canonical JSON per url — the BASELINE.json invariant)."""

import pytest

from google_maps_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
from google_maps_scraper_spark.plans.oracle import SequentialOracle
from google_maps_scraper_spark.sources.corpus import corpus_to_spark, generate_corpus

NOW = 1786838400000000


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(n_seeds=3, places_per_serp=8, seed=42)


@pytest.fixture(scope="module")
def oracle_out(corpus):
    pages = {p["url"]: p["html"] for p in corpus.pages}
    seeds = [(s["query"].split("#!#")[0].strip(), s["custom_id"]) for s in corpus.seeds]
    return SequentialOracle(pages, extract_email=True, now_micros=NOW).run(seeds)


@pytest.fixture(scope="module")
def engine_out(spark, corpus, tmp_path_factory):
    pages_df = corpus_to_spark(spark, corpus)
    seeds = [(s["query"].split("#!#")[0].strip(), s["custom_id"]) for s in corpus.seeds]
    eng = CrawlEngine(
        spark,
        pages_df,
        str(tmp_path_factory.mktemp("crawl")),
        CrawlConfig(extract_email=True, now_micros=NOW),
    )
    eng.seed_from_queries(seeds)
    counters = eng.run()
    return eng, counters


def test_seen_decisions_match(oracle_out, engine_out):
    eng, _ = engine_out
    spark_seen = {
        (r["url"], r["admitting_parent"])
        for r in eng.seen.select("url", "admitting_parent").collect()
    }
    oracle_admitted = {
        (url, parent) for url, admitted, parent in oracle_out.seen_decisions if admitted
    }
    assert spark_seen == oracle_admitted


def test_results_byte_identical(oracle_out, engine_out):
    eng, _ = engine_out
    spark_results = {
        r["link"]: r["canonical_json"]
        for r in eng.results.select("link", "canonical_json").collect()
    }
    oracle_results = {r["entry"]["link"]: r["canonical_json"] for r in oracle_out.results}
    assert set(spark_results) == set(oracle_results)
    mismatches = {
        k for k in oracle_results if spark_results[k] != oracle_results[k]
    }
    assert not mismatches, f"canonical JSON mismatch for {sorted(mismatches)[:3]}"


def test_counters_consistent(oracle_out, engine_out):
    eng, counters = engine_out
    # every seed SERP processed; no place/email left unclaimed
    assert counters.get("search_new", 0) == 0
    assert counters.get("place_new", 0) == 0
    assert counters.get("email_new", 0) == 0
    assert counters["results"] == len(oracle_out.results)
    assert counters["seen"] == len(
        {u for u, admitted, _ in oracle_out.seen_decisions if admitted}
    )


def test_emails_match(oracle_out, engine_out):
    eng, _ = engine_out
    spark_emails = {
        r["link"]: tuple(r["emails"] or [])
        for r in eng.results.select("link", "emails").collect()
    }
    for res in oracle_out.results:
        want = tuple(res["entry"].get("emails") or [])
        assert spark_emails[res["entry"]["link"]] == want


def test_bfs_rounds(engine_out):
    eng, counters = engine_out
    # 2-hop graph with email hop: search→place→email enter rounds 1/2/3;
    # failed jobs (malformed pages) may be re-claimed in later retry rounds
    # (≙ MaxRetries requeue, gmaps/job.go:57), so only the FIRST claim round
    # per kind is structural.
    assert counters["round"] >= 3
    rows = eng.frontier.select("kind", "round_claimed").collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], set()).add(r["round_claimed"])
    assert min(by_kind["search"]) == 1
    assert min(by_kind["place"]) == 2
    assert min(by_kind.get("email", {3})) == 3
    # successful jobs complete at their BFS round; only failures repeat
    done_rounds = {
        r["kind"]: r["rc"]
        for r in eng.frontier.filter("status = 'done'")
        .groupBy("kind").agg({"round_claimed": "max"})
        .withColumnRenamed("max(round_claimed)", "rc").collect()
    }
    assert done_rounds["search"] == 1
    assert done_rounds["place"] == 2
    assert done_rounds.get("email", 3) == 3


def test_resume_equivalence(spark, corpus, tmp_path_factory, engine_out):
    """Kill-and-resume parity: stop after round 1, resume in a fresh engine,
    final results equal the uninterrupted run (FIXTURES.md §4 resume check)."""
    eng_full, _ = engine_out
    pages_df = corpus_to_spark(spark, corpus)
    seeds = [(s["query"].split("#!#")[0].strip(), s["custom_id"]) for s in corpus.seeds]
    wd = str(tmp_path_factory.mktemp("resume"))
    cfg = CrawlConfig(extract_email=True, now_micros=NOW)
    eng1 = CrawlEngine(spark, pages_df, wd, cfg)
    eng1.seed_from_queries(seeds)
    eng1.run_round()  # only round 1, then "crash"
    del eng1

    eng2 = CrawlEngine.resume(spark, pages_df, wd, cfg)
    assert eng2.round == 1
    eng2.run()

    full = {
        r["link"]: r["canonical_json"]
        for r in eng_full.results.select("link", "canonical_json").collect()
    }
    resumed = {
        r["link"]: r["canonical_json"]
        for r in eng2.results.select("link", "canonical_json").collect()
    }
    assert resumed == full
