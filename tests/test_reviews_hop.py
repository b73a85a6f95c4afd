"""Extra-reviews pagination parity: the engine's chained review-RPC frontier
jobs must produce byte-identical entries to the oracle's inline pagination
loop (≙ gmaps/reviews.go:46-97 + entry.go:317-328)."""

import json

import pytest

from google_maps_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
from google_maps_scraper_spark.plans.oracle import SequentialOracle
from google_maps_scraper_spark.sources.corpus import corpus_to_spark, generate_corpus

NOW = 1786838400000000


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(
        n_seeds=2, places_per_serp=5, extra_review_pages=3, seed=7
    )


@pytest.fixture(scope="module")
def oracle_out(corpus):
    pages = {p["url"]: p["html"] for p in corpus.pages}
    seeds = [(s["query"].split("#!#")[0].strip(), s["custom_id"]) for s in corpus.seeds]
    return SequentialOracle(
        pages, extract_email=True, extra_reviews=True, now_micros=NOW
    ).run(seeds)


@pytest.fixture(scope="module")
def engine_out(spark, corpus, tmp_path_factory):
    pages_df = corpus_to_spark(spark, corpus)
    seeds = [(s["query"].split("#!#")[0].strip(), s["custom_id"]) for s in corpus.seeds]
    eng = CrawlEngine(
        spark,
        pages_df,
        str(tmp_path_factory.mktemp("crawl-reviews")),
        CrawlConfig(extract_email=True, extra_reviews=True, now_micros=NOW),
    )
    eng.seed_from_queries(seeds)
    counters = eng.run()
    return eng, counters


def test_reviews_results_byte_identical(oracle_out, engine_out):
    eng, _ = engine_out
    spark_results = {
        r["link"]: r["canonical_json"]
        for r in eng.results.select("link", "canonical_json").collect()
    }
    oracle_results = {r["entry"]["link"]: r["canonical_json"] for r in oracle_out.results}
    assert set(spark_results) == set(oracle_results)
    bad = [k for k in oracle_results if spark_results[k] != oracle_results[k]]
    assert not bad, f"canonical JSON mismatch for {bad[:3]}"


def test_extended_reviews_present(oracle_out, engine_out):
    """Places with RPC pages must carry user_reviews_extended in canonical
    JSON (non-empty array), with counts matching the oracle."""
    eng, _ = engine_out
    rows = eng.results.select("link", "canonical_json").collect()
    got = {r["link"]: json.loads(r["canonical_json"]) for r in rows}
    want = {r["entry"]["link"]: r["entry"] for r in oracle_out.results}
    n_with_ext = 0
    for link, entry in want.items():
        w = entry.get("user_reviews_extended")
        g = got[link].get("user_reviews_extended")
        if w:
            n_with_ext += 1
            assert g is not None and len(g) == len(w), link
    assert n_with_ext > 0  # the corpus must actually exercise the chain


def test_reviews_chain_rounds(engine_out):
    """Chains appear as 'reviews' frontier jobs claimed in rounds ≥3."""
    eng, counters = engine_out
    kinds = {
        r["kind"]: r["n"]
        for r in eng.frontier.groupBy("kind").count().withColumnRenamed("count", "n").collect()
    }
    assert kinds.get("reviews", 0) > 0
    assert counters.get("reviews_new", 0) == 0  # all chains drained


def test_distributed_corpus_review_chains(spark, tmp_path):
    """The DISTRIBUTED corpus generator must emit review-RPC chain pages the
    engine can actually walk (round-3: extra_reviews joins the bench-scale
    corpus; previously only the driver-local generator produced chains)."""
    from google_maps_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
    from google_maps_scraper_spark.sources.corpus import generate_corpus_spark

    pages, seeds = generate_corpus_spark(
        spark, n_seeds=2, places_per_serp=4, extra_review_pages=3, seed=5
    )
    pages = pages.localCheckpoint(eager=True)
    eng = CrawlEngine(
        spark, pages, str(tmp_path / "wd"),
        CrawlConfig(extra_reviews=True, now_micros=1786838400000000),
    )
    eng.seed_from_queries(seeds)
    counters = eng.run()
    # chains ran: reviews jobs existed and completed
    assert counters.get("reviews_done", 0) > 0
    assert counters.get("reviews_new", 0) == 0
    # extended reviews made it into the emitted entries
    n_ext = eng.results.filter(
        "canonical_json LIKE '%XReviewer%'"
    ).count()
    assert n_ext > 0
