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


def test_chains_do_not_multiply_rounds(spark, corpus, engine_out, tmp_path):
    """Round-4: chains are followed to exhaustion INSIDE the claiming round
    (≙ reviews.go:77-97 pagination inside one job), so enabling
    extra_reviews on a depth-3 chain corpus must take exactly as many
    global rounds as the same crawl with chains off — not depth-many more."""
    from google_maps_scraper_spark.sources.corpus import corpus_to_spark

    _, counters = engine_out
    assert counters.get("reviews_done", 0) > 0  # chains ran and completed

    pages_df = corpus_to_spark(spark, corpus)
    seeds = [(s["query"].split("#!#")[0].strip(), s["custom_id"]) for s in corpus.seeds]
    eng = CrawlEngine(
        spark, pages_df, str(tmp_path / "no-chain"),
        CrawlConfig(extract_email=True, extra_reviews=False, now_micros=NOW),
    )
    eng.seed_from_queries(seeds)
    no_chain = eng.run()
    assert counters["round"] == no_chain["round"]


def test_chain_follow_respects_politeness_claim(spark, tmp_path):
    """With a per-host budget of 1, chain continuations still complete within
    their parent's claimed round (pagination occupies the parent's slot, as
    in the reference) and results stay byte-identical to the unbudgeted run."""
    from google_maps_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
    from google_maps_scraper_spark.sources.corpus import corpus_to_spark, generate_corpus

    corpus = generate_corpus(n_seeds=2, places_per_serp=3, extra_review_pages=2, seed=9)
    pages = corpus_to_spark(spark, corpus).localCheckpoint(eager=True)
    seeds = [(s["query"].split("#!#")[0].strip(), s["custom_id"]) for s in corpus.seeds]

    def run(wd, budget):
        eng = CrawlEngine(
            spark, pages, str(tmp_path / wd),
            CrawlConfig(
                extra_reviews=True, now_micros=NOW,
                host_budget=budget, politeness_salts=2, max_rounds=64,
            ),
        )
        eng.seed_from_queries(seeds)
        eng.run()
        return {
            r["link"]: r["canonical_json"]
            for r in eng.results.select("link", "canonical_json").collect()
        }

    assert run("wd-budget", 1) == run("wd-free", None)


def test_chain_follow_respects_robots(spark, corpus, tmp_path):
    """A robots rule matching the review-RPC path must deny chain
    continuations per hop: they are recorded terminally FAILED (never
    fetched), the parent place never finalizes its entry (exactly the
    round-3 admission-stamping outcome), and the crawl still terminates."""
    from google_maps_scraper_spark.sources.corpus import corpus_to_spark

    pages_df = corpus_to_spark(spark, corpus)
    seeds = [(s["query"].split("#!#")[0].strip(), s["custom_id"]) for s in corpus.seeds]
    rpc_hosts = {
        r["host"]
        for r in pages_df.selectExpr("url").filter("url LIKE '%listugcposts%'")
        .selectExpr("parse_url(url, 'HOST') AS host").collect()
    }
    # the engine buckets by eTLD+1, so express the rule against that suffix
    rules = [(".".join(h.split(".")[-2:]), "/maps/rpc") for h in rpc_hosts]
    assert rules
    eng = CrawlEngine(
        spark, pages_df, str(tmp_path / "robots-chain"),
        CrawlConfig(
            extract_email=False, extra_reviews=True, now_micros=NOW,
            robots=rules,
        ),
    )
    eng.seed_from_queries(seeds)
    counters = eng.run()
    assert counters.get("reviews_failed", 0) > 0   # chains denied, recorded
    assert counters.get("reviews_new", 0) == 0     # nothing left pending
    # no finished chain ⇒ no extended reviews anywhere in the results
    assert eng.results.filter("canonical_json LIKE '%XReviewer%'").count() == 0
