"""Politeness: per-eTLD+1 per-round claim budgets hold exactly under host
skew (the corpus plants ~50% of websites on one dominant host), and the
budget splits across salt shards so a hot host cannot serialize a round."""

import pytest
from pyspark.sql import functions as F

from google_maps_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
from google_maps_scraper_spark.sources.corpus import corpus_to_spark, generate_corpus

NOW = 1786838400000000


def test_host_budget_exact_under_skew(spark, tmp_path):
    corpus = generate_corpus(
        n_seeds=3, places_per_serp=10, skew_host_fraction=0.8, seed=9
    )
    pages = corpus_to_spark(spark, corpus)
    seeds = [(s["query"].split("#!#")[0].strip(), s["custom_id"]) for s in corpus.seeds]
    budget = 3
    eng = CrawlEngine(
        spark, pages, str(tmp_path / "wd"),
        CrawlConfig(
            extract_email=True, now_micros=NOW,
            host_budget=budget, politeness_salts=4, max_rounds=64,
        ),
    )
    eng.seed_from_queries(seeds)
    counters = eng.run()

    # per (round, host) claims never exceed the budget
    per_round_host = (
        eng.frontier.filter(F.col("round_claimed").isNotNull())
        .groupBy("round_claimed", "host")
        .count()
        .collect()
    )
    over = [(r["round_claimed"], r["host"], r["count"])
            for r in per_round_host if r["count"] > budget]
    assert not over, f"budget exceeded: {over[:5]}"

    # the hot host forces many rounds, but everything still drains
    assert counters.get("email_new", 0) == 0
    assert counters.get("place_new", 0) == 0
    assert counters["round"] > 3  # budget stretched the crawl past plain BFS

    # and the budgeted crawl produces the same result set as an unbudgeted one
    eng2 = CrawlEngine(
        spark, pages, str(tmp_path / "wd2"),
        CrawlConfig(extract_email=True, now_micros=NOW),
    )
    eng2.seed_from_queries(seeds)
    eng2.run()
    a = sorted(r["canonical_json"] for r in eng.results.collect())
    b = sorted(r["canonical_json"] for r in eng2.results.collect())
    assert a == b
