"""Fast-mode parity: Spark engine vs the sequential fast oracle
(SearchJob.Process + filterAndSortEntriesWithinRadius semantics)."""

import pytest

from google_maps_scraper_spark.plans.fast import (
    FastSearchConfig,
    FastSearchEngine,
    fast_oracle,
)
from google_maps_scraper_spark.sources.corpus import (
    corpus_to_spark,
    generate_fast_corpus,
)

CFG = FastSearchConfig(lat=37.9838, lon=23.7275, zoom=15.0, radius_m=10_000.0)


@pytest.fixture(scope="module")
def corpus():
    return generate_fast_corpus(n_seeds=4, businesses_per_query=15, seed=11)


@pytest.fixture(scope="module")
def seeds(corpus):
    return [(s["query"], s["custom_id"]) for s in corpus.seeds]


@pytest.fixture(scope="module")
def oracle_rows(corpus, seeds):
    pages = {p["url"]: p["html"] for p in corpus.pages}
    return fast_oracle(pages, seeds, CFG)


def test_fast_mode_matches_oracle(spark, corpus, seeds, oracle_rows):
    eng = FastSearchEngine(spark, corpus_to_spark(spark, corpus), CFG)
    got = {
        (r["seed_id"], r["rank"]): r
        for r in eng.run(seeds).collect()
    }
    assert len(got) == len(oracle_rows) > 0
    for o in oracle_rows:
        g = got[(o["seed_id"], o["rank"])]
        e = o["entry"]
        assert g["title"] == e["title"]
        assert g["data_id"] == e["data_id"]
        assert g["latitude"] == e["latitude"]
        assert g["longitude"] == e["longtitude"]
        assert g["plus_code"] == e["plus_code"]
        assert g["distance_m"] == o["distance_m"]
        assert g["phone"] == e["phone"]
        assert list(g["categories"]) == e["categories"]


def test_fast_mode_radius_filter(spark, corpus, seeds, oracle_rows):
    """Every returned row is within the radius; planted far businesses are
    dropped (corpus plants ~30% outside 10 km)."""
    eng = FastSearchEngine(spark, corpus_to_spark(spark, corpus), CFG)
    rows = eng.run(seeds).collect()
    assert all(r["distance_m"] <= CFG.radius_m for r in rows)
    n_total = 4 * 15
    assert len(rows) < n_total  # the filter actually removed the far ones


def test_fast_mode_sorted_by_distance(spark, corpus, seeds):
    eng = FastSearchEngine(spark, corpus_to_spark(spark, corpus), CFG)
    rows = eng.run(seeds).collect()
    by_seed = {}
    for r in rows:
        by_seed.setdefault(r["seed_id"], []).append((r["rank"], r["distance_m"]))
    for seed_id, rs in by_seed.items():
        rs.sort()
        dists = [d for _, d in rs]
        assert dists == sorted(dists), seed_id


def test_fast_mode_radius_zero_parity(spark, corpus, seeds):
    """Reference parity (gmaps/entry.go:1013-1047): radius is applied
    unconditionally — radius 0 keeps only distance-0 entries (none here),
    a huge radius keeps everything, and the legacy flag restores the
    lenient round-1 behavior."""
    from google_maps_scraper_spark.plans.fast import (
        FastSearchConfig,
        FastSearchEngine,
        fast_oracle,
    )
    from google_maps_scraper_spark.sources.corpus import corpus_to_spark

    pages_df = corpus_to_spark(spark, corpus)
    pages = {p["url"]: p["html"] for p in corpus.pages}
    for radius in (0.0, -1.0, 1e12):
        cfg = FastSearchConfig(
            lat=CFG.lat, lon=CFG.lon, zoom=CFG.zoom, radius_m=radius
        )
        got = FastSearchEngine(spark, pages_df, cfg).run(seeds).collect()
        want = fast_oracle(pages, seeds, cfg)
        assert len(got) == len(want), f"radius={radius}"
        if radius <= 0:
            assert got == []  # reference: nothing within radius ≤ 0

    lenient = FastSearchConfig(
        lat=CFG.lat, lon=CFG.lon, zoom=CFG.zoom, radius_m=0.0,
        radius_zero_disables_filter=True,
    )
    got = FastSearchEngine(spark, pages_df, lenient).run(seeds).collect()
    want = fast_oracle(pages, seeds, lenient)
    assert len(got) == len(want) > 0
