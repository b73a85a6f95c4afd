"""Grid mode end-to-end: queries × grid cells seeding (CreateGridSeedJobs)
through the full engine vs the sequential oracle seeded with the same
expanded URL list."""

import pytest

from google_maps_scraper_spark.extract.geo import (
    cell_geo_coordinates,
    generate_cells,
    parse_bounding_box,
)
from google_maps_scraper_spark.extract.urls import build_search_url
from google_maps_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
from google_maps_scraper_spark.plans.oracle import SequentialOracle
from google_maps_scraper_spark.sources.corpus import (
    corpus_to_spark,
    generate_grid_corpus,
)

NOW = 1786838400000000
BBOX = "37.90,23.60,38.05,23.85"
CELL_KM = 10.0
ZOOM = 15
QUERIES = ["taverna", "kafeneio"]


@pytest.fixture(scope="module")
def corpus():
    return generate_grid_corpus(QUERIES, BBOX, CELL_KM, ZOOM, places_per_cell=3)


def _expanded_seed_urls():
    bbox = parse_bounding_box(BBOX)
    cells = generate_cells(bbox, CELL_KM)
    out = []
    for qi, q in enumerate(QUERIES):
        for ci, (lat, lon) in enumerate(cells):
            url = build_search_url(q, cell_geo_coordinates(lat, lon), ZOOM)
            out.append((url, f"gq{qi:02d}-cell{ci:05d}"))
    return out


def test_grid_crawl_matches_oracle(spark, corpus, tmp_path):
    pages = {p["url"]: p["html"] for p in corpus.pages}
    expanded = _expanded_seed_urls()
    # every grid SERP URL must actually resolve in the corpus
    assert all(u in pages for u, _ in expanded)

    oracle = SequentialOracle(pages, extract_email=False, now_micros=NOW).run(expanded)

    eng = CrawlEngine(
        spark,
        corpus_to_spark(spark, corpus),
        str(tmp_path / "wd"),
        CrawlConfig(extract_email=False, now_micros=NOW),
    )
    eng.seed_from_grid(
        [(q, f"gq{i:02d}") for i, q in enumerate(QUERIES)], BBOX, CELL_KM, ZOOM
    )
    eng.run()

    got = {
        r["link"]: r["canonical_json"]
        for r in eng.results.select("link", "canonical_json").collect()
    }
    want = {r["entry"]["link"]: r["canonical_json"] for r in oracle.results}
    assert got == want and len(got) > 0

    # per-cell seed ids propagate to results (input_id = cell id)
    ids = {r["input_id"] for r in eng.results.select("input_id").collect()}
    assert any("cell" in i for i in ids)


def test_grid_cell_count(corpus):
    bbox = parse_bounding_box(BBOX)
    cells = generate_cells(bbox, CELL_KM)
    # 2 queries × cells SERP pages + 3 places each
    assert len(corpus.pages) == len(QUERIES) * len(cells) * (1 + 3)
