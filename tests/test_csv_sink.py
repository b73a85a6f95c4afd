"""CSV sink parity: cells rendered from canonical JSON must equal the cells
rendered from the internal entry dict (gmaps/entry.go:276-315 semantics)."""

import pathlib

import pytest

from google_maps_scraper_spark.extract.canonical import (
    csv_row_from_canonical,
    entry_csv_headers,
    entry_csv_row,
    entry_to_canonical_json,
)
from google_maps_scraper_spark.extract.entry import entry_from_json

FIXTURES = pathlib.Path("/root/reference/testdata")


@pytest.mark.parametrize("fixture", ["raw.json", "raw2.json"])
def test_csv_cells_from_canonical_match_internal(fixture):
    e = entry_from_json((FIXTURES / fixture).read_bytes())
    direct = entry_csv_row(e)
    via_canonical = csv_row_from_canonical(entry_to_canonical_json(e))
    assert len(direct) == len(via_canonical) == 36
    for col, a, b in zip(entry_csv_headers(), direct, via_canonical):
        assert a == b, f"cell mismatch in {col!r}: {a!r} != {b!r}"


def test_csv_write_roundtrip(spark, tmp_path):
    """End-to-end: crawl results → write_results_csv → re-read header/rows."""
    import csv
    import glob

    from google_maps_scraper_spark.operators.csv_sink import write_results_csv
    from google_maps_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
    from google_maps_scraper_spark.sources.corpus import (
        corpus_to_spark,
        generate_corpus,
    )

    corpus = generate_corpus(n_seeds=2, places_per_serp=4)
    pages = corpus_to_spark(spark, corpus)
    eng = CrawlEngine(
        spark, pages, str(tmp_path / "wd"), CrawlConfig(max_rounds=8)
    )
    eng.seed_from_queries(
        [(s["query"].split(" #!#")[0], s["custom_id"]) for s in corpus.seeds]
    )
    eng.run()
    out = tmp_path / "results_csv"
    write_results_csv(eng.results, str(out))
    files = sorted(glob.glob(str(out / "part-*.csv")))
    assert files
    rows = []
    header = None
    for f in files:
        with open(f, newline="") as fh:
            r = list(csv.reader(fh))
        assert r[0] == entry_csv_headers()
        header = r[0]
        rows.extend(r[1:])
    assert header == entry_csv_headers()
    assert len(rows) == eng.results.filter("canonical_json is not null").count()
    # every row has 36 cells and a non-empty title
    for row in rows:
        assert len(row) == 36
        assert row[2]
