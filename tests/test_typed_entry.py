"""Typed Entry struct (schemas.ENTRY_STRUCT): fixture equality on nested
fields (expectations from /root/reference/gmaps/entry_test.go:30-180) and
nested-predicate querying over crawl results."""

import pathlib

import pytest

from pyspark.sql import functions as F

FIXTURES = pathlib.Path("/root/reference/testdata")


@pytest.fixture(scope="module")
def typed_row(spark):
    from google_maps_scraper_spark.extract import entry_from_json
    from google_maps_scraper_spark.extract.canonical import entry_to_canonical_json
    from google_maps_scraper_spark.schemas import ENTRY_STRUCT

    e = entry_from_json((FIXTURES / "raw.json").read_bytes())
    e["input_id"] = "fixture-1"
    cj = entry_to_canonical_json(e)
    df = spark.createDataFrame([(cj,)], "canonical_json string").select(
        F.from_json("canonical_json", ENTRY_STRUCT).alias("entry")
    )
    return df.select("entry").head()["entry"]


def test_typed_scalars(typed_row):
    e = typed_row
    assert e["title"] == "Kipriakon"
    assert e["category"] == "Restaurant"
    assert e["address"] == "Old port, Limassol 3042"
    assert e["review_count"] == 396
    assert e["review_rating"] == 4.2
    assert e["latitude"] == 34.670595399999996
    # the reference's dual-key quirk: both longitude spellings materialize
    assert e["longtitude"] == 33.042456699999995
    assert e["longitude"] == 33.042456699999995
    assert e["price_range"] == "€€"
    assert e["place_id"] == "ChIJDdnwdv0y5xQRRytw1ihZQeU"


def test_typed_open_hours_map(typed_row):
    from google_maps_scraper_spark.extract import entry_from_json

    want = entry_from_json((FIXTURES / "raw.json").read_bytes())["open_hours"]
    oh = typed_row["open_hours"]
    assert set(oh.keys()) == {
        "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
        "Saturday", "Sunday",
    }
    assert {d: list(v) for d, v in oh.items()} == want


def test_typed_popular_times(typed_row):
    from google_maps_scraper_spark.extract import entry_from_json

    want = entry_from_json((FIXTURES / "raw.json").read_bytes())["popular_times"]
    pt = typed_row["popular_times"]
    assert set(pt.keys()) == set(want.keys())
    # entry_test.go:153-175 invariant-style check on a concrete cell
    for day, hours in want.items():
        got_day = pt[day]
        assert {int(k): v for k, v in got_day.items()} == {
            int(k): v for k, v in hours.items()
        }


def test_typed_complete_address_and_owner(typed_row):
    ca = typed_row["complete_address"]
    assert ca["city"] == "Limassol"
    assert ca["postal_code"] == "3042"
    assert ca["country"] == "CY"
    assert typed_row["owner"]["name"]
    assert typed_row["images"][0]["title"] == "All"


def test_typed_about_options(typed_row):
    about = typed_row["about"]
    assert about
    by_name = {a["name"]: a for a in about}
    svc = by_name.get("Service options") or about[0]
    assert svc["options"]
    assert isinstance(svc["options"][0]["enabled"], bool)


def test_nested_predicate_on_crawl_results(spark, tmp_path):
    """WHERE entry.complete_address.city = ... on real crawl output — the
    query shape the typed struct exists for."""
    from google_maps_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
    from google_maps_scraper_spark.sources.corpus import (
        corpus_to_spark,
        generate_corpus,
    )

    corpus = generate_corpus(n_seeds=2, places_per_serp=5, seed=42)
    pages = corpus_to_spark(spark, corpus)
    eng = CrawlEngine(
        spark, pages, str(tmp_path / "wd"),
        CrawlConfig(now_micros=1786838400000000),
    )
    eng.seed_from_queries(
        [(s["query"].split(" #!#")[0], s["custom_id"]) for s in corpus.seeds]
    )
    eng.run()
    res = eng.results
    assert res.filter(F.col("entry").isNotNull()).count() == res.count() > 0
    cities = res.groupBy(F.col("entry.complete_address.city").alias("city")).count()
    rows = {r["city"]: r["count"] for r in cities.collect()}
    assert rows and all(v > 0 for v in rows.values())
    # typed nested equality against the scalar projection
    mismatch = res.filter(F.col("entry.title") != F.col("title")).count()
    assert mismatch == 0
