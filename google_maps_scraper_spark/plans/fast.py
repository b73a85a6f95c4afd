"""Fast mode: single-request SERP extraction (no browser, no place pages).

≙ the reference's ``-fast-mode`` path: one ``SearchJob`` per query fetching
the ``tbm=map`` endpoint (gmaps/searchjob.go:46-130), entries parsed from the
positional JSON payload (gmaps/multiple.go:11-81), then filtered to the
search radius and sorted by haversine distance ascending
(gmaps/entry.go:1013-1047).  ≤21 results/query by construction of the stored
payload (README.md:366).

Spark shape: seeds × pages broadcast join → one vectorized parse UDF →
``posexplode`` → per-seed distance rank window.  Distances are computed
inside the UDF with the same float math as the oracle, so ordering is
byte-reproducible; the window sort only permutes by that value.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = ["FastSearchConfig", "FastSearchEngine", "fast_oracle"]


@dataclass
class FastSearchConfig:
    lat: float = 0.0
    lon: float = 0.0
    zoom: float = 15.0
    radius_m: float = 10_000.0   # CLI default (runner/runner.go radius flag)
    lang: str = "en"
    radius_zero_disables_filter: bool = False
    # Default = reference parity: filterAndSortEntriesWithinRadius
    # (gmaps/entry.go:1013-1047) applies ``distance <= radius``
    # unconditionally, so radius 0 keeps only entries exactly at the center
    # and a negative radius keeps nothing.  The flag opts into the lenient
    # round-1 behavior (radius ≤ 0 ⇒ no filter) for callers that used it as
    # an "unbounded" sentinel.


_FAST_ENTRY_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("pos", T.IntegerType()),
    T.StructField("input_id", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("categories", T.ArrayType(T.StringType())),
    T.StructField("web_site", T.StringType()),
    T.StructField("review_rating", T.DoubleType()),
    T.StructField("review_count", T.IntegerType()),
    T.StructField("address", T.StringType()),
    T.StructField("latitude", T.DoubleType()),
    T.StructField("longitude", T.DoubleType()),
    T.StructField("phone", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("timezone", T.StringType()),
    T.StructField("data_id", T.StringType()),
    T.StructField("plus_code", T.StringType()),
    T.StructField("open_hours_json", T.StringType()),
    T.StructField("distance_m", T.DoubleType()),
]))


def _parse_fast_page(html, lat: float, lon: float) -> list[dict]:
    from ..extract.entry import haversine_distance
    from ..extract.serp import parse_search_results, remove_first_line

    if html is None:
        return []
    body = bytes(html) if isinstance(html, (bytes, bytearray)) else str(html).encode()
    body = remove_first_line(body)
    if not body:
        return []
    try:
        entries = parse_search_results(body)
    except ValueError:
        return []
    out = []
    for i, e in enumerate(entries):
        out.append({
            "pos": i,
            "input_id": e["input_id"],
            "title": e["title"],
            "categories": e["categories"],
            "web_site": e["web_site"],
            "review_rating": float(e["review_rating"]),
            "review_count": int(e["review_count"]),
            "address": e["address"],
            "latitude": float(e["latitude"]),
            "longitude": float(e["longtitude"]),
            "phone": e["phone"],
            "status": e["status"],
            "timezone": e["timezone"],
            "data_id": e["data_id"],
            "plus_code": e["plus_code"],
            "open_hours_json": json.dumps(e["open_hours"], sort_keys=True),
            # same float math as the oracle → byte-reproducible ordering
            "distance_m": haversine_distance(
                lat, lon, float(e["latitude"]), float(e["longtitude"])
            ),
        })
    return out


class FastSearchEngine:
    def __init__(self, spark: SparkSession, pages: DataFrame, config: FastSearchConfig):
        self.spark = spark
        self.pages = pages
        self.cfg = config

    def run(self, queries: list[tuple[str, str]]) -> DataFrame:
        """queries: ordered (query_text, custom_id) — returns the fast-mode
        results DataFrame, radius-filtered and distance-ranked per seed."""
        from ..extract.urls import build_fast_search_url

        cfg = self.cfg
        rows = []
        for i, (query, custom_id) in enumerate(queries):
            url = build_fast_search_url(query, cfg.lat, cfg.lon, cfg.zoom, cfg.lang)
            rows.append((custom_id or f"seed-{i}", query, url))
        seeds = self.spark.createDataFrame(
            rows, "seed_id string, query string, url string"
        )

        lat, lon = float(cfg.lat), float(cfg.lon)

        @pandas_udf(_FAST_ENTRY_SCHEMA)
        def fast_entries_udf(html: pd.Series) -> pd.Series:
            return html.map(lambda h: _parse_fast_page(h, lat, lon))

        pages = self.pages.select("url", "html")
        fetched = pages.join(F.broadcast(seeds), "url", "inner")
        exploded = (
            fetched.withColumn("e", fast_entries_udf("html"))
            .drop("html")
            .select("seed_id", "query", F.explode("e").alias("e"))
            .select("seed_id", "query", "e.*")
        )
        skip_filter = cfg.radius_zero_disables_filter and cfg.radius_m <= 0
        filtered = (
            exploded
            if skip_filter
            else exploded.filter(F.col("distance_m") <= F.lit(float(cfg.radius_m)))
        )
        w = Window.partitionBy("seed_id").orderBy("distance_m", "pos")
        return (
            filtered.withColumn("rank", F.row_number().over(w))
            .drop("pos")
        )


def fast_oracle(
    pages: dict[str, bytes | str],
    queries: list[tuple[str, str]],
    config: FastSearchConfig,
) -> list[dict]:
    """Sequential reference-order fast mode (SearchJob.Process +
    filterAndSortEntriesWithinRadius) over the same stored pages."""
    from ..extract.entry import haversine_distance
    from ..extract.serp import parse_search_results, remove_first_line
    from ..extract.urls import build_fast_search_url

    out = []
    for i, (query, custom_id) in enumerate(queries):
        seed_id = custom_id or f"seed-{i}"
        url = build_fast_search_url(query, config.lat, config.lon, config.zoom, config.lang)
        body = pages.get(url)
        if body is None:
            continue
        body = body if isinstance(body, bytes) else body.encode()
        body = remove_first_line(body)
        if not body:
            continue
        try:
            entries = parse_search_results(body)
        except ValueError:
            continue
        skip_filter = config.radius_zero_disables_filter and config.radius_m <= 0
        wd = []
        for pos, e in enumerate(entries):
            d = haversine_distance(
                config.lat, config.lon, float(e["latitude"]), float(e["longtitude"])
            )
            if not skip_filter and d > config.radius_m:
                continue
            wd.append((d, pos, e))
        wd.sort(key=lambda t: (t[0], t[1]))
        for rank, (d, pos, e) in enumerate(wd, start=1):
            out.append({
                "seed_id": seed_id, "query": query, "rank": rank,
                "distance_m": d, "entry": e,
            })
    return out
