"""google_maps_scraper_spark — a PySpark-native crawl-frontier and
place-extraction engine with the query semantics of gosom/google-maps-scraper.

Built from scratch for Spark's execution model: the network fetch of the
reference is replaced by a distributed equi-join against an (Iceberg/parquet)
table of pre-crawled Common-Crawl-style pages, the crawl frontier is a
partitioned priority table driven by window-rank round selection, the URL-seen
set is a persisted hash table consulted via left-anti joins, and all per-row
parsing runs in vectorized Arrow/pandas UDFs.
"""

__version__ = "0.1.0"
