"""Pure-Python parse/extraction core (no Spark dependency).

Every function here is a deterministic pure function so it can be unit-tested
against the reference's golden fixtures without a SparkSession, then wrapped
in vectorized pandas UDFs by :mod:`google_maps_scraper_spark.operators`.
"""

from .canonical import entry_csv_headers, entry_csv_row, entry_to_canonical_json
from .emails import extract_emails
from .entry import (
    entry_from_json,
    extract_reviews_page,
    haversine_distance,
    is_website_valid_for_email,
    parse_reviews,
    validate_entry,
)
from .geo import generate_cells, parse_bounding_box
from .olc import olc_encode
from .serp import extract_feed_links, parse_search_results, remove_first_line
from .urls import (
    build_search_url,
    canonical_url_hash,
    etld1,
    extract_actual_url,
    extract_next_page_token,
    extract_place_id,
    is_google_maps_url,
    normalize_google_url,
    parse_query_line,
)

__all__ = [
    "build_search_url",
    "canonical_url_hash",
    "entry_csv_headers",
    "entry_csv_row",
    "entry_from_json",
    "entry_to_canonical_json",
    "etld1",
    "extract_actual_url",
    "extract_emails",
    "extract_feed_links",
    "extract_next_page_token",
    "extract_place_id",
    "extract_reviews_page",
    "generate_cells",
    "haversine_distance",
    "is_google_maps_url",
    "is_website_valid_for_email",
    "normalize_google_url",
    "olc_encode",
    "parse_bounding_box",
    "parse_query_line",
    "parse_reviews",
    "parse_search_results",
    "remove_first_line",
    "validate_entry",
]
