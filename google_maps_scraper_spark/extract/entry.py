"""Place-entry extraction from the APP_INITIALIZATION_STATE JSON array.

This re-expresses the semantics of the reference's master extractor:

  * ``EntryFromJSON``         — gmaps/entry.go:360-542
  * ``parseReviews`` + helpers— gmaps/entry.go:544-715
  * ``getHours``              — gmaps/entry.go:742-804
  * ``getPopularTimes``       — gmaps/entry.go:806-855
  * ``getLinkSource``         — gmaps/entry.go:717-739
  * ``getOptionValues``       — gmaps/entry.go:923-939
  * ``addOrMergeOption``      — gmaps/entry.go:908-921
  * ``mergeStringSlices``     — gmaps/entry.go:941-949
  * ``extractStreetViewURL``  — gmaps/entry.go:965-977
  * ``extractReviews`` (RPC)  — gmaps/entry.go:330-357
  * validation / email gate   — gmaps/entry.go:203-233
  * haversine                 — gmaps/entry.go:176-201

Entries are plain dicts whose keys mirror the Go struct *fields* (snake_case
per the json tags).  ``None`` ⇔ Go nil slice/map (marshals to ``null``);
``[]``/``{}`` ⇔ allocated-but-empty (marshals to ``[]``/``{}``).  That nil/
empty distinction is load-bearing for byte-identical canonical JSON.

Determinism: ``reviewPublishedAt`` bounds its timestamp by wall clock in the
reference (entry.go:664).  We take ``now_micros`` as a parameter so results
are reproducible (SURVEY.md §7 hard part #2).
"""

from __future__ import annotations

import json
import math
import re
from typing import Any

from .nth import get_float, get_list, get_str
from .urls import decode_url, extract_actual_url

__all__ = [
    "entry_from_json",
    "parse_reviews",
    "extract_reviews_page",
    "validate_entry",
    "is_website_valid_for_email",
    "haversine_distance",
    "empty_entry",
]

_EARLIEST_REVIEW_MICROS = 1167609600000000  # 2007-01-01T00:00:00Z, entry.go:88
_FUTURE_SKEW_MICROS = 24 * 3600 * 1000000  # entry.go:86
_PANOID_RE = re.compile(r"panoid=([^&]+)")  # entry.go:18

_DAY_OF_WEEK = {
    1: "Monday", 2: "Tuesday", 3: "Wednesday", 4: "Thursday",
    5: "Friday", 6: "Saturday", 7: "Sunday",
}


def empty_entry() -> dict[str, Any]:
    """Zero-value Entry (Go struct zero values; nil slices/maps are None)."""
    return {
        "input_id": "",
        "link": "",
        "cid": "",
        "title": "",
        "categories": None,
        "category": "",
        "address": "",
        "open_hours": None,
        "popular_times": None,
        "web_site": "",
        "phone": "",
        "plus_code": "",
        "review_count": 0,
        "review_rating": 0.0,
        "reviews_per_rating": None,
        "latitude": 0.0,
        "longtitude": 0.0,
        "status": "",
        "description": "",
        "reviews_link": "",
        "thumbnail": "",
        "timezone": "",
        "price_range": "",
        "data_id": "",
        "street_view_url": "",
        "place_id": "",
        "images": None,
        "reservations": None,
        "order_online": None,
        "menu": {"link": "", "source": ""},
        "owner": {"id": "", "name": "", "link": ""},
        "complete_address": {
            "borough": "", "street": "", "city": "",
            "postal_code": "", "state": "", "country": "",
        },
        "credit_cards_accepted": None,
        "about": None,
        "user_reviews": None,
        "user_reviews_extended": None,
        "emails": None,
    }


def _get_link_source(arr: list, link: list[int], source: list[int]) -> list[dict] | None:
    """gmaps/entry.go:717-739 — returns None when nothing matched (nil slice)."""
    result: list[dict] | None = None
    for i in range(len(arr)):
        item = get_list(arr, i)
        el = {"link": get_str(item, *link), "source": get_str(item, *source)}
        if el["link"] and el["source"]:
            if result is None:
                result = []
            result.append(el)
    return result


def _get_hours(darray: list) -> dict[str, list[str]]:
    """gmaps/entry.go:742-804 — always returns an (possibly empty) dict."""
    items = get_list(darray, 203, 0)
    if not items:
        items = get_list(darray, 34, 1)

    hours: dict[str, list[str]] = {}
    for item in items:
        if not isinstance(item, list):
            continue
        day = get_str(item, 0)
        if not day:
            continue
        time_slots = get_list(item, 3)
        if time_slots:
            times = []
            for slot in time_slots:
                if not isinstance(slot, list) or not slot:
                    continue
                time_str = get_str(slot, 0)
                if time_str:
                    times.append(time_str)
            if times:
                hours[day] = times
        else:
            times_i = get_list(item, 1)
            times = [t for t in times_i if isinstance(t, str)]
            if times:
                hours[day] = times
    return hours


def _get_popular_times(darray: list) -> dict[str, dict[int, int]] | None:
    """gmaps/entry.go:806-855 — None (nil) on malformed rows, else dict."""
    items = get_list(darray, 84, 0)
    popular: dict[str, dict[int, int]] = {}
    for it in items:
        if not isinstance(it, list):
            return None
        day = int(get_float(it, 0))
        times_i = get_list(it, 1)
        times: dict[int, int] = {}
        for t in times_i:
            if not isinstance(t, list):
                return None
            if len(t) < 2 or isinstance(t[1], bool) or not isinstance(t[1], (int, float)):
                return None
            if isinstance(t[0], bool) or not isinstance(t[0], (int, float)):
                return None
            times[int(t[0])] = int(t[1])
        popular[_DAY_OF_WEEK.get(day, "")] = times
    return popular


def _get_option_values(opt: list) -> list[str] | None:
    """gmaps/entry.go:923-939 — empty slice is allocated (not nil) in Go but
    marshals identically to [] via omitempty?  No: Option.Values has
    ``omitempty`` (entry.go:48) so empty drops the key; we return [] and let
    the serializer apply omitempty."""
    values_i = get_list(opt, 2, 4, 1, 0, 0)
    values: list[str] = []
    for i in range(len(values_i)):
        value = get_str(values_i, i, 2)
        if not value:
            value = get_str(values_i, i, 3)
        if value:
            values.append(value)
    return values


def _merge_string_slices(current: list[str] | None, nxt: list[str]) -> list[str]:
    """gmaps/entry.go:941-949 — order-preserving union."""
    cur = list(current) if current else []
    for v in nxt:
        if v not in cur:
            cur.append(v)
    return cur


def _add_or_merge_option(options: list[dict], opt: dict) -> None:
    """gmaps/entry.go:908-921."""
    for o in options:
        if o["name"] == opt["name"]:
            o["enabled"] = o["enabled"] or opt["enabled"]
            o["values"] = _merge_string_slices(o["values"], opt["values"] or [])
            return
    options.append(opt)


def _extract_street_view_url(images: list[dict]) -> str:
    """gmaps/entry.go:965-977."""
    for img in images:
        if "Street View" in img["title"]:
            m = _PANOID_RE.search(img["image"])
            if m:
                return (
                    "https://www.google.com/maps/@?api=1&map_action=pano&pano="
                    + m.group(1)
                )
    return ""


def _first_non_empty(*values: str) -> str:
    for v in values:
        if v:
            return v
    return ""


def _first_non_zero(*values: float) -> float:
    for v in values:
        if v != 0:
            return v
    return 0.0


def _review_relative_date(el: list) -> str:
    return _first_non_empty(
        get_str(el, 1, 6),
        get_str(el, 3, 3),
        get_str(el, 2, 1, 3, 8, 0),
    )


def _review_published_at_micros(el: list, now_micros: int | None) -> int | None:
    """entry.go:650-669 — returns unix-micros (int) or None; the RFC3339
    rendering happens at serialization time."""
    ts = _first_non_zero(get_float(el, 1, 2), get_float(el, 1, 3))
    if ts == 0:
        return None
    micros = int(ts)
    if micros < _EARLIEST_REVIEW_MICROS:
        return None
    if now_micros is not None and micros > now_micros + _FUTURE_SKEW_MICROS:
        return None
    return micros


def _review_profile_picture(el: list) -> str:
    raw = get_str(el, 1, 4, 5, 1)
    try:
        pic = decode_url(raw)
    except ValueError:
        pic = ""
    if pic:
        return pic
    return _first_non_empty(get_str(el, 1, 2, 0), get_str(el, 0, 2, 0))


def _review_author_name(el: list) -> str:
    return _first_non_empty(
        get_str(el, 1, 4, 5, 0),
        get_str(el, 1, 4, 4),
        get_str(el, 0, 1),
    )


def _review_rating(el: list) -> int:
    return int(
        _first_non_zero(
            get_float(el, 2, 0, 0),
            get_float(el, 2, 0),
            get_float(el, 1, 0, 0),
        )
    )


def _review_description(el: list) -> str:
    return _first_non_empty(
        get_str(el, 2, 15, 0, 0),
        get_str(el, 2, 15, 0),
        get_str(el, 3, 0),
    )


def parse_reviews(reviews_i: list, now_micros: int | None = None) -> list[dict]:
    """gmaps/entry.go:544-630 — one dict per review element."""
    ans: list[dict] = []
    for i in range(len(reviews_i)):
        el = get_list(reviews_i, i, 0)
        if not el:
            el = get_list(reviews_i, i)
            if not el:
                continue

        review: dict[str, Any] = {
            "Name": _review_author_name(el),
            "ProfilePicture": _review_profile_picture(el),
            "When": _review_relative_date(el),
            "published_at_micros": _review_published_at_micros(el, now_micros),
            "Rating": _review_rating(el),
            "Description": _review_description(el),
            "Images": None,
        }

        review["review_id"] = get_str(el, 0)
        review["posted_at_unix_micros"] = int(get_float(el, 1, 2))
        review["updated_at_unix_micros"] = int(get_float(el, 1, 3))
        review["author_url"] = get_str(el, 1, 4, 2, 0)

        src = get_str(el, 1, 13, 0)
        review["source"] = src if src else "unknown"

        scale = int(get_float(el, 1, 13, 4))
        review["rating_scale"] = scale if scale else 5

        review["language"] = get_str(el, 2, 14, 0)
        review["translated_lang"] = get_str(el, 2, 14, 1)
        review["text_original"] = get_str(el, 2, 15, 0, 0)
        review["text_translated"] = get_str(el, 2, 15, 1, 0)

        r2 = get_list(el, 2)
        is_aggregator = len(r2) > 0 and r2[0] is None
        if is_aggregator:
            review["rating_float"] = get_float(el, 2, 8, 1)
        else:
            review["rating_float"] = float(review["Rating"])

        review["reply_posted_at_unix_micros"] = 0
        review["reply_updated_at_unix_micros"] = 0
        review["reply_language"] = ""
        review["reply_translated_lang"] = ""
        review["reply_text_original"] = ""
        review["reply_text"] = ""

        r3 = get_list(el, 3)
        if len(r3) >= 15 and r3[1] is not None:
            review["reply_posted_at_unix_micros"] = int(get_float(el, 3, 1))
            review["reply_updated_at_unix_micros"] = int(get_float(el, 3, 2))
            review["reply_language"] = get_str(el, 3, 13, 0)
            review["reply_translated_lang"] = get_str(el, 3, 13, 1)
            review["reply_text_original"] = get_str(el, 3, 14, 0, 0)
            review["reply_text"] = get_str(el, 3, 14, 1, 0)

        if not review["Name"]:
            continue

        imgs = get_list(el, 2, 2)
        for j in range(len(imgs)):
            url = get_str(imgs, j, 1, 6, 0)
            if url:
                if review["Images"] is None:
                    review["Images"] = []
                review["Images"].append(url)

        ans.append(review)
    return ans


def extract_reviews_page(data: bytes | str, now_micros: int | None = None) -> list[dict]:
    """gmaps/entry.go:330-357 — parse one review-RPC page body."""
    if isinstance(data, bytes):
        text = data.decode("utf-8", "replace")
    else:
        text = data
    if text.startswith(")]}'\n"):
        text = text[5:]
    elif text.startswith(")]}'"):
        text = text[4:]
    try:
        jd = json.loads(text)
    except ValueError:
        return []
    if not isinstance(jd, list) or len(jd) < 3:
        return []
    reviews_i = get_list(jd, 2)
    if not reviews_i:
        reviews_i = get_list(jd, 0)
    return parse_reviews(reviews_i, now_micros)


def entry_from_json(
    raw: bytes | str,
    review_count_only: bool = False,
    now_micros: int | None = None,
) -> dict[str, Any]:
    """gmaps/entry.go:360-542 — the master extractor.

    Raises ValueError on invalid JSON/shape (the Go version returns an error;
    its panic-recovery wrapper corresponds to the caller-side try/except in
    the Spark UDF).
    """
    if isinstance(raw, bytes):
        raw = raw.decode("utf-8", "replace")
    try:
        jd = json.loads(raw)
    except ValueError as exc:
        raise ValueError(f"invalid json: {exc}") from exc
    if not isinstance(jd, list) or len(jd) < 7:
        raise ValueError("invalid json")
    darray = jd[6]
    if not isinstance(darray, list):
        raise ValueError("invalid json")

    entry = empty_entry()
    entry["review_count"] = int(get_float(darray, 4, 8))
    if review_count_only:
        return entry

    entry["link"] = get_str(darray, 27)
    entry["title"] = get_str(darray, 11)

    categories_i = get_list(darray, 13)
    entry["categories"] = [c if isinstance(c, str) else "" for c in categories_i]
    if entry["categories"]:
        entry["category"] = entry["categories"][0]

    addr = get_str(darray, 18)
    prefix = entry["title"] + ","
    if addr.startswith(prefix):
        addr = addr[len(prefix):]
    entry["address"] = addr.strip()

    entry["open_hours"] = _get_hours(darray)
    entry["popular_times"] = _get_popular_times(darray)
    entry["web_site"] = extract_actual_url(get_str(darray, 7, 0))
    entry["phone"] = get_str(darray, 178, 0, 0)
    entry["plus_code"] = get_str(darray, 183, 2, 2, 0)
    entry["review_rating"] = get_float(darray, 4, 7)
    entry["latitude"] = get_float(darray, 9, 2)
    entry["longtitude"] = get_float(darray, 9, 3)
    entry["cid"] = get_str(jd, 25, 3, 0, 13, 0, 0, 1)
    entry["status"] = get_str(darray, 34, 4, 4)
    entry["description"] = get_str(darray, 32, 1, 1)
    entry["reviews_link"] = get_str(darray, 4, 3, 0)
    entry["thumbnail"] = get_str(darray, 72, 0, 1, 6, 0)
    entry["timezone"] = get_str(darray, 30)
    entry["price_range"] = get_str(darray, 4, 2)
    entry["data_id"] = get_str(darray, 10)
    entry["place_id"] = get_str(darray, 78)

    items = _get_link_source(get_list(darray, 171, 0), link=[3, 0, 6, 0], source=[2]) or []
    entry["images"] = [{"title": it["source"], "image": it["link"]} for it in items]
    entry["street_view_url"] = _extract_street_view_url(entry["images"])

    entry["reservations"] = _get_link_source(get_list(darray, 46), link=[0], source=[1])

    order_online_i = get_list(darray, 75, 0, 1, 2)
    if not order_online_i:
        order_online_i = get_list(darray, 75, 0, 0, 2)
    entry["order_online"] = _get_link_source(order_online_i, link=[1, 2, 0], source=[0, 0])

    entry["menu"] = {"link": get_str(darray, 38, 0), "source": get_str(darray, 38, 1)}

    owner_id = get_str(darray, 57, 2)
    entry["owner"] = {
        "id": owner_id,
        "name": get_str(darray, 57, 1),
        "link": f"https://www.google.com/maps/contrib/{owner_id}" if owner_id else "",
    }

    entry["complete_address"] = {
        "borough": get_str(darray, 183, 1, 0),
        "street": get_str(darray, 183, 1, 1),
        "city": get_str(darray, 183, 1, 3),
        "postal_code": get_str(darray, 183, 1, 4),
        "state": get_str(darray, 183, 1, 5),
        "country": get_str(darray, 183, 1, 6),
    }

    about_i = get_list(darray, 100, 1)
    for i in range(len(about_i)):
        el = get_list(about_i, i)
        about = {"id": get_str(el, 0), "name": get_str(el, 1), "options": []}
        opts_i = get_list(el, 2)
        for j in range(len(opts_i)):
            opt = {
                "enabled": get_float(opts_i, j, 2, 1, 0, 0) == 1,
                "name": get_str(opts_i, j, 1),
                "values": _get_option_values(get_list(opts_i, j)),
            }
            if opt["name"]:
                _add_or_merge_option(about["options"], opt)
            if about["id"] == "payments" and opt["name"] == "Credit cards" and opt["values"]:
                entry["credit_cards_accepted"] = _merge_string_slices(
                    entry["credit_cards_accepted"], opt["values"]
                )
        if entry["about"] is None:
            entry["about"] = []
        entry["about"].append(about)

    entry["reviews_per_rating"] = {
        1: int(get_float(darray, 175, 3, 0)),
        2: int(get_float(darray, 175, 3, 1)),
        3: int(get_float(darray, 175, 3, 2)),
        4: int(get_float(darray, 175, 3, 3)),
        5: int(get_float(darray, 175, 3, 4)),
    }

    reviews_i = get_list(darray, 175, 9, 0, 0)
    if reviews_i:
        entry["user_reviews"] = parse_reviews(reviews_i, now_micros)
    else:
        reviews_i = get_list(darray, 175, 9, 0)
        if reviews_i:
            entry["user_reviews"] = parse_reviews(reviews_i, now_micros)
        else:
            entry["user_reviews"] = []

    return entry


def validate_entry(entry: dict) -> bool:
    """gmaps/entry.go:223-233 — title and category must be non-empty."""
    return bool(entry["title"]) and bool(entry["category"])


def is_website_valid_for_email(web_site: str) -> bool:
    """gmaps/entry.go:203-221 — note the reference's 'instragram' misspelling
    is preserved deliberately (behavioral parity)."""
    if not web_site:
        return False
    for needle in ("facebook", "instragram", "twitter"):
        if needle in web_site:
            return False
    return True


def haversine_distance(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """gmaps/entry.go:176-195 — great-circle meters, R=6371e3."""
    r = 6371e3
    clat, clon = math.radians(lat1), math.radians(lon1)
    elat, elon = math.radians(lat2), math.radians(lon2)
    dlat, dlon = elat - clat, elon - clon
    a = (
        math.sin(dlat / 2) ** 2
        + math.cos(clat) * math.cos(elat) * math.sin(dlon / 2) ** 2
    )
    return r * 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a))
