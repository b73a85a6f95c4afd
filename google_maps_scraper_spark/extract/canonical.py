"""Canonical (byte-identical) serialization of extracted entries.

Reproduces Go's ``json.Marshal(Entry)`` output byte-for-byte:

  * struct-declaration key order with the dual-longitude quirk — MarshalJSON
    emits ``longitude`` first, then the alias struct, whose legacy
    ``longtitude`` key is preserved (gmaps/entry.go:140-153);
  * Review struct: untagged fields keep their Go field names (``Name``,
    ``ProfilePicture``, ``Rating``, ``Description``, ``Images``, ``When``)
    and the reply/published fields honor ``omitempty`` (entry.go:57-84);
  * ``published_at`` renders as Go ``time.Time`` RFC3339Nano (UTC, trailing
    fractional zeros trimmed);
  * CSV projection: 36 columns in the exact order of ``CsvHeaders``
    (entry.go:235-274) with ``stringify`` cell rendering (entry.go:951-963:
    strings as-is, floats ``%f``, nil → '', everything else Go-JSON).
"""

from __future__ import annotations

from typing import Any

from .gojson import GoStruct, go_json_dumps

__all__ = [
    "entry_to_canonical_json",
    "entry_csv_headers",
    "entry_csv_row",
    "csv_row_from_canonical",
    "review_to_gostruct",
]


def _rfc3339_nano_from_micros(micros: int) -> str:
    """Go time.Time.MarshalJSON (RFC3339Nano, UTC) from unix micros."""
    import datetime as _dt

    dt = _dt.datetime.fromtimestamp(micros // 1000000, tz=_dt.timezone.utc)
    frac = micros % 1000000
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if frac:
        frac_s = f"{frac:06d}".rstrip("0")
        return f"{base}.{frac_s}Z"
    return f"{base}Z"


def review_to_gostruct(r: dict) -> GoStruct:
    """Review struct → ordered fields with omitempty semantics."""
    fields: list[tuple[str, Any]] = [
        ("Name", r["Name"]),
        ("ProfilePicture", r["ProfilePicture"]),
        ("Rating", r["Rating"]),
        ("Description", r["Description"]),
        ("Images", r["Images"]),
        ("When", r["When"]),
        ("review_id", r["review_id"]),
        ("source", r["source"]),
        ("rating_scale", r["rating_scale"]),
        ("rating_float", r["rating_float"]),
        ("author_url", r["author_url"]),
        ("posted_at_unix_micros", r["posted_at_unix_micros"]),
        ("updated_at_unix_micros", r["updated_at_unix_micros"]),
        ("language", r["language"]),
        ("translated_lang", r["translated_lang"]),
        ("text_original", r["text_original"]),
        ("text_translated", r["text_translated"]),
    ]
    # omitempty block (entry.go:77-83)
    if r["reply_text"]:
        fields.append(("reply_text", r["reply_text"]))
    if r["reply_text_original"]:
        fields.append(("reply_text_original", r["reply_text_original"]))
    if r["reply_language"]:
        fields.append(("reply_language", r["reply_language"]))
    if r["reply_translated_lang"]:
        fields.append(("reply_translated_lang", r["reply_translated_lang"]))
    if r["reply_posted_at_unix_micros"]:
        fields.append(("reply_posted_at_unix_micros", r["reply_posted_at_unix_micros"]))
    if r["reply_updated_at_unix_micros"]:
        fields.append(("reply_updated_at_unix_micros", r["reply_updated_at_unix_micros"]))
    if r.get("published_at_micros") is not None:
        fields.append(("published_at", _rfc3339_nano_from_micros(r["published_at_micros"])))
    return GoStruct(fields)


def _image_gs(img: dict) -> GoStruct:
    return GoStruct([("title", img["title"]), ("image", img["image"])])


def _link_source_gs(ls: dict) -> GoStruct:
    return GoStruct([("link", ls["link"]), ("source", ls["source"])])


def _owner_gs(o: dict) -> GoStruct:
    return GoStruct([("id", o["id"]), ("name", o["name"]), ("link", o["link"])])


def _address_gs(a: dict) -> GoStruct:
    return GoStruct([
        ("borough", a["borough"]),
        ("street", a["street"]),
        ("city", a["city"]),
        ("postal_code", a["postal_code"]),
        ("state", a["state"]),
        ("country", a["country"]),
    ])


def _option_gs(o: dict) -> GoStruct:
    fields: list[tuple[str, Any]] = [("name", o["name"]), ("enabled", o["enabled"])]
    if o["values"]:  # omitempty (entry.go:48)
        fields.append(("values", o["values"]))
    return GoStruct(fields)


def _about_gs(a: dict) -> GoStruct:
    return GoStruct([
        ("id", a["id"]),
        ("name", a["name"]),
        ("options", [_option_gs(o) for o in a["options"]] if a["options"] is not None else None),
    ])


def _maybe_list(v: list | None, f) -> list | None:
    if v is None:
        return None
    return [f(x) for x in v]


def entry_to_gostruct(e: dict) -> GoStruct:
    """Entry → ordered fields matching MarshalJSON (entry.go:145-153 wrapper
    around the struct order of entry.go:90-134)."""
    return GoStruct([
        ("longitude", e["longtitude"]),
        ("input_id", e["input_id"]),
        ("link", e["link"]),
        ("cid", e["cid"]),
        ("title", e["title"]),
        ("categories", e["categories"]),
        ("category", e["category"]),
        ("address", e["address"]),
        ("open_hours", e["open_hours"]),
        ("popular_times", e["popular_times"]),
        ("web_site", e["web_site"]),
        ("phone", e["phone"]),
        ("plus_code", e["plus_code"]),
        ("review_count", e["review_count"]),
        ("review_rating", e["review_rating"]),
        ("reviews_per_rating", e["reviews_per_rating"]),
        ("latitude", e["latitude"]),
        ("longtitude", e["longtitude"]),
        ("status", e["status"]),
        ("description", e["description"]),
        ("reviews_link", e["reviews_link"]),
        ("thumbnail", e["thumbnail"]),
        ("timezone", e["timezone"]),
        ("price_range", e["price_range"]),
        ("data_id", e["data_id"]),
        ("street_view_url", e["street_view_url"]),
        ("place_id", e["place_id"]),
        ("images", _maybe_list(e["images"], _image_gs)),
        ("reservations", _maybe_list(e["reservations"], _link_source_gs)),
        ("order_online", _maybe_list(e["order_online"], _link_source_gs)),
        ("menu", _link_source_gs(e["menu"])),
        ("owner", _owner_gs(e["owner"])),
        ("complete_address", _address_gs(e["complete_address"])),
        ("credit_cards_accepted", e["credit_cards_accepted"]),
        ("about", _maybe_list(e["about"], _about_gs)),
        ("user_reviews", _maybe_list(e["user_reviews"], review_to_gostruct)),
        ("user_reviews_extended", _maybe_list(e["user_reviews_extended"], review_to_gostruct)),
        ("emails", e["emails"]),
    ])


def entry_to_canonical_json(e: dict) -> str:
    return go_json_dumps(entry_to_gostruct(e))


_CSV_HEADERS = [
    "input_id", "link", "title", "category", "address", "open_hours",
    "popular_times", "website", "phone", "plus_code", "review_count",
    "review_rating", "reviews_per_rating", "latitude", "longitude", "cid",
    "status", "descriptions", "reviews_link", "thumbnail", "timezone",
    "price_range", "data_id", "street_view_url", "place_id", "images",
    "reservations", "order_online", "menu", "owner", "complete_address",
    "credit_cards_accepted", "about", "user_reviews",
    "user_reviews_extended", "emails",
]


def entry_csv_headers() -> list[str]:
    """entry.go:235-274 — fixed 36-column order."""
    return list(_CSV_HEADERS)


def _stringify(v: Any) -> str:
    """entry.go:951-963.

    Parity note: CsvRow always passes *typed* values, so a nil Go map/slice
    arrives as a typed nil inside ``any`` — Go's ``case nil`` does NOT match
    and json.Marshal renders ``null``.  Python ``None`` therefore maps to
    ``"null"`` here (the untyped-nil → "" branch is unreachable from CsvRow).
    """
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return go_json_dumps(v)
    if isinstance(v, float):
        return f"{v:f}"
    return go_json_dumps(v)


def entry_csv_row(e: dict) -> list[str]:
    """entry.go:276-315 — cell rendering parity (stringify + joins)."""
    open_hours = e["open_hours"]
    popular = e["popular_times"]
    return [
        e["input_id"],
        e["link"],
        e["title"],
        e["category"],
        e["address"],
        _stringify(open_hours),
        _stringify(popular),
        e["web_site"],
        e["phone"],
        e["plus_code"],
        _stringify(e["review_count"]),
        _stringify(float(e["review_rating"])),
        _stringify(e["reviews_per_rating"]),
        _stringify(float(e["latitude"])),
        _stringify(float(e["longtitude"])),
        e["cid"],
        e["status"],
        e["description"],
        e["reviews_link"],
        e["thumbnail"],
        e["timezone"],
        e["price_range"],
        e["data_id"],
        e["street_view_url"],
        e["place_id"],
        _stringify(_maybe_list(e["images"], _image_gs)),
        _stringify(_maybe_list(e["reservations"], _link_source_gs)),
        _stringify(_maybe_list(e["order_online"], _link_source_gs)),
        _stringify(_link_source_gs(e["menu"])),
        _stringify(_owner_gs(e["owner"])),
        _stringify(_address_gs(e["complete_address"])),
        ", ".join(e["credit_cards_accepted"] or []),
        _stringify(_maybe_list(e["about"], _about_gs)),
        _stringify(_maybe_list(e["user_reviews"], review_to_gostruct)),
        _stringify(_maybe_list(e["user_reviews_extended"], review_to_gostruct)),
        ", ".join(e["emails"] or []),
    ]


# ---- CSV cells straight from canonical JSON --------------------------------
#
# The results table carries only the canonical (Go-marshaled) JSON per row;
# the CSV sink renders the 36 cells from it.  Nested objects must keep their
# original struct order when re-serialized, so we parse with an
# order-preserving hook into GoStruct rather than plain dicts.

_CANON_STR_CELLS = {
    # csv column → canonical json key, rendered as-is (string fields)
    "input_id": "input_id", "link": "link", "title": "title",
    "category": "category", "address": "address", "website": "web_site",
    "phone": "phone", "plus_code": "plus_code", "cid": "cid",
    "status": "status", "descriptions": "description",
    "reviews_link": "reviews_link", "thumbnail": "thumbnail",
    "timezone": "timezone", "price_range": "price_range",
    "data_id": "data_id", "street_view_url": "street_view_url",
    "place_id": "place_id",
}
_CANON_JSON_CELLS = {
    "open_hours": "open_hours", "popular_times": "popular_times",
    "reviews_per_rating": "reviews_per_rating", "images": "images",
    "reservations": "reservations", "order_online": "order_online",
    "menu": "menu", "owner": "owner", "complete_address": "complete_address",
    "about": "about", "user_reviews": "user_reviews",
    "user_reviews_extended": "user_reviews_extended",
}
_CANON_JOIN_CELLS = {
    "credit_cards_accepted": "credit_cards_accepted", "emails": "emails",
}
_CANON_FLOAT_CELLS = {
    "review_rating": "review_rating", "latitude": "latitude",
    "longitude": "longtitude",  # legacy key wins (entry.go:140-174)
}


def csv_row_from_canonical(canonical_json: str) -> list[str]:
    """36 CSV cells (entry.go:276-315 parity) from the canonical entry JSON.

    Nested-struct cells re-serialize byte-identically because object key
    order is preserved on parse (GoStruct hook) and scalars re-render through
    the same Go-compatible formatters that produced them.
    """
    import json as _json

    gs = _json.loads(
        canonical_json, object_pairs_hook=lambda pairs: GoStruct(list(pairs))
    )
    top = dict(gs.fields)

    def _as_list(v):
        if v is None:
            return []
        return [x if isinstance(x, str) else str(x) for x in v]

    row: list[str] = []
    for col in _CSV_HEADERS:
        if col in _CANON_STR_CELLS:
            row.append(top.get(_CANON_STR_CELLS[col]) or "")
        elif col in _CANON_JSON_CELLS:
            row.append(go_json_dumps(top.get(_CANON_JSON_CELLS[col])))
        elif col in _CANON_FLOAT_CELLS:
            row.append(f"{float(top.get(_CANON_FLOAT_CELLS[col]) or 0.0):f}")
        elif col == "review_count":
            row.append(str(int(top.get("review_count") or 0)))
        elif col in _CANON_JOIN_CELLS:
            row.append(", ".join(_as_list(top.get(_CANON_JOIN_CELLS[col]))))
        else:  # pragma: no cover
            raise KeyError(col)
    return row
