"""Locate the APP_INITIALIZATION_STATE payload inside a stored place page.

Replaces the reference's in-browser JS probe (gmaps/place.go:297-319): it
reads ``window.APP_INITIALIZATION_STATE[3]``, scans that container's values
for arrays holding a string at index 6 (then 5) that starts with ``)]}'``,
and returns the string with the anti-JSON prefix stripped
(gmaps/place.go:274-276).

Our corpus stores the whole page HTML; we find the assignment, balanced-
bracket-parse the array literal (it is valid JSON in practice), and apply the
same [3] → values → [6|5] walk.
"""

from __future__ import annotations

import json

__all__ = ["extract_app_init_blob"]

_MARKER = "window.APP_INITIALIZATION_STATE="


def _balanced_json_array(s: str, start: int) -> str | None:
    """Extract the balanced [...] literal starting at ``start`` (which must
    point at '['), honoring strings/escapes.

    Fast path: when the literal is well-formed JSON, the C decoder's
    ``raw_decode`` finds its end ~10× faster than the Python scan; the
    character scanner remains the fallback for payloads json would reject
    (e.g. trailing garbage inside — the panic-fixture shapes)."""
    import json as _json

    try:
        _, end = _json.JSONDecoder().raw_decode(s, start)
        return s[start:end]
    except ValueError:
        pass
    depth = 0
    in_str = False
    esc = False
    for i in range(start, len(s)):
        ch = s[i]
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
        elif ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                return s[start : i + 1]
    return None


def extract_app_init_blob(html: str | bytes) -> str | None:
    """Return the raw entry JSON (prefix-stripped) or None when absent."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", "replace")
    pos = html.find(_MARKER)
    if pos == -1:
        return None
    start = pos + len(_MARKER)
    while start < len(html) and html[start] in " \t\r\n":
        start += 1
    if start >= len(html) or html[start] != "[":
        return None
    literal = _balanced_json_array(html, start)
    if literal is None:
        return None
    try:
        state = json.loads(literal)
    except ValueError:
        return None
    if not isinstance(state, list) or len(state) < 4:
        return None
    container = state[3]
    if isinstance(container, dict):
        values = list(container.values())
    elif isinstance(container, list):
        values = container
    else:
        return None
    for arr in values:
        if not isinstance(arr, list):
            continue
        for idx in (6, 5):
            if len(arr) > idx and isinstance(arr[idx], str) and arr[idx].startswith(")]}'"):
                raw = arr[idx]
                return raw[4:].strip() if raw.startswith(")]}'") else raw.strip()
    return None
