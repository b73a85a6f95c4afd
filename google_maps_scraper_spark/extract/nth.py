"""Safe positional descent into untyped nested JSON arrays.

Re-expresses the semantics of ``getNthElementAndCast[T]`` from the reference
(``gmaps/entry.go:857-902``): walk a ``[]any`` by successive indexes; any
out-of-range index, nil element, or type mismatch yields the zero value of the
requested type.

Type-matching parity notes (Go ``encoding/json`` → Python ``json``):

* Go unmarshals every JSON number into ``float64``; Python yields ``int`` for
  integral literals. ``get_float`` therefore accepts both ``int`` and
  ``float`` (but never ``bool``, which Python treats as an ``int`` subclass
  while Go would unmarshal JSON ``true`` as ``bool``, not ``float64``).
* Go string assertion matches only JSON strings → ``get_str`` accepts ``str``.
* Go ``[]any`` assertion matches only JSON arrays → ``get_list`` accepts
  ``list``.
"""

from __future__ import annotations

from typing import Any

__all__ = ["get_str", "get_float", "get_list", "get_any"]


def _descend(arr: Any, indexes: tuple[int, ...]) -> Any:
    """Walk all but the last index as nested lists; return the element at the
    last index, or ``None`` on any miss.  Mirrors gmaps/entry.go:857-902."""
    if not indexes:
        return None

    idxs = list(indexes)
    while len(idxs) > 1:
        idx = idxs.pop(0)
        if not isinstance(arr, list) or idx >= len(arr) or idx < 0:
            return None
        nxt = arr[idx]
        if nxt is None:
            return None
        if not isinstance(nxt, list):
            return None
        arr = nxt

    idx = idxs[0]
    if not isinstance(arr, list) or len(arr) == 0 or idx >= len(arr) or idx < 0:
        return None
    return arr[idx]


def get_str(arr: Any, *indexes: int) -> str:
    """``getNthElementAndCast[string]`` — '' on miss."""
    v = _descend(arr, indexes)
    return v if isinstance(v, str) else ""


def get_float(arr: Any, *indexes: int) -> float:
    """``getNthElementAndCast[float64]`` — 0.0 on miss.

    Accepts int or float (JSON numbers), never bool.
    """
    v = _descend(arr, indexes)
    if isinstance(v, bool):
        return 0.0
    if isinstance(v, (int, float)):
        return float(v)
    return 0.0


def get_list(arr: Any, *indexes: int) -> list:
    """``getNthElementAndCast[[]any]`` — [] on miss."""
    v = _descend(arr, indexes)
    return v if isinstance(v, list) else []


def get_any(arr: Any, *indexes: int) -> Any:
    """Raw element at path, or None on miss (internal helper)."""
    return _descend(arr, indexes)
