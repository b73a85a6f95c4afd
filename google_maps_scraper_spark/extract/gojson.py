"""Go ``encoding/json``-compatible serialization primitives.

The reference persists results as the JSON encoding of its ``Entry`` struct
(``gmaps/entry.go:90-153``, ``postgres/resultwriter.go:91-139``).  To honor the
byte-identical-per-url invariant we reproduce Go's encoder behavior exactly:

* struct-declaration key order (callers pass ordered key/value pairs);
* map keys sorted bytewise on their *string* representation (Go sorts the
  stringified keys, so int keys 0..23 order as "0","1","10",...,"2","20",...);
* HTML-safe escaping: ``<`` ``>`` ``&`` → ``\\u003c`` ``\\u003e`` ``\\u0026``,
  U+2028/U+2029 escaped, control chars ``\\u00XX`` except ``\\n \\r \\t``;
* float formatting per Go: shortest round-trip digits, ``e`` form only when
  ``abs < 1e-6`` or ``abs >= 1e21``, exponent rendered as ``e+07`` style;
* ``nil`` slice/map → ``null`` (Python ``None``), empty-but-allocated slice →
  ``[]`` (Python ``[]``).
"""

from __future__ import annotations

import math
import re
from typing import Any

__all__ = ["go_json_dumps", "go_float_repr", "go_string_escape"]

# Characters Go's HTML-safe encoder escapes specially.
_GO_ESCAPES = {
    '"': '\\"',
    "\\": "\\\\",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "<": "\\u003c",
    ">": "\\u003e",
    "&": "\\u0026",
    " ": "\\u2028",
    " ": "\\u2029",
}


# any char the escaper would touch; clean strings (the overwhelmingly common
# case) take the zero-copy fast path
_NEEDS_ESCAPE = re.compile('[\x00-\x1f"\\\\<>&\u2028\u2029]')


def go_string_escape(s: str) -> str:
    """Escape a string body exactly as Go's json encoder (HTML-safe mode)."""
    if not _NEEDS_ESCAPE.search(s):
        return s
    out = []
    for ch in s:
        esc = _GO_ESCAPES.get(ch)
        if esc is not None:
            out.append(esc)
        elif ch < "\x20":
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    return "".join(out)


def go_float_repr(f: float) -> str:
    """Render a float as Go encoding/json does (encode.go floatEncoder).

    Go uses strconv.AppendFloat(fmt='f') unless abs < 1e-6 or >= 1e21, in
    which case 'e' with the "1e+21"-style exponent (minimum two digits are NOT
    padded by Go: it trims a leading zero from exponents like e-07 → e-07?
    Go keeps strconv's form, e.g. ``1e+21``, ``1e-07``).  Python's repr yields
    the same shortest digits; we reshape the exponent/format to match.
    """
    if math.isnan(f) or math.isinf(f):
        raise ValueError("json: unsupported value: " + repr(f))
    if f == int(f) and abs(f) < 1e16:
        # Integral floats: Go prints shortest form, e.g. 5 → "5", -0.0 → "-0"
        i = int(f)
        if i == 0 and math.copysign(1.0, f) < 0:
            return "-0"
        if 1e-6 <= abs(f) or f == 0:
            return str(i)

    a = abs(f)
    use_e = a != 0 and (a < 1e-6 or a >= 1e21)

    # Shortest round-trip digits from Python repr (same shortest guarantee as Go).
    r = repr(f)
    if "e" in r or "E" in r:
        mant, _, exp = r.partition("e")
        exp_i = int(exp)
    else:
        mant, exp_i = r, 0

    neg = mant.startswith("-")
    if neg:
        mant = mant[1:]
    if "." in mant:
        int_part, frac_part = mant.split(".")
    else:
        int_part, frac_part = mant, ""
    digits = (int_part + frac_part).lstrip("0")
    # decimal exponent of the first significant digit
    if digits:
        lead_zeros = len(int_part + frac_part) - len(digits)
        dec_exp = len(int_part) - 1 - lead_zeros + exp_i
    else:
        digits, dec_exp = "0", 0

    sign = "-" if neg else ""

    if use_e:
        d = digits.rstrip("0") or "0"
        mantissa = d[0] + ("." + d[1:] if len(d) > 1 else "")
        e_sign = "+" if dec_exp >= 0 else "-"
        return f"{sign}{mantissa}e{e_sign}{abs(dec_exp):02d}"

    # 'f' form
    d = digits.rstrip("0") or "0"
    if dec_exp >= 0:
        if len(d) <= dec_exp + 1:
            return sign + d + "0" * (dec_exp + 1 - len(d))
        return sign + d[: dec_exp + 1] + "." + d[dec_exp + 1 :]
    return sign + "0." + "0" * (-dec_exp - 1) + d


def _map_key_str(k: Any) -> str:
    if isinstance(k, str):
        return k
    if isinstance(k, bool):
        raise TypeError("unsupported map key type bool")
    if isinstance(k, int):
        return str(k)
    raise TypeError(f"unsupported map key type {type(k)!r}")


def go_json_dumps(v: Any) -> str:
    """Serialize per Go encoding/json semantics.

    * ``dict`` → object with keys sorted bytewise on their string form
      (Go map behavior).  To express *struct* order, pass a list of
      ``(key, value)`` tuples wrapped in :class:`GoStruct`.
    * ``None`` → ``null``; ``[]`` → ``[]``.
    """
    out: list[str] = []
    _write(v, out)
    return "".join(out)


class GoStruct:
    """Ordered key/value sequence serialized in declaration order (Go struct)."""

    __slots__ = ("fields",)

    def __init__(self, fields: list[tuple[str, Any]]):
        self.fields = fields


def _write(v: Any, out: list[str]) -> None:
    if v is None:
        out.append("null")
    elif isinstance(v, GoStruct):
        out.append("{")
        first = True
        for k, val in v.fields:
            if not first:
                out.append(",")
            first = False
            out.append('"' + go_string_escape(k) + '":')
            _write(val, out)
        out.append("}")
    elif isinstance(v, bool):
        out.append("true" if v else "false")
    elif isinstance(v, str):
        out.append('"' + go_string_escape(v) + '"')
    elif isinstance(v, int):
        out.append(str(v))
    elif isinstance(v, float):
        out.append(go_float_repr(v))
    elif isinstance(v, dict):
        items = sorted(((_map_key_str(k), val) for k, val in v.items()), key=lambda kv: kv[0])
        out.append("{")
        first = True
        for k, val in items:
            if not first:
                out.append(",")
            first = False
            out.append('"' + go_string_escape(k) + '":')
            _write(val, out)
        out.append("}")
    elif isinstance(v, (list, tuple)):
        out.append("[")
        first = True
        for val in v:
            if not first:
                out.append(",")
            first = False
            _write(val, out)
        out.append("]")
    else:
        raise TypeError(f"unsupported type {type(v)!r}")
