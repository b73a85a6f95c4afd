"""Open Location Code (plus code) encoder.

Pure-Python implementation of the published OLC algorithm
(https://github.com/google/open-location-code — Apache-2.0 public spec).
The reference calls ``olc.Encode(lat, lon, 10)`` for fast-mode results
(gmaps/multiple.go:75).
"""

from __future__ import annotations

__all__ = ["olc_encode"]

_ALPHABET = "23456789CFGHJMPQRVWX"
_SEPARATOR_POS = 8
_PAIR_CODE_LEN = 10
_MAX_CODE_LEN = 15
_LAT_MAX = 90
_LON_MAX = 180
_GRID_COLS = 4
_GRID_ROWS = 5
# Value of the most significant pair digit in degrees.
_PAIR_FIRST_VALUE = 20.0
_FINAL_LAT_PRECISION = 2.5e7  # pow(20,2) * pow(5,5) per spec
_FINAL_LON_PRECISION = 8.192e6  # pow(20,2) * pow(4,5)


def _clip_latitude(lat: float) -> float:
    return min(_LAT_MAX, max(-_LAT_MAX, lat))


def _normalize_longitude(lon: float) -> float:
    while lon < -_LON_MAX:
        lon += 2 * _LON_MAX
    while lon >= _LON_MAX:
        lon -= 2 * _LON_MAX
    return lon


def _lat_precision(code_len: int) -> float:
    if code_len <= _PAIR_CODE_LEN:
        return 20.0 ** ((code_len // -2) + 2)
    return (20.0 ** -3) / (_GRID_ROWS ** (code_len - _PAIR_CODE_LEN))


def olc_encode(lat: float, lon: float, code_len: int = _PAIR_CODE_LEN) -> str:
    """Encode lat/lon to a plus code of ``code_len`` significant digits."""
    if code_len < 2 or (code_len < _PAIR_CODE_LEN and code_len % 2 == 1):
        raise ValueError(f"invalid code length: {code_len}")
    code_len = min(code_len, _MAX_CODE_LEN)

    lat = _clip_latitude(lat)
    lon = _normalize_longitude(lon)
    if lat == _LAT_MAX:
        lat -= 0.9 * _lat_precision(code_len)

    # Integer-arithmetic encoding per the reference implementations: scale to
    # the finest grid, then emit digits most-significant last.
    lat_val = int(round((lat + _LAT_MAX) * _FINAL_LAT_PRECISION * 1e-0))
    lon_val = int(round((lon + _LON_MAX) * _FINAL_LON_PRECISION * 1e-0))

    code = ""
    if code_len > _PAIR_CODE_LEN:
        for _ in range(_MAX_CODE_LEN - _PAIR_CODE_LEN):
            lat_digit = lat_val % _GRID_ROWS
            lon_digit = lon_val % _GRID_COLS
            ndx = lat_digit * _GRID_COLS + lon_digit
            code = _ALPHABET[ndx] + code
            lat_val //= _GRID_ROWS
            lon_val //= _GRID_COLS
    else:
        lat_val //= _GRID_ROWS ** (_MAX_CODE_LEN - _PAIR_CODE_LEN)
        lon_val //= _GRID_COLS ** (_MAX_CODE_LEN - _PAIR_CODE_LEN)

    for _ in range(_PAIR_CODE_LEN // 2):
        code = _ALPHABET[lon_val % 20] + code
        code = _ALPHABET[lat_val % 20] + code
        lat_val //= 20
        lon_val //= 20

    code = code[:_SEPARATOR_POS] + "+" + code[_SEPARATOR_POS:]

    if code_len >= _SEPARATOR_POS:
        return code[: code_len + 1]
    return code[:code_len].ljust(_SEPARATOR_POS, "0") + "+"
