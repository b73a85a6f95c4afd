"""Geographic grid seeding (bbox → cells) — grid/grid.go parity.

  * ``ParseBoundingBox`` — grid/grid.go:27-80
  * ``GenerateCells``    — grid/grid.go:101-120
  * ``EstimateCellCount``— grid/grid.go:124-142
  * lon-step latitude correction — grid/grid.go:152-165
"""

from __future__ import annotations

import math
from dataclasses import dataclass

__all__ = ["BoundingBox", "parse_bounding_box", "generate_cells", "estimate_cell_count"]

_KM_PER_DEGREE_LAT = 111.32
_MIN_COS_LATITUDE = 1e-6


@dataclass(frozen=True)
class BoundingBox:
    min_lat: float
    min_lon: float
    max_lat: float
    max_lon: float


def parse_bounding_box(s: str) -> BoundingBox:
    parts = s.split(",")
    if len(parts) != 4:
        raise ValueError(
            f"invalid bounding box {s!r}: expected format minLat,minLon,maxLat,maxLon"
        )
    vals = []
    for p in parts:
        try:
            v = float(p.strip())
        except ValueError as exc:
            raise ValueError(f"invalid bounding box value {p!r}") from exc
        if math.isnan(v) or math.isinf(v):
            raise ValueError(f"invalid bounding box value {p!r}: must be finite")
        vals.append(v)
    bbox = BoundingBox(*vals)
    if bbox.min_lat >= bbox.max_lat:
        raise ValueError(f"minLat ({bbox.min_lat:f}) must be less than maxLat ({bbox.max_lat:f})")
    if bbox.min_lon >= bbox.max_lon:
        raise ValueError(f"minLon ({bbox.min_lon:f}) must be less than maxLon ({bbox.max_lon:f})")
    for name, v, lim in (
        ("minLat", bbox.min_lat, 90), ("maxLat", bbox.max_lat, 90),
        ("minLon", bbox.min_lon, 180), ("maxLon", bbox.max_lon, 180),
    ):
        if v < -lim or v > lim:
            raise ValueError(f"{name} ({v:f}) must be between -{lim} and {lim}")
    return bbox


def _normalize_cell_size(cell_size_km: float) -> float:
    return 1.0 if cell_size_km <= 0 else cell_size_km


def _lon_step(bbox: BoundingBox, cell_size_km: float) -> float:
    mid_lat = (bbox.min_lat + bbox.max_lat) / 2
    cos_mid = math.cos(math.radians(mid_lat))
    if abs(cos_mid) < _MIN_COS_LATITUDE:
        cos_mid = -_MIN_COS_LATITUDE if cos_mid < 0 else _MIN_COS_LATITUDE
    return cell_size_km / (_KM_PER_DEGREE_LAT * cos_mid)


def generate_cells(bbox: BoundingBox, cell_size_km: float) -> list[tuple[float, float]]:
    """Cell centers (lat, lon), row-major, matching the Go loop exactly
    (float accumulation order preserved for identical cell sets)."""
    cell_size_km = _normalize_cell_size(cell_size_km)
    lat_step = cell_size_km / _KM_PER_DEGREE_LAT
    lon_step = _lon_step(bbox, cell_size_km)

    cells: list[tuple[float, float]] = []
    lat = bbox.min_lat + lat_step / 2
    while lat < bbox.max_lat:
        lon = bbox.min_lon + lon_step / 2
        while lon < bbox.max_lon:
            cells.append((lat, lon))
            lon += lon_step
        lat += lat_step
    return cells


def estimate_cell_count(bbox: BoundingBox, cell_size_km: float) -> int:
    cell_size_km = _normalize_cell_size(cell_size_km)
    lat_step = cell_size_km / _KM_PER_DEGREE_LAT
    lon_step = _lon_step(bbox, cell_size_km)
    lat_cells = max(0, math.ceil((bbox.max_lat - bbox.min_lat) / lat_step))
    lon_cells = max(0, math.ceil((bbox.max_lon - bbox.min_lon) / lon_step))
    return lat_cells * lon_cells


def cell_geo_coordinates(lat: float, lon: float) -> str:
    """grid/grid.go:90-92 — '%f,%f' rendering."""
    return f"{lat:f},{lon:f}"
