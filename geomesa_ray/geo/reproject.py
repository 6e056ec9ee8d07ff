"""Coordinate reprojection: EPSG:4326 (lon/lat) <-> EPSG:3857 (web mercator).

Analog of the reference's result reprojection (reference
geomesa-index-api/.../utils/Reprojection.scala, applied at
QueryPlanner.scala:86-90). The engine computes in 4326; 3857 is the tiling
CRS every slippy-map pipeline needs. Spherical-mercator math (public
formulas), vectorized numpy; latitudes clamped to the Mercator domain.
"""

from __future__ import annotations

import numpy as np

_R = 6378137.0  # WGS84 semi-major axis (spherical mercator radius)
MAX_LAT = 85.051128779806604  # atan(sinh(pi)) in degrees


def lonlat_to_mercator(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    x = np.radians(lon) * _R
    y = np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) * _R
    return x, y


def mercator_to_lonlat(x, y) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / _R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / _R)) - np.pi / 2.0)
    return lon, lat


def slippy_tile(lon, lat, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """Web-map tile indices (z/x/y scheme) — the raster-tile addressing the
    density grids feed."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    n = 1 << zoom
    tx = np.clip(((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    lat_r = np.radians(lat)
    ty = np.clip(
        ((1.0 - np.arcsinh(np.tan(lat_r)) / np.pi) / 2.0 * n).astype(np.int64), 0, n - 1
    )
    return tx, ty


def reproject_stage(lon_col: str = "lon", lat_col: str = "lat"):
    """map_batches fn adding mercator_x / mercator_y columns."""
    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        x, y = lonlat_to_mercator(
            t.column(lon_col).to_numpy(zero_copy_only=False),
            t.column(lat_col).to_numpy(zero_copy_only=False),
        )
        return t.append_column("mercator_x", pa.array(x)).append_column("mercator_y", pa.array(y))

    return fn
