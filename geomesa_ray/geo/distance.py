"""Spherical distances, vectorized.

Analog of the reference's geodesic calculations (GeometricDistanceFunctions
st_distanceSphere, reference geomesa-spark/.../GeometricDistanceFunctions.scala,
and the kNN process's distance ordering). Haversine on the WGS84 mean radius —
deterministic, vectorizable, and the same ordering as true geodesics at the
scales the tests exercise.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6_371_008.8  # IUGG mean radius


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters; broadcasts numpy-style."""
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def haversine_matrix_m(qlon, qlat, plon, plat) -> np.ndarray:
    """(nq,) query points x (np,) data points -> (nq, np) distance matrix."""
    return haversine_m(
        np.asarray(qlon)[:, None],
        np.asarray(qlat)[:, None],
        np.asarray(plon)[None, :],
        np.asarray(plat)[None, :],
    )


def meters_to_degrees_at(lat_deg, meters) -> tuple[np.ndarray, np.ndarray]:
    """Approximate (dlon, dlat) degree half-widths of a `meters` radius at a
    latitude — the reference's TubeBuilder.metersToDegrees analog
    (geomesa-process/.../tube/TubeBuilder.scala:56-70)."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    # 1% pad: the planar formula slightly UNDERestimates the true geodesic
    # circle's lon half-width near its east/west extremes; envelope callers
    # (proximity/tube pre-filters) need a conservative bound
    dlat = 1.01 * np.asarray(meters) / 111_194.9
    dlon = 1.01 * np.asarray(meters) / (111_194.9 * np.maximum(np.cos(lat), 1e-6))
    return dlon, dlat


def geodesic_halfwidths(lat_deg, meters) -> tuple[np.ndarray, np.ndarray]:
    """EXACT spherical (dlon, dlat) degree half-widths of the geodesic
    radius-r disk at a latitude — a guaranteed bbox superset, unlike the
    1%-padded planar `meters_to_degrees_at`, whose lon estimate falls short
    of the true asin(sin(r/R)/cos(lat)) once r*tan(lat)/R grows (doubled kNN
    radii at mid/high latitudes). Use this wherever a bbox must CONTAIN the
    full disk for a correctness guarantee; keep the planar form where an
    oracle mirrors it (tube).

    dlat = r/R exactly (meridian arc). dlon = asin(sin(r/R)/cos(lat)); when
    the disk encloses a pole (sin(r/R) >= cos(lat)) or spans a hemisphere
    (r >= pi*R/2) every longitude is inside -> 180."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    c = np.asarray(meters, dtype=np.float64) / EARTH_RADIUS_M
    dlat = np.degrees(c)
    coslat = np.maximum(np.abs(np.cos(lat)), 1e-12)
    s = np.sin(np.minimum(c, np.pi / 2)) / coslat
    dlon = np.where(
        (s >= 1.0) | (c >= np.pi / 2),
        180.0,
        np.degrees(np.arcsin(np.minimum(s, 1.0))),
    )
    # 1e-9 deg (~0.1 mm) guard for float rounding at the disk's extreme points
    return dlon + 1e-9, dlat + 1e-9
