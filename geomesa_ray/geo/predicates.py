"""Vectorized spatial predicates (no native geo deps).

The exact-filter analog of the reference's JTS predicate evaluation in
LocalQueryRunner / FilterTransformIterator (reference
geomesa-index-api/.../planning/LocalQueryRunner.scala): after the coarse
cell/key filter, every candidate is checked with the exact geometry
predicate. Here that is vectorized ray-casting point-in-polygon over numpy
arrays — O(points x edges) elementwise ops, no Python row loop.
"""

from __future__ import annotations

import numpy as np


def points_in_bbox(lon, lat, xmin, ymin, xmax, ymax) -> np.ndarray:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    return (lon >= xmin) & (lon <= xmax) & (lat >= ymin) & (lat <= ymax)


def _ring_crossings(lon: np.ndarray, lat: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Count of edges a ray going +x from each point crosses (even-odd rule).

    ring: (k, 2) closed or open ring (closure enforced here).
    Returns int array of crossings per point. Points exactly on an edge may
    fall either side (standard ray-casting caveat; matches JTS's tolerance
    behavior closely enough for interior/exterior classification of data
    points against query polygons).
    """
    rx = ring[:, 0]
    ry = ring[:, 1]
    if rx[0] != rx[-1] or ry[0] != ry[-1]:
        rx = np.append(rx, rx[0])
        ry = np.append(ry, ry[0])
    x1, y1 = rx[:-1], ry[:-1]
    x2, y2 = rx[1:], ry[1:]
    # broadcast points (n,1) against edges (1,k)
    plon = lon[:, None]
    plat = lat[:, None]
    cond = (y1[None, :] > plat) != (y2[None, :] > plat)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (plat - y1[None, :]) / (y2[None, :] - y1[None, :]) * (
            x2[None, :] - x1[None, :]
        )
    crossing = cond & (plon < xint)
    return crossing.sum(axis=1)


class Polygon:
    """A polygon (exterior ring + optional holes) with vectorized contains.

    Built once (driver or actor __init__), probed per batch.
    """

    __slots__ = ("rings", "xmin", "ymin", "xmax", "ymax", "_max_edges")

    def __init__(self, rings):
        """rings: [exterior, hole1, ...] each an (k, 2) array of lon/lat."""
        self.rings = [np.asarray(r, dtype=np.float64) for r in rings]
        ext = self.rings[0]
        self.xmin = float(ext[:, 0].min())
        self.xmax = float(ext[:, 0].max())
        self.ymin = float(ext[:, 1].min())
        self.ymax = float(ext[:, 1].max())

    @classmethod
    def from_wkt(cls, wkt: str) -> "Polygon | MultiPolygon":
        from geomesa_ray.geo.wkt import parse_wkt

        g = parse_wkt(wkt)
        if g["type"] == "Polygon":
            return cls(g["coords"])
        if g["type"] == "MultiPolygon":
            return MultiPolygon([cls(rings) for rings in g["coords"]])
        raise ValueError(f"not a polygon: {g['type']}")

    @classmethod
    def from_bbox(cls, xmin, ymin, xmax, ymax) -> "Polygon":
        return cls([np.array([[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]])])

    def bbox(self):
        return self.xmin, self.ymin, self.xmax, self.ymax

    def contains(self, lon, lat) -> np.ndarray:
        """Vectorized even-odd PIP with a bbox fast-reject."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        out = np.zeros(lon.shape, dtype=bool)
        cand = points_in_bbox(lon, lat, self.xmin, self.ymin, self.xmax, self.ymax)
        if not cand.any():
            return out
        clon, clat = lon[cand], lat[cand]
        crossings = _ring_crossings(clon, clat, self.rings[0])
        inside = (crossings % 2) == 1
        for hole in self.rings[1:]:
            inside &= (_ring_crossings(clon, clat, hole) % 2) == 0
        out[cand] = inside
        return out

    def area_planar(self) -> float:
        """Shoelace area in degree^2 (used for size heuristics only)."""
        total = 0.0
        for idx, ring in enumerate(self.rings):
            x, y = ring[:, 0], ring[:, 1]
            a = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
            total += a if idx == 0 else -a
        return total


class MultiPolygon:
    __slots__ = ("polys", "xmin", "ymin", "xmax", "ymax")

    def __init__(self, polys):
        self.polys = list(polys)
        self.xmin = min(p.xmin for p in self.polys)
        self.xmax = max(p.xmax for p in self.polys)
        self.ymin = min(p.ymin for p in self.polys)
        self.ymax = max(p.ymax for p in self.polys)

    def bbox(self):
        return self.xmin, self.ymin, self.xmax, self.ymax

    def contains(self, lon, lat) -> np.ndarray:
        out = np.zeros(np.asarray(lon).shape, dtype=bool)
        for p in self.polys:
            out |= p.contains(lon, lat)
        return out

    def area_planar(self) -> float:
        return sum(p.area_planar() for p in self.polys)
