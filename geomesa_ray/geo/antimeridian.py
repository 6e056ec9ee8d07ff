"""Antimeridian (±180°) handling for query geometries.

Parity target: GeoMesa ``GeometryProcessing`` (reference
geomesa-index-api/.../utils/GeometryProcessing.scala:39-166): query
geometries crossing the antimeridian are split into two pieces on either
side of ±180 before range planning, otherwise a Pacific-crossing box
silently matches nothing (its naive envelope covers the whole globe or is
inverted).

Crossing boxes are accepted in either public convention:
- translated coordinates (xmax > 180 or xmin < -180, e.g. lon 170..190), or
- wrapped min>max (xmin > xmax, e.g. 170..-170).
"""

from __future__ import annotations


def crosses_antimeridian(xmin: float, xmax: float) -> bool:
    return xmax > 180.0 or xmin < -180.0 or xmin > xmax


def split_bbox(xmin: float, ymin: float, xmax: float, ymax: float) -> list[tuple]:
    """bbox -> 1 or 2 in-range [-180, 180] boxes (GeometryProcessing split)."""
    if xmax > 180.0:
        return [(xmin, ymin, 180.0, ymax), (-180.0, ymin, xmax - 360.0, ymax)]
    if xmin < -180.0:
        return [(xmin + 360.0, ymin, 180.0, ymax), (-180.0, ymin, xmax, ymax)]
    if xmin > xmax:
        return [(xmin, ymin, 180.0, ymax), (-180.0, ymin, xmax, ymax)]
    return [(xmin, ymin, xmax, ymax)]
