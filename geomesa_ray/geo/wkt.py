"""WKT parsing/formatting without native geometry libraries.

The reference parses geometries via JTS WKTReader inside its converter
functions (reference geomesa-convert/.../transforms/GeometryFunctionFactory.scala).
Here:

- ``parse_points_wkt``: the HOT path — anchored, case-insensitive regex
  extraction of ``POINT (x y)`` strings via Arrow's C++ ``extract_regex``
  (pandas fallback for non-Arrow inputs; no Python row loop).
- ``parse_wkt``: driver-side general parser for POINT / LINESTRING /
  POLYGON / MULTIPOLYGON (query geometries are few; plain Python is fine).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_POINT_RE = r"(?i)^\s*POINT\s*\(\s*(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)\s+(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)\s*\)\s*$"


_POINT_RE_NAMED = (
    r"(?i)^\s*POINT\s*\(\s*(?P<x>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    r"\s+(?P<y>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)\s*\)\s*$"
)


def parse_points_wkt(values) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized: array of 'POINT (x y)' strings -> (lon, lat, valid_mask).

    Hot path uses Arrow's C++ ``extract_regex`` (~3x the pandas engine);
    inputs that can't form an Arrow string array fall back to pandas.
    Invalid / non-point strings yield NaN coords and valid=False.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    try:
        arr = values if isinstance(values, (pa.Array, pa.ChunkedArray)) else pa.array(
            values, type=pa.string()
        )
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        res = pc.extract_regex(arr, pattern=_POINT_RE_NAMED)
        lon = pc.struct_field(res, "x").cast(pa.float64()).to_numpy(zero_copy_only=False)
        lat = pc.struct_field(res, "y").cast(pa.float64()).to_numpy(zero_copy_only=False)
        valid = ~(np.isnan(lon) | np.isnan(lat))
        return lon, lat, valid
    except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
        s = pd.Series(values, dtype="object").astype("string")
        ext = s.str.extract(_POINT_RE, expand=True)
        lon = pd.to_numeric(ext[0], errors="coerce").to_numpy(dtype=np.float64)
        lat = pd.to_numeric(ext[1], errors="coerce").to_numpy(dtype=np.float64)
        valid = ~(np.isnan(lon) | np.isnan(lat))
        return lon, lat, valid


def format_point_wkt(lon, lat) -> pd.Series:
    """Vectorized (lon, lat) -> 'POINT (x y)' strings."""
    lon = pd.Series(np.asarray(lon, dtype=np.float64))
    lat = pd.Series(np.asarray(lat, dtype=np.float64))
    return "POINT (" + lon.astype(str) + " " + lat.astype(str) + ")"


_NUM = r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"


def _parse_ring(text: str) -> np.ndarray:
    pts = []
    for pair in text.split(","):
        xy = pair.strip().split()
        pts.append((float(xy[0]), float(xy[1])))
    return np.asarray(pts, dtype=np.float64)


def parse_wkt(wkt: str):
    """Driver-side parser. Returns a dict:
    {"type": "Point"|"LineString"|"Polygon"|"MultiPolygon",
     "coords": ndarray | [rings] | [[rings]]}.
    """
    w = wkt.strip()
    upper = w.upper()
    if upper.startswith("POINT"):
        inner = w[w.index("(") + 1 : w.rindex(")")]
        xy = inner.strip().split()
        return {"type": "Point", "coords": np.array([float(xy[0]), float(xy[1])])}
    if upper.startswith("LINESTRING"):
        inner = w[w.index("(") + 1 : w.rindex(")")]
        return {"type": "LineString", "coords": _parse_ring(inner)}
    if upper.startswith("MULTIPOINT"):
        inner = w[w.index("(") + 1 : w.rindex(")")]
        # both forms: MULTIPOINT (1 2, 3 4) and MULTIPOINT ((1 2), (3 4))
        pts = re.findall(r"\(([^()]*)\)", inner) or inner.split(",")
        coords = np.array([[float(t) for t in p.strip().split()[:2]] for p in pts])
        return {"type": "MultiPoint", "coords": coords}
    if upper.startswith("MULTILINESTRING"):
        inner = w[w.index("(") + 1 : w.rindex(")")]
        lines = [_parse_ring(r) for r in re.findall(r"\(([^()]*)\)", inner)]
        return {"type": "MultiLineString", "coords": lines}
    if upper.startswith("MULTIPOLYGON"):
        inner = w[w.index("(") + 1 : w.rindex(")")]
        polys = []
        for poly_text in re.findall(r"\(\s*(\([^)]*\)(?:\s*,\s*\([^)]*\))*)\s*\)", inner):
            rings = [_parse_ring(r) for r in re.findall(r"\(([^()]*)\)", poly_text)]
            polys.append(rings)
        return {"type": "MultiPolygon", "coords": polys}
    if upper.startswith("POLYGON"):
        inner = w[w.index("(") + 1 : w.rindex(")")]
        rings = [_parse_ring(r) for r in re.findall(r"\(([^()]*)\)", inner)]
        return {"type": "Polygon", "coords": rings}
    raise ValueError(f"unsupported WKT: {wkt[:60]}")


def _fmt_xy(x, y) -> str:
    return f"{float(x)!r} {float(y)!r}"


def format_wkt(g) -> str:
    """Canonical WKT writer for any parse_wkt dict (shortest-round-trip
    float formatting)."""
    t, c = g["type"], g["coords"]
    if t == "Point":
        return f"POINT ({_fmt_xy(c[0], c[1])})"
    if t == "LineString":
        return "LINESTRING (" + ", ".join(_fmt_xy(x, y) for x, y in c) + ")"
    if t == "MultiPoint":
        return "MULTIPOINT (" + ", ".join(f"({_fmt_xy(x, y)})" for x, y in c) + ")"
    if t == "MultiLineString":
        return ("MULTILINESTRING ("
                + ", ".join("(" + ", ".join(_fmt_xy(x, y) for x, y in ln) + ")" for ln in c)
                + ")")
    if t == "Polygon":
        return ("POLYGON ("
                + ", ".join("(" + ", ".join(_fmt_xy(x, y) for x, y in r) + ")" for r in c)
                + ")")
    if t == "MultiPolygon":
        return ("MULTIPOLYGON ("
                + ", ".join(
                    "(" + ", ".join("(" + ", ".join(_fmt_xy(x, y) for x, y in r) + ")" for r in p) + ")"
                    for p in c)
                + ")")
    raise ValueError(f"unsupported geometry type: {t}")


def format_polygon_wkt(rings) -> str:
    ring_strs = []
    for ring in rings:
        ring_strs.append("(" + ", ".join(f"{x} {y}" for x, y in ring) + ")")
    return "POLYGON (" + ", ".join(ring_strs) + ")"
