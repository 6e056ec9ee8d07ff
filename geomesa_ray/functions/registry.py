"""Scalar function library — the converter-DSL / st_* subset, vectorized.

Parity targets:
- converter transformer functions (reference geomesa-convert/
  geomesa-convert-common/.../convert2/transforms/{String,Math,Cast,Date,
  Collection,Geometry,Id}FunctionFactory.scala) — evaluated per record
  during parse; here each is a vectorized kernel over numpy/pandas arrays.
- Spark SQL ``st_*`` UDFs (geomesa-spark/geomesa-spark-jts/.../udf/*.scala)
  — the parity subset: constructors, accessors, relations, distances,
  geohash output.

All functions take/return numpy arrays (or pandas Series) so they compose
inside ``map_batches`` without row loops; ``call(name, *cols)`` dispatches
by registry name.
"""

from __future__ import annotations

import hashlib
import uuid as _uuid

import numpy as np
import pandas as pd

from geomesa_ray.cells.shard import fnv1a_str, fnv1a_u64
from geomesa_ray.geo.distance import haversine_m
from geomesa_ray.geo.predicates import Polygon
from geomesa_ray.geo.wkt import format_point_wkt, parse_points_wkt


def _s(values) -> pd.Series:
    return pd.Series(values).astype("string")


# ---------------------------------------------------------------- strings

def f_trim(v):
    return _s(v).str.strip().to_numpy(dtype=object)

def f_strip_quotes(v):
    return _s(v).str.strip("'\"").to_numpy(dtype=object)

def f_strip_prefix(v, prefix):
    s = _s(v)
    p = str(prefix)
    return s.mask(s.str.startswith(p), s.str.slice(len(p))).to_numpy(dtype=object)

def f_strip_suffix(v, suffix):
    s = _s(v)
    p = str(suffix)
    return s.mask(s.str.endswith(p), s.str.slice(0, -len(p))).to_numpy(dtype=object)

def f_replace(v, old, new):
    return _s(v).str.replace(str(old), str(new), regex=False).to_numpy(dtype=object)

def f_regex_replace(v, pattern, new):
    return _s(v).str.replace(str(pattern), str(new), regex=True).to_numpy(dtype=object)

def f_substr(v, start, end):
    return _s(v).str.slice(int(start), int(end)).to_numpy(dtype=object)

def f_strlen(v):
    return _s(v).str.len().fillna(0).to_numpy(dtype=np.int64)

def f_lowercase(v):
    return _s(v).str.lower().to_numpy(dtype=object)

def f_uppercase(v):
    return _s(v).str.upper().to_numpy(dtype=object)

def f_capitalize(v):
    return _s(v).str.capitalize().to_numpy(dtype=object)

def f_concat(*cols):
    out = _s(cols[0])
    for c in cols[1:]:
        out = out.str.cat(_s(c))
    return out.to_numpy(dtype=object)

def f_mkstring(sep, *cols):
    out = _s(cols[0])
    for c in cols[1:]:
        out = out.str.cat(_s(c), sep=str(sep))
    return out.to_numpy(dtype=object)

def f_empty_to_null(v):
    s = _s(v)
    return s.mask(s.str.len() == 0, pd.NA).to_numpy(dtype=object)

def f_to_string(v):
    return _s(v).to_numpy(dtype=object)


# ------------------------------------------------------------------- math

def f_add(*cols):
    out = np.asarray(cols[0], dtype=np.float64).copy()
    for c in cols[1:]:
        out += np.asarray(c, dtype=np.float64)
    return out

def f_subtract(a, b):
    return np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64)

def f_multiply(*cols):
    out = np.asarray(cols[0], dtype=np.float64).copy()
    for c in cols[1:]:
        out *= np.asarray(c, dtype=np.float64)
    return out

def f_divide(a, b):
    return np.asarray(a, dtype=np.float64) / np.asarray(b, dtype=np.float64)

def f_mean(*cols):
    return f_add(*cols) / len(cols)

def f_min(*cols):
    return np.minimum.reduce([np.asarray(c, dtype=np.float64) for c in cols])

def f_max(*cols):
    return np.maximum.reduce([np.asarray(c, dtype=np.float64) for c in cols])


# ------------------------------------------------------------------- casts

def f_to_int(v, default=None):
    s = pd.to_numeric(pd.Series(v), errors="coerce")
    if default is not None:
        s = s.fillna(default)
    return s.astype("Int64").to_numpy(dtype=object)

def f_to_double(v, default=None):
    s = pd.to_numeric(pd.Series(v), errors="coerce")
    if default is not None:
        s = s.fillna(default)
    return s.to_numpy(dtype=np.float64)

def f_to_bool(v):
    return _s(v).str.lower().isin(["true", "1", "t", "yes"]).to_numpy()


# ------------------------------------------------------------------- dates

def f_date(fmt, v):
    """Parse with an explicit strftime-style format (DateFunctionFactory
    'date' with a custom pattern)."""
    return pd.to_datetime(_s(v), format=str(fmt), utc=True).dt.tz_localize(None).to_numpy()

def f_isodate(v):
    return pd.to_datetime(_s(v), format="%Y%m%d", utc=True).dt.tz_localize(None).to_numpy()

def f_isodatetime(v):
    return pd.to_datetime(_s(v), format="%Y%m%dT%H%M%S.%fZ", utc=True, errors="coerce").dt.tz_localize(None).to_numpy()

def f_millis_to_date(v):
    return np.asarray(v, dtype=np.int64).astype("datetime64[ms]")

def f_secs_to_date(v):
    return (np.asarray(v, dtype=np.int64) * 1000).astype("datetime64[ms]")

def f_date_to_string(fmt, v):
    return pd.Series(pd.to_datetime(np.asarray(v))).dt.strftime(str(fmt)).to_numpy(dtype=object)


# ------------------------------------------------------------- collections

def f_parse_list(v, sep=","):
    return _s(v).str.split(str(sep)).to_numpy(dtype=object)

def f_list_item(v, idx):
    return pd.Series(v).str[int(idx)].to_numpy(dtype=object)


# ---------------------------------------------------------------- geometry

def f_point(x, y):
    """st_makePoint / converter point(): -> WKT strings."""
    return format_point_wkt(x, y).to_numpy(dtype=object)

def f_geom_from_wkt(v):
    """point WKT -> (lon, lat) pair of arrays (engine-native geometry)."""
    lon, lat, _ = parse_points_wkt(v)
    return lon, lat

def f_st_x(v):
    return parse_points_wkt(v)[0]

def f_st_y(v):
    return parse_points_wkt(v)[1]

def f_st_contains(wkt_polygon, lon, lat):
    poly = Polygon.from_wkt(str(wkt_polygon))
    return poly.contains(np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64))

f_st_intersects = f_st_contains  # point vs polygon: identical predicate
f_st_within = f_st_contains

def f_st_distance_sphere(lon1, lat1, lon2, lat2):
    return haversine_m(lon1, lat1, lon2, lat2)

def f_st_dwithin(lon1, lat1, lon2, lat2, meters):
    return haversine_m(lon1, lat1, lon2, lat2) <= float(meters)

def f_st_envelope(wkt_values):
    """st_envelope: geometry WKT -> (xmin, ymin, xmax, ymax) arrays."""
    from geomesa_ray.geo.wkt import parse_wkt

    vals = np.asarray(wkt_values, dtype=object)
    out = np.empty((len(vals), 4), dtype=np.float64)
    for i, w in enumerate(vals):  # query-side geometries are few
        g = parse_wkt(str(w))
        if g["type"] == "Point":
            x, y = g["coords"]
            out[i] = (x, y, x, y)
        elif g["type"] == "LineString":
            c = g["coords"]
            out[i] = (c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max())
        else:
            rings = g["coords"] if g["type"] == "Polygon" else [r for p in g["coords"] for r in p]
            ext = np.vstack(rings)
            out[i] = (ext[:, 0].min(), ext[:, 1].min(), ext[:, 0].max(), ext[:, 1].max())
    return out[:, 0], out[:, 1], out[:, 2], out[:, 3]


def f_st_centroid(wkt_values):
    """st_centroid for polygons (area-weighted shoelace centroid) and
    points/linestrings (vertex mean)."""
    from geomesa_ray.geo.wkt import parse_wkt

    vals = np.asarray(wkt_values, dtype=object)
    cx = np.empty(len(vals))
    cy = np.empty(len(vals))
    for i, w in enumerate(vals):
        g = parse_wkt(str(w))
        if g["type"] == "Point":
            cx[i], cy[i] = g["coords"]
        elif g["type"] == "LineString":
            cx[i], cy[i] = g["coords"][:, 0].mean(), g["coords"][:, 1].mean()
        else:
            ring = g["coords"][0] if g["type"] == "Polygon" else g["coords"][0][0]
            x, y = ring[:, 0], ring[:, 1]
            if x[0] != x[-1] or y[0] != y[-1]:
                x = np.append(x, x[0]); y = np.append(y, y[0])
            cross = x[:-1] * y[1:] - x[1:] * y[:-1]
            a = cross.sum() / 2.0
            if abs(a) < 1e-12:
                cx[i], cy[i] = x[:-1].mean(), y[:-1].mean()
            else:
                cx[i] = ((x[:-1] + x[1:]) * cross).sum() / (6.0 * a)
                cy[i] = ((y[:-1] + y[1:]) * cross).sum() / (6.0 * a)
    return cx, cy


def f_st_num_points(wkt_values):
    from geomesa_ray.geo.wkt import parse_wkt

    vals = np.asarray(wkt_values, dtype=object)
    out = np.empty(len(vals), dtype=np.int64)
    for i, w in enumerate(vals):
        g = parse_wkt(str(w))
        if g["type"] == "Point":
            out[i] = 1
        elif g["type"] == "LineString":
            out[i] = len(g["coords"])
        elif g["type"] == "Polygon":
            out[i] = sum(len(r) for r in g["coords"])
        else:
            out[i] = sum(len(r) for p in g["coords"] for r in p)
    return out


def f_st_as_geojson(wkt_values):
    """st_asGeoJSON for point WKT (the hot output case), vectorized."""
    lon, lat, valid = parse_points_wkt(wkt_values)
    s = pd.Series(lon).map("{:.6f}".format) + "," + pd.Series(lat).map("{:.6f}".format)
    out = ('{"type":"Point","coordinates":[' + s + "]}").to_numpy(dtype=object)
    out[~valid] = None
    return out


def f_st_buffer_point(lon, lat, meters):
    """st_bufferPoint: circle polygon WKT around each point (16-gon in the
    local meters-to-degrees frame — the reference's bufferPoint is also a
    geodesic approximation)."""
    from geomesa_ray.geo.distance import meters_to_degrees_at

    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    dlon, dlat = meters_to_degrees_at(lat, float(meters))
    dlon = np.broadcast_to(np.asarray(dlon, dtype=np.float64), lon.shape)
    dlat = np.broadcast_to(np.asarray(dlat, dtype=np.float64), lat.shape)
    ang = np.linspace(0, 2 * np.pi, 17)
    out = np.empty(len(lon), dtype=object)
    for i in range(len(lon)):  # output is WKT text; few rows expected
        xs = lon[i] + dlon[i] * np.cos(ang)
        ys = lat[i] + dlat[i] * np.sin(ang)
        out[i] = "POLYGON ((" + ", ".join(f"{x:.6f} {y:.6f}" for x, y in zip(xs, ys)) + "))"
    return out


_GEOHASH32 = np.array(list("0123456789bcdefghjkmnpqrstuvwxyz"), dtype=object)

def f_st_geohash(lon, lat, precision=9):
    """st_geoHash: standard geohash base-32 encoding, vectorized bitwise."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    nbits = int(precision) * 5
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    li = np.clip(((lon + 180.0) / 360.0 * (1 << lon_bits)).astype(np.uint64), 0, (1 << lon_bits) - 1)
    la = np.clip(((lat + 90.0) / 180.0 * (1 << lat_bits)).astype(np.uint64), 0, (1 << lat_bits) - 1)
    # interleave lon (even positions from the top) and lat
    total = np.zeros(len(lon), dtype=np.uint64)
    for i in range(nbits):
        total <<= np.uint64(1)
        if i % 2 == 0:  # lon bit
            shift = np.uint64(lon_bits - 1 - i // 2)
            total |= (li >> shift) & np.uint64(1)
        else:
            shift = np.uint64(lat_bits - 1 - i // 2)
            total |= (la >> shift) & np.uint64(1)
    out = np.empty(len(lon), dtype=object)
    chars = np.empty((int(precision), len(lon)), dtype=object)
    for c in range(int(precision) - 1, -1, -1):
        chars[c] = _GEOHASH32[(total & np.uint64(31)).astype(np.int64)]
        total >>= np.uint64(5)
    for i in range(len(lon)):
        out[i] = "".join(chars[:, i])
    return out


# --------------------------------------------------------------- id / hash

def f_md5(v):
    return np.array([hashlib.md5(str(x).encode()).hexdigest() for x in np.asarray(v, dtype=object)], dtype=object)

def f_hash64(v):
    """murmur3_64 analog: deterministic 64-bit content hash."""
    from geomesa_ray.cells.shard import hash64_str

    return hash64_str(v).astype(np.int64)

def f_uuid_from(v):
    """Deterministic UUIDv5-style id from content (uuidZ3 analog: stable
    id derivation)."""
    return np.array(
        [str(_uuid.uuid5(_uuid.NAMESPACE_OID, str(x))) for x in np.asarray(v, dtype=object)],
        dtype=object,
    )


FUNCTIONS = {
    # strings
    "trim": f_trim, "stripQuotes": f_strip_quotes, "stripPrefix": f_strip_prefix,
    "stripSuffix": f_strip_suffix, "replace": f_replace, "regexReplace": f_regex_replace,
    "substr": f_substr, "strlen": f_strlen, "lowercase": f_lowercase,
    "uppercase": f_uppercase, "capitalize": f_capitalize, "concat": f_concat,
    "mkstring": f_mkstring, "emptyToNull": f_empty_to_null, "toString": f_to_string,
    # math
    "add": f_add, "subtract": f_subtract, "multiply": f_multiply, "divide": f_divide,
    "mean": f_mean, "min": f_min, "max": f_max,
    # casts
    "toInt": f_to_int, "toDouble": f_to_double, "toBoolean": f_to_bool,
    # dates
    "date": f_date, "isodate": f_isodate, "isodatetime": f_isodatetime,
    "millisToDate": f_millis_to_date, "secsToDate": f_secs_to_date,
    "dateToString": f_date_to_string,
    # collections
    "parseList": f_parse_list, "listItem": f_list_item,
    # geometry
    "point": f_point, "geomFromWKT": f_geom_from_wkt, "st_x": f_st_x, "st_y": f_st_y,
    "st_contains": f_st_contains, "st_intersects": f_st_intersects,
    "st_within": f_st_within, "st_distanceSphere": f_st_distance_sphere,
    "st_dwithin": f_st_dwithin, "st_geoHash": f_st_geohash,
    "st_envelope": f_st_envelope, "st_centroid": f_st_centroid,
    "st_numPoints": f_st_num_points, "st_asGeoJSON": f_st_as_geojson,
    "st_bufferPoint": f_st_buffer_point,
    # id / hash
    "md5": f_md5, "hash64": f_hash64, "uuid": f_uuid_from,
}


def call(name: str, *args):
    return FUNCTIONS[name](*args)
