"""Shapefile export — the writer half of the .shp/.dbf converter pair.

Parity target: GeoMesa's ``ShapefileExporter`` (reference
geomesa-tools/src/main/scala/org/locationtech/geomesa/tools/export/formats/
ShapefileExporter.scala, which delegates to GeoTools'
ShapefileDataStoreFactory). No GeoTools exists in this container, so this
inverts the in-repo spec reader (``sources/shp.py``, ESRI whitepaper July
1998 + dBASE III): WKT geometry column -> typed shape records with ESRI
ring orientation (outer CW, holes CCW), attribute columns -> .dbf, plus a
WGS84 ``.prj`` sidecar (the EPSG 4326 WKT the reference writes).

Ray Data shape: ``write_shapefile_dataset`` is a per-block ``map_batches``
sink — one part-<uuid>.shp/.shx/.dbf[/.prj] trio per block under the
output directory (partitioned, resumable; a shapefile is a single-type
single-layer format, so "one giant file" is doubly wrong here), atomic
rename per file, (path, count) manifest Dataset returned. Like the
reference exporter, one output file holds ONE shape type — mixed-geometry
blocks raise.

dBASE numeric caveat (inherited from the format, documented like the
reference's GeoTools backend): float attributes serialize as fixed
6-decimal text, so they are NOT bit-exact through the round trip; use
integer/string attributes when exactness matters (the ``shp_roundtrip``
oracle does — lon/lat ride the .shp doubles, which ARE exact).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# EPSG 4326 WKT1 (public OGC well-known text; what GeoTools writes for
# DefaultGeographicCRS.WGS84)
_WGS84_PRJ = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
    'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
)

_KIND_OF_TYPE = {
    "Point": "point", "MultiPoint": "multipoint",
    "LineString": "polyline", "MultiLineString": "polyline",
    "Polygon": "polygon", "MultiPolygon": "polygon",
}


def _oriented(ring: np.ndarray, want_cw: bool) -> np.ndarray:
    """Force ESRI ring orientation: CW (negative shoelace in the standard
    x-right/y-up frame) for outers, CCW for holes."""
    x, y = ring[:, 0], ring[:, 1]
    area2 = float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    cw = area2 <= 0
    return ring if cw == want_cw else ring[::-1]


def _wkt_to_shape(wkt) -> tuple:
    """WKT -> the (kind, data) tuple ``sources/shp.write_shapefile``
    encodes. Polygon rings get ESRI orientation here."""
    from geomesa_ray.geo.wkt import parse_wkt

    if wkt is None:
        return ("null", None)
    g = parse_wkt(str(wkt))
    t, c = g["type"], g["coords"]
    kind = _KIND_OF_TYPE.get(t)
    if kind is None:
        raise ValueError(f"shapefile export: unsupported geometry {t}")
    if t == "Point":
        return ("point", (float(c[0]), float(c[1])))
    if t == "MultiPoint":
        return ("multipoint", [np.asarray(c, dtype=np.float64)])
    if t == "LineString":
        return ("polyline", [np.asarray(c, dtype=np.float64)])
    if t == "MultiLineString":
        return ("polyline", [np.asarray(p, dtype=np.float64) for p in c])
    polys = [c] if t == "Polygon" else c
    rings: list[np.ndarray] = []
    for poly in polys:
        rings.append(_oriented(np.asarray(poly[0], dtype=np.float64), True))
        for hole in poly[1:]:
            rings.append(_oriented(np.asarray(hole, dtype=np.float64), False))
    return ("polygon", rings)


def _dbf_ready(col: pa.ChunkedArray | pa.Array) -> list:
    """Arrow column -> python values the dBASE writer understands (ints,
    floats, bools, strings, None). Temporal/other types go through str()."""
    t = col.type
    if pa.types.is_integer(t) or pa.types.is_floating(t) or \
            pa.types.is_boolean(t) or pa.types.is_string(t) or \
            pa.types.is_large_string(t):
        return col.to_pylist()
    return [None if v is None else str(v) for v in col.to_pylist()]


def shapefile_block_writer(out_dir: str, geometry_col: str = "geometry",
                           attr_cols: list[str] | None = None,
                           lon_col: str = "lon", lat_col: str = "lat",
                           prj: bool = True):
    """Returns the per-block sink fn for ``map_batches``. Geometry comes
    from ``geometry_col`` WKT when present, else from lon/lat point
    columns (the reader's inverse convention)."""
    import os
    import uuid

    from geomesa_ray.sources.shp import write_shapefile

    def sink(t: pa.Table) -> pa.Table:
        names = set(t.column_names)
        if geometry_col in names:
            geoms = [_wkt_to_shape(w) for w in t.column(geometry_col).to_pylist()]
            skip = {geometry_col}
        elif lon_col in names and lat_col in names:
            lon = t.column(lon_col).to_numpy(zero_copy_only=False)
            lat = t.column(lat_col).to_numpy(zero_copy_only=False)
            geoms = [("point", (float(x), float(y))) for x, y in zip(lon, lat)]
            skip = {lon_col, lat_col}
        else:
            raise ValueError(f"shapefile export: no {geometry_col!r} or "
                             f"{lon_col!r}/{lat_col!r} columns")
        kinds = {k for k, _ in geoms if k != "null"}
        if len(kinds) > 1:  # one shape type per file (ESRI spec header)
            raise ValueError(f"shapefile export: mixed shape types {sorted(kinds)}")
        cols = attr_cols if attr_cols is not None else \
            [c for c in t.column_names if c not in skip]
        attrs = {c: _dbf_ready(t.column(c)) for c in cols}
        name = f"part-{uuid.uuid4().hex}"
        tmp_base = os.path.join(out_dir, "." + name)
        write_shapefile(tmp_base + ".shp", geoms, attrs or None)
        if prj:
            with open(tmp_base + ".prj", "w", encoding="ascii") as f:
                f.write(_WGS84_PRJ)
        final = os.path.join(out_dir, name)
        exts = [".dbf"] if attrs else []
        exts += [".prj"] if prj else []
        exts += [".shx", ".shp"]  # .shp last: its presence marks the part done
        for ext in exts:
            if os.path.exists(tmp_base + ext):
                os.replace(tmp_base + ext, final + ext)
        return pa.table({"path": pa.array([final + ".shp"]),
                         "count": pa.array([t.num_rows], type=pa.int64())})

    return sink


def write_shapefile_dataset(ds, out_dir: str, geometry_col: str = "geometry",
                            attr_cols: list[str] | None = None,
                            lon_col: str = "lon", lat_col: str = "lat",
                            prj: bool = True):
    """Distributed shapefile export: one .shp/.shx/.dbf part per block
    under ``out_dir``; returns the materialized (path, count) manifest."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    sink = shapefile_block_writer(out_dir, geometry_col, attr_cols,
                                  lon_col, lat_col, prj)
    return ds.map_batches(sink, batch_size=None,
                          batch_format="pyarrow").materialize()
