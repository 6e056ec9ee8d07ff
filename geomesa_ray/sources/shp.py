"""Pure-numpy ESRI Shapefile (.shp + .dbf) reader -> Arrow.

Parity target: the reference's shapefile converter
(reference geomesa-convert/geomesa-convert-shp/src/main/scala/org/
locationtech/geomesa/convert/shp/ShapefileConverter.scala), which delegates
to GeoTools' ShapefileDataStore. No GeoTools/shapefile binding exists in
this container, so this implements the PUBLIC spec ("ESRI Shapefile
Technical Description", ESRI whitepaper, July 1998) plus dBASE III for the
.dbf attribute sidecar.

Shape types supported: Null(0), Point(1), PolyLine(3), Polygon(5),
MultiPoint(8) and their Z/M variants (13/15/18, 11/21/23/25/28 — Z/M
ordinates are parsed past but not emitted, matching the 2-D engine).
Geometries come out as WKT in a ``geometry`` column (the repo's interchange
representation); point shapefiles additionally get ``lon``/``lat`` columns
so they can feed cell assignment without a WKT re-parse. Polygon rings are
classified by signed area (ESRI: outer=CW, holes=CCW); holes attach to the
outer ring whose bbox contains them.

``read_shapefile(paths)`` returns a Ray Dataset with one read task per
.shp file — the resumable-unit granularity the ingest manifests expect
(same shape as ``sources/avro.py``). The record loop is per-feature Python:
converters are the parse tier, not the hot analytic path (the same trade
the reference's converter framework makes); downstream stages get Arrow.
"""

from __future__ import annotations

import os
import struct
from datetime import date

import numpy as np
import pyarrow as pa

SHAPE_NAMES = {
    0: "null", 1: "point", 3: "polyline", 5: "polygon", 8: "multipoint",
    11: "point", 13: "polyline", 15: "polygon", 18: "multipoint",
    21: "point", 23: "polyline", 25: "polygon", 28: "multipoint",
}


# ------------------------------------------------------------ .shp geometry


def _ring_signed_area(xy: np.ndarray) -> float:
    x, y = xy[:, 0], xy[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _ring_wkt(xy: np.ndarray) -> str:
    return "(" + ", ".join(f"{p[0]:.10g} {p[1]:.10g}" for p in xy) + ")"


def _polygon_wkt(rings: list[np.ndarray]) -> str:
    """ESRI polygon record -> POLYGON/MULTIPOLYGON WKT. Outer rings are
    clockwise (negative shoelace area in the standard x-right/y-up frame);
    counter-clockwise rings are holes, attached to the containing outer."""
    outers: list[list[np.ndarray]] = []
    pending_holes: list[np.ndarray] = []
    for r in rings:
        if _ring_signed_area(r) <= 0:  # CW -> outer (degenerate counts too)
            outers.append([r])
        else:
            pending_holes.append(r)
    if not outers:  # malformed: treat every ring as an outer
        outers = [[r] for r in pending_holes]
        pending_holes = []
    for h in pending_holes:
        hx0, hy0 = h[:, 0].min(), h[:, 1].min()
        hx1, hy1 = h[:, 0].max(), h[:, 1].max()
        target = outers[-1]
        for o in outers:
            r = o[0]
            if (r[:, 0].min() <= hx0 and r[:, 0].max() >= hx1
                    and r[:, 1].min() <= hy0 and r[:, 1].max() >= hy1):
                target = o
                break
        target.append(h)
    parts = ["(" + ", ".join(_ring_wkt(r) for r in poly) + ")" for poly in outers]
    if len(parts) == 1:
        return "POLYGON " + parts[0]
    return "MULTIPOLYGON (" + ", ".join(parts) + ")"


def _parse_shp(blob: bytes):
    """Parse a .shp main file -> (wkts, lons, lats, shape_name). lons/lats
    are NaN except for point records."""
    if len(blob) < 100:
        raise ValueError("truncated .shp header")
    (code,) = struct.unpack(">i", blob[0:4])
    if code != 9994:
        raise ValueError(f"bad .shp file code {code}")
    (flen_words,) = struct.unpack(">i", blob[24:28])
    end = min(flen_words * 2, len(blob))
    wkts: list[str | None] = []
    lons: list[float] = []
    lats: list[float] = []
    pos = 100
    while pos + 8 <= end:
        _recno, clen_words = struct.unpack(">ii", blob[pos:pos + 8])
        pos += 8
        content = blob[pos:pos + clen_words * 2]
        pos += clen_words * 2
        if len(content) < 4:
            break
        (stype,) = struct.unpack("<i", content[0:4])
        kind = SHAPE_NAMES.get(stype)
        lon = lat = float("nan")
        if kind == "null" or kind is None:
            wkts.append(None)
        elif kind == "point":
            x, y = struct.unpack("<2d", content[4:20])
            lon, lat = x, y
            wkts.append(f"POINT ({x:.10g} {y:.10g})")
        elif kind == "multipoint":
            (n,) = struct.unpack("<i", content[36:40])
            pts = np.frombuffer(content, dtype="<f8", count=2 * n, offset=40).reshape(n, 2)
            wkts.append("MULTIPOINT (" + ", ".join(f"{p[0]:.10g} {p[1]:.10g}" for p in pts) + ")")
        else:  # polyline / polygon: bbox, numParts, numPoints, parts, points
            nparts, npts = struct.unpack("<2i", content[36:44])
            parts = np.frombuffer(content, dtype="<i4", count=nparts, offset=44)
            off = 44 + 4 * nparts
            pts = np.frombuffer(content, dtype="<f8", count=2 * npts, offset=off).reshape(npts, 2)
            bounds = np.append(parts, npts)
            pieces = [pts[bounds[i]:bounds[i + 1]] for i in range(nparts)
                      if bounds[i + 1] - bounds[i] >= 2]
            if not pieces:
                wkts.append(None)
            elif kind == "polyline":
                if len(pieces) == 1:
                    wkts.append("LINESTRING " + _ring_wkt(pieces[0]))
                else:
                    wkts.append("MULTILINESTRING (" + ", ".join(_ring_wkt(p) for p in pieces) + ")")
            else:
                wkts.append(_polygon_wkt(pieces))
        lons.append(lon)
        lats.append(lat)
    return wkts, np.asarray(lons), np.asarray(lats)


# ----------------------------------------------------------- .dbf attributes


def _parse_dbf(blob: bytes) -> dict[str, pa.Array]:
    """dBASE III .dbf -> named Arrow arrays. Field types: C (string),
    N/F (numeric -> float64, or int64 when no decimals), L (bool),
    D (YYYYMMDD -> date32). Deleted rows ('*' flag) are skipped."""
    if len(blob) < 32:
        raise ValueError("truncated .dbf header")
    nrec, hsize, rsize = struct.unpack("<IHH", blob[4:12])
    fields = []
    pos = 32
    while pos + 32 <= hsize and blob[pos] != 0x0D:
        raw = blob[pos:pos + 32]
        name = raw[0:11].split(b"\x00", 1)[0].decode("ascii", "replace").strip()
        ftype = chr(raw[11])
        flen = raw[16]
        fdec = raw[17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    cols: dict[str, list] = {name: [] for name, *_ in fields}
    base = hsize
    for i in range(nrec):
        rec = blob[base + i * rsize: base + (i + 1) * rsize]
        if len(rec) < rsize or rec[0:1] == b"*":
            continue
        off = 1
        for name, ftype, flen, fdec in fields:
            raw = rec[off:off + flen]
            off += flen
            txt = raw.decode("latin-1").strip()
            if ftype in ("N", "F"):
                if not txt or txt in ("*" * len(txt),):
                    cols[name].append(None)
                elif fdec == 0 and ftype == "N" and "." not in txt:
                    cols[name].append(int(txt))
                else:
                    cols[name].append(float(txt))
            elif ftype == "L":
                cols[name].append(None if txt in ("", "?") else txt in ("T", "t", "Y", "y"))
            elif ftype == "D":
                cols[name].append(
                    date(int(txt[0:4]), int(txt[4:6]), int(txt[6:8])) if len(txt) == 8 else None)
            else:  # C and anything else: text
                cols[name].append(txt if txt else None)
    out: dict[str, pa.Array] = {}
    for name, ftype, flen, fdec in fields:
        vals = cols[name]
        if ftype in ("N", "F"):
            typ = pa.int64() if (fdec == 0 and ftype == "N"
                                 and all(v is None or isinstance(v, int) for v in vals)) else pa.float64()
            out[name] = pa.array(vals, type=typ)
        elif ftype == "L":
            out[name] = pa.array(vals, type=pa.bool_())
        elif ftype == "D":
            out[name] = pa.array(vals, type=pa.date32())
        else:
            out[name] = pa.array(vals, type=pa.string())
    return out


# ------------------------------------------------------------------ Ray API


def read_shapefile_table(path: str) -> pa.Table:
    """One .shp (+ optional sibling .dbf) -> Arrow table with ``geometry``
    WKT, point ``lon``/``lat``, and the .dbf attribute columns."""
    with open(path, "rb") as f:
        wkts, lons, lats = _parse_shp(f.read())
    cols: dict[str, pa.Array] = {"geometry": pa.array(wkts, type=pa.string())}
    if len(lons) and np.isfinite(lons).all():
        cols["lon"] = pa.array(lons, type=pa.float64())
        cols["lat"] = pa.array(lats, type=pa.float64())
    dbf_path = os.path.splitext(path)[0] + ".dbf"
    if os.path.exists(dbf_path):
        with open(dbf_path, "rb") as f:
            attrs = _parse_dbf(f.read())
        for name, arr in attrs.items():
            if len(arr) == len(wkts) and name not in cols:
                cols[name] = arr
    return pa.table(cols)


def read_shapefile(paths) -> "ray.data.Dataset":  # noqa: F821
    """Ray Dataset over one or more shapefiles (or a directory of them) —
    one read task per .shp file."""
    import glob

    import ray.data as rd

    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = sorted(glob.glob(os.path.join(paths, "*.shp")))
        else:
            paths = [paths]

    def load(batch: pa.Table) -> pa.Table:
        return read_shapefile_table(batch.column("path")[0].as_py())

    files = rd.from_items([{"path": p} for p in paths])
    return files.map_batches(load, batch_format="pyarrow", batch_size=1)


# ------------------------------------------------------------- writer (tests)


def write_shapefile(path: str, geoms: list, attrs: dict[str, list] | None = None):
    """Spec-conformant writer for fixtures: geoms is a list of
    ('point', (x, y)) | ('polyline', [part...]) | ('polygon', [ring...]) |
    ('multipoint', [pts...]) | ('null', None); parts/rings are (n,2)
    float sequences. Writes .shp, .shx and (if attrs) a dBASE III .dbf."""
    records = []
    allx, ally = [], []
    for kind, data in geoms:
        if kind == "null":
            records.append(struct.pack("<i", 0))
            continue
        if kind == "point":
            x, y = float(data[0]), float(data[1])
            records.append(struct.pack("<i2d", 1, x, y))
            allx.append(x)
            ally.append(y)
            continue
        parts = [np.asarray(p, dtype=np.float64) for p in data]
        pts = np.concatenate(parts)
        allx += [pts[:, 0].min(), pts[:, 0].max()]
        ally += [pts[:, 1].min(), pts[:, 1].max()]
        bbox = struct.pack("<4d", pts[:, 0].min(), pts[:, 1].min(),
                           pts[:, 0].max(), pts[:, 1].max())
        if kind == "multipoint":
            records.append(struct.pack("<i", 8) + bbox + struct.pack("<i", len(pts))
                           + pts.astype("<f8").tobytes())
            continue
        stype = 3 if kind == "polyline" else 5
        offs = np.cumsum([0] + [len(p) for p in parts[:-1]]).astype("<i4")
        records.append(struct.pack("<i", stype) + bbox
                       + struct.pack("<2i", len(parts), len(pts))
                       + offs.tobytes() + pts.astype("<f8").tobytes())
    body = bytearray()
    shx = bytearray()
    for i, content in enumerate(records):
        shx.extend(struct.pack(">2i", (100 + len(body)) // 2, len(content) // 2))
        body.extend(struct.pack(">2i", i + 1, len(content) // 2))
        body.extend(content)
    xmin = min(allx) if allx else 0.0
    ymin = min(ally) if ally else 0.0
    xmax = max(allx) if allx else 0.0
    ymax = max(ally) if ally else 0.0
    main_type = next((1 if k == "point" else 3 if k == "polyline" else 5 if k == "polygon"
                      else 8 for k, _ in geoms if k != "null"), 0)

    def header(total_words: int) -> bytes:
        return (struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_words)
                + struct.pack("<2i", 1000, main_type)
                + struct.pack("<4d", xmin, ymin, xmax, ymax) + struct.pack("<4d", 0, 0, 0, 0))

    with open(path, "wb") as f:
        f.write(header((100 + len(body)) // 2) + bytes(body))
    with open(os.path.splitext(path)[0] + ".shx", "wb") as f:
        f.write(header((100 + len(shx)) // 2) + bytes(shx))
    if attrs:
        _write_dbf(os.path.splitext(path)[0] + ".dbf", attrs, len(geoms))


def _write_dbf(path: str, attrs: dict[str, list], nrec: int):
    fields = []
    encoded: list[list[bytes]] = []
    for name, vals in attrs.items():
        if all(v is None or isinstance(v, bool) for v in vals):
            ftype, flen, fdec = b"L", 1, 0
            col = [b"?" if v is None else (b"T" if v else b"F") for v in vals]
        elif all(v is None or isinstance(v, int) for v in vals):
            ftype, fdec = b"N", 0
            txt = [b"" if v is None else str(v).encode() for v in vals]
            flen = max([len(t) for t in txt] + [1])
            col = [t.rjust(flen) for t in txt]
        elif all(v is None or isinstance(v, (int, float)) for v in vals):
            ftype, fdec = b"N", 6
            txt = [b"" if v is None else f"{v:.6f}".encode() for v in vals]
            flen = max([len(t) for t in txt] + [1])
            col = [t.rjust(flen) for t in txt]
        else:
            ftype, fdec = b"C", 0
            txt = [b"" if v is None else str(v).encode("latin-1") for v in vals]
            flen = max([len(t) for t in txt] + [1])
            col = [t.ljust(flen) for t in txt]
        fields.append((name.encode("ascii")[:10], ftype, flen, fdec))
        encoded.append(col)
    rsize = 1 + sum(f[2] for f in fields)
    hsize = 32 + 32 * len(fields) + 1
    out = bytearray()
    out.extend(struct.pack("<B3BIHH", 0x03, 24, 1, 1, nrec, hsize, rsize))
    out.extend(b"\x00" * 20)
    for name, ftype, flen, fdec in fields:
        out.extend(name.ljust(11, b"\x00") + ftype + b"\x00" * 4
                   + bytes([flen, fdec]) + b"\x00" * 14)
    out.append(0x0D)
    for i in range(nrec):
        out.extend(b" ")
        for col in encoded:
            out.extend(col[i])
    out.append(0x1A)
    with open(path, "wb") as f:
        f.write(bytes(out))
