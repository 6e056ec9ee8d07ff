"""GeoJSON export — RFC 7946 Features, vectorized string building.

Parity target: GeoMesa's ``GeoJsonExporter`` (reference
geomesa-tools/src/main/scala/org/locationtech/geomesa/tools/export/formats/
GeoJsonExporter.scala + geomesa-features/.../serialization/GeoJsonSerializer
.scala): each SimpleFeature serializes to ``{"type":"Feature","geometry":
{...},"properties":{...},"id":...}`` inside a FeatureCollection.

Ray Data shape: ``geojson_feature_lines`` is a vectorized ``map_batches``
string builder (pandas C-level string concat + regex escaping — no Python
row loop), so the serialize stage streams. ``write_geojson`` writes ONE
FeatureCollection file PER BLOCK under the output directory (partitioned,
resumable — never one giant file) and returns the (path, count) manifest
as a Dataset. Coordinates and numeric properties use shortest-round-trip
``str()`` formatting, so parse-back yields bit-identical doubles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_ESCAPES = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
            ("\r", "\\r"), ("\t", "\\t")]


def _json_str_series(s: pd.Series) -> pd.Series:
    """Escape + quote a string column (vectorized .str.replace chain)."""
    out = s.astype(str)
    for raw, esc in _ESCAPES:
        out = out.str.replace(raw, esc, regex=False)
    return '"' + out + '"'


def _json_value_series(s: pd.Series) -> pd.Series:
    """Column -> JSON literal strings: numbers via C-level str() (shortest
    round-trip repr for floats), bools as true/false, rest escaped+quoted.
    Nulls/NaN become ``null``."""
    if pd.api.types.is_bool_dtype(s.dtype):
        return s.map({True: "true", False: "false"}).astype(str)
    if pd.api.types.is_integer_dtype(s.dtype):
        return s.astype(np.int64).astype(str)
    if pd.api.types.is_float_dtype(s.dtype):
        out = s.astype(np.float64).astype(str)
        out[s.isna()] = "null"
        return out
    out = _json_str_series(s)
    out[s.isna()] = "null"
    return out


def geojson_feature_lines(ds, lon_col: str = "lon", lat_col: str = "lat",
                          id_col: str | None = None,
                          props: list[str] | None = None):
    """Dataset -> Dataset[{"feature": str}] of RFC 7946 Feature JSON lines
    (Point geometry from lon/lat columns; ``props`` columns — default all
    others — land in properties)."""

    def build(df: pd.DataFrame) -> pd.DataFrame:
        cols = props if props is not None else [
            c for c in df.columns if c not in (lon_col, lat_col, id_col)]
        lon = df[lon_col].astype(np.float64).astype(str)
        lat = df[lat_col].astype(np.float64).astype(str)
        parts = []
        for c in cols:
            parts.append('"' + c.replace('"', '\\"') + '":' + _json_value_series(df[c]))
        body = parts[0] if parts else pd.Series([""] * len(df), index=df.index)
        for p in parts[1:]:
            body = body + "," + p
        line = ('{"type":"Feature","geometry":{"type":"Point","coordinates":['
                + lon + "," + lat + ']},"properties":{' + body + "}")
        if id_col is not None:
            line = line + ',"id":' + _json_value_series(df[id_col])
        return pd.DataFrame({"feature": line + "}"})

    return ds.map_batches(build, batch_format="pandas")


def write_geojson(ds, out_dir: str, lon_col: str = "lon", lat_col: str = "lat",
                  id_col: str | None = None, props: list[str] | None = None,
                  collection: bool = True):
    """Write the dataset as GeoJSON under ``out_dir`` — one
    FeatureCollection file per input block (``collection=False`` writes
    newline-delimited features, the geojsonl convention). Returns the
    materialized (path, count) manifest Dataset; the write itself runs in
    the map tasks, so export is distributed and per-file resumable."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)
    lines = geojson_feature_lines(ds, lon_col, lat_col, id_col, props)

    def sink(t: pa.Table) -> pa.Table:
        feats = t.column("feature").to_pylist()
        name = f"part-{uuid.uuid4().hex}.geojson" if collection else \
            f"part-{uuid.uuid4().hex}.geojsonl"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            if collection:
                f.write('{"type":"FeatureCollection","features":[\n')
                f.write(",\n".join(feats))
                f.write("\n]}\n")
            else:
                f.write("\n".join(feats) + "\n")
        os.replace(tmp, path)  # atomic per-file commit (resume skips done files)
        return pa.table({"path": pa.array([path]),
                         "count": pa.array([t.num_rows], type=pa.int64())})

    # whole-block batches: one output file per block
    return lines.map_batches(sink, batch_size=None, batch_format="pyarrow").materialize()


def read_geojson(paths):
    """Read GeoJSON FeatureCollection / geojsonl files back into a Dataset
    of flat rows (properties + lon/lat [+ id]) — the round-trip proof and a
    convenience source. Parsing is stdlib-json per file inside flat_map
    tasks (files are block-sized by construction)."""
    import json

    import ray.data as rd

    def parse(row):
        with open(row["path"], encoding="utf-8") as f:
            text = f.read()
        if text.lstrip().startswith('{"type":"FeatureCollection"'):
            feats = json.loads(text)["features"]
        else:
            feats = [json.loads(ln) for ln in text.splitlines() if ln.strip()]
        out = []
        for ft in feats:
            rec = dict(ft.get("properties") or {})
            coords = ft["geometry"]["coordinates"]
            rec["lon"], rec["lat"] = coords[0], coords[1]
            if "id" in ft:
                rec["id"] = ft["id"]
            out.append(rec)
        return out

    return rd.from_items([{"path": p} for p in paths]).flat_map(parse)
