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


_LEAFLET_TEMPLATE = """<!DOCTYPE html>
<html>
<head>
  <title>geomesa_ray export</title>
  <meta charset="utf-8"/>
  <link rel="stylesheet" href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"/>
  <script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
  <script src="https://unpkg.com/leaflet.heat@0.2.0/dist/leaflet-heat.js"></script>
  <style>html, body, #map {{ height: 100%; margin: 0; }}</style>
</head>
<body>
<div id="map"></div>
<script>
var points = {geojson};

var heat = {heat};

var map = L.map('map');
L.tileLayer('https://{{s}}.tile.openstreetmap.org/{{z}}/{{x}}/{{y}}.png',
            {{maxZoom: 19, attribution: '&copy; OpenStreetMap contributors'}}).addTo(map);
var layer = L.geoJSON(points).addTo(map);
if (heat.length) {{ L.heatLayer(heat, {{radius: 20}}).addTo(map); }}
try {{ map.fitBounds(layer.getBounds()); }} catch (e) {{ map.setView([0, 0], 2); }}
</script>
</body>
</html>
"""


def write_leaflet(ds, out_html: str, lon_col: str = "lon", lat_col: str = "lat",
                  id_col: str | None = None, props: list[str] | None = None,
                  max_features: int = 10_000):
    """Self-contained Leaflet preview page (LeafletMapExporter.scala analog):
    an index.html embedding the features as ``var points = <geojson>`` plus
    a coordinate-count heat layer. A map PREVIEW is inherently bounded —
    ``max_features`` caps the embedded collection (the distributed-export
    path for full datasets is ``write_geojson``); the heat weights still
    aggregate the capped sample per rounded coordinate, matching the
    reference's coordMap counting."""
    import collections
    import json
    import os

    lines = geojson_feature_lines(ds.limit(max_features), lon_col, lat_col,
                                  id_col, props)
    feats = [r["feature"] for r in lines.take_all()]
    counts: collections.Counter = collections.Counter()
    for f in feats:
        c = json.loads(f)["geometry"]["coordinates"]
        counts[(round(c[1], 4), round(c[0], 4))] += 1
    heat = [[la, lo, n] for (la, lo), n in counts.items()]
    html = _LEAFLET_TEMPLATE.format(
        geojson='{"type":"FeatureCollection","features":[' + ",".join(feats) + "]}",
        heat=json.dumps(heat),
    )
    os.makedirs(os.path.dirname(os.path.abspath(out_html)) or ".", exist_ok=True)
    tmp = out_html + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(html)
    os.replace(tmp, out_html)
    return {"path": out_html, "count": len(feats)}
