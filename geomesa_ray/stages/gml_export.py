"""GML (WFS FeatureCollection) export — vectorized XML string building.

Parity target: GeoMesa's ``GmlExporter`` (reference geomesa-tools/src/main/
scala/org/locationtech/geomesa/tools/export/formats/GmlExporter.scala):
features encode as one ``wfs:FeatureCollection`` of ``gml:featureMember``
elements in the ``geomesa`` namespace (http://geomesa.org), GML 3.1
geometry encoding (``gml:Point``/``gml:pos``), EPSG:4326 srsName.

Ray Data shape mirrors the GeoJSON exporter: a vectorized ``map_batches``
string builder (pandas C-level concat + regex escaping), one
atomically-committed FeatureCollection document PER BLOCK so a large
export stays partitioned and resumable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_XML_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                ('"', "&quot;"), ("'", "&apos;")]

_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<wfs:FeatureCollection xmlns:wfs="http://www.opengis.net/wfs" '
    'xmlns:gml="http://www.opengis.net/gml" '
    'xmlns:geomesa="http://geomesa.org">\n'
)
_FOOTER = "</wfs:FeatureCollection>\n"


def _xml_text_series(s: pd.Series) -> pd.Series:
    out = s.astype(str)
    for raw, esc in _XML_ESCAPES:
        out = out.str.replace(raw, esc, regex=False)
    return out


def gml_feature_members(ds, lon_col: str = "lon", lat_col: str = "lat",
                        id_col: str | None = None,
                        props: list[str] | None = None,
                        type_name: str = "feature"):
    """Dataset -> Dataset[{"member": str}] of ``gml:featureMember``
    fragments (Point geometry; ``props`` columns — default all others —
    become ``geomesa:<name>`` elements). GML posLists are (lat lon) per
    the EPSG:4326 axis order the reference's urn srsName implies."""

    def build(df: pd.DataFrame) -> pd.DataFrame:
        cols = props if props is not None else [
            c for c in df.columns if c not in (lon_col, lat_col, id_col)]
        lon = df[lon_col].astype(np.float64).astype(str)
        lat = df[lat_col].astype(np.float64).astype(str)
        body = pd.Series([""] * len(df), index=df.index)
        for c in cols:
            tag = "geomesa:" + c
            body = (body + "      <" + tag + ">" + _xml_text_series(df[c])
                    + "</" + tag + ">\n")
        gid = ""
        if id_col is not None:
            gid = ' gml:id="' + _xml_text_series(df[id_col]) + '"'
        member = (
            "  <gml:featureMember>\n"
            + "    <geomesa:" + type_name + gid + ">\n"
            + body
            + "      <geomesa:geom><gml:Point "
            + 'srsName="urn:ogc:def:crs:EPSG::4326"><gml:pos>'
            + lat + " " + lon + "</gml:pos></gml:Point></geomesa:geom>\n"
            + "    </geomesa:" + type_name + ">\n"
            + "  </gml:featureMember>"
        )
        return pd.DataFrame({"member": member})

    return ds.map_batches(build, batch_format="pandas")


def write_gml(ds, out_dir: str, lon_col: str = "lon", lat_col: str = "lat",
              id_col: str | None = None, props: list[str] | None = None,
              type_name: str = "feature"):
    """Write one wfs:FeatureCollection .gml document per input block under
    ``out_dir``; returns the materialized (path, count) manifest Dataset."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)
    members = gml_feature_members(ds, lon_col, lat_col, id_col, props, type_name)

    def sink(t: pa.Table) -> pa.Table:
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.gml")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(_HEADER)
            f.write("\n".join(t.column("member").to_pylist()))
            f.write("\n" + _FOOTER)
        os.replace(tmp, path)  # atomic per-file commit
        return pa.table({"path": pa.array([path]),
                         "count": pa.array([t.num_rows], type=pa.int64())})

    return members.map_batches(sink, batch_size=None, batch_format="pyarrow").materialize()
