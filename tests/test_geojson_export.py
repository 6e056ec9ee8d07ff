"""GeoJSON exporter round-trip (GeoJsonExporter.scala analog, round 4)."""

import json
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestGeoJsonExport:
    def test_escaping_and_roundtrip(self, ray_session, tmp_path):
        import ray.data as rd

        from geomesa_ray.stages.geojson_export import read_geojson, write_geojson

        df = pd.DataFrame({
            "name": ['pl"ain', "two\nlines", "tab\there", "back\\slash", None],
            "score": [1.5, float(2 ** 53 + 1), -0.25, 1e-7, 3.0],
            "n": np.arange(5, dtype=np.int64),
            "lon": np.array([0.1, -179.99, 45.0, 2.350001, 0.0]),
            "lat": np.array([0.2, 89.5, -45.0, 48.85, 0.0]),
        })
        out = str(tmp_path / "gj")
        manifest = write_geojson(rd.from_pandas(df), out).take_all()
        assert sum(r["count"] for r in manifest) == 5
        back = read_geojson([r["path"] for r in manifest]).to_pandas()
        back = back.sort_values("n").reset_index(drop=True)
        assert back["name"].tolist()[:4] == df["name"].tolist()[:4]
        assert back["name"][4] is None or pd.isna(back["name"][4])
        # shortest-round-trip floats are BIT-identical after parse
        assert back["score"].tolist() == df["score"].tolist()
        assert back["lon"].tolist() == df["lon"].tolist()
        assert back["lat"].tolist() == df["lat"].tolist()

    def test_files_are_valid_json_and_duckdb_readable(self, ray_session, tmp_path):
        import ray.data as rd

        from geomesa_ray.stages.geojson_export import write_geojson

        df = pd.DataFrame({
            "tag": ["a", "b", "c", "d"],
            "v": [1.25, 2.5, 3.75, 5.0],
            "lon": [1.0, 2.0, 3.0, 4.0],
            "lat": [-1.0, -2.0, -3.0, -4.0],
        })
        out = str(tmp_path / "gj2")
        manifest = write_geojson(rd.from_pandas(df), out).take_all()
        for r in manifest:
            parsed = json.load(open(r["path"]))
            assert parsed["type"] == "FeatureCollection"
            assert all(f["type"] == "Feature" for f in parsed["features"])
        # independent parse: DuckDB read_json over the written files
        con = duckdb.connect()
        got = con.execute(
            f"SELECT unnest(features, recursive := true) FROM read_json('{out}/*.geojson')"
        ).df()
        assert len(got) == 4
        assert sorted(got["tag"]) == ["a", "b", "c", "d"]
        assert sorted(got["v"]) == [1.25, 2.5, 3.75, 5.0]

    def test_geojsonl_mode(self, ray_session, tmp_path):
        import ray.data as rd

        from geomesa_ray.stages.geojson_export import read_geojson, write_geojson

        df = pd.DataFrame({"k": [1, 2], "lon": [0.5, 1.5], "lat": [2.5, 3.5]})
        out = str(tmp_path / "gjl")
        manifest = write_geojson(rd.from_pandas(df), out, collection=False).take_all()
        assert all(r["path"].endswith(".geojsonl") for r in manifest)
        back = read_geojson([r["path"] for r in manifest]).to_pandas()
        assert sorted(back["k"]) == [1, 2]


class TestGmlExport:
    def test_members_parse_and_escape(self, ray_session, tmp_path):
        import xml.etree.ElementTree as ET

        import ray.data as rd

        from geomesa_ray.stages.gml_export import write_gml

        df = pd.DataFrame({
            "name": ["a<b&c", 'q"x', "plain'"],
            "v": [1.5, 2.5, 3.5],
            "lon": [1.0, 2.0, 3.0],
            "lat": [4.0, 5.0, 6.0],
        })
        out = str(tmp_path / "gml")
        man = write_gml(rd.from_pandas(df), out, id_col=None).take_all()
        assert sum(r["count"] for r in man) == 3
        GML = "{http://www.opengis.net/gml}"
        GM = "{http://geomesa.org}"
        names, poses = [], []
        for r in man:
            root = ET.parse(r["path"]).getroot()
            for m in root.findall(f".//{GML}featureMember"):
                names.append(m.find(f".//{GM}name").text)
                poses.append(m.find(f".//{GML}pos").text)
        assert sorted(names) == sorted(df["name"])  # escaping round-trips
        assert "4.0 1.0" in poses  # (lat lon) axis order

    def test_leaflet_page(self, ray_session, tmp_path):
        import json

        import ray.data as rd

        from geomesa_ray.stages.geojson_export import write_leaflet

        df = pd.DataFrame({"n": [1, 2], "lon": [2.35, 2.35], "lat": [48.85, 48.85]})
        out = str(tmp_path / "map.html")
        res = write_leaflet(rd.from_pandas(df), out)
        html = open(out).read()
        assert res["count"] == 2
        start = html.index("var points = ") + len("var points = ")
        end = html.index(";\n", start)
        fc = json.loads(html[start:end])
        assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 2
        # duplicate coordinate aggregates to one heat entry of weight 2
        hs = html.index("var heat = ") + len("var heat = ")
        he = html.index(";\n", hs)
        heat = json.loads(html[hs:he])
        assert heat == [[48.85, 2.35, 2]]
