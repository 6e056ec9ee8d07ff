"""Converter format tests: Avro container files, fixed-width text."""

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.sources.avro import (
    avro_to_arrow,
    read_avro,
    read_avro_file,
    write_avro_file,
)
from geomesa_ray.sources.fixedwidth import parse_fixed_width, read_fixed_width

SCHEMA = {
    "type": "record",
    "name": "Obs",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "value", "type": "double"},
        {"name": "tag", "type": ["null", "string"]},
        {"name": "path", "type": {"type": "array", "items": "double"}},
    ],
}

ROWS = [
    {"id": 1, "name": "alpha", "value": 1.5, "tag": "x", "path": [1.0, 2.0]},
    {"id": 2, "name": "βeta", "value": -2.25, "tag": None, "path": []},
    {"id": 3, "name": "gamma", "value": 0.0, "tag": "z", "path": [3.5]},
]


class TestAvro:
    def test_roundtrip_null_codec(self, tmp_path):
        p = str(tmp_path / "a.avro")
        write_avro_file(p, SCHEMA, ROWS)
        assert read_avro_file(p) == ROWS

    def test_roundtrip_deflate(self, tmp_path):
        p = str(tmp_path / "b.avro")
        write_avro_file(p, SCHEMA, ROWS, codec="deflate")
        assert read_avro_file(p) == ROWS

    def test_arrow_schema(self, tmp_path):
        p = str(tmp_path / "c.avro")
        write_avro_file(p, SCHEMA, ROWS)
        t = avro_to_arrow(p)
        assert t.num_rows == 3
        assert t.column("id").to_pylist() == [1, 2, 3]
        assert t.column("tag").to_pylist() == ["x", None, "z"]
        assert t.column("path").to_pylist() == [[1.0, 2.0], [], [3.5]]

    def test_ray_dataset(self, tmp_path, ray_session):
        for i in range(3):
            write_avro_file(str(tmp_path / f"s{i}.avro"), SCHEMA, ROWS)
        ds = read_avro(str(tmp_path))
        assert ds.count() == 9

    def test_rejects_non_avro(self, tmp_path):
        p = tmp_path / "bad.avro"
        p.write_bytes(b"not avro at all")
        with pytest.raises(ValueError):
            read_avro_file(str(p))


class TestFixedWidth:
    FIELDS = [("station", 0, 4, "string"), ("lon", 4, 9, "double"),
              ("lat", 13, 7, "double"), ("n", 20, 4, "int")]

    @staticmethod
    def _line(st, lon, lat, n):
        return f"{st:<4}{lon:>9.4f}{lat:>7.2f}{n:>4d}"

    def test_parse_vectorized(self):
        lines = pa.array([
            self._line("PARI", 2.35, 48.85, 12),
            self._line("NYC", -74.0, 40.70, 7),
        ])
        t = parse_fixed_width(lines, self.FIELDS)
        assert t.column("station").to_pylist() == ["PARI", "NYC"]
        assert t.column("lon").to_pylist() == [2.35, -74.0]
        assert t.column("n").to_pylist() == [12, 7]

    def test_ray_dataset(self, tmp_path, ray_session):
        f = tmp_path / "fw.txt"
        f.write_text(self._line("PARI", 2.35, 48.85, 12) + "\n"
                     + self._line("NYC", -74.0, 40.70, 7) + "\n")
        ds = read_fixed_width(str(f), self.FIELDS)
        df = ds.to_pandas().sort_values("station").reset_index(drop=True)
        assert df["lat"].tolist() == [40.7, 48.85]


class TestXml:
    DOC = """<?xml version="1.0"?>
    <obs_set>
      <obs id="1"><name>alpha</name><pos><lon>2.35</lon><lat>48.85</lat></pos></obs>
      <obs id="2"><name>beta</name><pos><lon>-74.0</lon><lat>40.7</lat></pos></obs>
      <obs id="3"><name/><pos><lon>0.0</lon><lat>0.0</lat></pos></obs>
    </obs_set>"""
    FIELDS = {"id": ("@id", "long"), "name": ("name", "string"),
              "lon": ("pos/lon", "double"), "lat": ("pos/lat", "double")}

    def test_parse_records(self):
        from geomesa_ray.sources.xmlsrc import parse_xml_records

        t = parse_xml_records(self.DOC, "obs", self.FIELDS)
        assert t.column("id").to_pylist() == [1, 2, 3]
        assert t.column("name").to_pylist() == ["alpha", "beta", None]
        assert t.column("lon").to_pylist() == [2.35, -74.0, 0.0]

    def test_ray_dataset(self, tmp_path, ray_session):
        from geomesa_ray.sources.xmlsrc import read_xml

        for i in range(2):
            (tmp_path / f"f{i}.xml").write_text(self.DOC)
        ds = read_xml(str(tmp_path), "obs", self.FIELDS)
        assert ds.count() == 6


class TestShapefile:
    def _write_mixed(self, tmp_path):
        from geomesa_ray.sources.shp import write_shapefile

        # CW outer ring (ESRI convention) + CCW hole inside it
        outer = [(0, 0), (0, 4), (4, 4), (4, 0), (0, 0)]
        hole = [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]
        p = str(tmp_path / "polys.shp")
        write_shapefile(
            p,
            [("polygon", [outer, hole]),
             ("polygon", [[(10, 10), (10, 12), (12, 12), (12, 10), (10, 10)]])],
            attrs={"name": ["donut", "plain"], "pop": [100, 25],
                   "score": [1.5, None], "flag": [True, False]},
        )
        return p

    def test_polygon_roundtrip_with_dbf(self, tmp_path):
        from geomesa_ray.sources.shp import read_shapefile_table

        t = read_shapefile_table(self._write_mixed(tmp_path))
        assert t.num_rows == 2
        g0 = t.column("geometry")[0].as_py()
        assert g0.startswith("POLYGON ((") and g0.count("(") == 3  # outer + hole
        assert "MULTIPOLYGON" not in g0
        assert t.column("name").to_pylist() == ["donut", "plain"]
        assert t.column("pop").to_pylist() == [100, 25]
        assert t.column("pop").type == pa.int64()
        assert t.column("score").to_pylist() == [pytest.approx(1.5), None]
        assert t.column("flag").to_pylist() == [True, False]

    def test_points_get_lonlat(self, tmp_path):
        from geomesa_ray.sources.shp import read_shapefile_table, write_shapefile

        p = str(tmp_path / "pts.shp")
        write_shapefile(p, [("point", (2.35, 48.85)), ("point", (-74.0, 40.7))],
                        attrs={"city": ["paris", "nyc"]})
        t = read_shapefile_table(p)
        assert t.column("lon").to_pylist() == [2.35, -74.0]
        assert t.column("lat").to_pylist() == [48.85, 40.7]
        assert t.column("geometry")[1].as_py() == "POINT (-74 40.7)"

    def test_polyline_multipoint_null(self, tmp_path):
        from geomesa_ray.sources.shp import read_shapefile_table, write_shapefile

        p = str(tmp_path / "mix.shp")
        write_shapefile(p, [
            ("polyline", [[(0, 0), (1, 1), (2, 0)]]),
            ("polyline", [[(0, 0), (1, 1)], [(5, 5), (6, 6)]]),
            ("multipoint", [[(1, 2), (3, 4)]]),
            ("null", None),
        ])
        g = read_shapefile_table(p).column("geometry").to_pylist()
        assert g[0] == "LINESTRING (0 0, 1 1, 2 0)"
        assert g[1].startswith("MULTILINESTRING ((0 0, 1 1), (5 5, 6 6))")
        assert g[2] == "MULTIPOINT (1 2, 3 4)"
        assert g[3] is None

    def test_ray_dataset_and_pip_feed(self, tmp_path, ray_session):
        """Shapefile polygons feed broadcast_pip_join like any WKT dict —
        the reference's converter -> query chain (ShapefileConverter.scala)."""
        import ray.data as rd

        from geomesa_ray.sources.shp import read_shapefile
        from geomesa_ray.stages.pip_join import broadcast_pip_join

        self._write_mixed(tmp_path)
        ds = read_shapefile(str(tmp_path))
        polys = {r["name"]: r["geometry"] for r in ds.take_all()}
        assert set(polys) == {"donut", "plain"}
        pts = rd.from_items([
            {"id": 0, "lon": 3.0, "lat": 3.0},   # inside donut (not in hole)
            {"id": 1, "lon": 1.5, "lat": 1.5},   # inside the hole -> no match
            {"id": 2, "lon": 11.0, "lat": 11.0},  # inside plain
            {"id": 3, "lon": 50.0, "lat": 50.0},  # outside everything
        ])
        out = broadcast_pip_join(pts, polys).to_pandas()
        got = dict(zip(out["id"], out["poly_name"]))
        assert got == {0: "donut", 2: "plain"}
