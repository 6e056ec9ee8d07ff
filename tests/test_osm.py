"""OSM XML converter (nodes -> points, ways -> joined LineStrings)."""

import pyarrow as pa
import pytest

from geomesa_ray.sources.osm import (
    parse_osm_nodes,
    parse_osm_ways,
    read_osm_nodes,
    read_osm_ways,
    ways_to_lines,
)

OSM = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6" generator="test">
  <node id="1" lat="48.1" lon="2.1" version="3" timestamp="2024-01-01T00:00:00Z" changeset="10" uid="7" user="alice">
    <tag k="amenity" v="cafe"/>
    <tag k="name" v="Chez Test"/>
  </node>
  <node id="2" lat="48.2" lon="2.2"/>
  <node id="3" lat="48.3" lon="2.3"/>
  <way id="100" version="1">
    <nd ref="1"/>
    <nd ref="2"/>
    <nd ref="3"/>
    <tag k="highway" v="residential"/>
  </way>
  <way id="101">
    <nd ref="3"/>
    <nd ref="1"/>
  </way>
  <way id="102">
    <nd ref="2"/>
  </way>
</osm>
"""


class TestParsers:
    def test_nodes(self):
        t = parse_osm_nodes(OSM)
        assert t.num_rows == 3
        r0 = t.slice(0, 1).to_pylist()[0]
        assert r0["node_id"] == 1 and r0["lon"] == 2.1 and r0["lat"] == 48.1
        assert r0["tags"] == "amenity=cafe;name=Chez Test"
        assert r0["version"] == 3 and r0["uid"] == 7 and r0["user"] == "alice"
        r1 = t.slice(1, 1).to_pylist()[0]
        assert r1["version"] is None and r1["tags"] == ""

    def test_ways_exploded(self):
        t = parse_osm_ways(OSM)
        rows = t.to_pylist()
        w100 = [r for r in rows if r["way_id"] == 100]
        assert [r["ref"] for r in w100] == [1, 2, 3]
        assert [r["seq"] for r in w100] == [0, 1, 2]
        assert w100[0]["tags"] == "highway=residential"


class TestDataset:
    @pytest.fixture()
    def osm_file(self, tmp_path):
        p = tmp_path / "sample.osm"
        p.write_text(OSM)
        return str(p)

    def test_read_and_join(self, ray_session, osm_file):
        nodes = read_osm_nodes(osm_file)
        ways = read_osm_ways(osm_file)
        assert nodes.count() == 3
        out = ways_to_lines(ways, nodes).to_pandas().sort_values("way_id")
        # way 102 has a single point -> dropped by min_points
        assert out["way_id"].tolist() == [100, 101]
        w100 = out[out["way_id"] == 100].iloc[0]
        assert w100["wkt"] == (
            "LINESTRING (2.100000 48.100000, 2.200000 48.200000, 2.300000 48.300000)"
        )
        assert w100["n_points"] == 3 and w100["tags"] == "highway=residential"
        w101 = out[out["way_id"] == 101].iloc[0]
        # ref order preserved: 3 then 1
        assert w101["wkt"].startswith("LINESTRING (2.300000 48.300000, 2.100000")
