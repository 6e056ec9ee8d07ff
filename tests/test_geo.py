"""Geometry-kernel tests: WKT round-trips, PIP truth tables, distances,
grid snapping, bucket-index probes (reference style: geomesa-spark-jts
st_* function tests with exact expected values)."""

import numpy as np

from geomesa_ray.geo import (
    GridSnap,
    Polygon,
    PolygonBucketIndex,
    format_point_wkt,
    haversine_m,
    parse_points_wkt,
    parse_wkt,
)
from geomesa_ray.geo.predicates import MultiPolygon
from geomesa_ray.geo.wkt import format_polygon_wkt


class TestWkt:
    def test_parse_points_vectorized(self):
        vals = ["POINT (1.5 2.5)", "POINT(-77.03 38.89)", "garbage", None, "POINT (1e2 -5)"]
        lon, lat, valid = parse_points_wkt(vals)
        assert valid.tolist() == [True, True, False, False, True]
        assert lon[0] == 1.5 and lat[0] == 2.5
        assert lon[1] == -77.03 and lat[1] == 38.89
        assert lon[4] == 100.0 and lat[4] == -5.0

    def test_format_roundtrip(self):
        w = format_point_wkt([1.25], [-3.5])
        lon, lat, valid = parse_points_wkt(w)
        assert valid[0] and lon[0] == 1.25 and lat[0] == -3.5

    def test_parse_polygon(self):
        g = parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
        assert g["type"] == "Polygon" and len(g["coords"]) == 2

    def test_parse_multipolygon(self):
        g = parse_wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))")
        assert g["type"] == "MultiPolygon" and len(g["coords"]) == 2

    def test_parse_linestring(self):
        g = parse_wkt("LINESTRING (0 0, 1 1, 2 0)")
        assert g["type"] == "LineString" and g["coords"].shape == (3, 2)


class TestPolygon:
    def test_square_truth_table(self):
        p = Polygon.from_bbox(0, 0, 10, 10)
        lon = np.array([5.0, -1.0, 10.5, 0.5, 9.99])
        lat = np.array([5.0, 5.0, 5.0, 0.5, 9.99])
        assert p.contains(lon, lat).tolist() == [True, False, False, True, True]

    def test_hole(self):
        p = Polygon.from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
        lon = np.array([5.0, 2.0, 6.5])
        lat = np.array([5.0, 2.0, 6.5])
        assert p.contains(lon, lat).tolist() == [False, True, True]

    def test_concave(self):
        # L-shape: notch at top right
        p = Polygon.from_wkt("POLYGON ((0 0, 10 0, 10 5, 5 5, 5 10, 0 10, 0 0))")
        assert p.contains(np.array([7.0]), np.array([7.0]))[0] == False  # noqa: E712
        assert p.contains(np.array([2.0]), np.array([7.0]))[0] == True  # noqa: E712
        assert p.contains(np.array([7.0]), np.array([2.0]))[0] == True  # noqa: E712

    def test_multipolygon(self):
        mp = Polygon.from_wkt("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))")
        assert isinstance(mp, MultiPolygon)
        lon = np.array([1.0, 6.0, 3.5])
        lat = np.array([1.0, 6.0, 3.5])
        assert mp.contains(lon, lat).tolist() == [True, True, False]

    def test_format_wkt(self):
        p = Polygon.from_bbox(0, 0, 1, 1)
        w = format_polygon_wkt([r.tolist() for r in p.rings])
        assert Polygon.from_wkt(w).contains(np.array([0.5]), np.array([0.5]))[0]


class TestDistance:
    def test_known_distance(self):
        # Paris -> London ~ 343 km
        d = haversine_m(2.3522, 48.8566, -0.1276, 51.5072)
        assert 330_000 < float(d) < 350_000

    def test_zero(self):
        assert float(haversine_m(10, 10, 10, 10)) == 0.0

    def test_antimeridian(self):
        # points just across the antimeridian are close
        d = haversine_m(179.99, 0, -179.99, 0)
        assert float(d) < 3000


class TestGridSnap:
    def test_snap_semantics(self):
        g = GridSnap(0, 0, 10, 10, 5, 5)
        assert g.i(np.array([0.0]))[0] == 0
        assert g.i(np.array([9.99]))[0] == 4
        assert g.i(np.array([10.0]))[0] == 4  # right edge inclusive
        assert g.i(np.array([-0.1]))[0] == -1  # out of envelope
        assert g.i(np.array([10.1]))[0] == -1
        assert g.x(np.array([0]))[0] == 1.0  # cell centers
        assert g.y(np.array([4]))[0] == 9.0

    def test_floor_binning(self):
        g = GridSnap(0, 0, 1, 1, 10, 10)
        xs = np.array([0.05, 0.15, 0.95])
        assert g.i(xs).tolist() == [0, 1, 9]


class TestBucketIndex:
    def test_probe_matches_bruteforce(self):
        rng = np.random.default_rng(13)
        polys = []
        names = []
        for k in range(20):
            cx, cy = rng.uniform(-50, 50), rng.uniform(-40, 40)
            w, h = rng.uniform(0.5, 5), rng.uniform(0.5, 5)
            polys.append(Polygon.from_bbox(cx - w, cy - h, cx + w, cy + h))
            names.append(f"poly{k}")
        idx = PolygonBucketIndex(polys, names=names)
        lon = rng.uniform(-60, 60, 5000)
        lat = rng.uniform(-50, 50, 5000)
        pi, qi = idx.probe(lon, lat)
        got = set(zip(pi.tolist(), qi.tolist()))
        expected = set()
        for k, p in enumerate(polys):
            for i in np.nonzero(p.contains(lon, lat))[0].tolist():
                expected.add((i, k))
        assert got == expected

    def test_world_polygon_goes_global(self):
        big = Polygon.from_bbox(-179, -89, 179, 89)
        idx = PolygonBucketIndex([big], level=14)
        assert idx.global_polys == [0]
        pi, qi = idx.probe(np.array([0.0]), np.array([0.0]))
        assert len(pi) == 1
