"""Tests for the round-3 jts UDF long tail (reference geomesa-spark-jts
udf/*.scala parity: constructors, accessors, casts, geohash decode,
boundary, closest point, spherical length, convex set ops)."""

import numpy as np
import pytest

from geomesa_ray.functions.registry import call

SQ = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
TRI = "POLYGON ((2 2, 6 2, 6 6, 2 2))"
LINE = "LINESTRING (0 0, 3 0, 3 4)"
CLOSED = "LINESTRING (0 0, 1 0, 1 1, 0 1, 0 0)"


def _area(wkt: str) -> float:
    return float(call("st_area", np.array([wkt], dtype=object))[0])


class TestConstructorsCasts:
    def test_as_text_canonicalizes(self):
        out = call("st_asText", np.array(["point( 1.5  2 )"], dtype=object))
        assert out[0] == "POINT (1.5 2.0)"

    def test_geom_from_wkt_invalid_is_null(self):
        out = call("st_geomFromWKT", np.array(["nonsense"], dtype=object))
        assert out[0] is None

    def test_typed_parsers(self):
        assert call("st_lineFromText", np.array([LINE], dtype=object))[0] is not None
        assert call("st_lineFromText", np.array([SQ], dtype=object))[0] is None
        assert call("st_polygonFromText", np.array([SQ], dtype=object))[0] is not None
        mp = "MULTIPOINT ((1 2), (3 4))"
        assert call("st_mPointFromText", np.array([mp], dtype=object))[0] == \
            "MULTIPOINT ((1.0 2.0), (3.0 4.0))"
        ml = "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))"
        assert call("st_mLineFromText", np.array([ml], dtype=object))[0] is not None

    def test_casts(self):
        assert call("st_castToPoint", np.array(["POINT (1 2)"], dtype=object))[0] is not None
        assert call("st_castToPoint", np.array([SQ], dtype=object))[0] is None
        assert call("st_castToPolygon", np.array([SQ], dtype=object))[0] is not None
        assert call("st_castToLineString", np.array([LINE], dtype=object))[0] is not None

    def test_make_box2d_and_polygon(self):
        box = call("st_makeBox2D", [0.0], [0.0], [2.0], [3.0])[0]
        assert _area(box) == 6.0
        poly = call("st_polygon", np.array([CLOSED], dtype=object))[0]
        assert _area(poly) == 1.0
        assert call("st_polygon", np.array([LINE], dtype=object))[0] is None

    def test_point_m_and_bytearray(self):
        assert call("st_makePointM", [1.0], [2.0], [3.0])[0] == "POINT M (1.0 2.0 3.0)"
        assert call("st_byteArray", np.array(["ab"], dtype=object))[0] == b"ab"


class TestGeohashDecode:
    def test_roundtrip_center(self):
        lon, lat = np.array([2.35]), np.array([48.85])
        gh = call("st_geoHash", lon, lat, 9)[0]
        pt = call("st_pointFromGeoHash", np.array([gh], dtype=object))[0]
        x, y = [float(v) for v in pt[pt.index("(") + 1:-1].split()]
        # precision-9 cells are ~5e-5 degrees
        assert abs(x - 2.35) < 1e-3 and abs(y - 48.85) < 1e-3

    def test_bbox_contains_point(self):
        gh = call("st_geoHash", np.array([2.35]), np.array([48.85]), 7)[0]
        box = call("st_geomFromGeoHash", np.array([gh], dtype=object))[0]
        assert call("st_contains", box, np.array([2.35]), np.array([48.85]))[0]


class TestAccessors:
    def test_boundary(self):
        b = call("st_boundary", np.array([SQ, LINE, "POINT (1 2)", CLOSED], dtype=object))
        assert b[0].startswith("LINESTRING")
        assert b[1] == "MULTIPOINT ((0.0 0.0), (3.0 4.0))"
        assert b[2] == "GEOMETRYCOLLECTION EMPTY"
        assert b[3] == "MULTIPOINT EMPTY"

    def test_dimension_type_flags(self):
        vals = np.array(["POINT (1 2)", LINE, SQ], dtype=object)
        assert list(call("st_dimension", vals)) == [0, 1, 2]
        assert list(call("st_coordDim", vals)) == [2, 2, 2]
        assert list(call("st_geometryType", vals)) == ["Point", "LineString", "Polygon"]
        assert list(call("st_isClosed", np.array([LINE, CLOSED], dtype=object))) == [False, True]
        assert list(call("st_isCollection",
                         np.array([SQ, "MULTIPOINT ((1 2))"], dtype=object))) == [False, True]

    def test_simple_valid_ring(self):
        bow = "LINESTRING (0 0, 2 2, 2 0, 0 2)"  # self-crossing
        assert list(call("st_isSimple", np.array([LINE, bow], dtype=object))) == [True, False]
        bowtie = "POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))"
        assert list(call("st_isValid", np.array([SQ, bowtie], dtype=object))) == [True, False]
        assert list(call("st_isRing", np.array([CLOSED, LINE], dtype=object))) == [True, False]

    def test_point_n_interior_ring_n(self):
        assert call("st_pointN", np.array([LINE], dtype=object), 2)[0] == "POINT (3.0 0.0)"
        assert call("st_pointN", np.array([LINE], dtype=object), 9)[0] is None
        holed = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
        ring = call("st_interiorRingN", np.array([holed], dtype=object), 1)[0]
        assert ring.startswith("LINESTRING (2.0 2.0")
        assert call("st_interiorRingN", np.array([holed], dtype=object), 2)[0] is None


class TestClosestPointLength:
    def test_closest_point_on_segment(self):
        out = call("st_closestPoint", np.array([LINE], dtype=object),
                   np.array([1.0]), np.array([2.0]))
        assert out[0] == "POINT (1.0 0.0)"

    def test_closest_point_inside_polygon_is_self(self):
        out = call("st_closestPoint", np.array([SQ], dtype=object),
                   np.array([1.0]), np.array([1.0]))
        assert out[0] == "POINT (1.0 1.0)"

    def test_closest_point_outside_polygon(self):
        out = call("st_closestPoint", np.array([SQ], dtype=object),
                   np.array([5.0]), np.array([2.0]))
        assert out[0] == "POINT (4.0 2.0)"

    def test_length_sphere_equator_degree(self):
        one_deg = "LINESTRING (0 0, 1 0)"
        m = call("st_lengthSphere", np.array([one_deg], dtype=object))[0]
        assert m == pytest.approx(111195, rel=1e-2)


class TestSetOps:
    def test_intersection_area(self):
        out = call("st_intersection", np.array([SQ], dtype=object),
                   np.array([TRI], dtype=object))[0]
        assert _area(out) == pytest.approx(2.0)

    def test_intersection_disjoint_empty(self):
        far = "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))"
        out = call("st_intersection", np.array([SQ], dtype=object),
                   np.array([far], dtype=object))[0]
        assert out == "POLYGON EMPTY"

    def test_difference_area(self):
        out = call("st_difference", np.array([SQ], dtype=object),
                   np.array([TRI], dtype=object))[0]
        total = 0.0
        if out.startswith("MULTIPOLYGON"):
            n = int(call("st_numGeometries", np.array([out], dtype=object))[0])
            for k in range(1, n + 1):
                piece = call("st_geometryN", np.array([out], dtype=object), k)[0]
                total += _area(piece)
        else:
            total = _area(out)
        assert total == pytest.approx(14.0)

    def test_difference_covered_is_empty(self):
        big = "POLYGON ((-1 -1, 5 -1, 5 5, -1 5, -1 -1))"
        out = call("st_difference", np.array([SQ], dtype=object),
                   np.array([big], dtype=object))[0]
        assert out == "POLYGON EMPTY"

    def test_holed_polygon_set_ops(self):
        # interior rings enter as the shell's convex cover minus the hole's
        # pieces; integer rectilinear fixtures keep every area FP-exact
        holed = ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                 "(4 4, 6 4, 6 6, 4 6, 4 4))")          # area 100 - 4 = 96
        big = "POLYGON ((-5 -5, 15 -5, 15 15, -5 15, -5 -5))"  # covers holed

        def area_of(wkt):
            from geomesa_ray.geo.poly import signed_area
            from geomesa_ray.geo.wkt import parse_wkt
            if wkt == "POLYGON EMPTY":
                return 0.0
            g = parse_wkt(wkt)
            rings = [g["coords"][0]] if g["type"] == "Polygon" else \
                    [p[0] for p in g["coords"]]
            return sum(abs(signed_area(np.asarray(r)[:-1])) for r in rings)

        one = lambda fn, a, b: call(fn, np.array([a], dtype=object),
                                    np.array([b], dtype=object))[0]
        # holed ∩ big = the holed polygon itself: area 96
        assert area_of(one("st_intersection", holed, big)) == 96.0
        assert area_of(one("st_intersection", big, holed)) == 96.0
        # holed ∩ SQ (4x4 square at origin, touches the hole only at a
        # corner): full 16, none lost to the hole
        assert area_of(one("st_intersection", holed, SQ)) == 16.0
        # square congruent to the hole intersects to empty
        hole_sq = "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))"
        assert one("st_intersection", holed, hole_sq) == "POLYGON EMPTY"
        # holed − SQ removes the 4x4 corner: 96 - 16
        assert area_of(one("st_difference", holed, SQ)) == 80.0
        # big − holed = frame around the shell + the hole region: 400-96
        assert area_of(one("st_difference", big, holed)) == 304.0
        # holed − big = empty
        assert one("st_difference", holed, big) == "POLYGON EMPTY"
        # holed ∩ holed (self) = 96; holed − holed = empty
        assert area_of(one("st_intersection", holed, holed)) == 96.0
        assert one("st_difference", holed, holed) == "POLYGON EMPTY"

    def test_line_clip_through_hole_leaves_gap(self):
        holed = ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
                 "(4 5, 6 5, 6 7, 4 7, 4 5))")
        line = "LINESTRING (-2 6, 12 6)"  # crosses shell and the hole band
        out = call("st_intersection", np.array([line], dtype=object),
                   np.array([holed], dtype=object))[0]
        assert out == ("MULTILINESTRING ((0.0 6.0, 4.0 6.0), "
                       "(6.0 6.0, 10.0 6.0))")

    def test_concave_self_intersection_conserves_area(self):
        # round 4: concave x concave no longer null — ear-clip decomposition
        from geomesa_ray.geo.poly import signed_area
        from geomesa_ray.geo.wkt import parse_wkt

        concave = "POLYGON ((0 0, 4 0, 4 4, 2 1, 0 4, 0 0))"
        out = call("st_intersection", np.array([concave], dtype=object),
                   np.array([concave], dtype=object))[0]
        g = parse_wkt(out)
        rings = [g["coords"][0]] if g["type"] == "Polygon" else [p[0] for p in g["coords"]]
        got = sum(abs(signed_area(np.asarray(r, dtype=float)[:-1])) for r in rings)
        src = abs(signed_area(np.asarray(parse_wkt(concave)["coords"][0], dtype=float)[:-1]))
        assert abs(got - src) < 1e-9


class TestAntimeridianLatLonText:
    def test_split_polygon(self):
        over = "POLYGON ((170 10, 190 10, 190 20, 170 20, 170 10))"
        out = call("st_antimeridianSafeGeom", np.array([over], dtype=object))[0]
        assert out.startswith("MULTIPOLYGON")
        assert "-170" in out  # western part shifted into range

    def test_in_range_passthrough(self):
        out = call("st_antimeridianSafeGeom", np.array([SQ], dtype=object))[0]
        assert _area(out) == 16.0

    def test_lat_lon_text(self):
        out = call("st_asLatLonText", np.array([-79.2]), np.array([35.5]))[0]
        assert out == "35°30'00.000\"N 79°12'00.000\"W"


class TestConcaveSetOps:
    """Round 4: concave x concave set ops via ear-clip decomposition."""

    A = "POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))"  # L, area 12
    B = "POLYGON ((1 1, 5 1, 5 5, 3 5, 3 3, 1 3, 1 1))"  # L, area 12

    @staticmethod
    def _area(wkt):
        from geomesa_ray.geo.poly import signed_area
        from geomesa_ray.geo.wkt import parse_wkt

        if wkt == "POLYGON EMPTY":
            return 0.0
        g = parse_wkt(wkt)
        rings = [g["coords"][0]] if g["type"] == "Polygon" else [p[0] for p in g["coords"]]
        return sum(abs(signed_area(np.asarray(r, dtype=float)[:-1])) for r in rings)

    def test_concave_intersection_area(self):
        got = call("st_intersection", np.array([self.A], dtype=object),
                   np.array([self.B], dtype=object))[0]
        assert got is not None and got != "POLYGON EMPTY"
        assert abs(self._area(got) - 4.0) < 1e-9

    def test_concave_difference_areas(self):
        d1 = call("st_difference", np.array([self.A], dtype=object),
                  np.array([self.B], dtype=object))[0]
        d2 = call("st_difference", np.array([self.B], dtype=object),
                  np.array([self.A], dtype=object))[0]
        assert abs(self._area(d1) - 8.0) < 1e-9
        assert abs(self._area(d2) - 8.0) < 1e-9

    def test_disjoint_concave(self):
        far = "POLYGON ((100 100, 104 100, 104 102, 102 102, 102 104, 100 104, 100 100))"
        got = call("st_intersection", np.array([self.A], dtype=object),
                   np.array([far], dtype=object))[0]
        assert got == "POLYGON EMPTY"

    def test_ear_clip_area_conservation_random(self):
        from geomesa_ray.geo.poly import ear_clip, signed_area

        rng = np.random.default_rng(11)
        for _ in range(20):
            # random star-shaped polygon: strictly increasing angles with
            # every gap < pi (guarantees simplicity around the origin)
            n = int(rng.integers(5, 12))
            ang = (np.arange(n) + rng.uniform(0.0, 0.9, n)) * 2 * np.pi / n
            rad = rng.uniform(1.0, 5.0, n)
            ring = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1)
            tris = ear_clip(ring)
            assert abs(sum(signed_area(t) for t in tris) - abs(signed_area(ring))) < 1e-9


class TestLinePolygonClip:
    """Round 4: st_intersection(line, polygon) via Liang-Barsky unions."""

    L = "POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))"

    def _clip(self, line):
        return call("st_intersection", np.array([line], dtype=object),
                    np.array([self.L], dtype=object))[0]

    def test_bottom_arm(self):
        assert self._clip("LINESTRING (-5 0.5, 10 0.5)") == "LINESTRING (0.0 0.5, 4.0 0.5)"

    def test_tall_arm(self):
        assert self._clip("LINESTRING (-5 3, 10 3)") == "LINESTRING (0.0 3.0, 2.0 3.0)"

    def test_miss(self):
        assert self._clip("LINESTRING (-5 5, 10 5)") == "LINESTRING EMPTY"

    def test_diagonal_through_corner(self):
        assert self._clip("LINESTRING (-1 -1, 5 5)") == "LINESTRING (0.0 0.0, 2.0 2.0)"

    def test_reversed_args(self):
        got = call("st_intersection", np.array([self.L], dtype=object),
                   np.array(["LINESTRING (-5 3, 10 3)"], dtype=object))[0]
        assert got == "LINESTRING (0.0 3.0, 2.0 3.0)"

    def test_multi_piece_convex(self):
        # zig-zag line exits and re-enters a convex square -> 2 pieces
        sq = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
        got = call("st_intersection",
                   np.array(["LINESTRING (2 5, 2 15, 8 15, 8 5)"], dtype=object),
                   np.array([sq], dtype=object))[0]
        assert got.startswith("MULTILINESTRING")
        assert got.count("(") == 3  # outer + two pieces


class TestMultiPolygonSetOps:
    """Round 4: set ops accept MultiPolygon on either side."""

    MP = ("MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), "
          "((20 0, 30 0, 30 10, 20 10, 20 0)))")
    B = "POLYGON ((5 2, 25 2, 25 8, 5 8, 5 2))"  # spans the gap

    @staticmethod
    def _area(wkt):
        from geomesa_ray.geo.poly import signed_area
        from geomesa_ray.geo.wkt import parse_wkt

        if wkt.endswith("EMPTY"):
            return 0.0
        g = parse_wkt(wkt)
        rings = [g["coords"][0]] if g["type"] == "Polygon" else [p[0] for p in g["coords"]]
        return sum(abs(signed_area(np.asarray(r, dtype=float)[:-1])) for r in rings)

    def test_intersection_area(self):
        got = call("st_intersection", np.array([self.MP], dtype=object),
                   np.array([self.B], dtype=object))[0]
        assert abs(self._area(got) - 60.0) < 1e-9

    def test_difference_both_directions(self):
        d1 = call("st_difference", np.array([self.MP], dtype=object),
                  np.array([self.B], dtype=object))[0]
        d2 = call("st_difference", np.array([self.B], dtype=object),
                  np.array([self.MP], dtype=object))[0]
        assert abs(self._area(d1) - 140.0) < 1e-9
        assert abs(self._area(d2) - 60.0) < 1e-9

    def test_line_clip_across_gap(self):
        got = call("st_intersection",
                   np.array(["LINESTRING (-5 5, 35 5)"], dtype=object),
                   np.array([self.MP], dtype=object))[0]
        assert got == "MULTILINESTRING ((0.0 5.0, 10.0 5.0), (20.0 5.0, 30.0 5.0))"
