"""Unit tests for the round-2 geometry function widening (accessors,
constructors, convex relations — SpatialRelationFunctions parity)."""

import numpy as np
import pytest

from geomesa_ray.functions.registry import FUNCTIONS, call

SQ = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"       # 4x4 square
SQ_SHIFT = "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"  # overlapping square
SQ_FAR = "POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))"
SQ_TOUCH = "POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))"  # shares the x=4 edge
SQ_INNER = "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"  # inside SQ
MP = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))"


def test_registry_size_meets_reference_bar():
    assert len(FUNCTIONS) >= 60


def test_st_translate_point_and_polygon():
    out = call("st_translate", np.array(["POINT (1 2)"], dtype=object), 0.5, -0.5)
    assert out[0] == "POINT (1.5 1.5)"
    poly = call("st_translate", np.array([SQ], dtype=object), 1, 1)[0]
    assert "1.0 1.0" in poly or "1 1" in poly


def test_st_area_square_and_hole():
    assert call("st_area", np.array([SQ], dtype=object))[0] == pytest.approx(16.0)
    holed = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    assert call("st_area", np.array([holed], dtype=object))[0] == pytest.approx(15.0)
    assert call("st_area", np.array([MP], dtype=object))[0] == pytest.approx(2.0)


def test_st_length_and_perimeter():
    line = "LINESTRING (0 0, 3 4, 3 10)"
    assert call("st_length", np.array([line], dtype=object))[0] == pytest.approx(11.0)
    assert call("st_perimeter", np.array([SQ], dtype=object))[0] == pytest.approx(16.0)


def test_st_is_empty():
    out = call("st_isEmpty", np.array(["POINT EMPTY", SQ, ""], dtype=object))
    assert out.tolist() == [True, False, True]


def test_st_num_geometries_and_geometry_n():
    assert call("st_numGeometries", np.array([MP, SQ], dtype=object)).tolist() == [2, 1]
    g2 = call("st_geometryN", np.array([MP], dtype=object), 2)[0]
    assert "5" in g2 and g2.startswith("POLYGON")


def test_st_exterior_ring():
    out = call("st_exteriorRing", np.array([SQ], dtype=object))[0]
    assert out.startswith("LINESTRING") and "4.0 4.0" in out


def test_st_make_line_polygon_bbox():
    line = call("st_makeLine", [0, 1, 2], [0, 1, 0])
    assert line == "LINESTRING (0.0 0.0, 1.0 1.0, 2.0 0.0)"
    poly = call("st_makePolygon", [0, 4, 4, 0], [0, 0, 4, 4])
    assert poly.startswith("POLYGON ((") and poly.count(",") == 4  # auto-closed
    bbox = call("st_makeBBOX", 0, 0, 2, 3)[0]
    assert bbox == "POLYGON ((0.0 0.0, 2.0 0.0, 2.0 3.0, 0.0 3.0, 0.0 0.0))"


def test_st_convex_hull():
    lon = np.array([0.0, 4.0, 4.0, 0.0, 2.0])  # interior point must vanish
    lat = np.array([0.0, 0.0, 4.0, 4.0, 2.0])
    hull = call("st_convexHull", lon, lat)
    assert hull.startswith("POLYGON") and "2.0 2.0" not in hull
    assert call("st_convexHull", [1.0], [2.0]) == "POINT (1.0 2.0)"


def test_convex_relations():
    a = np.array([SQ], dtype=object)
    assert call("st_intersectsPoly", a, np.array([SQ_SHIFT], dtype=object))[0]
    assert call("st_disjoint", a, np.array([SQ_FAR], dtype=object))[0]
    assert call("st_touches", a, np.array([SQ_TOUCH], dtype=object))[0]
    assert not call("st_touches", a, np.array([SQ_SHIFT], dtype=object))[0]
    assert call("st_overlaps", a, np.array([SQ_SHIFT], dtype=object))[0]
    # containment is intersecting but NOT overlapping
    assert not call("st_overlaps", a, np.array([SQ_INNER], dtype=object))[0]
    assert call("st_equals", a, np.array([SQ], dtype=object))[0]
    assert not call("st_equals", a, np.array([SQ_SHIFT], dtype=object))[0]


def test_st_crosses_line_polygon():
    crossing = np.array(["LINESTRING (-1 2, 5 2)"], dtype=object)
    inside = np.array(["LINESTRING (1 1, 2 2)"], dtype=object)
    assert call("st_crosses", crossing, np.array([SQ], dtype=object))[0]
    assert not call("st_crosses", inside, np.array([SQ], dtype=object))[0]


def test_wkb_roundtrip():
    pts = np.array(["POINT (2.5 -3.25)"], dtype=object)
    hexes = call("st_asBinary", pts)
    assert hexes[0].startswith("0101000000")
    back = call("st_geomFromWKB", hexes)
    assert back[0] == "POINT (2.5 -3.25)"


def test_point_from_text_and_antimeridian():
    out = call("st_pointFromText", np.array(["POINT (1 2)", "nope"], dtype=object))
    assert out[0] == "POINT (1.0 2.0)" and out[1] is None
    boxes = call("antimeridianSafeBBox", 170, -10, 190, 10)
    assert len(boxes) == 2 and boxes[0][2] == 180.0


def test_uuid_z3_prefix_clusters_spatially():
    from geomesa_ray.curves.z3 import Z3SFC

    ms = np.array([1704067200000, 1704067200000, 1704067200000])
    lon = np.array([2.35, 2.3501, 139.69])
    lat = np.array([48.85, 48.8501, 35.68])
    ids = call("uuidZ3", lon, lat, ms, np.array(["a", "b", "c"], dtype=object))
    bins, z3 = Z3SFC("week").index_millis(lon, lat, ms, lenient=True)
    for i in range(3):
        assert ids[i].startswith(f"{int(bins[i]) & 0xFFFF:04x}")
        assert ids[i][4:20] == f"{int(z3[i]) & 0xFFFFFFFFFFFFFFFF:016x}"
    # nearby points share a long prefix; the far one does not
    shared = len(os_common_prefix := [a == b for a, b in zip(ids[0][:20], ids[1][:20])])
    assert sum(os_common_prefix) > 14
    assert ids[0][:8] != ids[2][:8]
    # deterministic
    again = call("uuidZ3", lon, lat, ms, np.array(["a", "b", "c"], dtype=object))
    assert list(ids) == list(again)


def _dist_to_ring(ring, px, py):
    """Min distance from points to a closed ring's segments (numpy)."""
    a = ring
    b = np.roll(ring, -1, axis=0)
    ab = b - a
    ap = np.stack([px[:, None] - a[None, :, 0], py[:, None] - a[None, :, 1]], axis=2)
    denom = (ab * ab).sum(axis=1)
    t = np.clip((ap * ab[None]).sum(axis=2) / np.where(denom == 0, 1.0, denom), 0, 1)
    cx = a[None, :, 0] + t * ab[None, :, 0]
    cy = a[None, :, 1] + t * ab[None, :, 1]
    return np.sqrt((px[:, None] - cx) ** 2 + (py[:, None] - cy) ** 2).min(axis=1)


def test_st_buffer_convex_polygon_and_point():
    from geomesa_ray.geo.predicates import Polygon as _P

    buf = call("st_buffer", np.array([SQ], dtype=object), 1.0)[0]
    p = _P.from_wkt(buf)
    # offset edges contained; round (JTS-style) corners EXCLUDE the miter
    # overshoot: (-0.9,-0.9) is 1.27 from the corner -> outside, (-0.7,-0.7)
    # is 0.99 -> inside
    assert p.contains(np.array([-0.7, 2.0]), np.array([-0.7, -0.9])).all()
    assert not p.contains(np.array([-0.9]), np.array([-0.9]))[0]
    assert not p.contains(np.array([-1.5]), np.array([-1.5]))[0]
    x0, y0, x1, y1 = p.bbox()
    assert x0 == pytest.approx(-1.0) and x1 == pytest.approx(5.0)
    pt = call("st_buffer", np.array(["POINT (0 0)"], dtype=object), 2.0)[0]
    q = _P.from_wkt(pt)
    assert q.contains(np.array([1.8]), np.array([0.0]))[0]


def test_st_buffer_concave_polygon_distance_field():
    from geomesa_ray.geo.predicates import Polygon as _P
    from geomesa_ray.geo.wkt import parse_wkt

    # L-shape with a reflex vertex at (2, 2)
    lshape = "POLYGON ((0 0, 5 0, 5 2, 2 2, 2 5, 0 5, 0 0))"
    r = 0.5
    buf = call("st_buffer", np.array([lshape], dtype=object), r)[0]
    p = _P.from_wkt(buf)
    orig = _P.from_wkt(lshape)
    ring = np.asarray(parse_wkt(lshape)["coords"][0], dtype=np.float64)[:-1]

    rng = np.random.default_rng(11)
    px = rng.uniform(-1.5, 6.5, 4000)
    py = rng.uniform(-1.5, 6.5, 4000)
    d = _dist_to_ring(ring, px, py)
    inside_orig = orig.contains(px, py)
    dist = np.where(inside_orig, 0.0, d)
    got = p.contains(px, py)
    # arc discretization tolerance band: pi/16 step -> sagitta ~0.5%
    band = 0.02
    definitely_in = dist <= r - band
    definitely_out = dist >= r + band
    assert got[definitely_in].all()
    assert not got[definitely_out].any()


def test_st_buffer_beyond_clearance_minkowski_union():
    # U-shape with a 3-wide slot; r=2 exceeds the minimum clearance (the
    # slot's opposing offset walls cross), forcing the Minkowski-union
    # fallback: union of buffered convex pieces as disjoint MULTIPOLYGON.
    # Verify by membership probes against the exact distance field of the
    # U's three-rectangle decomposition (slot fully absorbed, JTS-style).
    from geomesa_ray.geo.relate import relate
    from geomesa_ray.geo.wkt import parse_wkt

    U = "POLYGON ((0 0, 7 0, 7 5, 5 5, 5 2, 2 2, 2 5, 0 5, 0 0))"
    out = call("st_buffer", np.array([U], dtype=object), 2.0)[0]
    assert out.startswith("MULTIPOLYGON")
    g = parse_wkt(out)

    def dist2(px, py):
        def d2(xl, xh, yl, yh):
            dx = max(xl - px, 0.0, px - xh)
            dy = max(yl - py, 0.0, py - yh)
            return dx * dx + dy * dy
        return min(d2(0, 2, 0, 5), d2(5, 7, 0, 5), d2(0, 7, 0, 2))

    checked = 0
    for px in np.arange(-3.5, 10.6, 0.5):
        for py in np.arange(-3.5, 8.6, 0.5):
            d2v = dist2(px, py)
            if abs(d2v - 4.0) < 0.05:  # skip the arc-sagitta band
                continue
            m = relate(parse_wkt(f"POINT ({px} {py})"), g)
            assert (m[:2] != "FF") == (d2v < 4.0), (px, py, d2v, m)
            checked += 1
    assert checked > 600


def test_st_buffer_negative_polygon_raises():
    with pytest.raises(ValueError):
        call("st_buffer", np.array([SQ], dtype=object), -1.0)


def test_st_touches_degenerate_point_inside_is_false():
    # a point geometry contributes only zero (degenerate) SAT axes; those
    # must be masked, else a point strictly INSIDE a polygon reports
    # touches=True (JTS: interiors intersect -> touches is false)
    a = np.array([SQ], dtype=object)
    assert not call("st_touches", a, np.array(["POINT (2 2)"], dtype=object))[0]
    # a point exactly ON the boundary genuinely touches
    assert call("st_touches", a, np.array(["POINT (4 2)"], dtype=object))[0]
    # and a point outside does not
    assert not call("st_touches", a, np.array(["POINT (9 9)"], dtype=object))[0]


def test_geodesic_halfwidths_contain_the_disk():
    from geomesa_ray.geo.distance import (geodesic_halfwidths, haversine_m,
                                          meters_to_degrees_at)

    # sample the geodesic circle of radius r around (lon0, lat) by bearing
    # (spherical direct formula) and assert the bbox contains every point
    for lat0, r in [(0.0, 1e5), (52.0, 8e5), (68.0, 8e5), (75.0, 1.5e6)]:
        dlon, dlat = geodesic_halfwidths(lat0, r)
        c = r / 6_371_008.8
        th = np.linspace(0, 2 * np.pi, 721)
        phi1 = np.radians(lat0)
        phi2 = np.arcsin(np.sin(phi1) * np.cos(c) + np.cos(phi1) * np.sin(c) * np.cos(th))
        dl = np.arctan2(np.sin(th) * np.sin(c) * np.cos(phi1),
                        np.cos(c) - np.sin(phi1) * np.sin(phi2))
        assert (np.abs(np.degrees(phi2) - lat0) <= float(dlat) + 1e-9).all()
        assert (np.abs(np.degrees(dl)) <= float(dlon) + 1e-9).all()
    # the planar 1%-padded estimate UNDERcovers this large/high-lat disk
    # (the bug the geodesic form fixes)
    p_dlon, _ = meters_to_degrees_at(68.0, 8e5)
    g_dlon, _ = geodesic_halfwidths(68.0, 8e5)
    assert float(g_dlon) > float(p_dlon)
    # polar disk: every longitude is inside
    dlon, _ = geodesic_halfwidths(89.0, 5e5)
    assert float(dlon) == pytest.approx(180.0)
