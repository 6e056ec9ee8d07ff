"""DE-9IM st_relate for point/convex-polygon pairs — matrices checked
against the canonical JTS values for each configuration."""

import numpy as np
import pytest

from geomesa_ray.functions.registry import call
from geomesa_ray.geo.relate import matches

SQ = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"          # unit-ish square
SQ_SHIFT = "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"    # overlaps SQ
SQ_INNER = "POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))"        # strictly inside SQ
SQ_EDGE = "POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))"  # shares the x=10 edge
SQ_CORNER = "POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))"  # corner touch
SQ_FAR = "POLYGON ((30 30, 40 30, 40 40, 30 40, 30 30))"


def rel(a, b) -> str:
    return call("st_relate", [a], [b])[0]


class TestPolygonPolygon:
    def test_equal(self):
        assert rel(SQ, SQ) == "2FFF1FFF2"

    def test_disjoint(self):
        assert rel(SQ, SQ_FAR) == "FF2FF1212"

    def test_overlap(self):
        assert rel(SQ, SQ_SHIFT) == "212101212"

    def test_contains_properly(self):
        # A contains B with no boundary contact
        assert rel(SQ, SQ_INNER) == "212FF1FF2"
        assert rel(SQ_INNER, SQ) == "2FF1FF212"  # within, transposed

    def test_touch_edge(self):
        assert rel(SQ, SQ_EDGE) == "FF2F11212"

    def test_touch_corner(self):
        assert rel(SQ, SQ_CORNER) == "FF2F01212"

    def test_contains_with_shared_edge(self):
        # B inside A but sharing part of A's boundary (covers, not contains-properly)
        b = "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))"
        m = rel(SQ, b)
        assert m == "212F11FF2"
        assert matches(m, "T*****FF*")   # contains
        assert not matches(m, "T**FF*FF*")  # but not within-style interior-only


class TestPointCases:
    def test_point_point(self):
        assert rel("POINT (1 2)", "POINT (1 2)") == "0FFFFFFF2"
        assert rel("POINT (1 2)", "POINT (3 4)") == "FF0FFF0F2"

    def test_point_in_polygon(self):
        assert rel("POINT (5 5)", SQ) == "0FFFFF212"
        assert rel("POINT (10 5)", SQ) == "F0FFFF212"   # on boundary
        assert rel("POINT (20 20)", SQ) == "FF0FFF212"  # outside

    def test_polygon_point_transposed(self):
        assert rel(SQ, "POINT (5 5)") == "0F2FF1FF2"
        assert rel(SQ, "POINT (10 5)") == "FF20F1FF2"
        assert rel(SQ, "POINT (20 20)") == "FF2FF10F2"


class TestPatternMatch:
    def test_named_predicates_as_patterns(self):
        # the classic JTS pattern definitions, evaluated through relate
        assert call("st_relateBool", [SQ], [SQ_SHIFT], "T*T***T**")[0]  # overlaps
        assert call("st_relateBool", [SQ], [SQ_EDGE], "F***T****")[0]  # touches (edge)
        assert call("st_relateBool", [SQ], ["POINT (10 5)"], "F**T*****")[0]  # touches (boundary point)
        assert call("st_relateBool", [SQ], [SQ_INNER], "T*****FF*")[0]  # contains
        assert call("st_relateBool", [SQ_INNER], [SQ], "T*F**F***")[0]  # within
        assert call("st_relateBool", [SQ], [SQ_FAR], "FF*FF****")[0]  # disjoint
        assert not call("st_relateBool", [SQ], [SQ_SHIFT], "FF*FF****")[0]

    def test_pattern_validation(self):
        with pytest.raises(ValueError):
            matches("2FFF1FFF2", "T*")

    def test_consistency_with_named_functions(self):
        pairs = [(SQ, SQ_SHIFT), (SQ, SQ_EDGE), (SQ, SQ_INNER), (SQ, SQ_FAR),
                 (SQ, SQ_CORNER), (SQ, SQ)]
        a = [p[0] for p in pairs]
        b = [p[1] for p in pairs]
        m = call("st_relate", a, b)
        touches = call("st_touches", a, b)
        disjoint = call("st_disjoint", a, b)
        for i in range(len(pairs)):
            touch_via_matrix = (
                matches(m[i], "FT*******")
                or matches(m[i], "F**T*****")
                or matches(m[i], "F***T****")
            )
            assert touch_via_matrix == bool(touches[i])
            assert bool(disjoint[i]) == matches(m[i], "FF*FF****")

    def test_line_line_supported(self):
        # round 4: line x line no longer raises — full DE-9IM
        assert rel("LINESTRING (0 0, 1 1)", "LINESTRING (0 1, 1 0)") == "0F1FF0102"


class TestLinePolygon:
    def test_line_crosses_through(self):
        # both endpoints outside, passes through: canonical JTS matrix
        assert rel("LINESTRING (-5 5, 15 5)", SQ) == "101FF0212"

    def test_line_within(self):
        assert rel("LINESTRING (2 2, 8 8)", SQ) == "1FF0FF212"
        assert matches(rel("LINESTRING (2 2, 8 8)", SQ), "T*F**F***")  # within

    def test_line_touches_boundary_point(self):
        # endpoint lands on the boundary from outside
        m = rel("LINESTRING (10 5, 15 5)", SQ)
        assert m == "FF1F00212"  # endpoint on boundary, other outside
        assert matches(m, "F***T****")  # touches

    def test_line_along_edge(self):
        # collinear with the x=10 edge, otherwise outside
        m = rel("LINESTRING (10 2, 10 8)", SQ)
        assert m[0] == "F" and m[1] == "1"  # interior runs along boundary
        assert matches(m, "FT*******")  # touches

    def test_line_half_in(self):
        # one endpoint inside, one outside: crosses
        m = rel("LINESTRING (5 5, 15 5)", SQ)
        assert m == "1010F0212"
        assert matches(m, "T*T******")  # crosses(line, area)

    def test_polygon_line_transposed(self):
        assert rel(SQ, "LINESTRING (2 2, 8 8)") == _tr("1FF0FF212")

    def test_interior_touch_point_is_dim0(self):
        # segment grazes the corner (10,10) travelling outside
        m = rel("LINESTRING (5 15, 15 5)", SQ)
        assert m[1] == "0" and m[0] == "F"


def _tr(m: str) -> str:
    return "".join(m[j * 3 + i] for i in range(3) for j in range(3))


class TestLineLine:
    """Line x line DE-9IM (round-4: JTS relate parity for line pairs)."""

    CASES = [
        ("LINESTRING (0 0, 10 10)", "LINESTRING (0 10, 10 0)", "0F1FF0102"),  # X cross
        ("LINESTRING (0 0, 10 0)", "LINESTRING (0 0, 10 0)", "1FFF0FFF2"),    # equal
        ("LINESTRING (0 0, 5 0)", "LINESTRING (5 0, 10 5)", "FF1F00102"),     # endpoint touch
        ("LINESTRING (0 0, 10 0)", "LINESTRING (5 0, 5 5)", "F01FF0102"),     # T (B end on A int)
        ("LINESTRING (5 0, 5 5)", "LINESTRING (0 0, 10 0)", "FF10F0102"),     # T (A end on B int)
        ("LINESTRING (0 0, 10 0)", "LINESTRING (2 0, 8 0)", "101FF0FF2"),     # contains
        ("LINESTRING (2 0, 8 0)", "LINESTRING (0 0, 10 0)", "1FF0FF102"),     # within
        ("LINESTRING (0 0, 6 0)", "LINESTRING (4 0, 10 0)", "1010F0102"),     # overlap
        ("LINESTRING (0 0, 1 1)", "LINESTRING (5 5, 6 6)", "FF1FF0102"),      # disjoint
    ]

    @pytest.mark.parametrize("a,b,exp", CASES)
    def test_matrix(self, a, b, exp):
        got = call("st_relate", np.array([a], dtype=object),
                   np.array([b], dtype=object))[0]
        assert got == exp

    def test_crosses_touches_predicates(self):
        cross = call("st_relate", np.array(["LINESTRING (0 0, 10 10)"], dtype=object),
                     np.array(["LINESTRING (0 10, 10 0)"], dtype=object))[0]
        assert matches(cross, "0********")  # crosses(L, L): dim(II) == 0
        touch = call("st_relate", np.array(["LINESTRING (0 0, 5 0)"], dtype=object),
                     np.array(["LINESTRING (5 0, 10 5)"], dtype=object))[0]
        # JTS touches = FT*******, F**T***** or F***T****
        assert (matches(touch, "FT*******") or matches(touch, "F**T*****")
                or matches(touch, "F***T****"))

    def test_closed_ring_has_empty_boundary(self):
        ring = "LINESTRING (0 0, 10 0, 10 10, 0 10, 0 0)"
        m = call("st_relate", np.array([ring], dtype=object),
                 np.array(["LINESTRING (10 -5, 10 5)"], dtype=object))[0]
        # contact happens on the ring's x=10 edge: ring has NO boundary,
        # so the contact sits in I(ring) x I(other)... the other line's
        # interior passes through (10,0) which is a ring vertex (interior)
        assert m[0] == "1" or m[0] == "0"
        assert m[3] == "F" and m[4] == "F"  # empty boundary row

    def test_point_line(self):
        assert call("st_relate", np.array(["POINT (5 0)"], dtype=object),
                    np.array(["LINESTRING (0 0, 10 0)"], dtype=object))[0] == "0FFFFF102"
        assert call("st_relate", np.array(["LINESTRING (0 0, 10 0)"], dtype=object),
                    np.array(["POINT (0 0)"], dtype=object))[0] == _tr("F0FFFF102")


class TestMultiPointRelate:
    """Round 4: MultiPoint DE-9IM (puntal geometry has no boundary)."""

    CASES = [
        ("MULTIPOINT ((5 5), (15 15))", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "0F0FFF212"),
        ("MULTIPOINT ((5 5), (6 6))", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "0FFFFF212"),
        ("MULTIPOINT ((10 5), (15 15))", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "F00FFF212"),
        ("MULTIPOINT ((1 1), (2 2))", "POINT (1 1)", "0F0FFFFF2"),
        ("MULTIPOINT ((1 1))", "POINT (1 1)", "0FFFFFFF2"),
        ("MULTIPOINT ((1 1), (2 2))", "POINT (9 9)", "FF0FFF0F2"),
        ("MULTIPOINT ((5 0), (20 0))", "LINESTRING (0 0, 10 0)", "0F0FFF102"),
        ("MULTIPOINT ((0 0), (10 0))", "LINESTRING (0 0, 10 0)", "F0FFFF1F2"),
        ("MULTIPOINT ((0 0), (5 5))", "LINESTRING (0 0, 10 0)", "F00FFF102"),
        ("MULTIPOINT ((1 1), (2 2))", "MULTIPOINT ((2 2), (3 3))", "0F0FFF0F2"),
        ("MULTIPOINT ((1 1))", "MULTIPOINT ((1 1))", "0FFFFFFF2"),
        # transposed polygon case
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "MULTIPOINT ((5 5), (15 15))", "0F2FF10F2"),
    ]

    @pytest.mark.parametrize("a,b,exp", CASES)
    def test_matrix(self, a, b, exp):
        got = call("st_relate", np.array([a], dtype=object),
                   np.array([b], dtype=object))[0]
        assert got == exp

    def test_duplicate_points_dedup(self):
        got = call("st_relate", np.array(["MULTIPOINT ((1 1), (1 1))"], dtype=object),
                   np.array(["POINT (1 1)"], dtype=object))[0]
        assert got == "0FFFFFFF2"  # equals: dupes collapse, no extra point


class TestMultiLineStringRelate:
    """Round 4: MultiLineString DE-9IM under the JTS Mod2BoundaryNodeRule —
    endpoints with ODD valence across components form the boundary, so
    chains that fuse end-to-end behave like the merged line."""

    CASES = [
        # fused MLS == merged line (shared endpoint valence 2 -> interior)
        ("MULTILINESTRING ((0 0, 5 0), (5 0, 10 0))", "LINESTRING (0 0, 10 0)", "1FFF0FFF2"),
        # two components: one crosses the line, one is far away
        ("MULTILINESTRING ((0 0, 10 10), (20 0, 30 0))", "LINESTRING (0 10, 10 0)", "0F1FF0102"),
        # a component endpoint touches the other line's endpoint
        ("MULTILINESTRING ((0 0, 5 0), (7 3, 9 9))", "LINESTRING (5 0, 5 -5)", "FF1F00102"),
        # MLS x polygon: one component within, one outside
        ("MULTILINESTRING ((2 2, 8 8), (20 20, 30 30))",
         "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", "1F10F0212"),
        # fused junction point is INTERIOR of the MLS
        ("POINT (5 0)", "MULTILINESTRING ((0 0, 5 0), (5 0, 10 0))", "0FFFFF102"),
        # three chains meeting at one point: valence 3 -> boundary node
        ("POINT (0 0)",
         "MULTILINESTRING ((0 0, 1 0), (0 0, 0 1), (0 0, -1 0))", "F0FFFF102"),
    ]

    @pytest.mark.parametrize("a,b,exp", CASES)
    def test_matrix(self, a, b, exp):
        got = call("st_relate", np.array([a], dtype=object),
                   np.array([b], dtype=object))[0]
        assert got == exp


class TestMultiPolygonRelate:
    """Round 4: MultiPolygon DE-9IM (interior-disjoint convex components)."""

    MP = ("MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), "
          "((20 0, 30 0, 30 10, 20 10, 20 0)))")

    CASES = [
        (MP, "POINT (5 5)", "0F2FF1FF2"),            # in component 1
        (MP, "POINT (15 5)", "FF2FF10F2"),           # in the gap
        (MP, "POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))", "212FF1FF2"),    # contains
        (MP, "POLYGON ((8 2, 22 2, 22 8, 8 8, 8 2))", "212101212"),  # spans gap
        (MP, "POLYGON ((12 2, 18 2, 18 8, 12 8, 12 2))", "FF2FF1212"),  # disjoint
        (MP, MP, "2FFF1FFF2"),                       # equals
        ("LINESTRING (-5 5, 35 5)", MP, "101FF0212"),  # crosses both comps
        ("LINESTRING (2 5, 8 5)", MP, "1FF0FF212"),    # within one comp
        ("LINESTRING (12 5, 18 5)", MP, "FF1FF0212"),  # wholly in the gap
        ("MULTIPOINT ((5 5), (25 5))", MP, "0FFFFF212"),  # one pt per comp
    ]

    @pytest.mark.parametrize("a,b,exp", CASES)
    def test_matrix(self, a, b, exp):
        got = call("st_relate", np.array([a], dtype=object),
                   np.array([b], dtype=object))[0]
        assert got == exp

    def test_gap_line_exterior_entry(self):
        # a line crossing ONE comp but ending in the gap: IE covers the
        # union-of-intervals logic (per-component outside flags would lie)
        got = call("st_relate", np.array(["LINESTRING (5 5, 15 5)"], dtype=object),
                   np.array([self.MP], dtype=object))[0]
        assert got == "1010F0212"  # crosses out of comp 1; end in exterior


def _rel(a: str, b: str) -> str:
    from geomesa_ray.geo.relate import relate
    from geomesa_ray.geo.wkt import parse_wkt

    return relate(parse_wkt(a), parse_wkt(b))


class TestRelateConcave:
    """Round 4 (late): concave shells relate via (boundary rings, ear-clip
    cover) — interior probes over original-vertex triangles stay exact
    while seam edges never read as boundary."""

    # V-notched square: notch dips to (5, 2) from the top edge
    V = "POLYGON ((0 0, 10 0, 10 10, 5 2, 0 10, 0 0))"
    # L-shape: bottom arm [0,4]x[0,1] + vertical arm [0,1]x[0,4]
    L = "POLYGON ((0 0, 4 0, 4 1, 1 1, 1 4, 0 4, 0 0))"

    def test_point_roles(self):
        assert _rel(self.V, "POINT (1 1)") == "0F2FF1FF2"   # transpose
        assert _rel("POINT (1 1)", self.V) == "0FFFFF212"   # interior
        assert _rel("POINT (5 2)", self.V) == "F0FFFF212"   # reflex vertex
        assert _rel("POINT (5 5)", self.V) == "FF0FFF212"   # inside notch
        assert _rel("POINT (5 0)", self.V) == "F0FFFF212"   # on bottom edge
        # L-shape: (2, 2) is OUTSIDE the L (above the bottom arm)
        assert _rel("POINT (2 2)", self.L) == "FF0FFF212"
        assert _rel("POINT (2 0.5)", self.L) == "0FFFFF212"

    def test_line_vs_concave(self):
        # horizontal line straight through the notch: enters left lobe,
        # exits into the notch (exterior), re-enters right lobe; both
        # endpoints sit in the exterior
        got = _rel("LINESTRING (-1 5, 11 5)", self.V)
        assert got == "101FF0212"
        # segment fully inside the left lobe
        assert _rel("LINESTRING (1 1, 2 1)", self.V) == "1FF0FF212"
        # segment running along the bottom edge only
        assert _rel("LINESTRING (2 0, 8 0)", self.V) == "F1FF0F212"
        # segment lying on the notch edge (10 10)-(5 2): boundary run
        assert _rel("LINESTRING (10 10, 5 2)", self.V)[1] == "1"

    def test_concave_x_convex_polygon(self):
        # square sitting inside the notch: touches nothing interior
        notch_sq = "POLYGON ((4 6, 6 6, 6 8, 4 8, 4 6))"
        assert _rel(self.V, notch_sq) == "FF2FF1212"  # disjoint
        # square overlapping the left lobe
        over = "POLYGON ((-1 0, 2 0, 2 2, -1 2, -1 0))"
        got = _rel(self.V, over)
        assert got[0] == "2" and got[2] == "2" and got[6] == "2"
        # V contains a small square deep in the left lobe
        small = "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"
        assert _rel(self.V, small) == "212FF1FF2"  # JTS contains (B inside A)
        assert _rel(small, self.V) == "2FF1FF212"  # within

    def test_concave_x_concave(self):
        # two interlocking Ls that overlap in the unit square [0,1]^2
        l2 = "POLYGON ((0 0, 1 0, 1 4, 4 4, 4 5, 0 5, 0 0))"
        got = _rel(self.L, l2)
        assert got[0] == "2"          # interiors overlap
        assert got[2] == "2" and got[6] == "2"  # neither contains the other
        # identical concave polygons -> JTS equals matrix
        assert _rel(self.V, self.V) == "2FFF1FFF2"
        assert _rel(self.L, self.L) == "2FFF1FFF2"

    def test_disjoint_touch_cases(self):
        # triangle inside the notch wedge (|x-5| <= 5/8*(y-2)), touching V
        # only at the reflex vertex (5, 2)
        touch = "POLYGON ((5 2, 6 4, 4 4, 5 2))"
        got = _rel(self.V, touch)
        assert got[0] == "F" and got[4] == "0"


class TestRelateHoled:
    """Holed polygons relate against points via exact even-odd parity."""

    H = ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
         "(4 4, 6 4, 6 6, 4 6, 4 4))")

    def test_point_roles(self):
        assert _rel("POINT (1 1)", self.H) == "0FFFFF212"   # in the ring
        assert _rel("POINT (5 5)", self.H) == "FF0FFF212"   # inside hole
        assert _rel("POINT (4 5)", self.H) == "F0FFFF212"   # on hole ring
        assert _rel("POINT (0 5)", self.H) == "F0FFFF212"   # on shell
        assert _rel("POINT (-1 5)", self.H) == "FF0FFF212"  # outside
        assert _rel(self.H, "POINT (5 5)") == "FF2FF10F2"  # transpose

    def test_multipoint_mixed(self):
        got = _rel("MULTIPOINT (1 1, 5 5, 4 5)", self.H)
        assert got == "000FFF212"  # interior + exterior(hole) + boundary

    def test_line_vs_holed(self):
        """Round 4 (late): line/polygon operands vs holed polygons relate
        via the hole-subtracted convex cover (boundary tests stay on the
        ORIGINAL ring edges, so constructed seam vertices never classify
        as boundary)."""
        # spans the ring solid and the hole; endpoints ON the shell
        assert _rel("LINESTRING (0 5, 10 5)", self.H) == "101F0F212"
        # solid part of the ring contains a small square
        assert _rel(self.H, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))") == "212FF1FF2"
        # line entirely inside the hole is DISJOINT from the polygon
        assert _rel(self.H, "LINESTRING (4.5 5, 5.5 5)") == "FF2FF1102"
        # line along a hole edge touches (dim-1 boundary run, no interior)
        assert _rel(self.H, "LINESTRING (4 4, 6 4)") == "FF2101FF2"
        # polygon EQUAL to the hole: boundaries coincide, interiors disjoint
        hole = "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))"
        assert _rel(self.H, hole) == "FF2F112F2"
        # polygon strictly inside the hole is disjoint
        assert _rel(self.H, "POLYGON ((4.5 4.5, 5.5 4.5, 5.5 5.5, 4.5 5.5, 4.5 4.5))") == "FF2FF1212"
        # holed polygon equals itself
        assert _rel(self.H, self.H) == "2FFF1FFF2"
        # polygon overlapping shell, solid ring and hole at once
        got = _rel(self.H, "POLYGON ((5 -2, 12 -2, 12 5, 5 5, 5 -2))")
        assert got == "212101212"
