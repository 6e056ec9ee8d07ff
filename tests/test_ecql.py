"""ECQL front-end: parse, vectorized evaluation, pushdown extraction."""

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.pipelines.ecql import compile_ecql, query_spec_from_ecql

T = pa.table({
    "event_type": ["purchase", "view", "error", "purchase", None],
    "value": [120.0, 10.0, 55.0, 80.0, 200.0],
    "user_id": [1, 2, 3, 4, 5],
    "name": ["alpha", "beta", "alice", "bob", "axolotl"],
    "lon": [10.0, 100.0, -170.0, 175.0, 0.0],
    "lat": [10.0, 40.0, 5.0, -5.0, 0.0],
    "ts": pa.array([1704067200000, 1704672000000, 1705276800000,
                    1705881600000, 1706486400000], type=pa.int64()),  # epoch ms
})


def m(expr):
    return compile_ecql(expr).mask(T).tolist()


class TestComparisons:
    def test_eq_and_numeric(self):
        assert m("event_type = 'purchase'") == [True, False, False, True, False]
        assert m("value > 100") == [True, False, False, False, True]
        assert m("value <= 55") == [False, True, True, False, False]
        assert m("user_id <> 3") == [True, True, False, True, True]

    def test_between_in_like_null(self):
        assert m("value BETWEEN 50 AND 150") == [True, False, True, True, False]
        assert m("event_type IN ('view', 'error')") == [False, True, True, False, False]
        assert m("name LIKE 'a%'") == [True, False, True, False, True]
        assert m("name LIKE 'a_o%'") == [False, False, False, False, True]
        assert m("event_type IS NULL") == [False, False, False, False, True]
        assert m("event_type IS NOT NULL") == [True, True, True, True, False]

    def test_logic(self):
        assert m("value > 50 AND value < 150") == [True, False, True, True, False]
        assert m("user_id = 1 OR user_id = 5") == [True, False, False, False, True]
        assert m("NOT (value > 50)") == [False, True, False, False, False]
        assert m("INCLUDE") == [True] * 5
        assert m("EXCLUDE") == [False] * 5


class TestSpatialTemporal:
    def test_bbox(self):
        assert m("BBOX(geom, -20, -20, 20, 20)") == [True, False, False, False, True]

    def test_bbox_antimeridian(self):
        # translated crossing box picks up both +175 and -170 points
        assert m("BBOX(geom, 160, -10, 200, 10)") == [False, False, True, True, False]

    def test_intersects_polygon(self):
        assert m("INTERSECTS(geom, POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5)))") == \
            [True, False, False, False, False]

    def test_dwithin(self):
        got = m("DWITHIN(geom, POINT (10.1 10.1), 50, kilometers)")
        assert got == [True, False, False, False, False]

    def test_during_after_before(self):
        assert m("ts DURING 2024-01-05T00:00:00Z/2024-01-20T00:00:00Z") == \
            [False, True, True, False, False]
        assert m("ts AFTER 2024-01-20T00:00:00Z") == [False, False, False, True, True]
        assert m("ts BEFORE 2024-01-05T00:00:00Z") == [True, False, False, False, False]

    def test_ge_le_datetime_inclusive_at_boundary(self):
        # row 1's ts is exactly 2024-01-08T00:00:00Z: GeoTools ECQL >=/<= are
        # INCLUSIVE, so the boundary instant must be kept on both sides
        assert m("ts >= 2024-01-08T00:00:00Z") == [False, True, True, True, True]
        assert m("ts <= 2024-01-08T00:00:00Z") == [True, True, False, False, False]
        # strict operators still exclude the boundary
        assert m("ts > 2024-01-08T00:00:00Z") == [False, False, True, True, True]
        assert m("ts < 2024-01-08T00:00:00Z") == [True, False, False, False, False]

    def test_like_null_is_false(self):
        # null must never match (astype(str) would stringify it to 'None')
        assert m("event_type LIKE '%o%'") == [False, False, True, False, False]
        assert m("event_type LIKE '%None%'") == [False, False, False, False, False]


class TestRelate:
    # rows: (10,10) inside, (100,40) outside, (-170,5) outside, (175,-5)
    # outside, (0,0) ON the boundary of the 0..20 square
    SQ = "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))"

    def test_within_pattern(self):
        # T*F**F*** (within): interior only — boundary point excluded
        assert m(f"RELATE(geom, {self.SQ}, 'T*F**F***')") == [True, False, False, False, False]

    def test_touch_pattern(self):
        # FT******* (touches: the POINT's interior meets the polygon's
        # boundary — a point has no boundary of its own, so BI is always F)
        assert m(f"RELATE(geom, {self.SQ}, 'FT*******')") == [False, False, False, False, True]

    def test_disjoint_pattern(self):
        assert m(f"RELATE(geom, {self.SQ}, 'FF*FF****')") == [False, True, True, True, False]

    def test_intersects_star(self):
        # 'T********' OR boundary: inside-or-on via two patterns
        got_in = m(f"RELATE(geom, {self.SQ}, 'T********')")
        got_b = m(f"RELATE(geom, {self.SQ}, 'FT*******')")
        assert [a or b for a, b in zip(got_in, got_b)] == [True, False, False, False, True]

    def test_pushdown_only_when_interior_bound(self):
        f = compile_ecql(f"RELATE(geom, {self.SQ}, 'T*F**F***')")
        assert f.extract_geometries() == [(0.0, 0.0, 20.0, 20.0)]
        f2 = compile_ecql(f"RELATE(geom, {self.SQ}, 'FF*FF****')")
        assert f2.extract_geometries() == []  # disjoint rows are unbounded

    def test_unquoted_pattern_rejected(self):
        with pytest.raises(ValueError):
            compile_ecql(f"RELATE(geom, {self.SQ}, 42)")


class TestPushdownExtraction:
    def test_conjunct_bbox_and_interval_extracted(self):
        spec, f = query_spec_from_ecql(
            "event_type = 'purchase' AND BBOX(geom, -10, -10, 10, 10) "
            "AND ts DURING 2024-01-01T00:00:00Z/2024-02-01T00:00:00Z")
        assert len(spec.geometries) == 1
        assert spec.intervals == [(1704067200000, 1706745600000)]

    def test_or_spatial_not_extracted_when_mixed(self):
        spec, _ = query_spec_from_ecql("value > 5 OR BBOX(geom, 0, 0, 1, 1)")
        assert spec.geometries == []

    def test_or_spatial_extracted_when_all_spatial(self):
        spec, _ = query_spec_from_ecql(
            "BBOX(geom, 0, 0, 1, 1) OR BBOX(geom, 5, 5, 6, 6)")
        assert len(spec.geometries) == 2

    def test_crossing_bbox_splits(self):
        spec, _ = query_spec_from_ecql("BBOX(geom, 170, -10, 190, 10)")
        assert len(spec.geometries) == 2

    def test_parse_errors(self):
        with pytest.raises(ValueError):
            compile_ecql("value >")
        with pytest.raises(ValueError):
            compile_ecql("BBOX(geom, 1, 2)")


class TestIndexedEcql:
    def test_ecql_over_indexed_layout(self, ray_session, tmp_path):
        import pyarrow.parquet as pq_

        from geomesa_ray.cells.zcell import ZCellGrid
        from geomesa_ray.pipelines.query import query_indexed_ecql

        rng = np.random.default_rng(5)
        lon = rng.uniform(-180, 180, 2000)
        lat = rng.uniform(-90, 90, 2000)
        val = rng.uniform(0, 100, 2000)
        cells = ZCellGrid(12).cell_of_points(lon, lat)
        t = pa.table({"fid": pa.array(np.arange(2000)), "lon": pa.array(lon),
                      "lat": pa.array(lat), "value": pa.array(val),
                      "cell_id": pa.array(cells)})
        pq_.write_table(t, tmp_path / "part.parquet")

        got = query_indexed_ecql(
            str(tmp_path), "BBOX(geom, -30, -20, 30, 20) AND value > 50",
            level=12, columns=["fid"],
        ).to_pandas()
        exp_mask = (lon >= -30) & (lon <= 30) & (lat >= -20) & (lat <= 20) & (val > 50)
        assert sorted(got["fid"].tolist()) == sorted(np.arange(2000)[exp_mask].tolist())


class TestRound3Operators:
    def test_ilike(self):
        assert m("event_type ILIKE 'PUR%'") == [True, False, False, True, False]
        assert m("event_type LIKE 'PUR%'") == [False, False, False, False, False]
        # null stays false under ILIKE too
        assert m("event_type ILIKE '%'") == [True, True, True, True, False]

    def test_beyond_is_not_dwithin(self):
        near = m("DWITHIN(geom, POINT (10 10), 100, kilometers)")
        far = m("BEYOND(geom, POINT (10 10), 100, kilometers)")
        assert all(a != b for a, b in zip(near, far))
        assert near[0] is True  # (10, 10) itself

    def test_beyond_no_pushdown(self):
        f = compile_ecql("BEYOND(geom, POINT (10 10), 100, kilometers)")
        assert f.extract_geometries() == []

    def test_disjoint(self):
        expr = "DISJOINT(geom, POLYGON ((-20 -20, 20 -20, 20 20, -20 20, -20 -20)))"
        assert m(expr) == [False, True, True, True, False]
        assert compile_ecql(expr).extract_geometries() == []

    def test_touches_boundary_only(self):
        # (10, 10): lat 10 is ON the top edge y=10 of this box
        expr = "TOUCHES(geom, POLYGON ((-20 -20, 20 -20, 20 10, -20 10, -20 -20)))"
        out = m(expr)
        assert out[0] is True    # on boundary
        assert out[4] is False   # strictly inside
        assert out[1] is False   # outside

    def test_crosses_overlaps_false(self):
        expr = "CROSSES(geom, POLYGON ((-20 -20, 20 -20, 20 20, -20 20, -20 -20)))"
        assert m(expr) == [False] * 5
        expr = "OVERLAPS(geom, POLYGON ((-20 -20, 20 -20, 20 20, -20 20, -20 -20)))"
        assert m(expr) == [False] * 5

    def test_equals_point(self):
        assert m("EQUALS(geom, POINT (10 10))") == [True, False, False, False, False]
        assert compile_ecql("EQUALS(geom, POINT (10 10))").extract_geometries() == \
            [(10.0, 10.0, 10.0, 10.0)]
        assert m("EQUALS(geom, POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))") == [False] * 5
