"""Exact convex-polygon predicates + scale-shape grep gates."""

import numpy as np

from geomesa_ray.geo.poly import convex_intersect, points_in_convex


def _tri(*pts):
    return np.asarray([pts], dtype=np.float64)


class TestConvexIntersect:
    def test_overlapping(self):
        a = _tri((0, 0), (2, 0), (1, 2))
        b = _tri((1, 1), (3, 1), (2, 3))
        assert convex_intersect(a, b)[0]

    def test_disjoint(self):
        a = _tri((0, 0), (2, 0), (1, 2))
        b = _tri((5, 5), (7, 5), (6, 7))
        assert not convex_intersect(a, b)[0]

    def test_touching_counts_as_intersecting(self):
        # shared vertex (2,0) — JTS intersects() semantics
        a = _tri((0, 0), (2, 0), (1, 2))
        b = _tri((2, 0), (4, 0), (3, 2))
        assert convex_intersect(a, b)[0]

    def test_containment_no_edge_crossing(self):
        a = _tri((0, 0), (10, 0), (5, 10))
        b = _tri((4, 2), (6, 2), (5, 4))  # fully inside a
        assert convex_intersect(a, b)[0]
        assert convex_intersect(b, a)[0]

    def test_bbox_overlap_but_disjoint(self):
        # bboxes overlap, triangles do not (the case bbox joins get wrong)
        a = _tri((0, 0), (4, 0), (0, 4))
        b = _tri((4, 4), (4, 2.5), (2.5, 4))
        assert not convex_intersect(a, b)[0]

    def test_quad_vs_triangle(self):
        q = np.asarray([[(0, 0), (2, 0), (2, 2), (0, 2)]], dtype=np.float64)
        t = _tri((1, 1), (3, 1), (2, 3))
        assert convex_intersect(q, t)[0]

    def test_vectorized_batch(self):
        rng = np.random.default_rng(7)
        base = rng.uniform(-10, 10, (200, 2))
        A = np.stack([base, base + [1.0, 0.0], base + [0.5, 1.0]], axis=1)
        shift = rng.uniform(-3, 3, (200, 2))
        B = A + shift[:, None, :]
        got = convex_intersect(A, B)
        # oracle: brute-force per-pair via matplotlib-free SAT in Python
        for i in range(0, 200, 17):
            assert got[i] == convex_intersect(A[i:i + 1], B[i:i + 1])[0]

    def test_points_in_convex(self):
        p = np.asarray([[(0, 0), (4, 0), (4, 4), (0, 4)]] * 3, dtype=np.float64)
        px = np.array([2.0, 4.0, 5.0])
        py = np.array([2.0, 4.0, 5.0])
        inside = points_in_convex(p, px, py)
        assert inside.tolist() == [True, True, False]


class TestScaleShapeGates:
    """Source-level gates for the round-1 scale regressions: no driver-side
    materialization in the minhash path, no per-row Python lookups in hot
    broadcast joins."""

    def test_minhash_path_has_no_driver_materialization(self):
        import inspect

        from geomesa_ray.stages import dedup

        src = inspect.getsource(dedup.minhash_clusters) + inspect.getsource(dedup.minhash_dedup)
        assert "to_pandas" not in src
        assert "to_pylist" not in src

    def test_hot_pipelines_have_no_per_row_pylist_lookups(self):
        from pathlib import Path

        src = Path(__file__).resolve().parents[1] / "geomesa_ray" / "pipelines" / "queries.py"
        text = src.read_text()
        # to_pylist is allowed only outside per-batch hot loops; the broadcast
        # lookup classes must use SortedLookup/searchsorted
        assert "self.seg.probe" in text or "SortedLookup" in text
        for needle in ("self.seg.get(", "self.brands.get("):
            assert needle not in text


class TestAntimeridian:
    def test_split_conventions(self):
        from geomesa_ray.geo.antimeridian import split_bbox

        assert split_bbox(150, -30, 210, 30) == [(150, -30, 180.0, 30), (-180.0, -30, -150.0, 30)]
        assert split_bbox(170, -10, -170, 10) == [(170, -10, 180.0, 10), (-180.0, -10, -170, 10)]
        assert split_bbox(-190, -10, -170, 10) == [(170.0, -10, 180.0, 10), (-180.0, -10, -170, 10)]
        assert split_bbox(-10, -10, 10, 10) == [(-10, -10, 10, 10)]

    def test_queryspec_splits_crossing_box(self):
        from geomesa_ray.pipelines.query import QuerySpec

        spec = QuerySpec(geometries=["POLYGON ((150 -30, 210 -30, 210 30, 150 30, 150 -30))"])
        boxes = spec.bboxes()
        assert len(boxes) == 2
        assert boxes[0][2] == 180.0 and boxes[1][0] == -180.0

    def test_plan_cells_covers_both_sides(self):
        import numpy as np

        from geomesa_ray.cells.zcell import ZCellGrid
        from geomesa_ray.pipelines.query import QuerySpec, plan_cells

        spec = QuerySpec(geometries=["POLYGON ((170 -10, 190 -10, 190 10, 170 10, 170 -10))"])
        cells = plan_cells(spec, level=6)
        assert cells is not None
        grid = ZCellGrid(6)
        east = grid.cell_of_points(np.array([175.0]), np.array([0.0]))[0]
        west = grid.cell_of_points(np.array([-175.0]), np.array([0.0]))[0]
        assert east in cells and west in cells
