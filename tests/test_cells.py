"""Cell-grid + S2 tests: Z-curve ↔ cell equivalence fixtures and hierarchy
invariants (reference style: geomesa-z3 S2SFCTest.scala, Z2Test.scala)."""

import numpy as np

from geomesa_ray.cells import S2CellId, ZCellGrid, shard_of
from geomesa_ray.cells.s2 import MAX_LEVEL
from geomesa_ray.curves.z2 import Z2SFC


class TestZCellGrid:
    def test_cell_is_z_prefix(self):
        # Z ↔ cell equivalence: a cell id IS the z-value prefix
        grid = ZCellGrid(10)
        z2 = Z2SFC(31)
        rng = np.random.default_rng(5)
        lon = rng.uniform(-180, 180, 1000)
        lat = rng.uniform(-90, 90, 1000)
        z = z2.index(lon, lat).astype(np.uint64)
        cells = grid.cell_of_points(lon, lat)
        assert np.array_equal(cells, (z >> np.uint64(2 * 21)).astype(np.int64))

    def test_bounds_contain_point(self):
        grid = ZCellGrid(12)
        rng = np.random.default_rng(6)
        lon = rng.uniform(-180, 180, 500)
        lat = rng.uniform(-90, 90, 500)
        cells = grid.cell_of_points(lon, lat)
        xmin, ymin, xmax, ymax = grid.cell_bounds(cells)
        assert np.all((lon >= xmin - 1e-9) & (lon <= xmax + 1e-9))
        assert np.all((lat >= ymin - 1e-9) & (lat <= ymax + 1e-9))

    def test_cover_bbox_exact(self):
        grid = ZCellGrid(8)
        cover = set(grid.cover_bbox(-10, -10, 10, 10).tolist())
        # every random point inside the bbox must land in a covered cell
        rng = np.random.default_rng(7)
        lon = rng.uniform(-10, 10, 2000)
        lat = rng.uniform(-10, 10, 2000)
        cells = grid.cell_of_points(lon, lat)
        assert set(cells.tolist()) <= cover
        # no cell entirely outside the bbox
        xmin, ymin, xmax, ymax = grid.cell_bounds(np.array(sorted(cover)))
        assert np.all((xmax >= -10) & (xmin <= 10) & (ymax >= -10) & (ymin <= 10))

    def test_cover_bbox_auto_caps(self):
        grid = ZCellGrid(14)
        cells, level = grid.cover_bbox_auto(-170, -80, 170, 80, max_cells=1000)
        assert len(cells) <= 1000 and level < 14

    def test_neighbors_ring(self):
        grid = ZCellGrid(10)
        c = grid.cell_of_points(np.array([0.1]), np.array([0.1]))
        n1 = grid.neighbors(c, ring=1)
        assert len(n1) == 9
        # neighbors share an edge/corner: centers within ~1.5 cell diagonals
        cx, cy = grid.cell_center(n1)
        px, py = grid.cell_center(c)
        assert np.all(np.abs(cx - px[0]) <= 1.5 * grid.cell_width)
        assert np.all(np.abs(cy - py[0]) <= 1.5 * grid.cell_height)

    def test_lon_wrap(self):
        grid = ZCellGrid(6)
        c = grid.cell_of_points(np.array([179.9]), np.array([0.0]))
        n = grid.neighbors(c, ring=1)
        # must include a cell on the -180 side
        xmin, _, _, _ = grid.cell_bounds(n)
        assert (xmin < -179).any()

    def test_parent(self):
        grid = ZCellGrid(12)
        c = grid.cell_of_points(np.array([5.0]), np.array([5.0]))
        p = grid.parent(c, 6)
        p_direct = ZCellGrid(6).cell_of_points(np.array([5.0]), np.array([5.0]))
        assert p[0] == p_direct[0]


class TestS2:
    def test_roundtrip_center(self):
        rng = np.random.default_rng(8)
        lat = rng.uniform(-89, 89, 2000)
        lng = rng.uniform(-179.9, 179.9, 2000)
        cid = S2CellId.from_latlng(lat, lng)  # leaf
        clat, clng = S2CellId.to_latlng(cid)
        # leaf cells are ~1cm; decode must land essentially on the point
        assert np.max(np.abs(clat - lat)) < 1e-5
        dlng = np.abs(clng - lng)
        assert np.max(np.minimum(dlng, 360 - dlng)) < 1e-5

    def test_level_structure(self):
        lat = np.array([48.85])
        lng = np.array([2.35])
        leaf = S2CellId.from_latlng(lat, lng)
        assert S2CellId.level(leaf)[0] == MAX_LEVEL
        for lvl in (0, 5, 12, 20, 29):
            p = S2CellId.parent(leaf, lvl)
            assert S2CellId.level(p)[0] == lvl
            assert S2CellId.contains(p, leaf)[0]

    def test_parent_nesting(self):
        rng = np.random.default_rng(9)
        lat = rng.uniform(-89, 89, 500)
        lng = rng.uniform(-180, 180, 500)
        leaf = S2CellId.from_latlng(lat, lng)
        p10 = S2CellId.parent(leaf, 10)
        p5 = S2CellId.parent(leaf, 5)
        # parent at 5 of the level-10 parent == parent at 5 of the leaf
        assert np.array_equal(S2CellId.parent(p10, 5), p5)
        # siblings at same level share their level-5 ancestor iff nearby
        assert np.all(S2CellId.contains(p5, p10))

    def test_locality(self):
        # two points 0.001 deg apart share a fine-level parent
        a = S2CellId.from_latlng(np.array([10.0]), np.array([10.0]))
        b = S2CellId.from_latlng(np.array([10.0001]), np.array([10.0001]))
        assert S2CellId.parent(a, 12)[0] == S2CellId.parent(b, 12)[0]
        # antipodal points do not share even level 0
        c = S2CellId.from_latlng(np.array([-10.0]), np.array([-170.0]))
        assert S2CellId.parent(a, 0)[0] != S2CellId.parent(c, 0)[0]

    def test_face_centers(self):
        # known face centers: (0,0) is on face 0, (0,90)->face 1, north pole->face 2
        f0 = S2CellId.from_latlng(np.array([0.0]), np.array([0.0]))
        f1 = S2CellId.from_latlng(np.array([0.0]), np.array([90.0]))
        f2 = S2CellId.from_latlng(np.array([90.0]), np.array([0.0]))
        f3 = S2CellId.from_latlng(np.array([0.0]), np.array([180.0]))
        f5 = S2CellId.from_latlng(np.array([-90.0]), np.array([0.0]))
        faces = [int(np.asarray(c).astype(np.uint64)[0]) >> 61 for c in (f0, f1, f2, f3, f5)]
        assert faces == [0, 1, 2, 3, 5]

    def test_valid_ids(self):
        # valid cell ids are odd multiples of their lsb; leaf ids are odd
        rng = np.random.default_rng(10)
        leaf = S2CellId.from_latlng(rng.uniform(-80, 80, 100), rng.uniform(-180, 180, 100))
        assert np.all(leaf.astype(np.int64) & 1 == 1)


class TestShard:
    def test_deterministic_and_balanced(self):
        ids = np.arange(100_000, dtype=np.int64)
        s1 = shard_of(ids, 8)
        s2 = shard_of(ids, 8)
        assert np.array_equal(s1, s2)
        counts = np.bincount(s1, minlength=8)
        assert counts.min() > 100_000 / 8 * 0.9

    def test_string_ids(self):
        ids = np.array([f"doc-{i}" for i in range(10_000)], dtype=object)
        s = shard_of(ids, 4)
        counts = np.bincount(s, minlength=4)
        assert counts.min() > 10_000 / 4 * 0.85
        assert shard_of(np.array(["doc-1"], dtype=object), 4)[0] == s[1]
