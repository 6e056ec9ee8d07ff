"""Z-curve ↔ cell-encoding equivalence fixtures (the north-star parity
artifacts): the same deterministic point set indexed through the Z2 curve,
the quadtree cell grid, and the S2 encoder must agree on membership,
coverings, and locality."""

import numpy as np

from geomesa_ray.cells.s2 import S2CellId
from geomesa_ray.cells.zcell import ZCellGrid
from geomesa_ray.curves.z2 import Z2SFC
from geomesa_ray.geo.distance import haversine_m

RNG = np.random.default_rng(574)
N = 5000
LON = RNG.uniform(-180, 180, N)
LAT = RNG.uniform(-90, 90, N)


class TestZCellEquivalence:
    def test_cell_membership_equals_bbox_membership(self):
        """A level-L cell's member set == brute-force bbox membership."""
        grid = ZCellGrid(7)
        cells = grid.cell_of_points(LON, LAT)
        for cell in np.unique(cells)[:50]:
            xmin, ymin, xmax, ymax = grid.cell_bounds(np.array([cell]))
            member = cells == cell
            brute = (LON >= xmin[0]) & (LON < xmax[0]) & (LAT >= ymin[0]) & (LAT < ymax[0])
            assert np.array_equal(member, brute)

    def test_z_range_scan_equals_cell_group(self):
        """Scanning the z-value range of a cell selects exactly its members —
        the key-range <-> cell duality the engine's pruning relies on."""
        grid = ZCellGrid(6)
        sfc = Z2SFC(31)
        z = sfc.index(LON, LAT)
        cells = grid.cell_of_points(LON, LAT)
        shift = np.uint64(2 * (31 - 6))
        for cell in np.unique(cells)[:50]:
            zlo = np.int64(np.uint64(cell) << shift)
            zhi = np.int64(((np.uint64(cell) + np.uint64(1)) << shift) - np.uint64(1))
            in_range = (z >= zlo) & (z <= zhi)
            assert np.array_equal(in_range, cells == cell)

    def test_covering_is_exact_upper_bound(self):
        """cover_bbox returns exactly the cells whose bounds intersect."""
        grid = ZCellGrid(8)
        cover = set(grid.cover_bbox(-30.2, 10.1, -5.7, 25.9).tolist())
        cells = grid.cell_of_points(LON, LAT)
        inside = (LON >= -30.2) & (LON <= -5.7) & (LAT >= 10.1) & (LAT <= 25.9)
        assert set(cells[inside].tolist()) <= cover


class TestS2Equivalence:
    def test_same_zcell_implies_nearby_s2(self):
        """Points co-located in a fine Z cell share a coarse S2 ancestor —
        the two hierarchies agree on locality."""
        grid = ZCellGrid(8)
        zc = grid.cell_of_points(LON, LAT)
        s2 = S2CellId.from_latlng(LAT, LON, level=3)
        order = np.argsort(zc, kind="stable")
        zs = zc[order]
        uniq, starts, counts = np.unique(zs, return_index=True, return_counts=True)
        checked = 0
        for cell, s, c in zip(uniq, starts, counts):
            if c < 2:
                continue
            rows = order[s : s + c]
            # members of one ~150km z-cell land in at most a few adjacent
            # ~1300km S2 cells (borders/corners split)
            assert len(np.unique(s2[rows])) <= 3
            checked += 1
        assert checked > 5

    def test_s2_groups_are_geographically_tight(self):
        s2 = S2CellId.from_latlng(LAT, LON, level=6)
        uniq, counts = np.unique(s2, return_counts=True)
        for cell in uniq[counts >= 3][:30]:
            rows = np.nonzero(s2 == cell)[0]
            clon, clat = LON[rows], LAT[rows]
            d = haversine_m(clon[:, None], clat[:, None], clon[None, :], clat[None, :])
            # level-6 S2 cells are ~280 km across; diagonal bound with slack
            assert d.max() < 650_000

    def test_membership_consistency_z_vs_s2(self):
        """Both encoders agree that identical coordinates map identically
        (determinism across encoders for duplicated points)."""
        dup_lon = np.concatenate([LON[:100], LON[:100]])
        dup_lat = np.concatenate([LAT[:100], LAT[:100]])
        zc = ZCellGrid(12).cell_of_points(dup_lon, dup_lat)
        s2 = S2CellId.from_latlng(dup_lat, dup_lon, level=12)
        assert np.array_equal(zc[:100], zc[100:])
        assert np.array_equal(s2[:100], s2[100:])
