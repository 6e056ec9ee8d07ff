"""Z-prefix quadtree cells: the engine's primary cell grid.

A Z2 value truncated to its top ``2*level`` bits identifies a quadtree cell
at ``level`` — the same key space GeoMesa range-scans (Z2IndexKeySpace,
reference geomesa-index-api/.../index/z2/Z2IndexKeySpace.scala:42-70), viewed
as discrete cells instead of byte ranges. This grid is what the partitioned
spatial join and tile assignment shuffle on: exact, closed-form coverings
(no false negatives), cheap parent/child moves, and Z-curve ↔ cell
equivalence by construction.

cell_id encoding: ``(z >> 2*(31-level))`` — the level is pipeline config,
carried alongside, not packed into the id.
"""

from __future__ import annotations

import numpy as np

from geomesa_ray.curves.z2 import Z2SFC, split2, combine2


class ZCellGrid:
    """Fixed-resolution quadtree cell grid over lon/lat."""

    def __init__(self, level: int = 12):
        if not (0 <= level <= 31):
            raise ValueError("level must be in [0, 31]")
        self.level = int(level)
        self.sfc = Z2SFC(31)
        self._shift = np.uint64(2 * (31 - self.level))
        self.n_side = 1 << self.level  # cells per axis
        self.cell_width = 360.0 / self.n_side
        self.cell_height = 180.0 / self.n_side

    # ------------------------------------------------------------- assignment
    def cell_of_points(self, lon, lat, lenient: bool = True) -> np.ndarray:
        """Vectorized lon/lat -> int64 cell id at this grid's level."""
        z = self.sfc.index(lon, lat, lenient=lenient).astype(np.uint64)
        return (z >> self._shift).astype(np.int64)

    def cell_of_z(self, z) -> np.ndarray:
        return (np.asarray(z).astype(np.uint64) >> self._shift).astype(np.int64)

    # --------------------------------------------------------------- geometry
    def cell_xy(self, cell_id) -> tuple[np.ndarray, np.ndarray]:
        """cell id -> integer grid coords (cx, cy) in [0, 2^level)."""
        c = np.asarray(cell_id).astype(np.uint64)
        return combine2(c).astype(np.int64), combine2(c >> np.uint64(1)).astype(np.int64)

    def cell_from_xy(self, cx, cy) -> np.ndarray:
        cx = np.asarray(cx, dtype=np.uint64)
        cy = np.asarray(cy, dtype=np.uint64)
        return (split2(cx) | (split2(cy) << np.uint64(1))).astype(np.int64)

    def cell_bounds(self, cell_id):
        """cell id -> (xmin, ymin, xmax, ymax) arrays in lon/lat space."""
        cx, cy = self.cell_xy(cell_id)
        xmin = -180.0 + cx * self.cell_width
        ymin = -90.0 + cy * self.cell_height
        return xmin, ymin, xmin + self.cell_width, ymin + self.cell_height

    def cell_center(self, cell_id):
        xmin, ymin, xmax, ymax = self.cell_bounds(cell_id)
        return (xmin + xmax) / 2.0, (ymin + ymax) / 2.0

    # --------------------------------------------------------------- covering
    def cover_bbox(self, xmin, ymin, xmax, ymax, max_cells: int | None = None) -> np.ndarray:
        """Exact covering: every level-`level` cell intersecting the bbox.

        Closed-form (no recursion): grid coords of the corner cells span a
        rectangle of cells. Raises if the covering would exceed ``max_cells``
        (callers should then drop to a coarser level — the analog of
        GeoMesa's geomesa.scan.ranges.target cap, QueryProperties.scala:22).
        """
        xmin = max(float(xmin), -180.0)
        ymin = max(float(ymin), -90.0)
        xmax = min(float(xmax), 180.0)
        ymax = min(float(ymax), 90.0)
        # corner cells MUST come from the same normalize arithmetic as
        # cell_of_points (floor((x-min)*2^31/range) >> (31-level)) — naive
        # (x+180)//cell_width float division disagrees by one cell at some
        # representable boundaries, which would break the no-false-negative
        # covering guarantee
        shift = 31 - self.level
        cx0 = int(self.sfc.lon.normalize(np.array([xmin]))[0]) >> shift
        cx1 = int(self.sfc.lon.normalize(np.array([xmax]))[0]) >> shift
        cy0 = int(self.sfc.lat.normalize(np.array([ymin]))[0]) >> shift
        cy1 = int(self.sfc.lat.normalize(np.array([ymax]))[0]) >> shift
        nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
        if max_cells is not None and nx * ny > max_cells:
            raise ValueError(f"covering of {nx * ny} cells exceeds max_cells={max_cells}")
        gx, gy = np.meshgrid(
            np.arange(cx0, cx1 + 1, dtype=np.uint64),
            np.arange(cy0, cy1 + 1, dtype=np.uint64),
            indexing="ij",
        )
        return self.cell_from_xy(gx.ravel(), gy.ravel())

    def cover_bbox_auto(self, xmin, ymin, xmax, ymax, max_cells: int = 4096):
        """Covering at the finest level (starting from self.level) whose cell
        count fits max_cells. Returns (cells, level_used)."""
        level = self.level
        while level > 0:
            grid = self if level == self.level else ZCellGrid(level)
            try:
                return grid.cover_bbox(xmin, ymin, xmax, ymax, max_cells=max_cells), level
            except ValueError:
                level -= 1
        return ZCellGrid(0).cover_bbox(xmin, ymin, xmax, ymax), 0

    def neighbors(self, cell_id, ring: int = 1) -> np.ndarray:
        """Cells within `ring` king-moves of each input cell (dedup'd,
        clamped at the lat poles, wrapping in lon). Used for k-ring expansion
        in kNN (the analog of the reference's expanding query windows,
        KNearestNeighborSearchProcess.scala:278-301)."""
        cx, cy = self.cell_xy(np.atleast_1d(cell_id))
        offs = np.arange(-ring, ring + 1)
        dx, dy = np.meshgrid(offs, offs, indexing="ij")
        nx = (cx[:, None] + dx.ravel()[None, :]) % self.n_side  # lon wraps
        ny = cy[:, None] + dy.ravel()[None, :]
        ok = (ny >= 0) & (ny < self.n_side)
        cells = self.cell_from_xy(nx[ok].astype(np.uint64), ny[ok].astype(np.uint64))
        return np.unique(cells)

    def parent(self, cell_id, parent_level: int) -> np.ndarray:
        if parent_level > self.level:
            raise ValueError("parent_level must be <= level")
        shift = np.uint64(2 * (self.level - parent_level))
        return (np.asarray(cell_id).astype(np.uint64) >> shift).astype(np.int64)
