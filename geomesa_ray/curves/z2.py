"""Z2 space-filling curve: 31 bits/dim lon/lat -> 62-bit Z value.

Parity target: GeoMesa ``Z2SFC`` (reference
geomesa-z3/.../curve/Z2SFC.scala:27-53) + the ``org.locationtech.sfcurve``
``Z2`` bit interleave it delegates to. Semantics:

- lon normalized over [-180, 180], lat over [-90, 90] with
  ``BitNormalizedDimension`` floor/clamp rules.
- ``index(x, y)`` interleaves bits x0 y0 x1 y1 ... (lon occupies the even/low
  bit positions).
- ``lenient=True`` clamps out-of-bounds coords instead of raising
  (Z2SFC.scala:40-46).

All kernels are vectorized numpy over uint64; no Python-level loops.
"""

from __future__ import annotations

import numpy as np

from geomesa_ray.curves.normalize import BitNormalizedDimension

# Magic-number bit spreading (public "interleave by binary magic numbers"
# technique): spread the low 31 bits of v so there is a 0 bit between each.
_MASKS_2 = (
    np.uint64(0x00000000FFFFFFFF),
    np.uint64(0x0000FFFF0000FFFF),
    np.uint64(0x00FF00FF00FF00FF),
    np.uint64(0x0F0F0F0F0F0F0F0F),
    np.uint64(0x3333333333333333),
    np.uint64(0x5555555555555555),
)


def split2(v: np.ndarray) -> np.ndarray:
    """Insert a 0 bit between each of the low 32 bits of ``v`` (uint64)."""
    x = v.astype(np.uint64) & _MASKS_2[0]
    x = (x | (x << np.uint64(16))) & _MASKS_2[1]
    x = (x | (x << np.uint64(8))) & _MASKS_2[2]
    x = (x | (x << np.uint64(4))) & _MASKS_2[3]
    x = (x | (x << np.uint64(2))) & _MASKS_2[4]
    x = (x | (x << np.uint64(1))) & _MASKS_2[5]
    return x


def combine2(z: np.ndarray) -> np.ndarray:
    """Inverse of split2: extract the even bits of ``z`` back into an int."""
    x = z.astype(np.uint64) & _MASKS_2[5]
    x = (x ^ (x >> np.uint64(1))) & _MASKS_2[4]
    x = (x ^ (x >> np.uint64(2))) & _MASKS_2[3]
    x = (x ^ (x >> np.uint64(4))) & _MASKS_2[2]
    x = (x ^ (x >> np.uint64(8))) & _MASKS_2[1]
    x = (x ^ (x >> np.uint64(16))) & _MASKS_2[0]
    return x


class Z2SFC:
    """Vectorized Z2 curve over lon/lat."""

    def __init__(self, precision: int = 31):
        self.precision = precision
        self.lon = BitNormalizedDimension(-180.0, 180.0, precision)
        self.lat = BitNormalizedDimension(-90.0, 90.0, precision)

    def index(self, x, y, lenient: bool = False) -> np.ndarray:
        """lon/lat arrays -> int64 z values. Non-lenient callers must have
        validated bounds (see ``in_bounds``); lenient clamps."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if lenient:
            x, y = self.lon.clamp(x), self.lat.clamp(y)
        nx = self.lon.normalize(x).astype(np.uint64)
        ny = self.lat.normalize(y).astype(np.uint64)
        z = split2(nx) | (split2(ny) << np.uint64(1))
        return z.astype(np.int64)

    def in_bounds(self, x, y) -> np.ndarray:
        return self.lon.in_bounds(x) & self.lat.in_bounds(y)

    def invert(self, z) -> tuple[np.ndarray, np.ndarray]:
        """z -> (lon, lat) bin midpoints (Z2SFC.scala:48-51)."""
        z = np.asarray(z).astype(np.uint64)
        nx = combine2(z)
        ny = combine2(z >> np.uint64(1))
        return self.lon.denormalize(nx), self.lat.denormalize(ny)

    # ------------------------------------------------------------------
    # Range planning / quadtree-cell view.
    #
    # A Z2 value truncated to its top 2*level bits is exactly a quadtree cell
    # at `level`; this is what our cell grid (cells/zcell.py) builds on, the
    # analog of sfcurve's Z2.zranges used by Z2SFC.ranges (Z2SFC.scala:53+).
    # ------------------------------------------------------------------

    def bbox_ranges(
        self,
        xmin: float,
        ymin: float,
        xmax: float,
        ymax: float,
        max_recurse: int = 12,
    ) -> list[tuple[int, int]]:
        """Covering of a lon/lat bbox as sorted, merged, inclusive
        [zlo, zhi] ranges over full-precision z values.

        BFS over the implicit quadtree: a cell fully inside the normalized
        query window contributes its whole z interval; a partially
        overlapping cell recurses until ``max_recurse`` levels, then is
        included conservatively (no false negatives).
        """
        qxlo = int(self.lon.normalize(max(xmin, self.lon.min))[()])
        qxhi = int(self.lon.normalize(min(xmax, self.lon.max))[()])
        qylo = int(self.lat.normalize(max(ymin, self.lat.min))[()])
        qyhi = int(self.lat.normalize(min(ymax, self.lat.max))[()])

        p = self.precision
        ranges: list[tuple[int, int]] = []
        # stack entries: (level, cx, cy) — cell coords at that level
        stack = [(0, 0, 0)]
        while stack:
            level, cx, cy = stack.pop()
            shift = p - level
            # cell bounds in normalized int space at full precision
            xlo, xhi = cx << shift, ((cx + 1) << shift) - 1
            ylo, yhi = cy << shift, ((cy + 1) << shift) - 1
            if xhi < qxlo or xlo > qxhi or yhi < qylo or ylo > qyhi:
                continue
            contained = xlo >= qxlo and xhi <= qxhi and ylo >= qylo and yhi <= qyhi
            if contained or level >= max_recurse:
                zlo = self._z_of_norm(xlo, ylo)
                zhi = self._z_of_norm(xhi, yhi)
                ranges.append((zlo, zhi))
            else:
                for dx in (0, 1):
                    for dy in (0, 1):
                        stack.append((level + 1, (cx << 1) | dx, (cy << 1) | dy))
        ranges.sort()
        merged: list[tuple[int, int]] = []
        for lo, hi in ranges:
            if merged and lo <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
            else:
                merged.append((lo, hi))
        return merged

    def _z_of_norm(self, nx: int, ny: int) -> int:
        z = split2(np.asarray([nx], dtype=np.uint64)) | (
            split2(np.asarray([ny], dtype=np.uint64)) << np.uint64(1)
        )
        return int(z[0])


Z2 = Z2SFC(31)
