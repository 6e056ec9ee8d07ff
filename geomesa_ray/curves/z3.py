"""Z3 space-time filling curve: 21 bits/dim (lon, lat, time offset) -> 63-bit Z.

Parity target: GeoMesa ``Z3SFC`` (reference
geomesa-z3/.../curve/Z3SFC.scala:32-62): lon/lat normalized as in Z2, the
third dimension is the offset *within* a time bin (see
``curves.binnedtime``), normalized over [0, maxOffset(period)]. Bit order is
x0 y0 t0 x1 y1 t1 ... (lon in the lowest position of each triple).
"""

from __future__ import annotations

import numpy as np

from geomesa_ray.curves.binnedtime import BinnedTime
from geomesa_ray.curves.normalize import BitNormalizedDimension

# Spread the low 21 bits of v with two 0 bits between each (3-way interleave),
# standard Morton magic numbers for 64-bit 3D codes.
_M3_0 = np.uint64(0x00000000001FFFFF)
_M3_1 = np.uint64(0x001F00000000FFFF)
_M3_2 = np.uint64(0x001F0000FF0000FF)
_M3_3 = np.uint64(0x100F00F00F00F00F)
_M3_4 = np.uint64(0x10C30C30C30C30C3)
_M3_5 = np.uint64(0x1249249249249249)


def split3(v: np.ndarray) -> np.ndarray:
    x = v.astype(np.uint64) & _M3_0
    x = (x | (x << np.uint64(32))) & _M3_1
    x = (x | (x << np.uint64(16))) & _M3_2
    x = (x | (x << np.uint64(8))) & _M3_3
    x = (x | (x << np.uint64(4))) & _M3_4
    x = (x | (x << np.uint64(2))) & _M3_5
    return x


def combine3(z: np.ndarray) -> np.ndarray:
    x = z.astype(np.uint64) & _M3_5
    x = (x ^ (x >> np.uint64(2))) & _M3_4
    x = (x ^ (x >> np.uint64(4))) & _M3_3
    x = (x ^ (x >> np.uint64(8))) & _M3_2
    x = (x ^ (x >> np.uint64(16))) & _M3_1
    x = (x ^ (x >> np.uint64(32))) & _M3_0
    return x


class Z3SFC:
    """Vectorized Z3 curve over (lon, lat, offset-within-time-bin)."""

    def __init__(self, period: str = "week", precision: int = 21):
        if not (0 < precision < 22):
            raise ValueError("precision must be in [1, 21]")
        self.period = period
        self.precision = precision
        self.lon = BitNormalizedDimension(-180.0, 180.0, precision)
        self.lat = BitNormalizedDimension(-90.0, 90.0, precision)
        self.time = BitNormalizedDimension(
            0.0, float(BinnedTime.max_offset(period)), precision
        )

    def index(self, x, y, t, lenient: bool = False) -> np.ndarray:
        """x=lon, y=lat arrays; t = offset within the time bin (units depend
        on period: day->millis, week/month->seconds, year->minutes)."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        t = np.asarray(t, dtype=np.float64)
        if lenient:
            x, y, t = self.lon.clamp(x), self.lat.clamp(y), self.time.clamp(t)
        nx = self.lon.normalize(x).astype(np.uint64)
        ny = self.lat.normalize(y).astype(np.uint64)
        nt = self.time.normalize(t).astype(np.uint64)
        z = split3(nx) | (split3(ny) << np.uint64(1)) | (split3(nt) << np.uint64(2))
        return z.astype(np.int64)

    def index_millis(self, x, y, epoch_millis, lenient: bool = False):
        """Convenience: epoch millis -> (time_bin, z3) pair of arrays, the
        composite key GeoMesa writes as [2B bin][8B z3]
        (Z3IndexKeySpace.scala:64-96)."""
        bins, offsets = BinnedTime.to_binned_time(epoch_millis, self.period)
        return bins, self.index(x, y, offsets, lenient=lenient)

    def invert(self, z):
        z = np.asarray(z).astype(np.uint64)
        nx = combine3(z)
        ny = combine3(z >> np.uint64(1))
        nt = combine3(z >> np.uint64(2))
        return (
            self.lon.denormalize(nx),
            self.lat.denormalize(ny),
            self.time.denormalize(nt).astype(np.int64),
        )


    # ------------------------------------------------------------------
    # Range planning: BFS over the implicit oct-tree (the sfcurve
    # Z3.zranges analog used by Z3SFC.ranges, Z3SFC.scala:55-62) — a cell
    # fully inside the normalized query box contributes its whole z
    # interval; partial overlaps recurse to ``max_recurse`` levels.
    # ------------------------------------------------------------------

    def bbox_ranges(
        self,
        xmin: float,
        ymin: float,
        xmax: float,
        ymax: float,
        t0: float,
        t1: float,
        max_recurse: int = 7,
    ) -> list[tuple[int, int]]:
        """Covering of (lon, lat, offset) box as sorted inclusive [zlo, zhi]
        ranges over full-precision z3 values (t in bin-offset units)."""
        qx = (int(self.lon.normalize(max(xmin, self.lon.min))[()]),
              int(self.lon.normalize(min(xmax, self.lon.max))[()]))
        qy = (int(self.lat.normalize(max(ymin, self.lat.min))[()]),
              int(self.lat.normalize(min(ymax, self.lat.max))[()]))
        qt = (int(self.time.normalize(max(t0, self.time.min))[()]),
              int(self.time.normalize(min(t1, self.time.max))[()]))
        p = self.precision
        ranges: list[tuple[int, int]] = []
        stack = [(0, 0, 0, 0)]  # (level, cx, cy, ct)
        while stack:
            level, cx, cy, ct = stack.pop()
            shift = p - level
            bounds = []
            ok = True
            contained = True
            for (c, (qlo, qhi)) in ((cx, qx), (cy, qy), (ct, qt)):
                lo, hi = c << shift, ((c + 1) << shift) - 1
                if hi < qlo or lo > qhi:
                    ok = False
                    break
                if lo < qlo or hi > qhi:
                    contained = False
                bounds.append((lo, hi))
            if not ok:
                continue
            if contained or level >= max_recurse:
                (xlo, xhi), (ylo, yhi), (tlo, thi) = bounds
                zlo = int((split3(np.array([xlo], dtype=np.uint64))
                           | (split3(np.array([ylo], dtype=np.uint64)) << np.uint64(1))
                           | (split3(np.array([tlo], dtype=np.uint64)) << np.uint64(2)))[0])
                zhi = int((split3(np.array([xhi], dtype=np.uint64))
                           | (split3(np.array([yhi], dtype=np.uint64)) << np.uint64(1))
                           | (split3(np.array([thi], dtype=np.uint64)) << np.uint64(2)))[0])
                ranges.append((zlo, zhi))
            else:
                for dx in (0, 1):
                    for dy in (0, 1):
                        for dt in (0, 1):
                            stack.append((level + 1, (cx << 1) | dx, (cy << 1) | dy, (ct << 1) | dt))
        ranges.sort()
        merged: list[tuple[int, int]] = []
        for lo, hi in ranges:
            if merged and lo <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
            else:
                merged.append((lo, hi))
        return merged


Z3 = Z3SFC("week", 21)
