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


Z3 = Z3SFC("week", 21)
