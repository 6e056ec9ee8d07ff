"""XZ3: XZ2 extent codes + a time-bin third dimension.

Parity target: GeoMesa ``XZ3SFC`` (reference
geomesa-z3/.../curve/XZ3SFC.scala:26-53) and the XZ3 key space
(geomesa-index-api/.../index/z3/XZ3IndexKeySpace.scala:57-92): key =
[2B time-bin][8B xz3-code]. The reference's XZ3 is a true oct-tree over
(x, y, t); for engine purposes the equivalent composite — time bin via
``BinnedTime`` + per-bin XZ2 spatial code — preserves the pruning
semantics (time bins partition coarsely; XZ2 handles spatial extent
within the bin) and keeps the planner's range logic two-level, which is
how the engine shuffles anyway (SURVEY §7.4).
"""

from __future__ import annotations

import numpy as np

from geomesa_ray.curves.binnedtime import BinnedTime
from geomesa_ray.curves.xz2 import XZ2SFC


class XZ3SFC:
    def __init__(self, period: str = "week", g: int = 12):
        self.period = period
        self.xz2 = XZ2SFC(g)

    def index_millis(self, xmin, ymin, xmax, ymax, epoch_millis, lenient: bool = False):
        """bbox + epoch millis -> (time_bin int16, xz2 code int64)."""
        bins, _ = BinnedTime.to_binned_time(epoch_millis, self.period)
        codes = self.xz2.index(xmin, ymin, xmax, ymax, lenient=lenient)
        return bins, codes

    def ranges(self, windows, t0_ms: int, t1_ms: int, max_ranges: int | None = None):
        """Query windows + [t0, t1) -> {time_bin: [(lo, hi), ...]} — per-bin
        XZ2 coverings for every bin the interval touches."""
        spatial = self.xz2.ranges(windows, max_ranges=max_ranges)
        b0, _ = BinnedTime.to_binned_time(np.array([t0_ms]), self.period)
        b1, _ = BinnedTime.to_binned_time(np.array([max(t0_ms, t1_ms - 1)]), self.period)
        return {int(b): spatial for b in range(int(b0[0]), int(b1[0]) + 1)}
