"""GridSnap: snap coordinates to a W x H raster over an envelope.

Parity target: GeoMesa ``GridSnap`` (reference
geomesa-utils/.../geotools/GridSnap.scala) used by the density/heatmap scan
(DensityScan.scala:29-136): ``i = floor((x - xmin) / (xmax - xmin) * width)``
clamped to [0, width-1]; the cell center is returned on the way out.
This is the raster-to-vector tile assignment of the north rule.
"""

from __future__ import annotations

import numpy as np


class GridSnap:
    def __init__(self, xmin: float, ymin: float, xmax: float, ymax: float, width: int, height: int):
        self.xmin, self.ymin, self.xmax, self.ymax = map(float, (xmin, ymin, xmax, ymax))
        self.width, self.height = int(width), int(height)
        self.dx = (self.xmax - self.xmin) / self.width
        self.dy = (self.ymax - self.ymin) / self.height

    def i(self, x) -> np.ndarray:
        """x -> column index, clamped; -1 for out-of-envelope (GridSnap.i
        returns -1 outside the envelope)."""
        x = np.asarray(x, dtype=np.float64)
        idx = np.floor((x - self.xmin) / self.dx).astype(np.int64)
        idx = np.where(x == self.xmax, self.width - 1, idx)  # right edge inclusive
        return np.where((x < self.xmin) | (x > self.xmax), -1, np.clip(idx, 0, self.width - 1))

    def j(self, y) -> np.ndarray:
        y = np.asarray(y, dtype=np.float64)
        idx = np.floor((y - self.ymin) / self.dy).astype(np.int64)
        idx = np.where(y == self.ymax, self.height - 1, idx)
        return np.where((y < self.ymin) | (y > self.ymax), -1, np.clip(idx, 0, self.height - 1))

    def x(self, i) -> np.ndarray:
        """column -> cell-center x."""
        return self.xmin + (np.asarray(i, dtype=np.float64) + 0.5) * self.dx

    def y(self, j) -> np.ndarray:
        return self.ymin + (np.asarray(j, dtype=np.float64) + 0.5) * self.dy
