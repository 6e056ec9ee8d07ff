"""Normalized dimensions: double in [min, max] -> int in [0, 2^precision).

Parity target: GeoMesa ``BitNormalizedDimension``
(reference geomesa-z3/.../curve/NormalizedDimension.scala:56-78):

- ``normalize(x)``  : ``if x >= max: maxIndex else floor((x - min) * scale)``
- ``denormalize(i)``: ``if i >= maxIndex: min + (maxIndex + 0.5d) / scale
                       else min + (i + 0.5d) / scale``  (cell midpoint)

where ``scale = (2^precision - ???)``: GeoMesa uses
``normalizer = 2^precision / (max - min)`` and ``maxIndex = 2^precision - 1``.
All functions are vectorized over numpy arrays.
"""

from __future__ import annotations

import numpy as np


class BitNormalizedDimension:
    """Maps a closed double range onto ``precision`` bits, floor/clamp style."""

    def __init__(self, vmin: float, vmax: float, precision: int):
        if not (0 < precision <= 31):
            raise ValueError(f"precision must be in (0, 31], got {precision}")
        self.min = float(vmin)
        self.max = float(vmax)
        self.precision = int(precision)
        self.bins = 1 << precision
        self.max_index = self.bins - 1
        self.normalizer = self.bins / (self.max - self.min)
        self.denormalizer = (self.max - self.min) / self.bins

    def normalize(self, x) -> np.ndarray:
        """Vectorized: clamp-at-max floor normalization (lenient=False callers
        must bounds-check beforehand; see ``clamp``)."""
        x = np.asarray(x, dtype=np.float64)
        idx = np.floor((x - self.min) * self.normalizer).astype(np.int64)
        # x == max (or beyond) maps to maxIndex, mirroring the reference's
        # explicit `if (value >= max) maxIndex` branch.
        return np.clip(idx, 0, self.max_index)

    def denormalize(self, i) -> np.ndarray:
        """Vectorized inverse: midpoint of the bin."""
        i = np.minimum(np.asarray(i, dtype=np.float64), self.max_index)
        return self.min + (i + 0.5) * self.denormalizer

    def clamp(self, x) -> np.ndarray:
        """Lenient mode: clamp out-of-range values into [min, max]
        (Z2SFC.lenientIndex semantics, Z2SFC.scala:40-53)."""
        return np.clip(np.asarray(x, dtype=np.float64), self.min, self.max)

    def in_bounds(self, x) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        return (x >= self.min) & (x <= self.max)
