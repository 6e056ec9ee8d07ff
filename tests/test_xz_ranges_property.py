"""Property tests for the XZ2/XZ3 covering ranges (XZ2SFC.scala:146-252):
every box strictly overlapping a query window must have its sequence code
inside the BFS covering — coarse pruning may over-select but never drop.
Pure numpy (no Ray)."""

import numpy as np

from geomesa_ray.curves.xz2 import XZ2SFC
from geomesa_ray.curves.xz3 import XZ3SFC


def _bounds(ranges):
    return np.array([b for lo, hi in ranges for b in (lo, hi + 1)], dtype=np.int64)


def _member(bounds, codes):
    return (np.searchsorted(bounds, codes, side="right") % 2) == 1


def _random_boxes(rng, n):
    cx = rng.uniform(-180.0, 180.0, n)
    cy = rng.uniform(-90.0, 90.0, n)
    w = rng.uniform(0.0, 5.0, n)  # includes zero-extent (point) boxes
    h = rng.uniform(0.0, 5.0, n)
    xmin = np.clip(cx - w, -180.0, 180.0)
    xmax = np.clip(cx + w, -180.0, 180.0)
    ymin = np.clip(cy - h, -90.0, 90.0)
    ymax = np.clip(cy + h, -90.0, 90.0)
    return xmin, ymin, xmax, ymax


class TestXZ2RangesSuperset:
    def test_covering_never_drops_overlapping_boxes(self):
        rng = np.random.default_rng(7)
        sfc = XZ2SFC(8)
        windows = [(-30.0, -15.0, 10.0, 25.0), (100.0, 40.0, 140.0, 70.0)]
        for window in windows:
            bounds = _bounds(sfc.ranges([window]))
            xmin, ymin, xmax, ymax = _random_boxes(rng, 4000)
            codes = sfc.index(xmin, ymin, xmax, ymax)
            qx0, qy0, qx1, qy1 = window
            overlap = (xmin < qx1) & (xmax > qx0) & (ymin < qy1) & (ymax > qy0)
            assert _member(bounds, codes[overlap]).all()

    def test_multi_window_union(self):
        rng = np.random.default_rng(11)
        sfc = XZ2SFC(8)
        windows = [(-30.0, -15.0, 10.0, 25.0), (100.0, 40.0, 140.0, 70.0)]
        bounds = _bounds(sfc.ranges(windows))
        xmin, ymin, xmax, ymax = _random_boxes(rng, 4000)
        codes = sfc.index(xmin, ymin, xmax, ymax)
        overlap = np.zeros(len(codes), dtype=bool)
        for qx0, qy0, qx1, qy1 in windows:
            overlap |= (xmin < qx1) & (xmax > qx0) & (ymin < qy1) & (ymax > qy0)
        assert _member(bounds, codes[overlap]).all()

    def test_capped_covering_is_superset_of_uncapped(self):
        sfc = XZ2SFC(8)
        window = (-30.0, -15.0, 10.0, 25.0)
        full = sfc.ranges([window])
        capped = sfc.ranges([window], max_ranges=16)
        cb = _bounds(capped)
        for lo, hi in full:
            assert _member(cb, np.array([lo, hi])).all()

    def test_point_boxes_at_window_interior(self):
        # degenerate (point) boxes inside the window must always be covered
        sfc = XZ2SFC(8)
        window = (-30.0, -15.0, 10.0, 25.0)
        bounds = _bounds(sfc.ranges([window]))
        rng = np.random.default_rng(3)
        x = rng.uniform(-29.9, 9.9, 1000)
        y = rng.uniform(-14.9, 24.9, 1000)
        codes = sfc.index(x, y, x, y)
        assert _member(bounds, codes).all()


class TestXZ3RangesSuperset:
    def test_per_bin_covering(self):
        rng = np.random.default_rng(5)
        sfc = XZ3SFC(period="week", g=8)
        window = (-30.0, -15.0, 10.0, 25.0)
        t0, t1 = 1704672000000, 1705881600000
        per_bin = sfc.ranges([window], t0, t1)
        # bins covering [t0, t1) by floor-division weeks
        assert set(per_bin) == set(range(t0 // 604800000, (t1 - 1) // 604800000 + 1))
        xmin, ymin, xmax, ymax = _random_boxes(rng, 2000)
        ts = rng.integers(t0, t1, len(xmin))
        bins, codes = sfc.index_millis(xmin, ymin, xmax, ymax, ts)
        qx0, qy0, qx1, qy1 = window
        overlap = (xmin < qx1) & (xmax > qx0) & (ymin < qy1) & (ymax > qy0)
        for b in np.unique(bins[overlap]):
            bounds = _bounds(per_bin[int(b)])
            sel = overlap & (bins == b)
            assert _member(bounds, codes[sel]).all()
