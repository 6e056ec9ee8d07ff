"""Curve-kernel parity tests.

Mirrors the reference's test style (geomesa-z3/src/test/.../curve/Z2Test.scala,
Z3Test.scala, XZ2SFCTest.scala, BinnedTimeTest.scala,
NormalizedDimensionTest.scala): seeded random round-trips + exhaustive
boundary cases with exact expected values.
"""

import numpy as np
import pytest

from geomesa_ray.curves import BinnedTime, BitNormalizedDimension, XZ2SFC, Z2SFC, Z3SFC
from geomesa_ray.curves.z2 import combine2, split2
from geomesa_ray.curves.z3 import combine3, split3


class TestNormalize:
    def test_bounds(self):
        lon = BitNormalizedDimension(-180.0, 180.0, 31)
        assert lon.normalize(-180.0) == 0
        assert lon.normalize(180.0) == lon.max_index  # explicit >= max branch
        assert lon.normalize(0.0) == 1 << 30
        # denormalize returns bin midpoints
        mid = lon.denormalize(0)
        assert -180.0 < mid < -180.0 + 360.0 / (1 << 30)

    def test_roundtrip_within_bin(self):
        rng = np.random.default_rng(574)
        lat = BitNormalizedDimension(-90.0, 90.0, 21)
        xs = rng.uniform(-90, 90, 1000)
        back = lat.denormalize(lat.normalize(xs))
        assert np.all(np.abs(back - xs) <= 180.0 / (1 << 21))

    def test_monotonic(self):
        d = BitNormalizedDimension(0.0, 100.0, 10)
        xs = np.linspace(0, 100, 5000)
        ns = d.normalize(xs)
        assert np.all(np.diff(ns) >= 0)


class TestZ2:
    def test_split_combine_roundtrip(self):
        rng = np.random.default_rng(-574 % 2**32)
        vals = rng.integers(0, 1 << 31, 10_000, dtype=np.uint64)
        assert np.array_equal(combine2(split2(vals)), vals)

    def test_split_spreads_bits(self):
        # 0b11 -> 0b101
        assert split2(np.array([3], dtype=np.uint64))[0] == 5
        assert split2(np.array([1], dtype=np.uint64))[0] == 1

    def test_index_known_values(self):
        z2 = Z2SFC(31)
        # (-180, -90) is bin (0, 0) -> z 0
        assert z2.index(np.array([-180.0]), np.array([-90.0]))[0] == 0
        # (180, 90) -> all bits set: 2^62 - 1
        assert z2.index(np.array([180.0]), np.array([90.0]))[0] == (1 << 62) - 1

    def test_invert_roundtrip(self):
        z2 = Z2SFC(31)
        rng = np.random.default_rng(42)
        x = rng.uniform(-180, 180, 2000)
        y = rng.uniform(-90, 90, 2000)
        zs = z2.index(x, y)
        ix, iy = z2.invert(zs)
        assert np.all(np.abs(ix - x) <= 360.0 / (1 << 31) + 1e-9)
        assert np.all(np.abs(iy - y) <= 180.0 / (1 << 31) + 1e-9)

    def test_lenient_clamps(self):
        z2 = Z2SFC(31)
        z = z2.index(np.array([200.0]), np.array([-100.0]), lenient=True)
        assert z[0] == z2.index(np.array([180.0]), np.array([-90.0]))[0]

    def test_locality(self):
        # nearby points share high-order bits
        z2 = Z2SFC(31)
        a = int(z2.index(np.array([10.0]), np.array([10.0]))[0])
        b = int(z2.index(np.array([10.0001]), np.array([10.0001]))[0])
        assert (a >> 40) == (b >> 40)

    def test_bbox_ranges_cover_points(self):
        z2 = Z2SFC(31)
        rng = np.random.default_rng(7)
        x = rng.uniform(-20, 20, 500)
        y = rng.uniform(-10, 10, 500)
        zs = z2.index(x, y)
        ranges = z2.bbox_ranges(-20, -10, 20, 10, max_recurse=10)
        covered = np.zeros(len(zs), dtype=bool)
        for lo, hi in ranges:
            covered |= (zs >= lo) & (zs <= hi)
        assert covered.all()
        # and excludes far-away points
        far = z2.index(np.array([100.0]), np.array([50.0]))
        assert not any(lo <= far[0] <= hi for lo, hi in ranges)


class TestZ3:
    def test_split3_roundtrip(self):
        rng = np.random.default_rng(3)
        vals = rng.integers(0, 1 << 21, 10_000, dtype=np.uint64)
        assert np.array_equal(combine3(split3(vals)), vals)

    def test_known_corners(self):
        z3 = Z3SFC("week", 21)
        assert z3.index(np.array([-180.0]), np.array([-90.0]), np.array([0]))[0] == 0
        full = z3.index(
            np.array([180.0]), np.array([90.0]), np.array([BinnedTime.max_offset("week")])
        )[0]
        assert full == (1 << 63) - 1

    def test_invert_roundtrip(self):
        z3 = Z3SFC("week", 21)
        rng = np.random.default_rng(11)
        x = rng.uniform(-180, 180, 1000)
        y = rng.uniform(-90, 90, 1000)
        t = rng.integers(0, BinnedTime.max_offset("week"), 1000)
        ix, iy, it = z3.invert(z3.index(x, y, t))
        assert np.all(np.abs(ix - x) <= 360.0 / (1 << 21) + 1e-9)
        assert np.all(np.abs(iy - y) <= 180.0 / (1 << 21) + 1e-9)
        assert np.all(np.abs(it - t) <= BinnedTime.max_offset("week") / (1 << 21) + 1)

    def test_index_millis(self):
        z3 = Z3SFC("week", 21)
        # 1970-01-08T00:00:00Z = exactly 1 week
        bins, zs = z3.index_millis(np.array([0.0]), np.array([0.0]), np.array([7 * 86400000]))
        assert bins[0] == 1
        assert zs[0] == z3.index(np.array([0.0]), np.array([0.0]), np.array([0]))[0]


class TestBinnedTime:
    def test_day(self):
        bins, offs = BinnedTime.to_binned_time(np.array([86400000 + 123]), "day")
        assert bins[0] == 1 and offs[0] == 123

    def test_week(self):
        bins, offs = BinnedTime.to_binned_time(np.array([7 * 86400000 + 5000]), "week")
        assert bins[0] == 1 and offs[0] == 5

    def test_month_calendar(self):
        # 1970-03-01 is month bin 2 (Jan=0, Feb=1)
        ms = np.datetime64("1970-03-01T00:00:30", "ms").astype(np.int64)
        bins, offs = BinnedTime.to_binned_time(np.array([ms]), "month")
        assert bins[0] == 2 and offs[0] == 30

    def test_year_calendar(self):
        ms = np.datetime64("1972-01-01T01:00:00", "ms").astype(np.int64)
        bins, offs = BinnedTime.to_binned_time(np.array([ms]), "year")
        assert bins[0] == 2 and offs[0] == 60

    def test_roundtrip_all_periods(self):
        rng = np.random.default_rng(99)
        ts = rng.integers(0, 2_000_000_000_000, 500)
        for period, unit_ms in [("day", 1), ("week", 1000), ("month", 1000), ("year", 60000)]:
            bins, offs = BinnedTime.to_binned_time(ts, period)
            back = BinnedTime.from_binned_time(bins, offs, period)
            assert np.all(np.abs(back - ts) < unit_ms), period

    def test_max_offsets(self):
        assert BinnedTime.max_offset("day") == 86400000
        assert BinnedTime.max_offset("week") == 604800
        assert BinnedTime.max_offset("month") == 86400 * 31
        assert BinnedTime.max_offset("year") == 524160


class TestXZ2:
    def test_point_gets_max_length(self):
        xz = XZ2SFC(12)
        # a point bbox uses the full g-length code
        c = xz.index(np.array([10.0]), np.array([10.0]), np.array([10.0]), np.array([10.0]))
        assert c[0] > 0

    def test_ranges_cover_indexed_bboxes(self):
        xz = XZ2SFC(12)
        rng = np.random.default_rng(21)
        # random small boxes inside a window
        cx = rng.uniform(-10, 10, 200)
        cy = rng.uniform(-5, 5, 200)
        w = rng.uniform(0.001, 0.5, 200)
        codes = xz.index(cx - w, cy - w, cx + w, cy + w)
        ranges = xz.ranges([(-11, -6, 11, 6)])
        covered = np.zeros(len(codes), dtype=bool)
        for lo, hi in ranges:
            covered |= (codes >= lo) & (codes <= hi)
        assert covered.all()

    def test_disjoint_window_excludes(self):
        xz = XZ2SFC(12)
        code = xz.index(np.array([10.0]), np.array([10.0]), np.array([10.2]), np.array([10.2]))[0]
        ranges = xz.ranges([(100, 50, 120, 60)])
        assert not any(lo <= code <= hi for lo, hi in ranges)

    def test_bigger_geom_shorter_code(self):
        xz = XZ2SFC(12)
        small = xz.index(np.array([10.0]), np.array([10.0]), np.array([10.01]), np.array([10.01]))[0]
        big = xz.index(np.array([-170.0]), np.array([-80.0]), np.array([170.0]), np.array([80.0]))[0]
        # a world-spanning geometry sorts before deep small cells
        assert big < small

    def test_scalar_vector_agree(self):
        xz = XZ2SFC(12)
        v = xz.index(np.array([1.0, 2.0]), np.array([1.0, 2.0]), np.array([1.5, 2.5]), np.array([1.5, 2.5]))
        a = xz.index(1.0, 1.0, 1.5, 1.5)
        assert v[0] == np.atleast_1d(a)[0]


class TestZ3Ranges:
    def test_cover_points_exclude_far(self):
        z3 = Z3SFC("week", 21)
        rng = np.random.default_rng(23)
        x = rng.uniform(-20, 20, 400)
        y = rng.uniform(-10, 10, 400)
        t = rng.integers(100_000, 200_000, 400)
        zs = z3.index(x, y, t)
        ranges = z3.bbox_ranges(-20, -10, 20, 10, 100_000, 200_000)
        covered = np.zeros(len(zs), dtype=bool)
        for lo, hi in ranges:
            covered |= (zs >= lo) & (zs <= hi)
        assert covered.all()
        # spatially near but temporally far point excluded
        far = z3.index(np.array([0.0]), np.array([0.0]), np.array([500_000]))[0]
        assert not any(lo <= far <= hi for lo, hi in ranges)
        # spatially far point excluded
        far2 = z3.index(np.array([150.0]), np.array([80.0]), np.array([150_000]))[0]
        assert not any(lo <= far2 <= hi for lo, hi in ranges)
