"""Reprojection, merged hot/cold view, extra st_* functions, plus
hypothesis property tests for the curve kernels."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geomesa_ray.functions import call
from geomesa_ray.geo.reproject import (
    lonlat_to_mercator,
    mercator_to_lonlat,
    slippy_tile,
)


class TestReproject:
    def test_roundtrip(self):
        rng = np.random.default_rng(51)
        lon = rng.uniform(-180, 180, 1000)
        lat = rng.uniform(-85, 85, 1000)
        x, y = lonlat_to_mercator(lon, lat)
        lon2, lat2 = mercator_to_lonlat(x, y)
        assert np.allclose(lon, lon2) and np.allclose(lat, lat2)

    def test_known_values(self):
        # (0,0) -> (0,0); lon 180 -> ~20037508.34 m (classic web-mercator bound)
        x, y = lonlat_to_mercator(np.array([0.0, 180.0]), np.array([0.0, 0.0]))
        assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
        assert abs(x[1] - 20037508.342789244) < 1e-3

    def test_slippy_tiles(self):
        # zoom 0: everything in tile (0,0); zoom 1: paris in (1,0)
        tx, ty = slippy_tile(np.array([2.35]), np.array([48.85]), 0)
        assert (tx[0], ty[0]) == (0, 0)
        tx, ty = slippy_tile(np.array([2.35]), np.array([48.85]), 1)
        assert (tx[0], ty[0]) == (1, 0)


class TestMergedView:
    def test_last_write_wins(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.merged_view import merged_view

        cold = rd.from_pandas(pd.DataFrame({
            "id": ["a", "b", "c"], "ts": [1, 5, 3], "v": ["cold_a", "cold_b", "cold_c"],
        }))
        hot = rd.from_pandas(pd.DataFrame({
            "id": ["a", "b", "d"], "ts": [2, 5, 9], "v": ["hot_a", "hot_b", "hot_d"],
        }))
        out = merged_view(hot, cold, "id", "ts").to_pandas().set_index("id")["v"].to_dict()
        assert out == {"a": "hot_a", "b": "hot_b", "c": "cold_c", "d": "hot_d"}


class TestExtraStFunctions:
    def test_envelope(self):
        xmin, ymin, xmax, ymax = call("st_envelope", ["POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))"])
        assert (xmin[0], ymin[0], xmax[0], ymax[0]) == (0, 0, 4, 3)

    def test_centroid(self):
        cx, cy = call("st_centroid", ["POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"])
        assert np.isclose(cx[0], 1.0) and np.isclose(cy[0], 1.0)
        cx, cy = call("st_centroid", ["POINT (3 4)"])
        assert cx[0] == 3 and cy[0] == 4

    def test_num_points(self):
        n = call("st_numPoints", ["LINESTRING (0 0, 1 1, 2 0)", "POINT (1 1)"])
        assert n.tolist() == [3, 1]

    def test_geojson(self):
        g = call("st_asGeoJSON", ["POINT (2.35 48.85)", "junk"])
        import json

        parsed = json.loads(g[0])
        assert parsed["type"] == "Point" and abs(parsed["coordinates"][0] - 2.35) < 1e-6
        assert g[1] is None

    def test_buffer_point(self):
        from geomesa_ray.geo.predicates import Polygon

        w = call("st_bufferPoint", [10.0], [45.0], 10_000)[0]
        p = Polygon.from_wkt(w)
        assert p.contains(np.array([10.0]), np.array([45.0]))[0]
        assert not p.contains(np.array([10.5]), np.array([45.0]))[0]  # ~39 km away


class TestCurveProperties:
    @settings(max_examples=200, deadline=None)
    @given(st.floats(-180, 180, allow_nan=False), st.floats(-90, 90, allow_nan=False))
    def test_z2_roundtrip_property(self, lon, lat):
        from geomesa_ray.curves.z2 import Z2SFC

        sfc = Z2SFC(31)
        z = sfc.index(np.array([lon]), np.array([lat]))
        ilon, ilat = sfc.invert(z)
        assert abs(ilon[0] - lon) <= 360.0 / (1 << 31) + 1e-9
        assert abs(ilat[0] - lat) <= 180.0 / (1 << 31) + 1e-9

    @settings(max_examples=100, deadline=None)
    @given(st.integers(0, 2_000_000_000_000))
    def test_binnedtime_roundtrip_property(self, ms):
        from geomesa_ray.curves.binnedtime import BinnedTime

        for period, unit_ms in [("day", 1), ("week", 1000), ("month", 1000), ("year", 60000)]:
            bins, offs = BinnedTime.to_binned_time(np.array([ms]), period)
            back = BinnedTime.from_binned_time(bins, offs, period)
            assert 0 <= ms - back[0] < unit_ms

    @settings(max_examples=100, deadline=None)
    @given(
        st.floats(-179, 179, allow_nan=False), st.floats(-89, 89, allow_nan=False),
        st.floats(0.001, 5), st.floats(0.001, 5),
    )
    def test_xz2_index_within_own_query(self, x, y, w, h):
        """Any bbox's code is covered by the ranges of a window containing it."""
        from geomesa_ray.curves.xz2 import XZ2SFC

        xz = XZ2SFC(12)
        xmax, ymax = min(x + w, 180.0), min(y + h, 90.0)
        code = xz.index(np.array([x]), np.array([y]), np.array([xmax]), np.array([ymax]))[0]
        win = (max(x - 1, -180), max(y - 1, -90), min(xmax + 1, 180), min(ymax + 1, 90))
        ranges = xz.ranges([win])
        assert any(lo <= code <= hi for lo, hi in ranges)
