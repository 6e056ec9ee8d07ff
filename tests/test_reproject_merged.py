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


class TestConicProjections:
    # Snyder, "Map Projections — A Working Manual" (USGS PP 1395) worked
    # examples on Clarke 1866 (a=6378206.4, e^2=0.00676866): independent
    # published ground truth for both conic families.
    _CLARKE_A = 6378206.4
    _CLARKE_F = 1 - (1 - 0.00676866) ** 0.5

    def test_lcc_snyder_example(self):
        import numpy as np

        from geomesa_ray.geo.reproject import LambertConformalConic

        p = LambertConformalConic(33.0, 45.0, 23.0, -96.0,
                                  a=self._CLARKE_A, f=self._CLARKE_F)
        x, y = p.forward(np.array([-75.0]), np.array([35.0]))
        assert abs(x[0] - 1_894_410.9) < 0.5
        assert abs(y[0] - 1_564_649.5) < 0.5
        lon, lat = p.inverse(x, y)
        assert abs(lon[0] + 75.0) < 1e-9 and abs(lat[0] - 35.0) < 1e-9

    def test_albers_snyder_example(self):
        import numpy as np

        from geomesa_ray.geo.reproject import AlbersEqualArea

        p = AlbersEqualArea(29.5, 45.5, 23.0, -96.0,
                            a=self._CLARKE_A, f=self._CLARKE_F)
        x, y = p.forward(np.array([-75.0]), np.array([35.0]))
        assert abs(x[0] - 1_885_472.7) < 0.5
        assert abs(y[0] - 1_535_925.0) < 0.5

    def test_roundtrip_wgs84(self):
        import numpy as np

        from geomesa_ray.geo.reproject import get_projection

        rng = np.random.default_rng(7)
        lon = rng.uniform(-120, -70, 500)
        lat = rng.uniform(25, 50, 500)
        for code in ("EPSG:5070", "EPSG:3978", "EPSG:3034", "EPSG:102003"):
            p = get_projection(code)
            x, y = p.forward(lon, lat)
            lo, la = p.inverse(x, y)
            assert np.abs(lo - lon).max() < 1e-9, code
            assert np.abs(la - lat).max() < 1e-9, code

    def test_utm_adapter(self):
        import numpy as np

        from geomesa_ray.geo.reproject import get_projection

        p = get_projection("EPSG:32631")
        x, y = p.forward(np.array([3.0]), np.array([48.0]))
        lo, la = p.inverse(x, y)
        assert abs(lo[0] - 3.0) < 1e-8 and abs(la[0] - 48.0) < 1e-8

    def test_ups_epsg_worked_example(self):
        """EPSG Guidance Note 7-2's UPS North example: 73N 44E ->
        E 3320416.75, N 632668.43 — independent published ground truth."""
        import numpy as np

        from geomesa_ray.geo.reproject import get_projection

        p = get_projection("EPSG:32661")
        x, y = p.forward(np.array([44.0]), np.array([73.0]))
        assert abs(x[0] - 3_320_416.75) < 0.01
        assert abs(y[0] - 632_668.43) < 0.01
        lo, la = p.inverse(x, y)
        assert abs(lo[0] - 44.0) < 1e-9 and abs(la[0] - 73.0) < 1e-9

    def test_polar_stereographic_invariants(self):
        """Variant B definition checks: k = 1 exactly at the standard
        parallel (measured numerically along the parallel), the pole maps
        to the false origin, the EPSG axis conventions hold, and the
        inverse is machine-exact."""
        import numpy as np

        from geomesa_ray.geo.reproject import get_projection

        a = 6378137.0
        e = np.sqrt((1 / 298.257223563) * (2 - 1 / 298.257223563))
        for code, lat_ts, south in [("EPSG:3031", -71.0, True),
                                    ("EPSG:3413", 70.0, False)]:
            p = get_projection(code)
            x, y = p.forward(np.array([123.0]), np.array([-90.0 if south else 90.0]))
            assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
            rng = np.random.default_rng(3)
            lon = rng.uniform(-180, 180, 200)
            lat = (rng.uniform(-89.9, -55, 200) if south
                   else rng.uniform(55, 89.9, 200))
            X, Y = p.forward(lon, lat)
            lo, la = p.inverse(X, Y)
            dl = (lo - lon + 180) % 360 - 180
            assert np.abs(dl).max() < 1e-9 and np.abs(la - lat).max() < 1e-9
            ln = np.array([10.0, 10.0 + 1e-6])
            X, Y = p.forward(ln, np.array([lat_ts, lat_ts]))
            s = np.sin(np.radians(lat_ts))
            ds_true = (a * np.cos(np.radians(lat_ts))
                       / np.sqrt(1 - e * e * s * s) * np.radians(1e-6))
            k = np.hypot(X[1] - X[0], Y[1] - Y[0]) / ds_true
            assert abs(k - 1.0) < 1e-7, (code, k)
        # axis conventions: 3413 y points pole->135E, so (lon0, 75N) has y<0;
        # 3031 (south aspect) y points pole->lon0, so (0E, 75S) has y>0
        x, y = get_projection("EPSG:3413").forward(np.array([-45.0]), np.array([75.0]))
        assert abs(x[0]) < 1e-6 and y[0] < 0
        x, y = get_projection("EPSG:3031").forward(np.array([0.0]), np.array([-75.0]))
        assert abs(x[0]) < 1e-6 and y[0] > 0

    def test_unknown_code(self):
        import pytest

        from geomesa_ray.geo.reproject import get_projection

        with pytest.raises(KeyError):
            get_projection("EPSG:99999")


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


class TestUTM:
    """Krüger-series UTM vs an INDEPENDENT Snyder (1987) formula
    implementation — two unrelated public series agreeing to mm validates
    both; plus machine-precision roundtrips."""

    @staticmethod
    def _snyder_forward(lon, lat, zone):
        a, f, k0 = 6378137.0, 1 / 298.257223563, 0.9996
        e2 = f * (2 - f)
        ep2 = e2 / (1 - e2)
        lon0 = np.radians(zone * 6 - 183.0)
        phi = np.radians(lat)
        lam = np.radians(lon) - lon0
        N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        T = np.tan(phi) ** 2
        C = ep2 * np.cos(phi) ** 2
        A = lam * np.cos(phi)
        M = a * ((1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
                 - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * phi)
                 + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * phi)
                 - (35 * e2**3 / 3072) * np.sin(6 * phi))
        x = k0 * N * (A + (1 - T + C) * A**3 / 6
                      + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120)
        y = k0 * (M + N * np.tan(phi) * (A**2 / 2 + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
                  + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720))
        return x + 500000.0, np.where(lat < 0, y + 10_000_000.0, y)

    def test_matches_independent_snyder_series(self):
        from geomesa_ray.geo.reproject import lonlat_to_utm

        rng = np.random.default_rng(11)
        lat = rng.uniform(-80, 80, 500)
        zone = rng.integers(1, 61, 500)
        # stay within +-3 deg of each zone's central meridian (UTM's domain)
        lon = (zone * 6.0 - 183.0) + rng.uniform(-3, 3, 500)
        e, n, z, s = lonlat_to_utm(lon, lat, zone=None)
        # points sit inside their natural zone by construction
        assert (z == zone).all()
        se, sn = self._snyder_forward(lon, lat, zone)
        assert np.abs(e - se).max() < 5e-3  # Snyder truncates at A^6 -> mm
        assert np.abs(n - sn).max() < 5e-3

    def test_roundtrip_machine_precision(self):
        from geomesa_ray.geo.reproject import lonlat_to_utm, utm_to_lonlat

        rng = np.random.default_rng(3)
        lon = rng.uniform(-179.9, 179.9, 2000)
        lat = rng.uniform(-84, 84, 2000)
        e, n, z, s = lonlat_to_utm(lon, lat)
        lon2, lat2 = utm_to_lonlat(e, n, z, s)
        assert np.abs(lon2 - lon).max() < 1e-9
        assert np.abs(lat2 - lat).max() < 1e-9

    def test_zone_and_hemisphere(self):
        from geomesa_ray.geo.reproject import lonlat_to_utm

        e, n, z, s = lonlat_to_utm(np.array([2.3522]), np.array([48.8566]))
        assert z[0] == 31 and not s[0] and 400_000 < e[0] < 500_000
        e, n, z, s = lonlat_to_utm(np.array([151.2]), np.array([-33.87]))
        assert z[0] == 56 and s[0] and n[0] > 6_000_000


class TestNationalGrids:
    """Round 4: parameter-table CRS (state plane / national TM grids)."""

    def test_grid_origins(self):
        import numpy as np

        from geomesa_ray.geo.reproject import get_projection

        for code, lonlat, expect in [
            ("EPSG:2154", (3.0, 46.5), (700_000.0, 6_600_000.0)),       # Lambert-93
            ("EPSG:27700", (-2.0, 49.0), (400_000.0, -100_000.0)),      # OSGB
            ("EPSG:26943", (-120.5, 36.5), (2_000_000.0, 500_000.0)),   # CA zone 3
            ("EPSG:26985", (-77.0, 37.0 + 40 / 60), (400_000.0, 0.0)),  # Maryland
            ("EPSG:32040", (-99.0, 27.0 + 50 / 60), (2_000_000.0, 0.0)),  # TX SC (ftUS)
        ]:
            p = get_projection(code)
            x, y = p.forward(np.array([lonlat[0]]), np.array([lonlat[1]]))
            assert abs(x[0] - expect[0]) < 1e-6 and abs(y[0] - expect[1]) < 1e-6, code

    def test_texas_sc_snyder_worked_example(self):
        # Snyder PP1395 state-plane LCC parameter set (Clarke 1866, SP
        # 28°23'/30°17', origin 27°50'N 99°W, FE 2,000,000 ftUS):
        # (28°30'N, 96°W) -> x = 2,963,503.91 ft, y = 254,759.80 ft
        import numpy as np

        from geomesa_ray.geo.reproject import get_projection

        p = get_projection("EPSG:32040")
        x, y = p.forward(np.array([-96.0]), np.array([28.5]))
        assert abs(x[0] - 2_963_503.91) < 0.05
        assert abs(y[0] - 254_759.80) < 0.05

    def test_mga55_matches_utm_55s(self):
        # independent code paths: the TM parameter-table entry vs the
        # dedicated Krüger UTM fast path (GRS80 vs WGS84 f differs ~1e-9)
        import numpy as np

        from geomesa_ray.geo.reproject import get_projection, lonlat_to_utm

        lon = np.array([147.5, 145.2, 150.0])
        lat = np.array([-37.8, -42.9, -33.9])
        x, y = get_projection("EPSG:28355").forward(lon, lat)
        e, n, _, _ = lonlat_to_utm(lon, lat, zone=55)
        assert np.abs(x - e).max() < 1e-3
        assert np.abs(y - n).max() < 1e-3

    def test_roundtrips(self):
        import numpy as np

        from geomesa_ray.geo.reproject import get_projection

        rng = np.random.default_rng(3)
        for code, lo, hi, la, ha in [
            ("EPSG:2154", -4, 8, 42, 51), ("EPSG:27700", -7, 1.8, 50, 60),
            ("EPSG:2193", 166, 179, -47, -34),
            ("EPSG:26943", -123, -118, 36.6, 38.4),
            ("EPSG:32040", -100, -94, 28, 30.2),
        ]:
            p = get_projection(code)
            lon = rng.uniform(lo, hi, 200)
            lat = rng.uniform(la, ha, 200)
            lon2, lat2 = p.inverse(*p.forward(lon, lat))
            assert np.abs(lon2 - lon).max() < 1e-10, code
            assert np.abs(lat2 - lat).max() < 1e-10, code

    def test_scale_factor_on_standard_parallel(self):
        # conformal LCC: scale on a standard parallel equals 1 (ground
        # distance == grid distance) — checked by finite difference
        import numpy as np

        from geomesa_ray.geo.reproject import get_projection
        from geomesa_ray.geo.distance import haversine_m

        p = get_projection("EPSG:2154")
        lat = np.array([49.0, 49.0])   # upper standard parallel
        lon = np.array([2.0, 2.001])
        x, y = p.forward(lon, lat)
        grid = float(np.hypot(np.diff(x), np.diff(y))[0])
        # spherical ground distance is within ~0.3% of ellipsoidal here;
        # LCC scale at SP = 1 exactly, so ratio ~= sphere/ellipsoid error
        ground = float(haversine_m(lon[:1], lat[:1], lon[1:], lat[1:])[0])
        assert abs(grid / ground - 1.0) < 5e-3
