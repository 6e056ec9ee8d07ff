"""Coordinate reprojection: EPSG:4326 (lon/lat) <-> EPSG:3857 (web mercator).

Analog of the reference's result reprojection (reference
geomesa-index-api/.../utils/Reprojection.scala, applied at
QueryPlanner.scala:86-90). The engine computes in 4326; 3857 is the tiling
CRS every slippy-map pipeline needs. Spherical-mercator math (public
formulas), vectorized numpy; latitudes clamped to the Mercator domain.
"""

from __future__ import annotations

import numpy as np

_R = 6378137.0  # WGS84 semi-major axis (spherical mercator radius)
MAX_LAT = 85.051128779806604  # atan(sinh(pi)) in degrees


def lonlat_to_mercator(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    x = np.radians(lon) * _R
    y = np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) * _R
    return x, y


def mercator_to_lonlat(x, y) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / _R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / _R)) - np.pi / 2.0)
    return lon, lat


def slippy_tile(lon, lat, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """Web-map tile indices (z/x/y scheme) — the raster-tile addressing the
    density grids feed."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    n = 1 << zoom
    tx = np.clip(((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    lat_r = np.radians(lat)
    ty = np.clip(
        ((1.0 - np.arcsinh(np.tan(lat_r)) / np.pi) / 2.0 * n).astype(np.int64), 0, n - 1
    )
    return tx, ty


def reproject_stage(lon_col: str = "lon", lat_col: str = "lat"):
    """map_batches fn adding mercator_x / mercator_y columns."""
    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        x, y = lonlat_to_mercator(
            t.column(lon_col).to_numpy(zero_copy_only=False),
            t.column(lat_col).to_numpy(zero_copy_only=False),
        )
        return t.append_column("mercator_x", pa.array(x)).append_column("mercator_y", pa.array(y))

    return fn


# ---------------------------------------------------------------------------
# WGS84 UTM (EPSG:326xx north / 327xx south) — ellipsoidal Transverse
# Mercator via the Krüger series (public formulas, e.g. Karney 2011 /
# Snyder; 6th-order in n), pure numpy. Extends the reference's arbitrary-CRS
# reprojection surface (Reprojection.scala) beyond the v1 4326<->3857 pair.
# ---------------------------------------------------------------------------

_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563
_UTM_K0 = 0.9996
_UTM_FE = 500_000.0
_UTM_FN_S = 10_000_000.0

_n = _WGS84_F / (2.0 - _WGS84_F)
_A_CAP = _WGS84_A / (1.0 + _n) * (1.0 + _n**2 / 4.0 + _n**4 / 64.0 + _n**6 / 256.0)
# forward series coefficients (alpha) and inverse (beta), 6th order in n
_ALPHA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180 - 127 * _n**5 / 288,
    13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440 + 281 * _n**5 / 630,
    61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880,
    49561 * _n**4 / 161280 - 179 * _n**5 / 168,
    34729 * _n**5 / 80640,
])
_BETA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360 - 81 * _n**5 / 512,
    _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105,
    17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480,
    4397 * _n**4 / 161280 - 11 * _n**5 / 504,
    4583 * _n**5 / 161280,
])
_E = np.sqrt(_WGS84_F * (2.0 - _WGS84_F))


def utm_zone(lon, lat=None) -> np.ndarray:
    """Standard zone number for a longitude (1..60)."""
    lon = np.asarray(lon, dtype=np.float64)
    return (np.floor((lon + 180.0) / 6.0).astype(np.int64) % 60) + 1


def lonlat_to_utm(lon, lat, zone: int | None = None):
    """-> (easting, northing, zone, south). Krüger forward series."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if zone is None:
        zone_arr = utm_zone(lon)
    else:
        zone_arr = np.full(lon.shape, int(zone), dtype=np.int64)
    lon0 = np.radians(zone_arr * 6.0 - 183.0)
    phi = np.radians(lat)
    lam = np.radians(lon) - lon0

    sin_phi = np.sin(phi)
    t = np.sinh(np.arctanh(sin_phi) - _E * np.arctanh(_E * sin_phi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))

    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)

    easting = _UTM_FE + _UTM_K0 * _A_CAP * eta
    northing = _UTM_K0 * _A_CAP * xi
    south = lat < 0
    northing = np.where(south, northing + _UTM_FN_S, northing)
    return easting, northing, zone_arr, south


def utm_to_lonlat(easting, northing, zone, south=False):
    """Inverse Krüger series -> (lon, lat) degrees."""
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)
    zone = np.asarray(zone, dtype=np.int64)
    south = np.broadcast_to(np.asarray(south, dtype=bool), easting.shape)
    northing = np.where(south, northing - _UTM_FN_S, northing)

    xi = northing / (_UTM_K0 * _A_CAP)
    eta = (easting - _UTM_FE) / (_UTM_K0 * _A_CAP)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)

    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for _ in range(6):  # fixed-point: conformal -> geodetic latitude
        s = np.sin(phi)
        phi = np.arcsin(np.clip(np.tanh(np.arctanh(np.clip(np.sin(chi), -1, 1))
                                        + _E * np.arctanh(_E * s)), -1.0, 1.0))
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    lon0 = np.radians(zone * 6.0 - 183.0)
    return np.degrees(lam + lon0), np.degrees(phi)


# ---------------------------------------------------------------------------
# Conic projections — Lambert Conformal Conic (2SP) and Albers Equal Area
# (2SP), ellipsoidal forms from Snyder, "Map Projections — A Working
# Manual" (USGS PP 1395, public domain): LCC eqs. 14-15/15-1..15-5, Albers
# eqs. 14-12..14-21. These are the families behind most regional grids
# (US State Plane LCC zones, EPSG:5070 CONUS Albers, Canada LCC), closing
# more of the reference's arbitrary-CRS surface (Reprojection.scala).
# ---------------------------------------------------------------------------


def _m(phi, e):
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - e * e * s * s)


def _t(phi, e):
    s = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)


def _q(phi, e):
    s = np.sin(phi)
    return (1.0 - e * e) * (
        s / (1.0 - e * e * s * s) - (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
    )


class LambertConformalConic:
    """Ellipsoidal LCC 2SP (Snyder 15-1..15-5), vectorized forward/inverse."""

    def __init__(self, lat1: float, lat2: float, lat0: float, lon0: float,
                 false_e: float = 0.0, false_n: float = 0.0,
                 a: float = _WGS84_A, f: float = _WGS84_F):
        self.a, self.e = a, np.sqrt(f * (2.0 - f))
        p1, p2, p0 = np.radians([lat1, lat2, lat0])
        m1, m2 = _m(p1, self.e), _m(p2, self.e)
        t1, t2, t0 = _t(p1, self.e), _t(p2, self.e), _t(p0, self.e)
        self.n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2)) if lat1 != lat2 else np.sin(p1)
        self.F = m1 / (self.n * t1 ** self.n)
        self.rho0 = a * self.F * t0 ** self.n
        self.lon0 = np.radians(lon0)
        self.fe, self.fn = false_e, false_n

    def forward(self, lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        rho = self.a * self.F * _t(phi, self.e) ** self.n
        th = self.n * (lam - self.lon0)
        return rho * np.sin(th) + self.fe, self.rho0 - rho * np.cos(th) + self.fn

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.fe
        y = self.rho0 - (np.asarray(y, dtype=np.float64) - self.fn)
        rho = np.sign(self.n) * np.hypot(x, y)
        t = (rho / (self.a * self.F)) ** (1.0 / self.n)
        th = np.arctan2(np.sign(self.n) * x, np.sign(self.n) * y)
        phi = np.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(8):  # Snyder 7-9 fixed point
            s = self.e * np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(t * ((1.0 - s) / (1.0 + s)) ** (self.e / 2.0))
        return np.degrees(th / self.n + self.lon0), np.degrees(phi)


class AlbersEqualArea:
    """Ellipsoidal Albers 2SP (Snyder 14-12..14-21), vectorized."""

    def __init__(self, lat1: float, lat2: float, lat0: float, lon0: float,
                 false_e: float = 0.0, false_n: float = 0.0,
                 a: float = _WGS84_A, f: float = _WGS84_F):
        self.a, self.e = a, np.sqrt(f * (2.0 - f))
        p1, p2, p0 = np.radians([lat1, lat2, lat0])
        m1, m2 = _m(p1, self.e), _m(p2, self.e)
        q1, q2, q0 = _q(p1, self.e), _q(p2, self.e), _q(p0, self.e)
        self.n = (m1 * m1 - m2 * m2) / (q2 - q1) if lat1 != lat2 else np.sin(p1)
        self.C = m1 * m1 + self.n * q1
        self.rho0 = a * np.sqrt(self.C - self.n * q0) / self.n
        self.lon0 = np.radians(lon0)
        self.fe, self.fn = false_e, false_n

    def forward(self, lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        rho = self.a * np.sqrt(self.C - self.n * _q(phi, self.e)) / self.n
        th = self.n * (lam - self.lon0)
        return rho * np.sin(th) + self.fe, self.rho0 - rho * np.cos(th) + self.fn

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.fe
        y = self.rho0 - (np.asarray(y, dtype=np.float64) - self.fn)
        rho = np.hypot(x, y)
        q = (self.C - (rho * self.n / self.a) ** 2) / self.n
        th = np.arctan2(np.sign(self.n) * x, np.sign(self.n) * y)
        e2 = self.e * self.e
        phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        for _ in range(10):  # Snyder 3-16 fixed point
            s = np.sin(phi)
            es = self.e * s
            phi = phi + (1.0 - e2 * s * s) ** 2 / (2.0 * np.cos(phi)) * (
                q / (1.0 - e2)
                - s / (1.0 - e2 * s * s)
                + (1.0 / (2.0 * self.e)) * np.log((1.0 - es) / (1.0 + es))
            )
        return np.degrees(th / self.n + self.lon0), np.degrees(phi)


# ---------------------------------------------------------------------------
# Generalized Transverse Mercator (arbitrary ellipsoid / k0 / origin /
# false offsets) — the same 6th-order Krüger series as the UTM fast path
# above, parameterized so national TM grids (OSGB, NZTM, MGA, state-plane
# TM zones) come from a parameter table instead of new code.
# ---------------------------------------------------------------------------


def _krueger_coeffs(n: float):
    alpha = np.array([
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180 - 127 * n**5 / 288,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440 + 281 * n**5 / 630,
        61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880,
        49561 * n**4 / 161280 - 179 * n**5 / 168,
        34729 * n**5 / 80640,
    ])
    beta = np.array([
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360 - 81 * n**5 / 512,
        n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105,
        17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480,
        4397 * n**4 / 161280 - 11 * n**5 / 504,
        4583 * n**5 / 161280,
    ])
    return alpha, beta


class TransverseMercator:
    """Ellipsoidal TM via the Krüger series, with latitude-of-origin
    meridian-arc offset — covers OSGB / NZTM / MGA / state-plane TM zones."""

    def __init__(self, lon0: float, lat0: float = 0.0, k0: float = 0.9996,
                 false_e: float = 0.0, false_n: float = 0.0,
                 a: float = _WGS84_A, f: float = _WGS84_F):
        n = f / (2.0 - f)
        self.A = a / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0 + n**6 / 256.0)
        self.alpha, self.beta = _krueger_coeffs(n)
        self.e = np.sqrt(f * (2.0 - f))
        self.k0 = k0
        self.lon0 = np.radians(lon0)
        self.fe, self.fn = false_e, false_n
        self.m0 = self._arc(np.radians(lat0)) if lat0 != 0.0 else 0.0

    def _arc(self, phi: float) -> float:
        """Meridian arc length from the equator (Krüger xi at lam=0)."""
        s = np.sin(phi)
        t = np.sinh(np.arctanh(s) - self.e * np.arctanh(self.e * s))
        xi_p = np.arctan(t)
        xi = xi_p + sum(a * np.sin(2 * j * xi_p)
                        for j, a in enumerate(self.alpha, start=1))
        return float(self.A * xi)

    def forward(self, lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64)) - self.lon0
        s = np.sin(phi)
        t = np.sinh(np.arctanh(s) - self.e * np.arctanh(self.e * s))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
        xi, eta = xi_p.copy(), eta_p.copy()
        for j, a in enumerate(self.alpha, start=1):
            xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
            eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
        return (self.fe + self.k0 * self.A * eta,
                self.fn + self.k0 * (self.A * xi - self.m0))

    def inverse(self, x, y):
        xi = (np.asarray(y, dtype=np.float64) - self.fn + self.k0 * self.m0) / (self.k0 * self.A)
        eta = (np.asarray(x, dtype=np.float64) - self.fe) / (self.k0 * self.A)
        xi_p, eta_p = xi.copy(), eta.copy()
        for j, b in enumerate(self.beta, start=1):
            xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        chi = np.arcsin(np.clip(np.sin(xi_p) / np.cosh(eta_p), -1.0, 1.0))
        phi = chi.copy()
        for _ in range(8):
            s = np.sin(phi)
            phi = np.arcsin(np.clip(np.tanh(np.arctanh(np.clip(np.sin(chi), -1, 1))
                                            + self.e * np.arctanh(self.e * s)), -1.0, 1.0))
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        return np.degrees(lam + self.lon0), np.degrees(phi)


class PolarStereographic:
    """Ellipsoidal Polar Stereographic, Snyder PP1395 eqs. 21-33..21-41.

    Variant B (standard parallel ``lat_ts``: EPSG 3031/3413) or variant A
    (scale ``k0`` at the pole: UPS). ``south=True`` mirrors the aspect.
    Conventions match EPSG: for the north aspect y points from the pole
    toward ``lon0 + 180``; for the south aspect toward ``lon0``."""

    def __init__(self, lat_ts: float | None, lon0: float,
                 false_e: float = 0.0, false_n: float = 0.0,
                 south: bool = False, k0: float | None = None,
                 a: float = _WGS84_A, f: float = _WGS84_F):
        self.a, self.e = a, np.sqrt(f * (2.0 - f))
        self.south = south
        self.lon0 = np.radians(lon0)
        self.fe, self.fn = false_e, false_n
        e = self.e
        if k0 is not None:  # variant A: rho = 2 a k0 t / sqrt(...)
            self.rho_per_t = (2.0 * a * k0
                              / np.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e)))
        else:  # variant B: k = 1 at lat_ts (eq. 21-34)
            pc = np.radians(abs(lat_ts))
            self.rho_per_t = a * _m(pc, e) / _t(pc, e)

    def forward(self, lon, lat):
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        if self.south:
            phi, lam = -phi, -lam
        rho = self.rho_per_t * _t(phi, self.e)
        dl = lam - (-self.lon0 if self.south else self.lon0)
        x = rho * np.sin(dl)
        y = -rho * np.cos(dl)
        if self.south:
            x, y = -x, -y
        return x + self.fe, y + self.fn

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.fe
        y = np.asarray(y, dtype=np.float64) - self.fn
        if self.south:
            x, y = -x, -y
        rho = np.hypot(x, y)
        t = rho / self.rho_per_t
        phi = np.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(8):  # Snyder 7-9 fixed point
            s = self.e * np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                t * ((1.0 - s) / (1.0 + s)) ** (self.e / 2.0))
        lam = (-self.lon0 if self.south else self.lon0) + np.arctan2(x, -y)
        if self.south:
            phi, lam = -phi, -lam
        return np.degrees(lam), np.degrees(phi)


class _ScaledCRS:
    """Unit adapter: publishes a projection whose axis unit is not the
    meter (US survey foot state-plane zones)."""

    def __init__(self, proj, meters_per_unit: float):
        self.proj, self.s = proj, meters_per_unit

    def forward(self, lon, lat):
        x, y = self.proj.forward(lon, lat)
        return x / self.s, y / self.s

    def inverse(self, x, y):
        return self.proj.inverse(np.asarray(x, dtype=np.float64) * self.s,
                                 np.asarray(y, dtype=np.float64) * self.s)


# published reference ellipsoids (public EPSG registry values)
_GRS80_A, _GRS80_F = 6378137.0, 1.0 / 298.257222101
_AIRY_A, _AIRY_F = 6377563.396, 1.0 / 299.3249646
_CLARKE66_A, _CLARKE66_F = 6378206.4, 1.0 - (1.0 - 0.00676866) ** 0.5
_FT_US = 1200.0 / 3937.0  # US survey foot in meters

#: Named projected CRS built from the three kernels (LCC 2SP / Albers 2SP /
#: TM). Parameters are the published EPSG definitions. Geographic input is
#: interpreted on each CRS's own datum (no datum shift — NAD83/ETRS89/GDA94
#: agree with WGS84 at the meter level; NAD27 entries take NAD27 lon/lat,
#: exactly as Snyder's worked examples do).
PROJECTED_CRS = {
    # CONUS Albers (EPSG:5070 — NAD83/GRS80; GRS80 f matches WGS84 to 1e-9)
    "EPSG:5070": lambda: AlbersEqualArea(29.5, 45.5, 23.0, -96.0, 0.0, 0.0),
    # Canada Atlas Lambert (EPSG:3978)
    "EPSG:3978": lambda: LambertConformalConic(49.0, 77.0, 49.0, -95.0, 0.0, 0.0),
    # Europe conformal (EPSG:3034, ETRS89 LCC)
    "EPSG:3034": lambda: LambertConformalConic(35.0, 65.0, 52.0, 10.0, 4_000_000.0, 2_800_000.0),
    # US National Atlas Equal Area-ish CONUS check grid
    "EPSG:102003": lambda: AlbersEqualArea(29.5, 45.5, 37.5, -96.0, 0.0, 0.0),
    # --- national grids / state plane (round 4) ---
    # France Lambert-93 (RGF93, GRS80)
    "EPSG:2154": lambda: LambertConformalConic(
        44.0, 49.0, 46.5, 3.0, 700_000.0, 6_600_000.0, a=_GRS80_A, f=_GRS80_F),
    # Great Britain OSGB36 National Grid (Airy 1830, TM)
    "EPSG:27700": lambda: TransverseMercator(
        -2.0, 49.0, 0.9996012717, 400_000.0, -100_000.0, a=_AIRY_A, f=_AIRY_F),
    # New Zealand NZTM2000 (GRS80, TM)
    "EPSG:2193": lambda: TransverseMercator(
        173.0, 0.0, 0.9996, 1_600_000.0, 10_000_000.0, a=_GRS80_A, f=_GRS80_F),
    # Australia MGA zone 55 (GDA94/GRS80 — UTM 55S parameters)
    "EPSG:28355": lambda: TransverseMercator(
        147.0, 0.0, 0.9996, 500_000.0, 10_000_000.0, a=_GRS80_A, f=_GRS80_F),
    # US State Plane NAD83 California zone 3 (LCC, meters): SP 37°04'/38°26',
    # origin 36°30'N 120°30'W, FE 2,000,000 FN 500,000
    "EPSG:26943": lambda: LambertConformalConic(
        37.0 + 4 / 60, 38.0 + 26 / 60, 36.5, -120.5,
        2_000_000.0, 500_000.0, a=_GRS80_A, f=_GRS80_F),
    # US State Plane NAD83 Maryland (LCC, meters): SP 38°18'/39°27',
    # origin 37°40'N 77°W, FE 400,000
    "EPSG:26985": lambda: LambertConformalConic(
        38.3, 39.45, 37.0 + 40 / 60, -77.0,
        400_000.0, 0.0, a=_GRS80_A, f=_GRS80_F),
    # Antarctic Polar Stereographic (WGS84, lat_ts -71, lon0 0)
    "EPSG:3031": lambda: PolarStereographic(-71.0, 0.0, 0.0, 0.0, south=True),
    # NSIDC Sea Ice Polar Stereographic North (WGS84, lat_ts 70, lon0 -45)
    "EPSG:3413": lambda: PolarStereographic(70.0, -45.0, 0.0, 0.0),
    # Universal Polar Stereographic North / South (variant A, k0 0.994)
    "EPSG:32661": lambda: PolarStereographic(
        None, 0.0, 2_000_000.0, 2_000_000.0, k0=0.994),
    "EPSG:32761": lambda: PolarStereographic(
        None, 0.0, 2_000_000.0, 2_000_000.0, south=True, k0=0.994),
    # US State Plane NAD27 Texas South Central (LCC, US survey feet —
    # Snyder PP1395's state-plane parameter set): SP 28°23'/30°17',
    # origin 27°50'N 99°W, FE 2,000,000 ftUS
    "EPSG:32040": lambda: _ScaledCRS(LambertConformalConic(
        28.0 + 23 / 60, 30.0 + 17 / 60, 27.0 + 50 / 60, -99.0,
        2_000_000.0 * _FT_US, 0.0, a=_CLARKE66_A, f=_CLARKE66_F), _FT_US),
}


def get_projection(code: str):
    """Projected-CRS factory: 'EPSG:xxxx' -> projection object with
    vectorized forward/inverse. UTM codes (326xx/327xx) route to the
    Krüger implementation via a tiny adapter."""
    code = code.upper()
    if code in PROJECTED_CRS:
        return PROJECTED_CRS[code]()
    if code.startswith("EPSG:326") or code.startswith("EPSG:327"):
        zone = int(code[8:])
        south = code.startswith("EPSG:327")

        class _UTM:
            def forward(self, lon, lat):
                e, n, _, _ = lonlat_to_utm(lon, lat, zone=zone)
                if south:
                    n = np.asarray(n) + _UTM_FN_S * (np.asarray(lat) >= 0)
                return e, n

            def inverse(self, x, y):
                return utm_to_lonlat(x, y, np.full(np.shape(x), zone), south=south)

        return _UTM()
    raise KeyError(f"unknown projected CRS {code!r}; known: {sorted(PROJECTED_CRS)} + UTM 326xx/327xx")
