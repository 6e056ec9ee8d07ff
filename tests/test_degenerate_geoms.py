"""Degenerate-geometry guards in the set-op path (round-5 verdict ask #8).

JTS raises TopologyException on invalid rings; our convention is an honest
NULL from st_intersection / st_difference / st_buffer (documented in the
function docstrings) and False from st_isValid. The fuzz here perturbs
star-convex fixture rings with the degeneracy classes the validity
pre-pass (`registry._geom_is_valid`) must catch — bowtie (vertex swap),
pinch (repeated non-consecutive vertex), collapse (shoelace-zero) — plus
consecutive duplicate vertices, which JTS allows and we must keep VALID.
No call may crash; valid x valid pairs must conserve area
(a = a∩b + a\\b)."""

import numpy as np
import pytest

from geomesa_ray.functions.registry import call


def _wkt_poly(ring: np.ndarray) -> str:
    closed = np.vstack([ring, ring[:1]])
    return "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in closed) + "))"


def _one(fn: str, a: str, b: str):
    return call(fn, np.array([a], dtype=object), np.array([b], dtype=object))[0]


def _area(wkt: str) -> float:
    return float(call("st_area", np.array([wkt], dtype=object))[0])


def _star_ring(rng: np.random.Generator, n: int, cx: float, cy: float) -> np.ndarray:
    """Random simple star-shaped CCW ring. Angular gaps are kept below pi
    (gaps drawn from [0.5, 1] then normalized, so max gap <= 2*pi/3 for
    n >= 5) — with a gap over pi the edge passes on the far side of the
    center and the angular-sort construction self-intersects."""
    gaps = rng.uniform(0.5, 1.0, n)
    ang = 2 * np.pi * np.cumsum(gaps) / gaps.sum()
    rad = rng.uniform(0.5, 2.0, n)
    return np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)


def _perturb(rng: np.random.Generator, ring: np.ndarray, kind: str) -> np.ndarray:
    r = ring.copy()
    n = len(r)
    if kind == "bowtie":  # swap two adjacent vertices -> crossing edges
        i = int(rng.integers(0, n - 1))
        r[[i, i + 1]] = r[[i + 1, i]]
    elif kind == "pinch":  # repeat a non-adjacent vertex
        i = int(rng.integers(0, n))
        j = (i + n // 2) % n
        r[j] = r[i]
    elif kind == "collapse":  # all vertices on one line -> zero shoelace
        t = np.linspace(0.0, 1.0, n)
        r = np.stack([r[0, 0] + t, r[0, 1] + 2.0 * t], axis=1)
    elif kind == "dupe_consecutive":  # allowed by JTS -> must stay valid
        i = int(rng.integers(0, n))
        r = np.insert(r, i, r[i], axis=0)
    return r


SETOPS = ("st_intersection", "st_difference")
INVALID_KINDS = ("bowtie", "pinch", "collapse")


class TestValidity:
    def test_pinch_and_collapse_detected(self):
        pinch = "POLYGON ((0 0, 2 0, 2 2, 1 1, 0 2, 1 1, 0 0))"
        flat = "POLYGON ((0 0, 1 1, 2 2, 0 0))"
        bow = "POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))"
        ok = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
        dupe = "POLYGON ((0 0, 0 0, 4 0, 4 4, 0 4, 0 0))"
        out = call("st_isValid", np.array([pinch, flat, bow, ok, dupe], dtype=object))
        assert list(out) == [False, False, False, True, True]

    def test_zero_area_hole_invalid(self):
        holed = ("POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), "
                 "(2 2, 4 4, 6 6, 2 2))")
        assert not call("st_isValid", np.array([holed], dtype=object))[0]


class TestSetOpNullSemantics:
    def test_invalid_inputs_yield_null(self):
        sq = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
        bow = "POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))"
        for fn in SETOPS:
            assert _one(fn, sq, bow) is None
            assert _one(fn, bow, sq) is None
        buf = call("st_buffer", np.array([bow], dtype=object), 0.5)
        assert buf[0] is None

    def test_consecutive_dupe_still_works(self):
        sq = "POLYGON ((0 0, 0 0, 4 0, 4 4, 0 4, 0 0))"
        tri = "POLYGON ((2 2, 6 2, 6 6, 2 2))"
        got = _one("st_intersection", sq, tri)
        assert got is not None and _area(got) == pytest.approx(2.0)


class TestFuzzPerturbedRings:
    def test_fuzz_no_crash_and_null_on_invalid(self):
        rng = np.random.default_rng(20260818)
        for trial in range(40):
            n = int(rng.integers(5, 12))
            a = _star_ring(rng, n, 0.0, 0.0)
            b = _star_ring(rng, int(rng.integers(5, 12)), 0.6, 0.3)
            kind = (INVALID_KINDS + ("dupe_consecutive", "none"))[trial % 5]
            bad = _perturb(rng, a, kind) if kind != "none" else a
            wa, wb = _wkt_poly(bad), _wkt_poly(b)
            for fn in SETOPS:
                got = _one(fn, wa, wb)  # must not raise
                if kind in INVALID_KINDS:
                    # the perturbation may occasionally leave the ring
                    # valid (e.g. a swap on a near-collinear corner); the
                    # contract is: null iff st_isValid says invalid
                    valid = bool(call("st_isValid",
                                      np.array([wa], dtype=object))[0])
                    assert (got is None) == (not valid), (kind, fn, wa)
                else:
                    assert got is not None, (kind, fn, wa)
            buf = call("st_buffer", np.array([wa], dtype=object), 0.1)[0]
            if kind in INVALID_KINDS:
                valid = bool(call("st_isValid", np.array([wa], dtype=object))[0])
                assert (buf is None) == (not valid)
            else:
                assert buf is not None

    def test_fuzz_valid_pairs_conserve_area(self):
        rng = np.random.default_rng(7)
        for _ in range(25):
            a = _star_ring(rng, int(rng.integers(5, 10)), 0.0, 0.0)
            b = _star_ring(rng, int(rng.integers(5, 10)), 0.4, -0.2)
            wa, wb = _wkt_poly(a), _wkt_poly(b)
            inter = _one("st_intersection", wa, wb)
            diff = _one("st_difference", wa, wb)
            ai = 0.0 if inter in (None, "POLYGON EMPTY") else _area(inter)
            ad = 0.0 if diff in (None, "POLYGON EMPTY") else _area(diff)
            assert ai + ad == pytest.approx(_area(wa), rel=1e-9), (wa, wb)
