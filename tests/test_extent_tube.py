"""Extent (bbox) join, tube select, route search — exact driver-side oracles
(reference style: TubeSelectProcess/RouteSearch tests with hand-checked
membership)."""

import numpy as np
import pandas as pd
import pytest

from geomesa_ray.geo.distance import haversine_m
from geomesa_ray.stages.extent_join import extent_join
from geomesa_ray.stages.tube import build_tube, route_search, tube_select


@pytest.fixture(scope="module")
def boxes(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(31)
    def mk(n, prefix):
        cx = rng.uniform(-60, 60, n)
        cy = rng.uniform(-40, 40, n)
        w = rng.uniform(0.1, 3.0, n)
        h = rng.uniform(0.1, 3.0, n)
        return pd.DataFrame({
            "doc_id": [f"{prefix}{i}" for i in range(n)],
            "xmin": cx - w, "ymin": cy - h, "xmax": cx + w, "ymax": cy + h,
        })
    left = mk(300, "L")
    right = mk(250, "R")
    return rd.from_pandas(left).repartition(4), rd.from_pandas(right).repartition(3), left, right


class TestExtentJoin:
    def test_matches_bruteforce_no_dupes(self, ray_session, boxes):
        lds, rds, left, right = boxes
        out = extent_join(lds, rds, level=5).to_pandas()
        got = set(zip(out["left_id"], out["right_id"]))
        assert len(out) == len(got), "duplicate pairs from multi-cell overlap"
        lx0, ly0, lx1, ly1 = (left[c].to_numpy() for c in ("xmin", "ymin", "xmax", "ymax"))
        rx0, ry0, rx1, ry1 = (right[c].to_numpy() for c in ("xmin", "ymin", "xmax", "ymax"))
        hit = (lx0[:, None] <= rx1[None, :]) & (lx1[:, None] >= rx0[None, :]) & \
              (ly0[:, None] <= ry1[None, :]) & (ly1[:, None] >= ry0[None, :])
        expected = {
            (left["doc_id"].iloc[i], right["doc_id"].iloc[j]) for i, j in zip(*np.nonzero(hit))
        }
        assert got == expected and len(expected) > 50


class TestTube:
    @pytest.fixture(scope="class")
    def data(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(37)
        n = 5000
        df = pd.DataFrame({
            "doc_id": [f"d{i}" for i in range(n)],
            "lon": rng.uniform(-20, 20, n),
            "lat": rng.uniform(30, 60, n),
            "ts": rng.integers(0, 10 * 3_600_000, n),
        })
        return rd.from_pandas(df).repartition(4), df

    def test_build_tube_bins(self):
        track = pd.DataFrame({
            "ts_ms": [0, 3_600_000 * 2],
            "lon": [0.0, 2.0],
            "lat": [45.0, 45.0],
        })
        bins = build_tube(track, 10_000, 3_600_000, gap_fill="nofill")
        assert len(bins) == 2
        filled = build_tube(track, 10_000, 3_600_000, gap_fill="line")
        assert len(filled) == 3  # interpolated middle bin

    def test_tube_select_membership(self, ray_session, data):
        ds, df = data
        track = pd.DataFrame({
            "ts_ms": [0, 3_600_000, 2 * 3_600_000],
            "lon": [0.0, 1.0, 2.0],
            "lat": [45.0, 45.5, 46.0],
        })
        buffer_m = 100_000
        out = tube_select(ds, track, buffer_m=buffer_m, bin_ms=3_600_000).to_pandas()
        # exact oracle: a row matches bin b iff its ts is in the window and
        # its distance to the NEAREST track sample in b is within the buffer
        bins = {b["t0"]: b for b in build_tube(track, buffer_m, 3_600_000)}
        for t0, b in bins.items():
            samples = np.asarray(b["samples"])
            d = haversine_m(
                df["lon"].to_numpy()[:, None], df["lat"].to_numpy()[:, None],
                samples[None, :, 0], samples[None, :, 1],
            ).min(axis=1)
            expected = set(
                df["doc_id"].to_numpy()[
                    (df["ts"].to_numpy() >= b["t0"]) & (df["ts"].to_numpy() < b["t1"]) & (d <= buffer_m)
                ]
            )
            got_bin = set(out[out["tube_bin"] == t0]["doc_id"])
            assert got_bin == expected

    def test_route_search(self, ray_session, data):
        ds, df = data
        route = [(-10.0, 45.0), (0.0, 45.0), (10.0, 45.0)]
        tol = 50_000
        out = route_search(ds, route, tolerance_m=tol).to_pandas()
        # oracle: lat within ~tol of 45 deg and lon within route x-range (+slack)
        got = set(out["doc_id"])
        # every match is within tolerance per the planar metric it reports
        assert (out["route_distance_m"] <= tol).all()
        # points very close to the line must be found
        ky = 111_194.9
        near = df[(np.abs(df["lat"] - 45.0) * ky < tol * 0.9) & (df["lon"] >= -10) & (df["lon"] <= 10)]
        assert set(near["doc_id"]) <= got


class TestRouteHeading:
    def test_heading_match_bidirectional(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.tube import route_search

        df = pd.DataFrame({
            "event_id": [1, 2, 3, 4],
            "lon": [0.1, 0.2, 0.3, 5.0],
            "lat": [0.01, -0.01, 0.0, 5.0],
            "heading": [85.0, 270.0, 0.0, 90.0],  # along, reverse, across, far
        })
        route = [(0.0, 0.0), (1.0, 0.0)]  # due east -> bearing 90
        got = route_search(rd.from_pandas(df), route, tolerance_m=50_000,
                           heading_col="heading", heading_tol_deg=30.0).to_pandas()
        assert sorted(got["event_id"].tolist()) == [1, 2]

    def test_no_heading_col_keeps_all_near(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.tube import route_search

        df = pd.DataFrame({"event_id": [1, 2], "lon": [0.1, 5.0], "lat": [0.0, 5.0]})
        got = route_search(rd.from_pandas(df), [(0.0, 0.0), (1.0, 0.0)],
                           tolerance_m=50_000).to_pandas()
        assert got["event_id"].tolist() == [1]
