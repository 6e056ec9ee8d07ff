"""Density-grid (tile assignment) and kNN tests with exact driver-side
oracles (reference style: DensityScan / KNearestNeighborSearchProcess tests
with hand-checked neighbor sets)."""

import numpy as np
import pandas as pd
import pytest

from geomesa_ray.geo.distance import haversine_matrix_m
from geomesa_ray.stages.density import density_grid
from geomesa_ray.stages.knn import knn


@pytest.fixture(scope="module")
def points_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(77)
    n = 20_000
    df = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(n)],
            "lon": rng.uniform(-170, 170, n),
            "lat": rng.uniform(-80, 80, n),
            "w": rng.uniform(0, 2, n),
        }
    )
    return rd.from_pandas(df).repartition(8), df


class TestDensity:
    def test_counts_match_histogram(self, ray_session, points_ds):
        ds, df = points_ds
        out = density_grid(ds, -180, -90, 180, 90, width=64, height=32).to_pandas()
        # oracle: numpy 2d histogram with identical floor semantics
        i = np.floor((df["lon"] + 180) / (360 / 64)).astype(int).clip(0, 63)
        j = np.floor((df["lat"] + 90) / (180 / 32)).astype(int).clip(0, 31)
        expected = pd.DataFrame({"i": i, "j": j}).value_counts().to_dict()
        got = {(r.tile_i, r.tile_j): r.weight for r in out.itertuples()}
        assert got == {k: float(v) for k, v in expected.items()}
        assert out["weight"].sum() == len(df)

    def test_weighted(self, ray_session, points_ds):
        ds, df = points_ds
        out = density_grid(ds, -180, -90, 180, 90, width=8, height=4, weight_col="w").to_pandas()
        assert np.isclose(out["weight"].sum(), df["w"].sum())

    def test_envelope_filters(self, ray_session, points_ds):
        ds, df = points_ds
        out = density_grid(ds, 0, 0, 90, 45, width=16, height=16).to_pandas()
        inside = ((df["lon"] >= 0) & (df["lon"] <= 90) & (df["lat"] >= 0) & (df["lat"] <= 45)).sum()
        assert out["weight"].sum() == inside


class TestKnn:
    def test_exact_topk(self, ray_session, points_ds):
        ds, df = points_ds
        queries = pd.DataFrame(
            {"query_id": ["q0", "q1", "q2"], "lon": [0.0, 100.0, -120.0], "lat": [0.0, 45.0, -60.0]}
        )
        out = knn(ds, queries, k=5, id_col="doc_id").to_pandas()
        d = haversine_matrix_m(
            queries["lon"].to_numpy(), queries["lat"].to_numpy(),
            df["lon"].to_numpy(), df["lat"].to_numpy(),
        )
        for qi, qid in enumerate(queries["query_id"]):
            got = out[out["query_id"] == qid].sort_values("distance_m")
            expected_idx = np.argsort(d[qi])[:5]
            assert got["neighbor_id"].tolist() == df["doc_id"].to_numpy()[expected_idx].tolist()
            assert np.allclose(np.sort(got["distance_m"].to_numpy()), np.sort(d[qi][expected_idx]))

    def test_max_distance(self, ray_session, points_ds):
        ds, df = points_ds
        queries = pd.DataFrame({"query_id": ["q"], "lon": [0.0], "lat": [0.0]})
        out = knn(ds, queries, k=1000, max_distance_m=500_000).to_pandas()
        assert (out["distance_m"] <= 500_000).all()
        d = haversine_matrix_m(np.array([0.0]), np.array([0.0]), df["lon"].to_numpy(), df["lat"].to_numpy())
        assert len(out) == min(1000, int((d[0] <= 500_000).sum()))
