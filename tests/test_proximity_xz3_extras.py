"""Proximity join, XZ3, grouped stats, extract error modes."""

import numpy as np
import pandas as pd
import pytest

from geomesa_ray.curves.xz3 import XZ3SFC
from geomesa_ray.geo.distance import haversine_matrix_m
from geomesa_ray.stages.extract import extract_geometry
from geomesa_ray.stages.proximity import proximity_join
from geomesa_ray.stages.stats import grouped_stats_scan


class TestProximity:
    def test_matches_bruteforce(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(41)
        n = 8000
        df = pd.DataFrame({
            "doc_id": [f"d{i}" for i in range(n)],
            "lon": rng.uniform(-30, 30, n),
            "lat": rng.uniform(20, 60, n),
        })
        q = pd.DataFrame({"lon": [0.0, 20.0], "lat": [45.0, 30.0]})
        r = 400_000
        out = proximity_join(rd.from_pandas(df).repartition(4), q, radius_m=r).to_pandas()
        d = haversine_matrix_m(q["lon"].to_numpy(), q["lat"].to_numpy(),
                               df["lon"].to_numpy(), df["lat"].to_numpy()).min(axis=0)
        expected = set(df["doc_id"].to_numpy()[d <= r])
        assert set(out["doc_id"]) == expected and len(expected) > 0
        got_d = dict(zip(out["doc_id"], out["nearest_m"]))
        full = dict(zip(df["doc_id"], d))
        for k, v in got_d.items():
            assert np.isclose(v, full[k])


class TestXZ3:
    def test_bin_and_code(self):
        xz3 = XZ3SFC("day", g=12)
        ms = np.array([86_400_000 * 10 + 5000])
        bins, codes = xz3.index_millis(
            np.array([1.0]), np.array([1.0]), np.array([1.5]), np.array([1.5]), ms
        )
        assert bins[0] == 10 and codes[0] > 0

    def test_ranges_cover(self):
        xz3 = XZ3SFC("day", g=12)
        ms = np.array([86_400_000 * 3 + 100])
        bins, codes = xz3.index_millis(
            np.array([10.0]), np.array([10.0]), np.array([10.2]), np.array([10.2]), ms
        )
        plan = xz3.ranges([(9, 9, 11, 11)], 86_400_000 * 3, 86_400_000 * 4)
        assert int(bins[0]) in plan
        assert any(lo <= codes[0] <= hi for lo, hi in plan[int(bins[0])])


class TestGroupedStats:
    def test_matches_pandas(self, ray_session, sf_small):
        import pyarrow.parquet as pq
        import ray.data as rd

        ds = rd.read_parquet(f"{sf_small}/events.parquet")
        res = grouped_stats_scan(ds, "event_type", "count;minmax(value);descriptive(value)")
        df = pq.read_table(f"{sf_small}/events.parquet").to_pandas()
        for et, g in df.groupby("event_type"):
            stats = res[et]
            assert stats[0].result() == len(g)
            assert stats[1].result() == (g["value"].min(), g["value"].max())
            assert np.isclose(stats[2].result()["mean"], g["value"].mean())


class TestExtractErrorModes:
    def _bad_batch(self):
        import pyarrow as pa

        from geomesa_ray.sources.synth import SPAN_STRUCT

        spans = pa.array(
            [
                [{"kind": "geo", "text": "POINT (1 2)", "media_ref": "", "offset": 0}],
                [{"kind": "geo", "text": "NOT A POINT", "media_ref": "", "offset": 0}],
                [{"kind": "text", "text": "hello", "media_ref": "", "offset": 0}],
            ],
            type=pa.list_(SPAN_STRUCT),
        )
        return pa.table({"doc_id": pa.array(["a", "b", "c"]), "spans": spans})

    def test_mask(self):
        out = extract_geometry(self._bad_batch())
        assert out.column("has_geom").to_pylist() == [True, False, False]

    def test_raise(self):
        with pytest.raises(ValueError, match="unparseable"):
            extract_geometry(self._bad_batch(), error_mode="raise")

    def test_dead_letter(self):
        out = extract_geometry(self._bad_batch(), error_mode="dead_letter")
        errs = out.column("geo_error").to_pylist()
        assert errs == [None, "NOT A POINT", None]
