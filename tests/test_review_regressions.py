"""Regression tests for the round-1 code-review findings."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from geomesa_ray.cells.s2 import S2CellId
from geomesa_ray.cells.zcell import ZCellGrid
from geomesa_ray.geo.wkt import parse_points_wkt
from geomesa_ray.sources.synth import synthesize_corpus


class TestSynthPartialShards:
    def test_unique_ids_non_divisible(self, tmp_path):
        # 100 docs over 8 shards: per_shard=13, last shard partial
        d = synthesize_corpus(100, seed=1, base=str(tmp_path), n_shards=8)
        t = pq.read_table(d)
        ids = t.column("doc_id").to_pylist()
        assert t.num_rows == 100
        assert len(set(ids)) == 100, "duplicate doc ids across partial shards"

    def test_tiny_corpus_no_crash(self, tmp_path):
        d = synthesize_corpus(13, seed=1, base=str(tmp_path), n_shards=8)
        t = pq.read_table(d)
        assert t.num_rows == 13
        assert len(set(t.column("doc_id").to_pylist())) == 13


class TestS2CenterDecode:
    def test_nonleaf_centers_in_cell(self):
        rng = np.random.default_rng(9)
        lat = rng.uniform(-80, 80, 300)
        lng = rng.uniform(-180, 180, 300)
        leaf = S2CellId.from_latlng(lat, lng)
        for lvl in (0, 4, 8, 12, 20, 29):
            p = S2CellId.parent(leaf, lvl)
            clat, clng = S2CellId.to_latlng(p)
            re_enc = S2CellId.parent(S2CellId.from_latlng(clat, clng), lvl)
            assert np.array_equal(re_enc, p), f"center decodes outside cell at level {lvl}"


class TestCoverBboxConsistency:
    def test_boundary_coordinate(self):
        # the review's repro: a representable lon where naive float division
        # and the normalize path disagree by one cell
        lon = 59.85351562499998
        grid = ZCellGrid(12)
        cell = grid.cell_of_points(np.array([lon]), np.array([0.0]))[0]
        cover = set(grid.cover_bbox(lon - 1.0, -0.5, lon, 0.5).tolist())
        assert cell in cover

    def test_random_edges(self):
        rng = np.random.default_rng(10)
        grid = ZCellGrid(10)
        for _ in range(200):
            x = rng.uniform(-179, 179)
            y = rng.uniform(-89, 89)
            cell = grid.cell_of_points(np.array([x]), np.array([y]))[0]
            # bbox whose max edge is exactly the point
            cover = set(grid.cover_bbox(x - 0.7, y - 0.7, x, y).tolist())
            assert cell in cover


class TestTubeNearestSample:
    def test_point_near_far_flung_sample(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.tube import tube_select

        # bin with samples clustered at lon 0 plus one sample at lon 30;
        # a data point 5.6 km from the lone sample must match
        track = pd.DataFrame({
            "ts_ms": [0, 600_000, 1_200_000, 1_800_000, 2_400_000],
            "lon": [0.0, 0.1, -0.1, 0.05, 30.0],
            "lat": [45.0, 45.1, 44.9, 45.05, 45.0],
        })
        data = rd.from_items([{"doc_id": "x", "lon": 30.05, "lat": 45.0, "ts": 1_000_000}])
        out = tube_select(data, track, buffer_m=50_000, bin_ms=3_600_000).to_pandas()
        assert len(out) == 1 and out["doc_id"].iloc[0] == "x"
        # and a point far from every sample does not match
        far = rd.from_items([{"doc_id": "y", "lon": 15.0, "lat": 45.0, "ts": 1_000_000}])
        assert tube_select(far, track, buffer_m=50_000, bin_ms=3_600_000).count() == 0


class TestAttachWideAllNullColumn:
    def test_all_null_column_survives(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.joins import attach_wide

        left = rd.from_pandas(pd.DataFrame({
            "doc_id": ["a", "b"], "label": pd.Series([None, None], dtype=object),
        }))
        right = rd.from_pandas(pd.DataFrame({"doc_id": ["a", "b"], "payload": [1, 2]}))
        out = attach_wide(left, right, on="doc_id").to_pandas()
        assert set(out.columns) == {"doc_id", "label", "payload"}
        assert len(out) == 2


class TestQueryIntervalGuard:
    def test_intervals_without_ts_col_raise(self, ray_session, tmp_path):
        from geomesa_ray.pipelines.query import QuerySpec, query_indexed

        pq_path = str(tmp_path / "x.parquet")
        pq.write_table(
            pq.read_table("/root/testdata/sf0.001/events.parquet").slice(0, 10), pq_path
        )
        spec = QuerySpec(intervals=[(0, 10)])
        with pytest.raises(ValueError, match="ts_col"):
            query_indexed(pq_path, spec)


class TestWktStrictness:
    def test_multipoint_rejected_lowercase_accepted(self):
        lon, lat, valid = parse_points_wkt([
            "MULTIPOINT (1 2)",        # substring match must NOT count
            "point (1 2)",             # JTS accepts lowercase
            " POINT (3 4) ",           # surrounding whitespace ok
            "POINT (1 2) trailing",    # trailing junk rejected
        ])
        assert valid.tolist() == [False, True, True, False]
        assert lon[1] == 1.0 and lat[2] == 4.0
