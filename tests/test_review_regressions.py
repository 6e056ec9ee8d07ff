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


class TestRound4AdviceRegressions:
    """Regression tests for the round-3 ADVICE findings."""

    def test_jaccard_non_ascii_anchor(self, ray_session):
        # min shingle straddles a multibyte UTF-8 codepoint: the old
        # surrogateescape-decoded anchor crashed both fnv1a_str (encode)
        # and pa.array(...astype(str)) (decode)
        import ray.data as rd
        import pyarrow as pa
        from geomesa_ray.stages.dedup import jaccard_pairs

        t = pa.table({
            "doc_id": ["a", "b", "c"],
            "text": ["!!!!ézzzz", "!!!!ézzzz", "completely different body"],
        })
        out = jaccard_pairs(rd.from_arrow(t), threshold=0.5).to_pandas()
        assert len(out) == 1
        assert {out["left_id"][0], out["right_id"][0]} == {"a", "b"}
        assert out["jaccard"][0] == 1.0

    def test_jaccard_vectorized_matches_pairwise(self, ray_session):
        # value parity of the per-left-doc vectorized verify vs the exact
        # two-doc predicate, on docs with partial overlap
        import ray.data as rd
        import pyarrow as pa
        from geomesa_ray.stages.dedup import jaccard_pairs, ngram_jaccard

        texts = {
            "d1": "the quick brown fox jumps over the lazy dog",
            "d2": "the quick brown fox jumps over the lazy cat",
            "d3": "the quick brown fox leaps over the lazy dog",
        }
        t = pa.table({"doc_id": list(texts), "text": list(texts.values())})
        out = jaccard_pairs(rd.from_arrow(t), threshold=0.0).to_pandas()
        got = {(r.left_id, r.right_id): r.jaccard for r in out.itertuples()}
        for (a, b), j in got.items():
            # raw-byte shingles (no lowercasing) == ngram path here (ASCII lower already)
            assert abs(j - ngram_jaccard(texts[a], texts[b])) < 1e-12

    def test_asof_join_large_int64_payload(self, ray_session):
        import ray.data as rd
        import pyarrow as pa
        from geomesa_ray.stages.joins import asof_join

        big = 2 ** 53 + 12345  # not representable in float64
        left = rd.from_arrow(pa.table({
            "k": ["x", "x", "y"], "ts": pa.array([10, 20, 30], pa.int64()),
            "lid": pa.array([big + 1, big + 2, big + 3], pa.int64()),
        }))
        right = rd.from_arrow(pa.table({
            "k": ["x", "y"], "ts": pa.array([5, 25], pa.int64()),
            "rid": pa.array([big + 10, big + 20], pa.int64()),
        }))
        res = asof_join(left, right, on="k", ts_col="ts").to_pandas().sort_values("ts")
        assert res["lid"].tolist() == [big + 1, big + 2, big + 3]
        assert set(res["rid_r"]) == {big + 10, big + 20}

    def test_antimeridian_west_crossing(self):
        from geomesa_ray.functions.registry import f_st_antimeridian_safe_geom
        from geomesa_ray.geo.wkt import parse_wkt

        out = f_st_antimeridian_safe_geom(np.array(
            ["POLYGON ((-185 0, -175 0, -175 5, -185 5, -185 0))"], dtype=object))[0]
        g = parse_wkt(out)
        assert g["type"] == "MultiPolygon"
        xs = np.concatenate([np.asarray(p[0])[:, 0] for p in g["coords"]])
        assert xs.min() >= -180.0 and xs.max() <= 180.0
        # the sub- -180 part lands at [175, 180]
        assert (xs >= 175.0).any()

    def test_negative_point_buffer_raises(self):
        from geomesa_ray.functions.registry import f_st_buffer

        with pytest.raises(ValueError):
            f_st_buffer(np.array(["POINT (1 2)"], dtype=object), -3.0)

    def test_ivf_topk_exact_int_query_ids(self, ray_session):
        # non-string query ids must still drive the pruning/lookup
        import ray.data as rd
        from geomesa_ray.stages.similarity import ann_topk, ivf_topk_exact

        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(400, 16)).astype(np.float32)
        ds = rd.from_items([
            {"vec_id": i, "embedding": vecs[i].tolist()} for i in range(len(vecs))
        ])
        q = rng.normal(size=(2, 16)).astype(np.float32)
        exact = ivf_topk_exact(ds, q, [0, 1], k=5, n_lists=8, nprobe=2,
                               sample_rows=400).to_pandas()
        brute = ann_topk(ds, q, [0, 1], k=5).to_pandas()
        for qid in ("0", "1"):
            e = exact[exact["query_id"] == qid].sort_values(
                ["cosine", "neighbor_id"], ascending=[False, True])
            b = brute[brute["query_id"] == qid].sort_values(
                ["cosine", "neighbor_id"], ascending=[False, True])
            assert e["neighbor_id"].tolist() == b["neighbor_id"].tolist()
