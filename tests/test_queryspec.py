"""Query-lifecycle tests: ingest to an indexed layout, then QuerySpec
queries with exact expected ID sets (reference style: S2IndexTest.scala:29-70
— deterministic features, bbox+interval queries, exact containment)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from geomesa_ray.pipelines.query import QuerySpec, plan_cells, query_indexed
from geomesa_ray.sources.synth import synthesize_corpus
from geomesa_ray.stages.assign import AssignCells
from geomesa_ray.stages.extract import extract_geometry


@pytest.fixture(scope="module")
def indexed_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    base = tmp_path_factory.mktemp("ix")
    corpus = synthesize_corpus(5000, seed=13, base=str(base), n_shards=4)
    out = str(tmp_path_factory.mktemp("indexed"))
    (
        rd.read_parquet(corpus)
        .map_batches(extract_geometry, batch_format="pyarrow")
        .filter(expr="has_geom")
        .map_batches(AssignCells(level=12, n_shards=4), batch_format="pyarrow")
        .write_parquet(out)
    )
    return out


def _all_points(indexed_dir):
    t = pq.read_table(indexed_dir, columns=["doc_id", "lon", "lat"])
    return (
        t.column("doc_id").to_numpy(zero_copy_only=False),
        t.column("lon").to_numpy(),
        t.column("lat").to_numpy(),
    )


BBOX = "POLYGON ((-80 35, -70 35, -70 45, -80 45, -80 35))"  # around NYC
TRIANGLE = "POLYGON ((0 40, 10 40, 5 55, 0 40))"


class TestQuerySpec:
    def test_bbox_query_exact_ids(self, ray_session, indexed_dir):
        spec = QuerySpec(geometries=[BBOX], columns=["doc_id"])
        got = set(query_indexed(indexed_dir, spec).to_pandas()["doc_id"])
        ids, lon, lat = _all_points(indexed_dir)
        expected = set(ids[(lon >= -80) & (lon <= -70) & (lat >= 35) & (lat <= 45)])
        assert got == expected and len(got) > 0

    def test_bbox_only_detection(self):
        assert QuerySpec(geometries=[BBOX]).is_bbox_only()
        assert not QuerySpec(geometries=[BBOX, TRIANGLE]).is_bbox_only()

    def test_polygon_query_exact(self, ray_session, indexed_dir):
        from geomesa_ray.geo.predicates import Polygon

        spec = QuerySpec(geometries=[TRIANGLE], columns=["doc_id"])
        got = set(query_indexed(indexed_dir, spec).to_pandas()["doc_id"])
        ids, lon, lat = _all_points(indexed_dir)
        expected = set(ids[Polygon.from_wkt(TRIANGLE).contains(lon, lat)])
        assert got == expected

    def test_or_of_geometries(self, ray_session, indexed_dir):
        from geomesa_ray.geo.predicates import Polygon

        spec = QuerySpec(geometries=[BBOX, TRIANGLE], columns=["doc_id"])
        got = set(query_indexed(indexed_dir, spec).to_pandas()["doc_id"])
        ids, lon, lat = _all_points(indexed_dir)
        m = (lon >= -80) & (lon <= -70) & (lat >= 35) & (lat <= 45)
        m |= Polygon.from_wkt(TRIANGLE).contains(lon, lat)
        assert got == set(ids[m])

    def test_empty_region(self, ray_session, indexed_dir):
        # open-ocean box with no hot city: likely few/no docs; exact either way
        spec = QuerySpec(geometries=["POLYGON ((-39.9 -59.9, -39.5 -59.9, -39.5 -59.5, -39.9 -59.5, -39.9 -59.9))"])
        got = query_indexed(indexed_dir, spec).count()
        ids, lon, lat = _all_points(indexed_dir)
        exp = int(((lon >= -39.9) & (lon <= -39.5) & (lat >= -59.9) & (lat <= -59.5)).sum())
        assert got == exp

    def test_sort_and_limit(self, ray_session, indexed_dir):
        spec = QuerySpec(geometries=[BBOX], columns=["doc_id"], sort_by=["doc_id"], limit=5)
        got = query_indexed(indexed_dir, spec).to_pandas()["doc_id"].tolist()
        ids, lon, lat = _all_points(indexed_dir)
        expected = sorted(ids[(lon >= -80) & (lon <= -70) & (lat >= 35) & (lat <= 45)])[:5]
        assert got == expected

    def test_plan_cells_caps(self):
        spec = QuerySpec(geometries=["POLYGON ((-179 -89, 179 -89, 179 89, -179 89, -179 -89))"])
        assert plan_cells(spec, level=12, max_cells=2000) is None  # full scan
        small = QuerySpec(geometries=[BBOX])
        cells = plan_cells(small, level=8)
        assert cells is not None and 0 < len(cells) <= 2000


class TestQueryInterceptor:
    """QueryInterceptor parity: registered rewrites apply before planning."""

    def test_interceptor_rewrites_spec(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq_

        from geomesa_ray.cells.zcell import ZCellGrid
        from geomesa_ray.pipelines.query import (
            QuerySpec,
            clear_query_interceptors,
            query_indexed,
            register_query_interceptor,
        )

        rng = np.random.default_rng(8)
        lon = rng.uniform(-180, 180, 500)
        lat = rng.uniform(-90, 90, 500)
        t = pa.table({"fid": pa.array(np.arange(500)), "lon": pa.array(lon),
                      "lat": pa.array(lat),
                      "cell_id": pa.array(ZCellGrid(12).cell_of_points(lon, lat))})
        pq_.write_table(t, tmp_path / "p.parquet")

        @register_query_interceptor
        def clamp_to_east(spec):
            # security-filter style rewrite: force an eastern-hemisphere box
            return QuerySpec(geometries=["POLYGON ((0 -90, 180 -90, 180 90, 0 90, 0 -90))"],
                             intervals=spec.intervals, columns=spec.columns,
                             limit=spec.limit, sort_by=spec.sort_by)

        try:
            got = query_indexed(str(tmp_path), QuerySpec(columns=["fid", "lon"]),
                                level=12).to_pandas()
            assert (got["lon"] >= 0).all()
            assert len(got) == int((lon >= 0).sum())
        finally:
            clear_query_interceptors()
