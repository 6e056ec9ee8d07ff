"""M0 end-to-end: synthesize corpus -> read -> extract -> assign -> write,
with the per-row span-sequence invariant, plus PIP join strategy tests
(reference style: S2IndexTest.scala exact expected ID sets)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from geomesa_ray.sources.synth import synthesize_corpus, synthesize_shard
from geomesa_ray.stages.assign import AssignCells
from geomesa_ray.stages.extract import extract_geometry
from geomesa_ray.stages.pip_join import (
    broadcast_pip_join,
    partitioned_pip_join,
    spatial_join,
)


@pytest.fixture(scope="module")
def corpus_dir(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("corpus")
    return synthesize_corpus(4000, seed=42, base=str(base), n_shards=4)


@pytest.fixture(scope="module")
def extracted_ds(ray_session, corpus_dir):
    import ray.data as rd

    ds = rd.read_parquet(corpus_dir)
    return ds.map_batches(extract_geometry, batch_format="pyarrow")


class TestM0Pipeline:
    def test_span_sequence_equality(self, ray_session, corpus_dir, extracted_ds, tmp_path):
        """In = out, per row, for (kind, text, media_ref, order)."""
        out_dir = str(tmp_path / "out")
        assigned = extracted_ds.map_batches(
            AssignCells(level=12, n_shards=4), batch_format="pyarrow"
        )
        assigned.write_parquet(out_dir)

        src = pq.read_table(corpus_dir).sort_by("doc_id")
        dst = pq.read_table(out_dir).select(["doc_id", "spans"]).sort_by("doc_id")
        assert src.column("doc_id").equals(dst.column("doc_id"))
        # span-sequence equality: compare flattened struct fields in order
        flat_src = pc.list_flatten(src.column("spans")).combine_chunks()
        flat_dst = pc.list_flatten(dst.column("spans")).combine_chunks()
        for field in ("kind", "text", "media_ref", "offset"):
            assert flat_src.field(field).equals(flat_dst.field(field)), f"span field {field} mutated"

    def test_deterministic_cells(self, ray_session, corpus_dir, extracted_ds):
        assign = AssignCells(level=12, n_shards=4)
        t1 = extracted_ds.map_batches(assign, batch_format="pyarrow").select_columns(
            ["doc_id", "cell_id"]
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        t2 = extracted_ds.map_batches(assign, batch_format="pyarrow").select_columns(
            ["doc_id", "cell_id"]
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert t1.equals(t2)

    def test_geom_fraction(self, extracted_ds):
        df = extracted_ds.select_columns(["has_geom"]).to_pandas()
        # ~70% of docs have a geo span (p(no geo span in d spans) averaged)
        assert 0.6 < df["has_geom"].mean() < 0.8


POLYS = {
    "ne_quadrant": "POLYGON ((0 0, 180 0, 180 90, 0 90, 0 0))",
    "europe_box": "POLYGON ((-10 35, 30 35, 30 60, -10 60, -10 35))",
    "tiny_paris": "POLYGON ((2.2 48.7, 2.5 48.7, 2.5 49.0, 2.2 49.0, 2.2 48.7))",
}


class TestPIPJoin:
    def _expected(self, extracted_ds):
        """Brute-force oracle on the driver."""
        from geomesa_ray.geo.predicates import Polygon

        df = extracted_ds.select_columns(["doc_id", "lon", "lat", "has_geom"]).to_pandas()
        df = df[df["has_geom"]]
        expected = set()
        for name, wkt in POLYS.items():
            poly = Polygon.from_wkt(wkt)
            inside = poly.contains(df["lon"].to_numpy(), df["lat"].to_numpy())
            for d in df["doc_id"].to_numpy()[inside]:
                expected.add((d, name))
        return expected

    def test_broadcast_matches_oracle(self, ray_session, extracted_ds):
        pts = extracted_ds.filter(expr="has_geom")
        joined = broadcast_pip_join(pts, POLYS, concurrency=2)
        df = joined.select_columns(["doc_id", "poly_name"]).to_pandas()
        got = set(zip(df["doc_id"], df["poly_name"]))
        assert got == self._expected(extracted_ds)

    def test_partitioned_matches_oracle(self, ray_session, extracted_ds):
        pts = extracted_ds.filter(expr="has_geom")
        joined = partitioned_pip_join(
            pts, POLYS, partition_level=5, n_salts=3, keep_cols=[]
        )
        df = joined.select_columns(["doc_id", "poly_name"]).to_pandas()
        got = set(zip(df["doc_id"], df["poly_name"]))
        assert got == self._expected(extracted_ds)
        # no duplicate (doc, poly) pairs from salting/replication
        assert len(df) == len(got)

    def test_chooser(self, ray_session, extracted_ds):
        pts = extracted_ds.filter(expr="has_geom")
        ds = spatial_join(pts, POLYS, broadcast_threshold=5000)
        # small set -> broadcast path returns the same matches
        df = ds.select_columns(["doc_id", "poly_name"]).to_pandas()
        assert set(zip(df["doc_id"], df["poly_name"])) == self._expected(extracted_ds)
