"""Resumable-output tests: skip-on-resume, atomic commits, span invariant,
metrics lineage (reference model: FS storage PartitionMetadata + restartable
MapReduce ingest)."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from geomesa_ray.sources.synth import synthesize_corpus
from geomesa_ray.state.manifest import Manifest, run_resumable, span_checksum


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("resume_corpus")
    d = synthesize_corpus(2000, seed=7, base=str(base), n_shards=8)
    shards = sorted(os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet"))
    return shards


def _pipeline(paths):
    import ray.data as rd

    from geomesa_ray.stages.assign import AssignCells
    from geomesa_ray.stages.extract import extract_geometry

    return (
        rd.read_parquet(paths)
        .map_batches(extract_geometry, batch_format="pyarrow")
        .map_batches(AssignCells(level=10, n_shards=2), batch_format="pyarrow")
    )


class TestResumable:
    def test_full_run_and_resume(self, ray_session, corpus, tmp_path):
        out = str(tmp_path / "out")
        m = run_resumable(corpus, _pipeline, out, unit_size=2, verify_spans=True)
        assert len(m.completed()) == 4
        s = m.summary()
        assert s["rows_in"] == 2000 and s["rows_out"] == 2000
        for u in m.completed():
            assert m.read(u)["span_invariant_ok"]

        # resume: delete 2 manifests + trash one unit's data; re-run completes
        os.remove(m.entry_path("u00001"))
        os.remove(m.entry_path("u00003"))
        shutil.rmtree(os.path.join(out, "part-u00001"))
        done_before = {u: m.read(u)["wall_time_s"] for u in m.completed()}
        m2 = run_resumable(corpus, _pipeline, out, unit_size=2, verify_spans=True)
        assert len(m2.completed()) == 4
        # untouched units were not reprocessed (same committed record)
        for u, wt in done_before.items():
            assert m2.read(u)["wall_time_s"] == wt
        # all rows present exactly once
        total = sum(
            pq.read_metadata(f).num_rows
            for u in m2.completed()
            for f in m2.read(u)["files"]
        )
        assert total == 2000

    def test_partial_output_ignored_without_manifest(self, ray_session, corpus, tmp_path):
        out = str(tmp_path / "out2")
        # fake a partial (crashed) unit dir with garbage
        os.makedirs(os.path.join(out, "part-u00000"))
        with open(os.path.join(out, "part-u00000", "junk.parquet"), "w") as f:
            f.write("not parquet")
        m = run_resumable(corpus[:2], _pipeline, out, unit_size=2)
        rec = m.read("u00000")
        assert rec["rows_out"] == sum(pq.read_metadata(p).num_rows for p in corpus[:2])
        assert all(os.path.basename(f) != "junk.parquet" for f in rec["files"])

    def test_metrics_fn(self, ray_session, corpus, tmp_path):
        out = str(tmp_path / "out3")

        def metrics(tables):
            import numpy as np

            cells = np.concatenate([t.column("cell_id").to_numpy() for t in tables])
            return {"distinct_cells": int(len(np.unique(cells[cells >= 0])))}

        m = run_resumable(corpus[:2], _pipeline, out, unit_size=2, metrics_fn=metrics)
        assert m.read("u00000")["metrics"]["distinct_cells"] > 10


class TestSpanChecksum:
    def test_detects_mutation(self, corpus):
        t = pq.read_table(corpus[0])
        a = span_checksum(t)
        assert a == span_checksum(pq.read_table(corpus[0]))  # deterministic
        # order-insensitive across row permutations
        assert a == span_checksum(t.take(list(reversed(range(t.num_rows)))))
        # but sensitive to content
        import pyarrow as pa
        import pyarrow.compute as pc

        spans = t.column("spans").combine_chunks()
        flat = pc.list_flatten(spans)
        texts = flat.field("text").to_pylist()
        texts[3] = texts[3] + "x"
        mutated = pa.StructArray.from_arrays(
            [flat.field("kind"), pa.array(texts), flat.field("media_ref"), flat.field("offset")],
            names=["kind", "text", "media_ref", "offset"],
        )
        new_spans = pa.ListArray.from_arrays(spans.offsets, mutated)
        t2 = t.set_column(t.schema.get_field_index("spans"), "spans", new_spans)
        assert span_checksum(t2) != a


class TestIntrospect:
    """IteratorStackCount analog: task counts parsed from ds.stats()."""

    def test_stack_count(self, ray_session):
        import ray.data as rd

        from geomesa_ray.state.introspect import stack_count

        ds = rd.range(10_000).map_batches(lambda t: t, batch_format="pyarrow").materialize()
        rep = stack_count(ds)
        assert rep["total_tasks"] >= 1
        assert any("MapBatches" in name for name, _, _ in rep["stages"])
