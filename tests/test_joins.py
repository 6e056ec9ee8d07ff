"""Column-group re-attach: keys-only shuffle then span re-hydration with
byte-identical span sequences."""

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from geomesa_ray.sources.synth import synthesize_corpus
from geomesa_ray.stages.extract import extract_geometry
from geomesa_ray.stages.joins import attach, reattach_spans
from geomesa_ray.stages.pip_join import partitioned_pip_join


class TestReattach:
    def test_spans_identical_after_roundtrip(self, ray_session, tmp_path):
        import ray.data as rd

        corpus = synthesize_corpus(3000, seed=17, base=str(tmp_path), n_shards=4)
        docs = rd.read_parquet(corpus)
        pts = docs.map_batches(extract_geometry, batch_format="pyarrow").filter(expr="has_geom")

        polys = {"eu": "POLYGON ((-10 35, 30 35, 30 60, -10 60, -10 35))"}
        # keys-only through the shuffle join, then re-attach the wide payload
        matched = partitioned_pip_join(pts, polys, partition_level=5, keep_cols=[])
        hydrated = reattach_spans(matched, docs).to_pandas()
        assert len(hydrated) > 0
        assert "spans" in hydrated.columns and "poly_name" in hydrated.columns

        # span sequences byte-identical to the source for every matched doc
        src = pq.read_table(corpus)
        src_map = {}
        flat_ids = src.column("doc_id").to_pylist()
        spans_py = src.column("spans").to_pylist()
        for d, s in zip(flat_ids, spans_py):
            src_map[d] = s
        for _, row in hydrated.head(50).iterrows():
            got = [
                (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]
            ]
            exp = [
                (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in src_map[row["doc_id"]]
            ]
            assert got == exp

    def test_attach_inner_semantics(self, ray_session):
        import pandas as pd
        import ray.data as rd

        left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "a": ["x", "y", "z"]}))
        right = rd.from_pandas(pd.DataFrame({"k": [2, 3, 4], "b": [20, 30, 40]}))
        out = attach(left, right, on="k").to_pandas().sort_values("k").reset_index(drop=True)
        assert out["k"].tolist() == [2, 3]
        assert out["b"].tolist() == [20, 30]
