"""Column-group re-attach: keys-only shuffle then span re-hydration with
byte-identical span sequences."""

import numpy as np
import pandas as pd
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from geomesa_ray.sources.synth import synthesize_corpus
from geomesa_ray.stages.extract import extract_geometry
from geomesa_ray.stages.joins import SortedLookup, attach, reattach_spans, semi_join
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


class TestSemiJoin:
    """Regression for the round-2 driver crash: a filter-derived right side
    with empty / schema-degraded blocks fed to acero `Dataset.join` raised
    "No match or multiple matches for FieldRef.Name(doc_id)". `semi_join`
    must survive exactly that block layout."""

    def _sides(self, n_blocks=8):
        import pandas as pd
        import ray.data as rd

        left = rd.from_pandas(
            [pd.DataFrame({"doc_id": [f"d{i:03d}" for i in range(b * 10, b * 10 + 10)],
                           "v": list(range(b * 10, b * 10 + 10))})
             for b in range(n_blocks)]
        )
        # right side mimics the minhash keep-filter: most blocks filter to EMPTY
        right = left.map_batches(
            lambda t: t.filter(pc.less(t.column("v"), 7)).select(["doc_id"]),
            batch_format="pyarrow",
        )
        return left, right

    def test_empty_filtered_blocks(self, ray_session):
        left, right = self._sides()
        out = semi_join(left, right, on="doc_id").to_pandas().sort_values("doc_id")
        assert out["doc_id"].tolist() == [f"d{i:03d}" for i in range(7)]
        assert out["v"].tolist() == list(range(7))

    def test_anti(self, ray_session):
        left, right = self._sides()
        out = semi_join(left, right, on="doc_id", anti=True).to_pandas()
        assert len(out) == 80 - 7
        assert out["v"].min() == 7

    def test_all_empty_right(self, ray_session):
        left, right = self._sides()
        empty = right.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")
        assert semi_join(left, empty, on="doc_id").count() == 0
        assert semi_join(left, empty, on="doc_id", anti=True).count() == 80

    def test_nested_left_payload(self, ray_session):
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        t = pa.table({
            "doc_id": ["a", "b", "c"],
            "spans": [[{"kind": "t", "off": 0}], [{"kind": "u", "off": 1}], []],
        })
        left = rd.from_arrow(t)
        right = rd.from_pandas(pd.DataFrame({"doc_id": ["b", "c"]}))
        out = semi_join(left, right, on="doc_id").to_pandas().sort_values("doc_id")
        assert out["doc_id"].tolist() == ["b", "c"]
        assert out["spans"].iloc[0][0]["kind"] == "u"


class TestSortedLookupEmpty:
    def test_empty_build_side_all_miss(self):
        lk = SortedLookup(np.array([], dtype=np.int64), val=np.array([], dtype=np.float64))
        found, vals = lk.probe(np.array([1, 2, 3]))
        assert not found.any()
        assert len(vals["val"]) == 3


class TestAsofJoin:
    def _mk(self, ray_session):
        import pandas as pd
        import ray.data as rd

        left = pd.DataFrame({
            "lid": [1, 2, 3, 4, 5],
            "key": [10, 10, 10, 20, 30],
            "ts": pd.to_datetime([100, 250, 50, 500, 900], unit="ms"),
            "payload": [1.0, 2.0, 3.0, 4.0, 5.0],
        })
        right = pd.DataFrame({
            "rid": [7, 8, 9, 11],
            "key": [10, 10, 20, 20],
            "ts": pd.to_datetime([100, 200, 400, 600], unit="ms"),
        })
        return rd.from_pandas(left), rd.from_pandas(right)

    def test_backward_semantics(self, ray_session):
        from geomesa_ray.stages.joins import asof_join

        l, r = self._mk(ray_session)
        out = asof_join(l, r, on="key", ts_col="ts", right_cols=["rid"]).to_pandas()
        got = {int(row.lid): int(row.rid_r) for row in out.itertuples()}
        # lid=1 ts=100: exact match rid=7; lid=2 ts=250: latest <=250 is rid=8
        # lid=3 ts=50: no prior view -> dropped; lid=4 ts=500 key=20 -> rid=9
        # lid=5 key=30: no right rows -> dropped
        assert got == {1: 7, 2: 8, 4: 9}
        assert out["rid_r"].dtype == np.int64
        assert out["lid"].dtype == np.int64

    def test_right_cols_projection_and_suffix(self, ray_session):
        from geomesa_ray.stages.joins import asof_join

        l, r = self._mk(ray_session)
        out = asof_join(l, r, on="key", ts_col="ts", suffix="_x").to_pandas()
        assert {"lid", "key", "ts", "payload", "rid_x", "ts_x"} == set(out.columns)
        # attached ts is the RIGHT row's timestamp
        row = out[out.lid == 2].iloc[0]
        assert row["ts_x"] == pd.Timestamp(200, unit="ms")
