import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.stages.arrow_export import arrow_export, read_arrow_export


class TestArrowExport:
    def test_roundtrip_with_dictionaries(self, ray_session, sf_small, tmp_path):
        import ray.data as rd
        import pyarrow.parquet as pq

        ds = rd.read_parquet(f"{sf_small}/events.parquet")
        path = str(tmp_path / "events.arrow")
        arrow_export(ds, path, dict_cols=["event_type"], sort_by="event_id")
        t = read_arrow_export(path)
        src = pq.read_table(f"{sf_small}/events.parquet").sort_by("event_id")
        assert t.num_rows == src.num_rows
        assert pa.types.is_dictionary(t.schema.field("event_type").type)
        # decoded values identical + sorted order honored
        assert t.column("event_type").to_pylist() == src.column("event_type").to_pylist()
        assert t.column("event_id").to_pylist() == src.column("event_id").to_pylist()

    def test_overflow_values_null(self, ray_session, tmp_path):
        import ray.data as rd

        rows = [{"k": f"v{i}", "n": i} for i in range(50)]
        ds = rd.from_items(rows)
        path = str(tmp_path / "d.arrow")
        arrow_export(ds, path, dict_cols=["k"], dict_top=10)
        t = read_arrow_export(path)
        vals = t.column("k").to_pylist()
        assert sum(v is None for v in vals) == 40  # outside top-10 -> null
        assert len(t.column("k").chunk(0).dictionary) <= 10
