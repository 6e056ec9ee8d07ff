import numpy as np
import pandas as pd
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


class TestDeltaMode:
    """DeltaWriter parity: per-block local dictionaries, unified merge."""

    def test_delta_roundtrip_unifies_dictionaries(self, ray_session, tmp_path):
        import ray.data as rd

        from geomesa_ray.stages.arrow_export import arrow_export_delta, merge_arrow_deltas

        df = pd.DataFrame({
            "id": np.arange(100),
            "cat": (["alpha"] * 30 + ["beta"] * 30 + ["gamma"] * 40),
            "v": np.linspace(0, 1, 100),
        })
        ds = rd.from_pandas(df).repartition(4)  # several blocks -> several deltas
        out_dir = str(tmp_path / "deltas")
        manifest = arrow_export_delta(ds, out_dir, dict_cols=["cat"], batch_size=16)
        assert manifest["rows"].sum() == 100
        assert len(manifest) >= 2  # genuinely multiple delta files

        merged = merge_arrow_deltas(out_dir, out_path=str(tmp_path / "merged.arrow"),
                                    sort_by="id")
        assert pa.types.is_dictionary(merged.schema.field("cat").type)
        got = merged.to_pandas().reset_index(drop=True)
        exp = df.sort_values("id").reset_index(drop=True)
        assert got["id"].tolist() == exp["id"].tolist()
        assert got["cat"].astype(str).tolist() == exp["cat"].tolist()
        # merged file re-reads identically
        from geomesa_ray.stages.arrow_export import read_arrow_export

        again = read_arrow_export(str(tmp_path / "merged.arrow"))
        assert again.num_rows == 100
