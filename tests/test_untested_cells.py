"""Round 4: unit tests for the coverage rows VERDICT r3 marked `untested`
(uuidZ3 feature-id generation, IteratorStackCount analog, sample-based
hot-cell partition planning)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geomesa_ray.functions.registry import call


class TestZ3FeatureIdGenerator:
    """Z3FeatureIdGenerator.scala parity: ids carry a [bin][z3] prefix so
    feature ids cluster spatio-temporally; suffix is a content uuid."""

    def test_deterministic_and_prefixed(self):
        lon = np.array([2.35, 2.35, 139.69])
        lat = np.array([48.85, 48.85, 35.68])
        ms = np.array([1_700_000_000_000, 1_700_000_000_000, 1_700_000_000_000])
        content = np.array(["a", "a", "b"], dtype=object)
        out1 = call("uuidZ3", lon, lat, ms, content)
        out2 = call("uuidZ3", lon, lat, ms, content)
        assert list(out1) == list(out2)  # deterministic
        # identical (point, time, content) -> identical id
        assert out1[0] == out1[1]
        # format: 4-hex bin + 16-hex z3 + '-' + uuid
        head, _, tail = out1[0].partition("-")
        assert len(head) == 20 and int(head, 16) >= 0
        assert len(tail) > 30

    def test_spatial_clustering_prefix(self):
        # same week + nearby points share a z3 PREFIX; far point does not
        ms = np.full(3, 1_700_000_000_000)
        out = call("uuidZ3",
                   np.array([2.350, 2.351, -74.0]),
                   np.array([48.850, 48.851, 40.7]),
                   ms, np.array(["x", "y", "z"], dtype=object))
        near_a, near_b, far = (o.split("-")[0] for o in out)
        assert near_a[:4] == near_b[:4] == far[:4]  # same time bin
        common_near = len([1 for a, b in zip(near_a, near_b) if a == b])
        common_far = len([1 for a, b in zip(near_a, far) if a == b])
        assert sum(1 for a, b in zip(near_a[4:10], near_b[4:10]) if a == b) >= 5
        assert near_a[4:10] != far[4:10]


class TestIteratorStackCount:
    def test_counts_tasks_of_executed_dataset(self, ray_session):
        import ray.data as rd

        from geomesa_ray.state.introspect import stack_count

        ds = rd.range(10000, override_num_blocks=8).map_batches(
            lambda t: t, batch_format="pyarrow").materialize()
        out = stack_count(ds)
        assert out["total_tasks"] >= 1
        assert any(n for _, n, _ in out["stages"] if n)


class TestSampleBasedPlanning:
    def test_hot_cell_detected(self, ray_session):
        import ray.data as rd

        from geomesa_ray.stages.pip_join import detect_hot_cells
        from geomesa_ray.cells.zcell import ZCellGrid

        rng = np.random.default_rng(5)
        n = 200_000
        # 60% of points pile onto one city block; rest spread worldwide
        hot = rng.random(n) < 0.6
        lon = np.where(hot, 2.35 + rng.normal(0, 0.001, n),
                       rng.uniform(-180, 180, n))
        lat = np.where(hot, 48.85 + rng.normal(0, 0.001, n),
                       rng.uniform(-85, 85, n))
        ds = rd.from_arrow(pa.table({"lon": pa.array(lon), "lat": pa.array(lat)}))
        cells = detect_hot_cells(ds, partition_level=7, sample_rows=50_000)
        grid = ZCellGrid(7)
        paris = grid.cell_of_points(np.array([2.35]), np.array([48.85]), lenient=True)[0]
        assert paris in set(cells.tolist())
        assert len(cells) <= 5  # only genuinely hot cells flagged
