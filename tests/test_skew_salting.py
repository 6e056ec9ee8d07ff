"""Skew handling: hot-cell detection + salting must actually split the hot
shuffle groups; the partitioned join must stay exact with thousands of
polygons (the large-side regime the chooser routes to it)."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def skewed_points(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(61)
    # 80% of points piled on one city, 20% uniform — heavy skew
    n = 40_000
    hot = int(n * 0.8)
    lon = np.concatenate([rng.normal(2.35, 0.05, hot), rng.uniform(-180, 180, n - hot)])
    lat = np.concatenate([rng.normal(48.85, 0.05, hot), rng.uniform(-90, 90, n - hot)])
    df = pd.DataFrame({"doc_id": [f"d{i}" for i in range(n)], "lon": lon, "lat": lat})
    return rd.from_pandas(df).repartition(8), df


class TestSalting:
    def test_hot_cells_detected(self, ray_session, skewed_points):
        from geomesa_ray.stages.pip_join import detect_hot_cells

        ds, df = skewed_points
        hot = detect_hot_cells(ds, partition_level=6)
        assert len(hot) >= 1
        # the Paris cell is among them
        from geomesa_ray.cells.zcell import ZCellGrid

        paris = ZCellGrid(6).cell_of_points(np.array([2.35]), np.array([48.85]))[0]
        assert paris in hot

    def test_salting_splits_hot_groups(self, ray_session, skewed_points):
        import ray

        from geomesa_ray.stages.pip_join import _AssignPartition, detect_hot_cells

        ds, df = skewed_points
        hot = detect_hot_cells(ds, partition_level=6)

        def group_sizes(n_salts):
            assigned = ds.map_batches(
                _AssignPartition,
                fn_constructor_kwargs=dict(
                    partition_level=6, n_salts=n_salts, n_buckets=32,
                    hot_cells_ref=ray.put(hot), lon_col="lon", lat_col="lat",
                    id_col="doc_id",
                ),
                batch_format="pyarrow",
                concurrency=(1, 2),
            ).to_pandas()
            return assigned.groupby(["bucket", "salt"]).size()

        unsalted = group_sizes(1)
        salted = group_sizes(4)
        # the biggest shuffle group shrinks by ~the salt factor
        assert salted.max() < unsalted.max() * 0.45
        # and no rows were lost
        assert salted.sum() == unsalted.sum() == len(df)

    def test_partitioned_join_exact_with_many_polygons(self, ray_session, skewed_points):
        from geomesa_ray.geo.predicates import Polygon
        from geomesa_ray.stages.pip_join import spatial_join

        ds, df = skewed_points
        rng = np.random.default_rng(62)
        polys = {}
        for k in range(1500):
            cx, cy = rng.uniform(-170, 170), rng.uniform(-80, 80)
            w, h = rng.uniform(0.2, 2.0), rng.uniform(0.2, 2.0)
            polys[f"p{k}"] = (
                f"POLYGON (({cx-w} {cy-h}, {cx+w} {cy-h}, {cx+w} {cy+h}, {cx-w} {cy+h}, {cx-w} {cy-h}))"
            )
        # force the partitioned path (large polygon side)
        joined = spatial_join(ds, polys, broadcast_threshold=100,
                              partition_level=6, n_salts=4, keep_cols=[])
        got = set(zip(*[joined.to_pandas()[c] for c in ("doc_id", "poly_name")]))
        # brute-force oracle on a sample of polygons
        sample = list(polys.items())[:50]
        for name, wkt in sample:
            p = Polygon.from_wkt(wkt)
            inside = set(df["doc_id"].to_numpy()[p.contains(df["lon"].to_numpy(), df["lat"].to_numpy())])
            got_p = {d for d, n_ in got if n_ == name}
            assert got_p == inside, f"mismatch for {name}"
        # no duplicate pairs
        assert len(got) == joined.count()
