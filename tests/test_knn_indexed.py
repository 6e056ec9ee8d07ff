"""Cell-pruned expanding-window kNN vs the exact full-scan answer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def indexed_dir(tmp_path_factory, ray_session):
    """Small indexed layout: derived event points + level-12 cell ids."""
    out = tmp_path_factory.mktemp("knn_indexed")
    ev = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["event_id", "value"])
    v = ev.column("value").to_numpy()
    lon = np.fmod(v * 3.14159, 360.0) - 180.0
    lat = np.fmod(v * 2.71828, 180.0) - 90.0
    from geomesa_ray.cells.zcell import ZCellGrid

    cells = ZCellGrid(12).cell_of_points(lon, lat)
    t = pa.table({
        "event_id": ev.column("event_id"),
        "lon": pa.array(lon), "lat": pa.array(lat),
        "cell_id": pa.array(cells),
    })
    pq.write_table(t.slice(0, 500), out / "part-0.parquet")
    pq.write_table(t.slice(500), out / "part-1.parquet")
    return str(out)


def test_knn_indexed_matches_full_scan(indexed_dir, ray_session):
    import ray.data as rd

    from geomesa_ray.stages.knn import knn, knn_indexed

    q = pd.DataFrame({"query_id": ["qa", "qb", "qc"],
                      "lon": [2.35, -74.0, 139.69],
                      "lat": [48.85, 40.7, 35.68]})
    pruned = knn_indexed(indexed_dir, q, k=5, level=12, r0_m=100_000,
                         id_col="event_id")
    full = knn(rd.read_parquet(indexed_dir), q, k=5, id_col="event_id").to_pandas()
    for qid in ["qa", "qb", "qc"]:
        a = pruned[pruned["query_id"] == qid]["neighbor_id"].tolist()
        b = full[full["query_id"] == qid]["neighbor_id"].tolist()
        assert a == b, (qid, a, b)


def test_knn_indexed_tiny_radius_expands(indexed_dir, ray_session):
    import ray.data as rd

    from geomesa_ray.stages.knn import knn, knn_indexed

    q = pd.DataFrame({"query_id": ["qz"], "lon": [0.0], "lat": [0.0]})
    pruned = knn_indexed(indexed_dir, q, k=3, level=12, r0_m=10.0, max_rounds=3,
                         id_col="event_id")
    full = knn(rd.read_parquet(indexed_dir), q, k=3, id_col="event_id").to_pandas()
    assert pruned["neighbor_id"].tolist() == full["neighbor_id"].tolist()
