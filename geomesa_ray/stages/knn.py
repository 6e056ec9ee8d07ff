"""k-nearest-neighbor search over a point Dataset.

Parity target: GeoMesa ``KNearestNeighborSearchProcess`` (reference
geomesa-process/.../query/KNearestNeighborSearchProcess.scala:91-301):
per query point, run an expanding window search — start from an estimated
radius, grow by the Liu–Lim–Ng density estimate
``distance = sqrt(k / (pi * density))`` (:278-301), keep a bounded
k-nearest set, stop when the k-th distance fits inside the searched
window; distances are geodesic.

Ray Data shape: the query points (few) are broadcast; every data block
computes its local top-k per query with a vectorized haversine matrix
(map_batches partial — this searches ALL batches, the distributed
equivalent of the window search without its re-scan "holes" bookkeeping,
:263-267); a final ``groupby(query_id).map_groups`` merges partials to the
global top-k. One pass, no shuffle of the data side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from geomesa_ray.geo.distance import haversine_matrix_m
from geomesa_ray.util import default_concurrency


class KnnPartial:
    """Per-batch local top-k for every query point."""

    def __init__(self, queries_ref, k: int, id_col: str, lon_col: str, lat_col: str,
                 max_distance_m: float | None = None):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = np.asarray(q["query_id"], dtype=object)
        self.qlon = np.asarray(q["lon"], dtype=np.float64)
        self.qlat = np.asarray(q["lat"], dtype=np.float64)
        self.k = k
        self.id_col = id_col
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.max_distance_m = max_distance_m

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        lat = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        ok = ~(np.isnan(lon) | np.isnan(lat))
        lon, lat, ids = lon[ok], lat[ok], ids[ok]
        if len(lon) == 0 or len(self.qlon) == 0:
            id_type = batch.schema.field(self.id_col).type
            return pa.table({
                "query_id": pa.array([], type=pa.string()),
                "neighbor_id": pa.array([], type=id_type),
                "distance_m": pa.array([], type=pa.float64()),
            })
        d = haversine_matrix_m(self.qlon, self.qlat, lon, lat)  # (nq, np)
        kk = min(self.k, d.shape[1])
        # total order (distance, neighbor_id): exact-distance ties at the k
        # boundary must resolve identically in every partial and in the
        # final merge, or the global top-k is block-split-dependent
        tie = ids if ids.dtype.kind in "iu" else ids.astype(str)
        rows_l, cols_l = [], []
        for qi in range(d.shape[0]):
            order = np.lexsort((tie, d[qi]))[:kk]
            rows_l.append(np.full(len(order), qi))
            cols_l.append(order)
        rows = np.concatenate(rows_l)
        cols = np.concatenate(cols_l)
        dist = d[rows, cols]
        if self.max_distance_m is not None:
            keep = dist <= self.max_distance_m
            rows, cols, dist = rows[keep], cols[keep], dist[keep]
        return pa.table({
            "query_id": pa.array(self.qids[rows].astype(str)),
            "neighbor_id": pa.array(ids[cols]),
            "distance_m": pa.array(dist),
        })


def knn(
    ds,
    query_points,
    k: int = 10,
    id_col: str = "doc_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_distance_m: float | None = None,
    concurrency=None,
):
    """query_points: dict/DataFrame with query_id, lon, lat columns.
    Returns Dataset[(query_id, neighbor_id, distance_m)] — exact global
    top-k per query, ties broken by (distance, neighbor_id)."""
    if isinstance(query_points, pd.DataFrame):
        q = {c: query_points[c].to_numpy() for c in ("query_id", "lon", "lat")}
    else:
        q = {c: np.asarray(query_points[c]) for c in ("query_id", "lon", "lat")}
    qref = ray.put(q)

    partials = ds.map_batches(
        KnnPartial,
        fn_constructor_kwargs=dict(
            queries_ref=qref, k=k, id_col=id_col, lon_col=lon_col, lat_col=lat_col,
            max_distance_m=max_distance_m,
        ),
        batch_format="pyarrow",
        batch_size=65536,
        concurrency=concurrency or default_concurrency(),
    )

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["distance_m", "neighbor_id"]).head(k)

    return partials.groupby("query_id").map_groups(merge_topk, batch_format="pandas")
