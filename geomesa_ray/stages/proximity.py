"""Proximity search: rows within a geodesic radius of any query point.

Parity target: ``ProximitySearchProcess`` (reference
geomesa-process/.../query/ProximitySearchProcess.scala:29-89): the small
input collection is turned into a buffered-geometry disjunction pushed into
the scan. Ray shape: query points broadcast once; each batch computes a
vectorized haversine matrix and keeps rows within the radius of ANY query
point (with a cheap per-point bbox pre-filter).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from geomesa_ray.geo.distance import geodesic_halfwidths, haversine_matrix_m
from geomesa_ray.util import default_concurrency


class ProximityProbe:
    def __init__(self, queries_ref, radius_m: float, lon_col: str, lat_col: str,
                 emit_nearest: bool = True):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qlon = np.asarray(q["lon"], dtype=np.float64)
        self.qlat = np.asarray(q["lat"], dtype=np.float64)
        self.radius_m = float(radius_m)
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.emit_nearest = emit_nearest
        # bbox pre-filter envelope around all query points; exact spherical
        # half-widths so the envelope always CONTAINS the radius disk (the
        # residual haversine keep below is the exact filter)
        dlon, dlat = geodesic_halfwidths(self.qlat, self.radius_m)
        self.xmin = self.qlon - dlon
        self.xmax = self.qlon + dlon
        self.ymin = self.qlat - dlat
        self.ymax = self.qlat + dlat

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        lat = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        cand = np.zeros(len(lon), dtype=bool)
        for k in range(len(self.qlon)):
            cand |= (
                (lon >= self.xmin[k]) & (lon <= self.xmax[k])
                & (lat >= self.ymin[k]) & (lat <= self.ymax[k])
            )
        idx = np.nonzero(cand)[0]
        if len(idx) == 0:
            out = batch.take(pa.array(idx))
            return out.append_column("nearest_m", pa.array(np.empty(0, dtype=np.float64)))
        d = haversine_matrix_m(self.qlon, self.qlat, lon[idx], lat[idx])
        dmin = d.min(axis=0)
        keep = dmin <= self.radius_m
        out = batch.take(pa.array(idx[keep]))
        return out.append_column("nearest_m", pa.array(dmin[keep]))


def proximity_join(ds, query_points, radius_m: float, lon_col="lon", lat_col="lat",
                   concurrency=None):
    """query_points: DataFrame/dict with lon, lat. Returns matching rows +
    ``nearest_m`` (distance to the closest query point)."""
    if isinstance(query_points, pd.DataFrame):
        q = {"lon": query_points["lon"].to_numpy(), "lat": query_points["lat"].to_numpy()}
    else:
        q = {"lon": np.asarray(query_points["lon"]), "lat": np.asarray(query_points["lat"])}
    ref = ray.put(q)
    return ds.map_batches(
        ProximityProbe,
        fn_constructor_kwargs=dict(queries_ref=ref, radius_m=radius_m,
                                   lon_col=lon_col, lat_col=lat_col),
        batch_format="pyarrow",
        concurrency=concurrency or default_concurrency(),
    )
