"""Density / heatmap aggregation — raster-to-vector tile assignment.

Parity target: GeoMesa ``DensityScan`` (reference
geomesa-index-api/.../iterators/DensityScan.scala:29-136): snap each
geometry to a W x H grid over an envelope (``GridSnap`` floor semantics),
accumulate a weight per (i, j) cell per scan range, merge partials
client-side, decode to (x, y, weight) points (DensityProcess).

Ray Data shape: per-batch partial sparse grids (np.bincount over flat tile
ids — the map_batches partial), then one small ``groupby(tile).sum`` over
partials. The partial pass shrinks the shuffle from O(rows) to
O(occupied tiles x batches), GeoMesa's aggregating-scan pattern
(AggregatingScan.scala:26-116).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from geomesa_ray.geo.gridsnap import GridSnap
from geomesa_ray.util import default_concurrency


class DensityPartial:
    """map_batches stage: batch -> sparse (tile_i, tile_j, weight) partials."""

    def __init__(
        self,
        xmin: float,
        ymin: float,
        xmax: float,
        ymax: float,
        width: int = 256,
        height: int = 256,
        lon_col: str = "lon",
        lat_col: str = "lat",
        weight_col: str | None = None,
    ):
        self.snap = GridSnap(xmin, ymin, xmax, ymax, width, height)
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.weight_col = weight_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        lat = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        i = self.snap.i(lon)
        j = self.snap.j(lat)
        ok = (i >= 0) & (j >= 0) & ~(np.isnan(lon) | np.isnan(lat))
        flat = i[ok] * self.snap.height + j[ok]
        if self.weight_col:
            w = batch.column(self.weight_col).to_numpy(zero_copy_only=False)[ok]
            sums = np.bincount(flat, weights=w)
        else:
            sums = np.bincount(flat)
        occupied = np.nonzero(sums)[0]
        return pa.table(
            {
                "tile_i": pa.array((occupied // self.snap.height).astype(np.int32)),
                "tile_j": pa.array((occupied % self.snap.height).astype(np.int32)),
                "weight": pa.array(sums[occupied].astype(np.float64)),
            }
        )


def density_grid(
    ds,
    xmin: float = -180.0,
    ymin: float = -90.0,
    xmax: float = 180.0,
    ymax: float = 90.0,
    width: int = 256,
    height: int = 256,
    lon_col: str = "lon",
    lat_col: str = "lat",
    weight_col: str | None = None,
):
    """Dataset of points -> Dataset[(tile_i, tile_j, weight)] — final merge of
    per-batch partials. Adds ``x``/``y`` tile-center columns like
    DensityScan's decode."""
    from ray.data.aggregate import Sum

    partial = ds.map_batches(
        DensityPartial,
        fn_constructor_kwargs=dict(
            xmin=xmin, ymin=ymin, xmax=xmax, ymax=ymax, width=width, height=height,
            lon_col=lon_col, lat_col=lat_col, weight_col=weight_col,
        ),
        batch_format="pyarrow",
        batch_size=100_000,  # geomesa.density.batch.size analog (DensityScan.scala:58)
        concurrency=default_concurrency(),
    )
    merged = partial.groupby(["tile_i", "tile_j"]).aggregate(Sum("weight", alias_name="weight"))
    snap = GridSnap(xmin, ymin, xmax, ymax, width, height)

    def add_centers(t: pa.Table) -> pa.Table:
        i = t.column("tile_i").to_numpy(zero_copy_only=False)
        j = t.column("tile_j").to_numpy(zero_copy_only=False)
        return t.append_column("x", pa.array(snap.x(i))).append_column("y", pa.array(snap.y(j)))

    return merged.map_batches(add_centers, batch_format="pyarrow")
