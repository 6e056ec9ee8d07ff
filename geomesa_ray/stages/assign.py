"""Cell / shard / time-bin assignment — the index-key stage.

Analog of the reference's ``toIndexKey`` write path (reference
geomesa-index-api/.../index/z3/Z3IndexKeySpace.scala:64-96: key =
[1B shard][2B time-bin][8B z3][id]): materialized here as columns
``shard: int16``, ``time_bin: int16`` (when a timestamp column is given),
``cell_id: int64`` on the Dataset, which downstream stages shuffle on.

A callable class so the curve/grid objects are built once per actor
(IteratorCache pattern); it is cheap enough to run as a stateless task too.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geomesa_ray.cells.s2 import S2CellId
from geomesa_ray.cells.shard import shard_of
from geomesa_ray.cells.zcell import ZCellGrid
from geomesa_ray.curves.binnedtime import BinnedTime
from geomesa_ray.curves.z3 import Z3SFC


class AssignExtentCells:
    """XZ2 key assignment for rows WITH spatial extent (bbox columns) — the
    XZ2/XZ3 key-space write path (reference
    geomesa-index-api/.../index/z2/XZ2IndexKeySpace.scala:44-71): adds
    ``xz2: int64`` (+ ``time_bin`` when a timestamp column is given, the
    XZ3 composite)."""

    def __init__(self, g: int = 12, n_shards: int = 4, id_col: str = "doc_id",
                 bbox_cols=("xmin", "ymin", "xmax", "ymax"),
                 ts_col: str | None = None, period: str = "week"):
        from geomesa_ray.curves.xz2 import XZ2SFC

        self.xz2 = XZ2SFC(g)
        self.n_shards = n_shards
        self.id_col = id_col
        self.bbox_cols = bbox_cols
        self.ts_col = ts_col
        self.period = period

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = [batch.column(c).to_numpy(zero_copy_only=False) for c in self.bbox_cols]
        codes = self.xz2.index(*cols, lenient=True)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        out = batch.append_column("xz2", pa.array(np.atleast_1d(codes), type=pa.int64()))
        out = out.append_column("shard", pa.array(shard_of(ids, self.n_shards), type=pa.int16()))
        if self.ts_col:
            from geomesa_ray.util import ts_to_millis

            bins, _ = BinnedTime.to_binned_time(ts_to_millis(batch.column(self.ts_col)), self.period)
            out = out.append_column("time_bin", pa.array(bins, type=pa.int16()))
        return out


class AssignCells:
    def __init__(
        self,
        level: int = 12,
        scheme: str = "zcell",
        n_shards: int = 4,
        id_col: str = "doc_id",
        lon_col: str = "lon",
        lat_col: str = "lat",
        ts_col: str | None = None,
        period: str = "week",
    ):
        self.level = level
        self.scheme = scheme
        self.n_shards = n_shards
        self.id_col = id_col
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.ts_col = ts_col
        self.period = period
        self.grid = ZCellGrid(level) if scheme == "zcell" else None
        # S3 keyspace (reference geomesa-index-api/.../index/s3/
        # S3IndexKeySpace.scala: [shard][bin][s2 cell]) = S2 scheme + a time
        # bin and NO z3 column; the z-curve offset only exists for zcell
        self.z3 = Z3SFC(period) if (ts_col and scheme == "zcell") else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        lat = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        valid = ~(np.isnan(lon) | np.isnan(lat))
        lon_c = np.where(valid, lon, 0.0)
        lat_c = np.where(valid, lat, 0.0)

        if self.scheme == "zcell":
            cells = self.grid.cell_of_points(lon_c, lat_c, lenient=True)
        elif self.scheme == "s2":
            cells = S2CellId.from_latlng(lat_c, lon_c, level=self.level)
        else:
            raise ValueError(f"unknown scheme {self.scheme}")
        cells = np.where(valid, cells, -1)

        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        shards = shard_of(ids, self.n_shards)

        out = batch.append_column("cell_id", pa.array(cells, type=pa.int64())).append_column(
            "shard", pa.array(shards, type=pa.int16())
        )
        if self.ts_col:
            from geomesa_ray.util import ts_to_millis

            millis = ts_to_millis(batch.column(self.ts_col))
            bins, offsets = BinnedTime.to_binned_time(millis, self.period)
            out = out.append_column("time_bin", pa.array(bins, type=pa.int16()))
            if self.z3 is not None:  # zcell scheme: full [bin][z3] composite
                z3 = self.z3.index(lon_c, lat_c, offsets, lenient=True)
                out = out.append_column("z3", pa.array(np.where(valid, z3, -1), type=pa.int64()))
        return out
