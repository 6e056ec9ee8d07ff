"""Extent (bbox x bbox) spatial join — geometries with spatial extension.

Parity target: the reference's grid-partitioned join where features with
extent are duplicated into every intersecting envelope
(geomesa-spark/.../RelationUtils.gridIdMapper:39-53 +
GeoMesaJoinRelation.scala:41-91 sweepline), and the XZ2 index for extent
rows (XZ2SFC). The reference leaves duplicate matches unfiltered
(RelationUtils.scala:38 "TODO: Filter duplicates"); here the dedup is a
first-class final stage keyed on (left_id, right_id).

Shape: both sides explode to covering cells at a coarse level, cells hash
into ~2xCPU buckets, one groupby co-shuffles, each group runs a vectorized
bbox-overlap test (the sweepline candidate step) + optional exact
predicate; duplicates from multi-cell overlap are removed by a
groupby(left_id, right_id) head(1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from geomesa_ray.cells.shard import fnv1a_u64
from geomesa_ray.cells.zcell import ZCellGrid
from geomesa_ray.util import default_concurrency


class _ExplodeExtents:
    """map_batches: each row duplicated into every covering cell's bucket.

    Expects bbox columns (xmin, ymin, xmax, ymax). Output adds ``bucket``.
    """

    def __init__(self, level: int, n_buckets: int, side: int, cols: dict):
        self.grid = ZCellGrid(level)
        self.n_buckets = n_buckets
        self.side = side
        self.cols = cols  # {"id": ..., "xmin": ..., ...}

    def __call__(self, batch: pa.Table) -> pa.Table:
        c = self.cols
        xmin = batch.column(c["xmin"]).to_numpy(zero_copy_only=False)
        ymin = batch.column(c["ymin"]).to_numpy(zero_copy_only=False)
        xmax = batch.column(c["xmax"]).to_numpy(zero_copy_only=False)
        ymax = batch.column(c["ymax"]).to_numpy(zero_copy_only=False)
        g = self.grid
        cx0 = np.clip(((xmin + 180.0) // g.cell_width).astype(np.int64), 0, g.n_side - 1)
        cx1 = np.clip(((xmax + 180.0) // g.cell_width).astype(np.int64), 0, g.n_side - 1)
        cy0 = np.clip(((ymin + 90.0) // g.cell_height).astype(np.int64), 0, g.n_side - 1)
        cy1 = np.clip(((ymax + 90.0) // g.cell_height).astype(np.int64), 0, g.n_side - 1)
        counts = ((cx1 - cx0 + 1) * (cy1 - cy0 + 1)).astype(np.int64)
        row_idx = np.repeat(np.arange(batch.num_rows), counts)
        # per duplicated row: which covering cell (row-major within its rect)
        offs = np.arange(len(row_idx)) - np.repeat(np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
        w = (cx1 - cx0 + 1)[row_idx]
        dx = offs % w
        dy = offs // w
        cells = self.grid.cell_from_xy(
            (cx0[row_idx] + dx).astype(np.uint64), (cy0[row_idx] + dy).astype(np.uint64)
        )
        bucket = (fnv1a_u64(cells) % np.uint64(self.n_buckets)).astype(np.int32)
        out = batch.take(pa.array(row_idx))
        return out.append_column("bucket", pa.array(bucket))


def extent_join(
    left_ds,
    right_ds,
    level: int = 6,
    n_buckets: int | None = None,
    left_cols: dict | None = None,
    right_cols: dict | None = None,
    predicate: str = "intersects",
):
    """Join rows whose bboxes intersect. Returns Dataset[(left_id, right_id)].

    left_cols/right_cols default to {"id": "doc_id", "xmin": "xmin", ...}.
    predicate: "intersects" (bbox overlap) — exact geometry refinement is
    the caller's follow-up stage when rows carry full geometries.
    """
    if n_buckets is None:
        try:
            n_buckets = max(16, 2 * int(ray.cluster_resources().get("CPU", 8)))
        except Exception:
            n_buckets = 32
    lc = left_cols or {"id": "doc_id", "xmin": "xmin", "ymin": "ymin", "xmax": "xmax", "ymax": "ymax"}
    rc = right_cols or dict(lc)

    def prep(ds, cols, side):
        keep = [cols["id"], cols["xmin"], cols["ymin"], cols["xmax"], cols["ymax"]]
        ds = ds.select_columns(keep)
        ds = ds.map_batches(
            _ExplodeExtents,
            fn_constructor_kwargs=dict(level=level, n_buckets=n_buckets, side=side, cols=cols),
            batch_format="pyarrow",
            concurrency=default_concurrency(),
        )
        # normalize column names
        return ds.map_batches(
            lambda t, c=cols, s=side: pa.table({
                "rid": t.column(c["id"]).cast(pa.string()),
                "xmin": t.column(c["xmin"]).cast(pa.float64()),
                "ymin": t.column(c["ymin"]).cast(pa.float64()),
                "xmax": t.column(c["xmax"]).cast(pa.float64()),
                "ymax": t.column(c["ymax"]).cast(pa.float64()),
                "side": pa.array(np.full(t.num_rows, s, dtype=np.int8)),
                "bucket": t.column("bucket"),
            }),
            batch_format="pyarrow",
        )

    both = prep(left_ds, lc, 0).union(prep(right_ds, rc, 1))

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0].drop_duplicates(subset=["rid", "xmin", "ymin"])
        right = g[g["side"] == 1].drop_duplicates(subset=["rid", "xmin", "ymin"])
        if left.empty or right.empty:
            return pd.DataFrame({"left_id": pd.Series([], dtype=object),
                                 "right_id": pd.Series([], dtype=object)})
        lx0 = left["xmin"].to_numpy()[:, None]
        ly0 = left["ymin"].to_numpy()[:, None]
        lx1 = left["xmax"].to_numpy()[:, None]
        ly1 = left["ymax"].to_numpy()[:, None]
        rx0 = right["xmin"].to_numpy()[None, :]
        ry0 = right["ymin"].to_numpy()[None, :]
        rx1 = right["xmax"].to_numpy()[None, :]
        ry1 = right["ymax"].to_numpy()[None, :]
        hit = (lx0 <= rx1) & (lx1 >= rx0) & (ly0 <= ry1) & (ly1 >= ry0)
        li, ri = np.nonzero(hit)
        return pd.DataFrame({
            "left_id": left["rid"].to_numpy()[li],
            "right_id": right["rid"].to_numpy()[ri],
        })

    pairs = both.groupby("bucket").map_groups(join_group, batch_format="pandas")

    # dedup multi-cell duplicates — the dedup the reference TODO'd. Pairs are
    # hashed into a bounded number of groups and dedup'd vectorized inside
    # each (a per-pair groupby would pay per-group overhead on every match).
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        from geomesa_ray.cells.shard import fnv1a_str

        l = t.column("left_id").to_numpy(zero_copy_only=False).astype(object)
        r = t.column("right_id").to_numpy(zero_copy_only=False).astype(object)
        h = (fnv1a_str(l) * np.uint64(31) + fnv1a_str(r)) % np.uint64(256)
        return t.append_column("pk", pa.array(h.astype(np.int32)))

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["left_id", "right_id"])[["left_id", "right_id"]]

    return (
        pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(dedup, batch_format="pandas")
    )
