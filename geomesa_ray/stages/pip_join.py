"""Spatial (point-in-polygon) joins over Ray Data.

Two strategies, chosen by polygon-set cardinality — the reference's
broadcast-vs-partitioned split (small side pushed as a filter:
geomesa-process/.../query/ProximitySearchProcess.scala:29-89; large side
grid-partitioned + per-partition sweepline: geomesa-spark/.../
GeoMesaJoinRelation.scala:41-91 and RelationUtils.gridIdMapper:39-53):

1. ``BroadcastPIPJoin`` — an actor-pool ``map_batches`` stage. The polygon
   set is ``ray.put`` once on the driver; each actor builds a
   ``PolygonBucketIndex`` in ``__init__`` (once per actor — IteratorCache
   pattern) and probes every batch vectorized. No shuffle.

2. ``partitioned_pip_join`` — both sides keyed by coarse quadtree cell
   (polygons duplicated into every covering cell, points into exactly one),
   hot cells salted (``shard_of``, the ShardStrategy analog), cells hashed
   into ~2xCPU coarse buckets and co-shuffled with one
   ``groupby(["bucket", "salt"]).map_groups``; each group probes with a
   fine-level bucket index. Point×polygon matches are unique by
   construction (a point's cell lives in exactly one bucket), so no dedup
   pass is needed — unlike the reference's duplicated-feature grid join
   (RelationUtils.scala:38 "TODO: Filter duplicates").

``spatial_join`` picks the strategy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from geomesa_ray.util import default_concurrency

from geomesa_ray.cells.shard import shard_of
from geomesa_ray.cells.zcell import ZCellGrid
from geomesa_ray.geo.bucketindex import PolygonBucketIndex
from geomesa_ray.geo.predicates import Polygon


def _as_wkt_list(polygons) -> tuple[list[str], list]:
    """polygons: list[str wkt] | list[(name, wkt)] | dict name->wkt."""
    if isinstance(polygons, dict):
        names = list(polygons.keys())
        wkts = [polygons[n] for n in names]
    elif polygons and isinstance(polygons[0], (tuple, list)):
        names = [p[0] for p in polygons]
        wkts = [p[1] for p in polygons]
    else:
        wkts = list(polygons)
        names = list(range(len(wkts)))
    return wkts, names


class BroadcastPIPJoin:
    """Actor-pool stage: keep rows whose (lon, lat) fall in any polygon;
    appends ``poly_name``. Rows matching k polygons are emitted k times
    (inner-join semantics)."""

    def __init__(self, polys_ref, lon_col: str = "lon", lat_col: str = "lat"):
        wkts, names = ray.get(polys_ref) if isinstance(polys_ref, ray.ObjectRef) else polys_ref
        self.index = PolygonBucketIndex(wkts, names=names)
        self.names = np.asarray(self.index.names, dtype=object)
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        lat = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        pt_idx, poly_idx = self.index.probe(lon, lat)
        out = batch.take(pa.array(pt_idx))
        return out.append_column("poly_name", pa.array(self.names[poly_idx].astype(str)))


def broadcast_pip_join(
    points_ds,
    polygons,
    lon_col: str = "lon",
    lat_col: str = "lat",
    concurrency=None,
    batch_size: int = 65536,
    actor_threshold: int = 64,
):
    """Small polygon sets run as STATELESS tasks (the bucket index is cheap
    to build, and plain tasks fuse into the upstream map chain with zero
    actor-pool ramp); big sets amortize the index across batches in an
    autoscaling actor pool (the IteratorCache pattern)."""
    wkts, names = _as_wkt_list(polygons)
    ref = ray.put((wkts, names))
    if len(wkts) <= actor_threshold:
        holder: dict = {}

        def join_fn(batch: pa.Table) -> pa.Table:
            if "j" not in holder:  # once per task process, not per batch
                holder["j"] = BroadcastPIPJoin(ref, lon_col, lat_col)
            return holder["j"](batch)

        return points_ds.map_batches(
            join_fn, batch_format="pyarrow", batch_size=batch_size
        )
    return points_ds.map_batches(
        BroadcastPIPJoin,
        fn_constructor_kwargs={"polys_ref": ref, "lon_col": lon_col, "lat_col": lat_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )


# ---------------------------------------------------------------------------
# Partitioned join
# ---------------------------------------------------------------------------


class _AssignPartition:
    """Adds (bucket, salt) shuffle keys to the point side.

    bucket = hash(partition cell) % n_buckets — a point's cell maps to
    exactly one bucket, so matches stay unique; n_buckets ~ 2 x CPUs keeps
    groups large enough that per-group overhead amortizes (tiny per-cell
    groups were the bottleneck at fine partition levels)."""

    def __init__(self, partition_level: int, n_salts: int, n_buckets: int, hot_cells_ref,
                 lon_col, lat_col, id_col, poly_cells_ref=None):
        self.grid = ZCellGrid(partition_level)
        self.n_salts = n_salts
        self.n_buckets = n_buckets
        self.hot = ray.get(hot_cells_ref) if isinstance(hot_cells_ref, ray.ObjectRef) else hot_cells_ref
        pc = (ray.get(poly_cells_ref) if isinstance(poly_cells_ref, ray.ObjectRef)
              else poly_cells_ref)
        self.poly_cells = np.sort(pc) if pc is not None and len(pc) else None
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from geomesa_ray.cells.shard import fnv1a_u64

        lon = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        lat = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        pcell = self.grid.cell_of_points(lon, lat, lenient=True)
        if self.poly_cells is not None:
            # shuffle ONLY candidate points: a match requires the point's
            # cell to be in some polygon's covering (the reference scans
            # covering ranges only — BatchScanPlan semantics)
            pos = np.searchsorted(self.poly_cells, pcell)
            pos = np.minimum(pos, len(self.poly_cells) - 1)
            keep = self.poly_cells[pos] == pcell
            batch = batch.filter(pa.array(keep))
            lon, lat, pcell = lon[keep], lat[keep], pcell[keep]
        bucket = (fnv1a_u64(pcell) % np.uint64(self.n_buckets)).astype(np.int32)
        if self.n_salts > 1 and len(self.hot):
            ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
            salt = shard_of(ids, self.n_salts).astype(np.int16)
            salt = np.where(np.isin(pcell, self.hot), salt, np.int16(0))
        else:
            salt = np.zeros(len(pcell), dtype=np.int16)
        return batch.append_column("bucket", pa.array(bucket, type=pa.int32())).append_column(
            "salt", pa.array(salt, type=pa.int16())
        )


def _explode_polygons(
    polygons, partition_level: int, n_salts: int, n_buckets: int, hot_cells: np.ndarray
) -> pd.DataFrame:
    """Driver-side: polygon k -> one row per distinct (bucket, salt) among
    its covering cells. Hot cells force all salts (polygon replicated so
    every salted point shard sees it); cold cells salt 0."""
    from geomesa_ray.cells.shard import fnv1a_u64

    wkts, names = _as_wkt_list(polygons)
    grid = ZCellGrid(partition_level)
    hot_set = set(hot_cells.tolist()) if len(hot_cells) else set()
    rows = set()
    for k, wkt in enumerate(wkts):
        poly = Polygon.from_wkt(wkt) if isinstance(wkt, str) else wkt
        xmin, ymin, xmax, ymax = poly.bbox()
        cells = grid.cover_bbox(xmin, ymin, xmax, ymax)
        buckets = (fnv1a_u64(cells) % np.uint64(n_buckets)).astype(np.int32)
        for c, b in zip(cells.tolist(), buckets.tolist()):
            salts = range(n_salts) if c in hot_set else (0,)
            for s in salts:
                rows.add((b, s, k))
    rows = sorted(rows)
    return pd.DataFrame(
        {
            "bucket": np.asarray([r[0] for r in rows], dtype=np.int32),
            "salt": np.asarray([r[1] for r in rows], dtype=np.int16),
            "poly_idx": np.asarray([r[2] for r in rows], dtype=np.int64),
            "wkt": np.asarray([wkts[r[2]] for r in rows], dtype=object),
            "poly_name": np.asarray([str(names[r[2]]) for r in rows], dtype=object),
        }
    )


def detect_hot_cells(
    points_ds, partition_level: int, lon_col="lon", lat_col="lat", sample_rows: int = 100_000,
    hot_multiple: float = 8.0,
) -> np.ndarray:
    """Sample-based hot-cell detection (the analog of the reference's
    WEIGHTED/RTREE sample partitioning, RelationUtils.scala:107-158): a cell
    is hot if its sampled count exceeds hot_multiple x the mean.

    Samples STRATIFIED across the whole dataset (``random_sample`` touches
    every block) so a hot region that only appears late in time-ordered
    input is still seen — the round-1 prefix-sample trade missed it; the
    two-column sample scan is cheap next to the join itself. Falls back to
    a prefix when the sampled set is tiny. Callers with better knowledge
    pass ``hot_cells`` explicitly."""
    two_cols = points_ds.select_columns([lon_col, lat_col])
    df = two_cols.random_sample(0.05).limit(sample_rows).to_pandas()
    if len(df) < 5000:
        df = two_cols.limit(sample_rows).to_pandas()
    if df.empty:
        return np.empty(0, dtype=np.int64)
    grid = ZCellGrid(partition_level)
    cells = grid.cell_of_points(df[lon_col].to_numpy(), df[lat_col].to_numpy(), lenient=True)
    uniq, counts = np.unique(cells, return_counts=True)
    return uniq[counts > hot_multiple * counts.mean()]


def partitioned_pip_join(
    points_ds,
    polygons,
    partition_level: int = 7,
    index_level: int = 12,
    n_salts: int = 4,
    n_buckets: int | None = None,
    hot_cells: np.ndarray | None = None,
    lon_col: str = "lon",
    lat_col: str = "lat",
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
):
    """Cell-partitioned PIP join; returns a Dataset of matched point rows +
    ``poly_name``. ``keep_cols`` limits the point columns carried through
    the shuffle (carry keys only, re-attach wide columns after — the
    column-group pattern, SURVEY.md §7.5)."""
    if n_buckets is None:
        try:
            n_buckets = max(16, 2 * int(ray.cluster_resources().get("CPU", 8)))
        except Exception:
            n_buckets = 32
    if hot_cells is None:
        hot_cells = detect_hot_cells(points_ds, partition_level, lon_col, lat_col)
    hot_ref = ray.put(hot_cells)

    # union of all polygons' covering cells (driver-side, small): points
    # outside it cannot match and are dropped BEFORE the shuffle
    _wkts, _ = _as_wkt_list(polygons)
    _grid = ZCellGrid(partition_level)
    _cells = [np.asarray([], dtype=np.int64)]
    for _w in _wkts:
        _p = Polygon.from_wkt(_w) if isinstance(_w, str) else _w
        _cells.append(_grid.cover_bbox(*_p.bbox()))
    poly_cells = np.unique(np.concatenate(_cells))
    poly_cells_ref = ray.put(poly_cells)

    if keep_cols is not None:
        cols = list(dict.fromkeys([id_col, lon_col, lat_col] + keep_cols))
        points_ds = points_ds.select_columns(cols)

    # STATELESS tasks (holder-initialized), not an actor pool: the state is
    # two small broadcast arrays + a grid (trivial to build per task), and
    # an actor pool here fuses with the upstream extract into an actor op
    # whose autoscaling lag serializes the whole read side (measured: the
    # fused actor chain reported ~20x the per-batch UDF time of the same
    # code as plain tasks — the density stage hit the identical trap).
    holder: dict = {}
    ap_kwargs = {
        "partition_level": partition_level,
        "n_salts": n_salts,
        "n_buckets": n_buckets,
        "hot_cells_ref": hot_ref,
        "lon_col": lon_col,
        "lat_col": lat_col,
        "id_col": id_col,
        "poly_cells_ref": poly_cells_ref,
    }

    def assign_partition_fn(batch):
        if "p" not in holder:
            holder["p"] = _AssignPartition(**ap_kwargs)
        return holder["p"](batch)

    pts = points_ds.map_batches(assign_partition_fn, batch_format="pyarrow")

    poly_df = _explode_polygons(polygons, partition_level, n_salts, n_buckets, hot_cells)
    # conform schemas: points get null poly cols, polys get null point cols
    pts = pts.map_batches(
        lambda t: t.append_column("side", pa.array(np.zeros(t.num_rows, dtype=np.int8)))
        .append_column("poly_idx", pa.nulls(t.num_rows, pa.int64()))
        .append_column("wkt", pa.nulls(t.num_rows, pa.string()))
        .append_column("poly_name", pa.nulls(t.num_rows, pa.string())),
        batch_format="pyarrow",
    )
    pts_schema = pts.schema().base_schema
    point_cols = [c for c in pts_schema.names if c not in ("side", "poly_idx", "wkt", "poly_name")]
    point_types = {c: pts_schema.field(c).type for c in point_cols}
    poly_df["side"] = np.int8(1)
    polys_ds = ray.data.from_pandas(poly_df)
    polys_ds = polys_ds.map_batches(
        lambda t, pc_=point_cols, tt_=point_types: _conform_poly_side(t, pc_, tt_),
        batch_format="pyarrow",
    )
    both = pts.union(polys_ds)

    index_level_ = index_level
    lon_col_ = lon_col
    lat_col_ = lat_col

    def join_group(group: pd.DataFrame) -> pd.DataFrame:
        polys = group[group["side"] == 1]
        points = group[group["side"] == 0]
        if polys.empty or points.empty:
            return _empty_join_result(group, point_cols)
        # one polygon may appear once per (cell,salt); dedup within group
        polys = polys.drop_duplicates(subset=["poly_idx"])
        index = PolygonBucketIndex(
            polys["wkt"].tolist(), names=polys["poly_name"].tolist(), level=index_level_
        )
        pt_idx, poly_pos = index.probe(
            points[lon_col_].to_numpy(dtype=np.float64), points[lat_col_].to_numpy(dtype=np.float64)
        )
        if len(pt_idx) == 0:
            return _empty_join_result(group, point_cols)
        out = points.iloc[pt_idx][[c for c in point_cols if c not in ("bucket", "salt", "side")]].copy()
        out["poly_name"] = np.asarray(index.names, dtype=object)[poly_pos]
        return out

    joined = both.groupby(["bucket", "salt"]).map_groups(join_group, batch_format="pandas")
    return joined


def _conform_poly_side(t: pa.Table, point_cols: list[str], point_types: dict) -> pa.Table:
    arrays = []
    names = []
    for c in point_cols:
        names.append(c)
        if c == "bucket":
            arrays.append(t.column("bucket").cast(point_types[c]))
        elif c == "salt":
            arrays.append(t.column("salt").cast(point_types[c]))
        else:
            arrays.append(pa.nulls(t.num_rows, point_types[c]))
    for c in ("side", "poly_idx", "wkt", "poly_name"):
        names.append(c)
        if c == "side":
            arrays.append(t.column("side").cast(pa.int8()))
        else:
            arrays.append(t.column(c))
    return pa.table(dict(zip(names, arrays)))


def _empty_join_result(group: pd.DataFrame, point_cols: list[str]) -> pd.DataFrame:
    cols = [c for c in point_cols if c not in ("bucket", "salt", "side")]
    out = group.iloc[0:0][[c for c in cols if c in group.columns]].copy()
    out["poly_name"] = pd.Series([], dtype=object)
    return out


def spatial_join(
    points_ds,
    polygons,
    broadcast_threshold: int = 5000,
    **kwargs,
):
    """Strategy chooser: broadcast when the polygon set is small (the usual
    case — admin boundaries, AOIs), partitioned cell-shuffle otherwise."""
    wkts, names = _as_wkt_list(polygons)
    pairs = list(zip(names, wkts))
    if len(wkts) <= broadcast_threshold:
        return broadcast_pip_join(points_ds, pairs, **{
            k: v for k, v in kwargs.items() if k in ("lon_col", "lat_col", "concurrency", "batch_size")
        })
    return partitioned_pip_join(points_ds, pairs, **{
        k: v for k, v in kwargs.items() if k not in ("concurrency", "batch_size")
    })
