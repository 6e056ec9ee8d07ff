"""Query model: the reference's query lifecycle over indexed parquet output.

Mirrors QueryPlanner.runQuery (reference
geomesa-index-api/.../planning/QueryPlanner.scala:56-93) in Ray Data form:

1. configure — ``QuerySpec``: OR'd query geometries, OR'd time intervals,
   residual predicate, projection, sort, limit (the Query + hints IR).
2. decompose — geometries -> bboxes (FilterHelper.extractGeometries:101-135),
   intervals -> [t0, t1) ms bounds (extractIntervals:147-214).
3. range planning — bboxes -> cell covering at the index level
   (IndexKeySpace.getRanges; target cap = the geomesa.scan.ranges.target
   analog) pushed into ``read_parquet`` as a row-group filter on
   ``cell_id`` / ``time_bin`` — the Lance-fragment-pruning analog.
4. coarse filter — vectorized bbox/time mask (Z3Filter.inBounds analog).
5. exact refine — vectorized PIP, SKIPPED when every query geometry is an
   axis-aligned bbox (the loose-bbox / useFullFilter rule,
   Z3IndexKeySpace.scala:235-249).
6. transform / sort / limit (QueryPlanner.scala:68-84).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from geomesa_ray.cells.zcell import ZCellGrid
from geomesa_ray.geo.predicates import MultiPolygon, Polygon, points_in_bbox
from geomesa_ray.geo.wkt import parse_wkt

RANGE_TARGET = 2000  # geomesa.scan.ranges.target (QueryProperties.scala:22)

# QueryInterceptor parity (reference geomesa-index-api/.../planning/
# QueryInterceptor.scala): registered callables rewrite the QuerySpec before
# planning — security filters, default time windows, query hints. Applied
# in registration order by query_indexed.
_QUERY_INTERCEPTORS: list = []


def register_query_interceptor(fn):
    """fn(spec: QuerySpec) -> QuerySpec. Returns fn (decorator-friendly)."""
    _QUERY_INTERCEPTORS.append(fn)
    return fn


def clear_query_interceptors():
    _QUERY_INTERCEPTORS.clear()


@dataclass
class QuerySpec:
    geometries: list[str] = field(default_factory=list)  # OR'd WKT
    intervals: list[tuple] = field(default_factory=list)  # OR'd (t0_ms, t1_ms) half-open
    columns: list[str] | None = None
    limit: int | None = None
    sort_by: list | None = None

    def parsed_geoms(self):
        return [Polygon.from_wkt(w) for w in self.geometries]

    def is_bbox_only(self) -> bool:
        """True when every query geometry is an axis-aligned rectangle —
        the loose-bbox rule lets us skip the exact PIP refine."""
        for w in self.geometries:
            g = parse_wkt(w)
            if g["type"] != "Polygon" or len(g["coords"]) != 1:
                return False
            ring = g["coords"][0]
            pts = {(x, y) for x, y in ring}
            if len(pts) != 4:
                return False
            xs = {p[0] for p in pts}
            ys = {p[1] for p in pts}
            if len(xs) != 2 or len(ys) != 2:
                return False
        return True

    def bboxes(self) -> list[tuple]:
        """Query bboxes, with antimeridian-crossing boxes split into their
        two in-range pieces (GeometryProcessing.scala:39-166 — see
        geo/antimeridian.py). A crossing geometry thus contributes TWO OR'd
        bboxes to range planning and the coarse filter."""
        from geomesa_ray.geo.antimeridian import split_bbox

        out: list[tuple] = []
        for p in self.parsed_geoms():
            out.extend(split_bbox(*p.bbox()))
        return out


def plan_cells(spec: QuerySpec, level: int, max_cells: int = RANGE_TARGET):
    """Query geometries -> covering cell set at the index level (or None if
    the covering overflows the range target — full scan, filter only)."""
    grid = ZCellGrid(level)
    cells = []
    for (xmin, ymin, xmax, ymax) in spec.bboxes():
        try:
            cells.append(grid.cover_bbox(xmin, ymin, xmax, ymax, max_cells=max_cells))
        except ValueError:
            return None
    if not cells:
        return None
    out = np.unique(np.concatenate(cells))
    return out if len(out) <= max_cells else None


def query_indexed(
    indexed_dir: str,
    spec: QuerySpec,
    level: int = 12,
    cell_col: str = "cell_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    ts_col: str | None = None,
    residual_filter=None,
    auths=None,
    visibility_col: str = "visibility",
):
    """Run a QuerySpec against an indexed parquet layout (the output of the
    ingest pipeline: materialized cell_id/lon/lat columns). Returns a lazy
    Dataset. ``residual_filter`` (an ecql.Filter) re-applies the FULL
    predicate after the coarse scan (LocalQueryRunner semantics).
    ``auths`` (a set of authorization strings) applies the Accumulo-style
    row-visibility filter over ``visibility_col`` before the residual
    (AuthorizationsProvider + VisibilityEvaluator semantics,
    geomesa-security/.../VisibilityEvaluator.scala)."""
    import glob
    import os

    import ray.data as rd

    # expand directories -> parquet files (skip _manifest etc.)
    for interceptor in _QUERY_INTERCEPTORS:
        spec = interceptor(spec)

    dirs = [indexed_dir] if isinstance(indexed_dir, str) else list(indexed_dir)
    paths: list[str] = []
    for d in dirs:
        if os.path.isdir(d):
            paths.extend(sorted(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)))
        else:
            paths.append(d)

    cells = plan_cells(spec, level)
    pred = None
    if cells is not None:
        # row-group pruning at the read — the BatchScanPlan ranges analog
        pred = pads.field(cell_col).isin(pa.array(cells, type=pa.int64()))

    if spec.intervals and not ts_col:
        raise ValueError("QuerySpec has time intervals but no ts_col was given "
                         "— the intervals would be silently ignored")

    ds = rd.read_parquet(paths, filter=pred)

    bboxes = spec.bboxes()
    geoms = spec.parsed_geoms()
    exact = not spec.is_bbox_only()
    intervals = list(spec.intervals)

    def refine(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t
        mask = np.ones(n, dtype=bool)
        if bboxes:
            lon = t.column(lon_col).to_numpy(zero_copy_only=False)
            lat = t.column(lat_col).to_numpy(zero_copy_only=False)
            m = np.zeros(n, dtype=bool)
            if exact:
                for g in geoms:
                    m |= g.contains(lon, lat)
                    # translated antimeridian-crossing polygon: also test the
                    # wrapped copy (GeometryProcessing split semantics)
                    gx0, _, gx1, _ = g.bbox()
                    if gx1 > 180.0:
                        m |= g.contains(lon + 360.0, lat)
                    if gx0 < -180.0:
                        m |= g.contains(lon - 360.0, lat)
            else:
                for (xmin, ymin, xmax, ymax) in bboxes:
                    m |= points_in_bbox(lon, lat, xmin, ymin, xmax, ymax)
            mask &= m
        if intervals and ts_col:
            from geomesa_ray.util import ts_to_millis

            millis = ts_to_millis(t.column(ts_col))
            m = np.zeros(n, dtype=bool)
            for (t0, t1) in intervals:
                m |= (millis >= t0) & (millis < t1)
            mask &= m
        return t.filter(pa.array(mask))

    ds = ds.map_batches(refine, batch_format="pyarrow")
    if auths is not None:
        from geomesa_ray.stages.visibility import filter_visible

        ds = filter_visible(ds, auths, column=visibility_col)
    if residual_filter is not None:
        def residual(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            return t.filter(pa.array(residual_filter.mask(t)))

        ds = ds.map_batches(residual, batch_format="pyarrow")
    if spec.columns:
        ds = ds.select_columns(spec.columns)
    if spec.sort_by:
        keys = [k[0] if isinstance(k, (tuple, list)) else k for k in spec.sort_by]
        desc = [bool(k[1]) if isinstance(k, (tuple, list)) else False for k in spec.sort_by]
        ds = ds.sort(keys, descending=desc)
    if spec.limit is not None:
        ds = ds.limit(spec.limit)
    return ds


def query_indexed_ecql(indexed_dir: str, ecql_text: str, level: int = 12,
                       columns=None, limit=None, sort_by=None, **kw):
    """ECQL text -> pushdown QuerySpec + residual mask over an indexed
    layout (the full reference query path: ECQL.toFilter -> planning ->
    coarse scan -> local filter)."""
    from geomesa_ray.pipelines.ecql import query_spec_from_ecql

    spec, residual = query_spec_from_ecql(ecql_text, columns=columns,
                                          limit=limit, sort_by=sort_by)
    return query_indexed(indexed_dir, spec, level=level,
                         residual_filter=residual, **kw)
