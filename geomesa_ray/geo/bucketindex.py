"""Grid-bucket spatial index over a polygon set.

Parity target: GeoMesa's in-memory ``BucketIndex`` / ``SizeSeparatedBucketIndex``
(reference geomesa-utils/.../index/BucketIndex.scala) — the query-side state
its PIP-style joins hold per worker. Polygons are bucketed by the Z-quadtree
cells their bboxes cover; a probe batch is grouped by point cell and each
candidate polygon runs one vectorized PIP over the points in its buckets.

Built once per actor (``__init__`` of the PIP joiner stage) — the
IteratorCache pattern (geomesa-index-api/.../iterators/IteratorCache.scala).
"""

from __future__ import annotations

import numpy as np

from geomesa_ray.cells.zcell import ZCellGrid
from geomesa_ray.geo.predicates import MultiPolygon, Polygon


class PolygonBucketIndex:
    def __init__(self, polygons, names=None, level: int | None = None, max_cells_per_poly: int = 4096):
        """polygons: list of Polygon/MultiPolygon (or WKT strings).
        names: optional per-polygon labels (returned by probe).
        level: bucket grid level; default picks the finest level where the
        average polygon bbox covers <= ~64 cells.
        """
        self.polygons = [
            Polygon.from_wkt(p) if isinstance(p, str) else p for p in polygons
        ]
        self.names = list(names) if names is not None else list(range(len(self.polygons)))
        if level is None:
            level = self._pick_level(self.polygons)
        self.grid = ZCellGrid(level)
        self.buckets: dict[int, list[int]] = {}
        # polygons whose bbox covers too many cells are checked against every
        # batch instead (bbox fast-reject makes this cheap) — the analog of
        # the reference's outside-all-envelopes partition -1
        # (GeoMesaJoinRelation.scala / RelationUtils.gridIdMapper)
        self.global_polys: list[int] = []
        for idx, poly in enumerate(self.polygons):
            xmin, ymin, xmax, ymax = poly.bbox()
            try:
                cells = self.grid.cover_bbox(xmin, ymin, xmax, ymax, max_cells=max_cells_per_poly)
            except ValueError:
                self.global_polys.append(idx)
                continue
            for c in cells.tolist():
                self.buckets.setdefault(c, []).append(idx)

    @staticmethod
    def _pick_level(polygons, target_cells: float = 64.0) -> int:
        """Finest level where an average polygon bbox covers ~target_cells."""
        if not polygons:
            return 8
        widths = [max(p.xmax - p.xmin, 1e-9) for p in polygons]
        heights = [max(p.ymax - p.ymin, 1e-9) for p in polygons]
        avg_dim = float(np.mean([max(w, h) for w, h in zip(widths, heights)]))
        side = np.sqrt(target_cells)
        level = int(np.floor(np.log2(360.0 / max(avg_dim / side, 1e-12))))
        return int(np.clip(level, 2, 16))

    def probe(self, lon, lat) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized containment probe.

        Returns (point_indices, polygon_indices) — one pair per (point,
        polygon) containment match (a point can match several polygons).
        """
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        cells = self.grid.cell_of_points(lon, lat)
        out_pts: list[np.ndarray] = []
        out_polys: list[np.ndarray] = []
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        uniq, starts = np.unique(sorted_cells, return_index=True)
        ends = np.append(starts[1:], len(sorted_cells))
        # gather per-polygon point lists across buckets, then one PIP per
        # polygon over all its candidate points (vectorized in the point dim)
        poly_pts: dict[int, list[np.ndarray]] = {}
        for cell, s, e in zip(uniq.tolist(), starts.tolist(), ends.tolist()):
            cand = self.buckets.get(cell)
            if not cand:
                continue
            pts = order[s:e]
            for pidx in cand:
                poly_pts.setdefault(pidx, []).append(pts)
        all_pts = np.arange(len(lon), dtype=np.int64)
        for pidx in self.global_polys:
            poly_pts.setdefault(pidx, []).append(all_pts)
        for pidx, chunks in poly_pts.items():
            pts = np.concatenate(chunks)
            mask = self.polygons[pidx].contains(lon[pts], lat[pts])
            hit = pts[mask]
            if len(hit):
                out_pts.append(hit)
                out_polys.append(np.full(len(hit), pidx, dtype=np.int64))
        if not out_pts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(out_pts), np.concatenate(out_polys)
