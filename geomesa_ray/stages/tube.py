"""Tube select + route search — track-proximity analytics.

Parity targets:
- ``TubeSelectProcess`` / ``TubeBuilder`` (reference geomesa-process/.../
  tube/{TubeBuilder,TubeSelectProcess}.scala): buffer+time-bin a track
  (geodesic meters -> degrees at the bin centroid, TubeBuilder.scala:56-70),
  optionally gap-fill between samples, then select data falling inside any
  tube bin's buffered geometry AND time interval.
- ``RouteSearchProcess`` (.../query/RouteSearchProcess.scala): features
  within a buffer of a route polyline.

Ray shape: tubes/routes are small (driver-built, broadcast); the data side
streams through one ``map_batches`` doing a vectorized bins x batch mask —
no shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from geomesa_ray.geo.distance import haversine_m, meters_to_degrees_at
from geomesa_ray.util import default_concurrency, holder_fn


def build_tube(track: pd.DataFrame, buffer_m: float, bin_ms: int, gap_fill: str = "nofill"):
    """Track (ts_ms, lon, lat) -> list of tube bins:
    (t0, t1, xmin, ymin, xmax, ymax, samples). ``gap_fill="line"``
    interpolates a point per empty bin between consecutive samples
    (TubeBuilder's line gap-fill)."""
    df = track.sort_values("ts_ms").reset_index(drop=True)
    pts = df[["ts_ms", "lon", "lat"]].to_numpy(dtype=np.float64)
    if gap_fill == "line" and len(pts) > 1:
        filled = [pts[0]]
        for prev, cur in zip(pts[:-1], pts[1:]):
            n_missing = int((cur[0] - prev[0]) // bin_ms) - 1
            for k in range(1, n_missing + 1):
                f = k / (n_missing + 1)
                filled.append(prev + (cur - prev) * f)
            filled.append(cur)
        pts = np.asarray(filled)
    bins: dict[int, list] = {}
    for t, x, y in pts:
        bins.setdefault(int(t // bin_ms), []).append((x, y))
    out = []
    for b, coords in sorted(bins.items()):
        arr = np.asarray(coords)
        clat = arr[:, 1].mean()
        dlon, dlat = meters_to_degrees_at(clat, buffer_m)
        out.append({
            "t0": b * bin_ms, "t1": (b + 1) * bin_ms,
            "xmin": arr[:, 0].min() - float(dlon), "xmax": arr[:, 0].max() + float(dlon),
            "ymin": arr[:, 1].min() - float(dlat), "ymax": arr[:, 1].max() + float(dlat),
            "samples": arr.tolist(),  # (lon, lat) track samples in this bin
        })
    return out


class _TubeProbe:
    def __init__(self, bins_ref, buffer_m, id_col, lon_col, lat_col, ts_col):
        b = ray.get(bins_ref) if isinstance(bins_ref, ray.ObjectRef) else bins_ref
        self.t0 = np.array([x["t0"] for x in b], dtype=np.int64)
        self.t1 = np.array([x["t1"] for x in b], dtype=np.int64)
        self.xmin = np.array([x["xmin"] for x in b])
        self.xmax = np.array([x["xmax"] for x in b])
        self.ymin = np.array([x["ymin"] for x in b])
        self.ymax = np.array([x["ymax"] for x in b])
        self.samples = [np.asarray(x["samples"], dtype=np.float64) for x in b]
        self.buffer_m = buffer_m
        self.id_col = id_col
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.ts_col = ts_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        lat = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        from geomesa_ray.util import ts_to_millis

        ms = ts_to_millis(batch.column(self.ts_col))
        # (bins, rows) candidate mask: time + bbox
        cand = (
            (ms[None, :] >= self.t0[:, None]) & (ms[None, :] < self.t1[:, None])
            & (lon[None, :] >= self.xmin[:, None]) & (lon[None, :] <= self.xmax[:, None])
            & (lat[None, :] >= self.ymin[:, None]) & (lat[None, :] <= self.ymax[:, None])
        )
        bi, ri = np.nonzero(cand)
        if len(bi):
            # exact refine: geodesic distance to the NEAREST track sample in
            # the bin must be within the buffer (the buffered-track geometry;
            # a centroid test false-negatives points near far-flung samples)
            keep = np.zeros(len(bi), dtype=bool)
            for b in np.unique(bi):
                rows = bi == b
                s = self.samples[b]
                d = haversine_m(
                    lon[ri[rows]][:, None], lat[ri[rows]][:, None],
                    s[None, :, 0], s[None, :, 1],
                ).min(axis=1)
                keep[rows] = d <= self.buffer_m
            bi, ri = bi[keep], ri[keep]
        out = batch.take(pa.array(ri))
        return out.append_column("tube_bin", pa.array(self.t0[bi]))


def tube_select(ds, track: pd.DataFrame, buffer_m: float = 50_000, bin_ms: int = 3_600_000,
                gap_fill: str = "nofill", id_col="doc_id", lon_col="lon", lat_col="lat",
                ts_col="ts"):
    """Rows of ``ds`` inside the track's buffered spatio-temporal tube.
    Output = matching rows + ``tube_bin`` (bin start ms); a row in several
    bins appears once per bin (tube semantics)."""
    bins = build_tube(track, buffer_m, bin_ms, gap_fill)
    ref = ray.put(bins)
    return ds.map_batches(
        holder_fn(_TubeProbe, bins_ref=ref, buffer_m=buffer_m, id_col=id_col,
                  lon_col=lon_col, lat_col=lat_col, ts_col=ts_col),
        batch_format="pyarrow",
    )


class _RouteProbe:
    """Vectorized min point-to-segment distance against a broadcast route,
    with optional heading agreement (RouteSearchProcess.scala's
    bidirectional course match: a row passes when its heading is within
    ``heading_tol_deg`` of the NEAREST segment's bearing, either
    direction)."""

    def __init__(self, route_ref, tolerance_m, lon_col, lat_col,
                 heading_col=None, heading_tol_deg=45.0):
        r = ray.get(route_ref) if isinstance(route_ref, ray.ObjectRef) else route_ref
        self.route = np.asarray(r, dtype=np.float64)  # (k, 2) lon/lat
        self.tolerance_m = tolerance_m
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.heading_col = heading_col
        self.heading_tol_deg = heading_tol_deg
        # planar scaling at the route's mean latitude (TubeBuilder-style
        # meters->degrees local approximation)
        clat = float(self.route[:, 1].mean())
        self.kx = 111_194.9 * max(np.cos(np.radians(clat)), 1e-6)
        self.ky = 111_194.9

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        lat = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        px = lon * self.kx
        py = lat * self.ky
        ax = self.route[:-1, 0] * self.kx
        ay = self.route[:-1, 1] * self.ky
        bx = self.route[1:, 0] * self.kx
        by = self.route[1:, 1] * self.ky
        dx = bx - ax
        dy = by - ay
        seg_len2 = np.maximum(dx * dx + dy * dy, 1e-12)
        # (rows, segs) projection parameter clamped to [0,1]
        t = ((px[:, None] - ax[None, :]) * dx[None, :] + (py[:, None] - ay[None, :]) * dy[None, :]) / seg_len2[None, :]
        t = np.clip(t, 0.0, 1.0)
        cx = ax[None, :] + t * dx[None, :]
        cy = ay[None, :] + t * dy[None, :]
        d2 = (px[:, None] - cx) ** 2 + (py[:, None] - cy) ** 2
        nearest = d2.argmin(axis=1)
        dmin = np.sqrt(d2[np.arange(len(px)), nearest])
        mask = dmin <= self.tolerance_m
        if self.heading_col is not None:
            heading = batch.column(self.heading_col).to_numpy(zero_copy_only=False)
            seg_bearing = np.degrees(np.arctan2(dx, dy)) % 360.0  # from-north
            diff = np.abs((heading - seg_bearing[nearest] + 180.0) % 360.0 - 180.0)
            # bidirectional: a track running the route backwards matches too
            diff = np.minimum(diff, 180.0 - diff)
            mask &= diff <= self.heading_tol_deg
        out = batch.take(pa.array(np.nonzero(mask)[0]))
        return out.append_column("route_distance_m", pa.array(dmin[mask]))


def route_search(ds, route_lonlat, tolerance_m: float = 10_000, lon_col="lon", lat_col="lat",
                 heading_col: str | None = None, heading_tol_deg: float = 45.0):
    """Rows within ``tolerance_m`` of the route polyline; adds
    ``route_distance_m`` (planar local approximation). With ``heading_col``
    the row's course must also agree with the nearest segment's bearing
    within ``heading_tol_deg`` either direction (RouteSearchProcess's
    heading match)."""
    ref = ray.put(np.asarray(route_lonlat, dtype=np.float64))
    return ds.map_batches(
        holder_fn(_RouteProbe, route_ref=ref, tolerance_m=tolerance_m,
                  lon_col=lon_col, lat_col=lat_col,
                  heading_col=heading_col, heading_tol_deg=heading_tol_deg),
        batch_format="pyarrow",
    )
