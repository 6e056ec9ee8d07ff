"""Raster -> vector: GeoTIFF payloads to per-pixel (lon, lat, value)
features, the ingest direction of the "raster-to-vector tile assignment"
target (the reference's DensityScan renders the OTHER direction — vectors
into grids; see stages/density.py).

Shape: one vectorized meshgrid per raster inside ``map_batches`` (payloads
are the large side — small batches), no Python per-pixel loop; the
per-raster cell rollup happens inside the same batch because a raster's
pixels never span batches, so the stage needs NO shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _pixel_features(blob: bytes):
    from geomesa_ray.sources.geotiff import decode_geotiff

    img, tr = decode_geotiff(bytes(blob))
    if tr is None:
        raise ValueError("raster payload has no georeferencing tags")
    ox, oy, sx, sy = tr
    # native-dtype band sum (float rasters stay float; float32 widens to
    # float64 so the sum is exact for float32 inputs), PLUS the int64 view
    # the FP-exact oracles aggregate (truncating for fractional samples)
    acc = np.float64 if np.issubdtype(img.dtype, np.floating) else np.int64
    vnat = img.astype(acc).sum(axis=2) if img.ndim == 3 else img.astype(acc)
    val = vnat if acc is np.int64 else vnat.astype(np.int64)
    h, w = val.shape
    rr, cc = np.mgrid[0:h, 0:w]
    lon = ox + (cc + 0.5) * sx
    lat = oy - (rr + 0.5) * sy
    return (lon.ravel(), lat.ravel(), val.ravel(), vnat.ravel().astype(np.float64),
            rr.ravel(), cc.ravel())


def raster_to_features(ds, payload_col: str = "payload",
                       ref_col: str = "media_ref", batch_size: int = 16):
    """Dataset[(media_ref, payload: GeoTIFF)] -> one row per pixel:
    (media_ref, row, col, lon, lat, value, value_f). ``value`` is the int64
    view (exact for integer rasters, truncated for fractional samples — the
    column the integer-math oracles aggregate); ``value_f`` is the native
    value as float64 (exact for float32 and for integers below 2^53)."""

    def fn(t: pa.Table) -> pa.Table:
        refs, lons, lats, vals, fvals, rows_, cols = [], [], [], [], [], [], []
        payloads = t.column(payload_col).to_pylist()
        names = t.column(ref_col).to_pylist()
        for ref, blob in zip(names, payloads):
            lon, lat, val, vf, rr, cc = _pixel_features(blob)
            refs.append(np.full(len(val), ref, dtype=object))
            lons.append(lon)
            lats.append(lat)
            vals.append(val)
            fvals.append(vf)
            rows_.append(rr)
            cols.append(cc)
        if not refs:
            return pa.table({ref_col: pa.array([], pa.string()),
                             "row": pa.array([], pa.int32()),
                             "col": pa.array([], pa.int32()),
                             "lon": pa.array([], pa.float64()),
                             "lat": pa.array([], pa.float64()),
                             "value": pa.array([], pa.int64()),
                             "value_f": pa.array([], pa.float64())})
        return pa.table({
            ref_col: pa.array(np.concatenate(refs), pa.string()),
            "row": pa.array(np.concatenate(rows_).astype(np.int32)),
            "col": pa.array(np.concatenate(cols).astype(np.int32)),
            "lon": pa.array(np.concatenate(lons)),
            "lat": pa.array(np.concatenate(lats)),
            "value": pa.array(np.concatenate(vals)),
            "value_f": pa.array(np.concatenate(fvals)),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def density_to_geotiff(tiles, xmin: float, ymin: float, xmax: float,
                       ymax: float, width: int, height: int) -> bytes:
    """Vector -> raster FILE: density-grid rows (tile_i, tile_j, weight —
    the output of ``stages/density.density_grid``, j increasing NORTH) ->
    a georeferenced float32 GeoTIFF (LZW, north-up; row 0 = the top of the
    envelope). Closes the raster round-trip: ``raster_to_features`` on the
    result reads back the same weights at the same cell centers via its
    ``value_f`` column (float32-exact; the int64 ``value`` column matches
    only while weights are integer-valued, as density counts are)."""
    import pandas as pd

    from geomesa_ray.sources.geotiff import encode_geotiff

    if not isinstance(tiles, pd.DataFrame):
        tiles = tiles.to_pandas()
    arr = np.zeros((height, width), dtype=np.float32)
    i = tiles["tile_i"].to_numpy(dtype=np.int64)
    j = tiles["tile_j"].to_numpy(dtype=np.int64)
    w = tiles["weight"].to_numpy(dtype=np.float64)
    arr[height - 1 - j, i] = w.astype(np.float32)  # j north-up -> row top-down
    return encode_geotiff(arr, origin_x=xmin, origin_y=ymax,
                          pixel_w=(xmax - xmin) / width,
                          pixel_h=(ymax - ymin) / height,
                          compression=5)


def raster_cell_sums(ds, payload_col: str = "payload",
                     ref_col: str = "media_ref", cell_deg: float = 1.0,
                     batch_size: int = 16):
    """Dataset[(media_ref, payload: GeoTIFF)] -> per-raster per-cell value
    sums: (media_ref, cell_lon, cell_lat, value_sum, n_px). A raster's
    pixels never span batches, so the rollup is shuffle-FREE — per-batch
    bincount only (cross-raster cell merges, when wanted, ride the normal
    density/groupby stages downstream)."""

    def fn(t: pa.Table) -> pa.Table:
        out_ref, out_cx, out_cy, out_sum, out_n = [], [], [], [], []
        payloads = t.column(payload_col).to_pylist()
        names = t.column(ref_col).to_pylist()
        for ref, blob in zip(names, payloads):
            lon, lat, val, _, _, _ = _pixel_features(blob)
            cx = np.floor(lon / cell_deg).astype(np.int64)
            cy = np.floor(lat / cell_deg).astype(np.int64)
            key = (cx - cx.min()) * (cy.max() - cy.min() + 1) + (cy - cy.min())
            uniq, inv = np.unique(key, return_inverse=True)
            # pure-int64 accumulation (a float64 bincount intermediate is
            # exact only below 2^53 — violates the integer-aggregation rule)
            sums = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(sums, inv, val)
            cnts = np.bincount(inv)
            first = np.zeros(len(uniq), dtype=np.int64)
            first[inv[::-1]] = np.arange(len(key) - 1, -1, -1)
            out_ref.append(np.full(len(uniq), ref, dtype=object))
            out_cx.append(cx[first])
            out_cy.append(cy[first])
            out_sum.append(sums)
            out_n.append(cnts.astype(np.int64))
        return pa.table({
            ref_col: pa.array(np.concatenate(out_ref), pa.string()),
            "cell_lon": pa.array(np.concatenate(out_cx)),
            "cell_lat": pa.array(np.concatenate(out_cy)),
            "value_sum": pa.array(np.concatenate(out_sum)),
            "n_px": pa.array(np.concatenate(out_n)),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
