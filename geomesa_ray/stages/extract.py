"""Geometry extraction from interleaved spans — the converter stage.

Analog of the reference's converter framework (reference
geomesa-convert/.../convert2/AbstractConverter.scala:50-209): parse each
record, evaluate field expressions (here: find the doc's geometry-bearing
span and parse its WKT), validate (HasGeoValidator analog -> ``has_geom``
mask), and *never* mutate the source record — the ``spans`` column passes
through untouched byte-for-byte (the per-row span-sequence invariant).

Stateless ``map_batches`` function over zero-copy Arrow batches:
list-flatten + parent-indices + vectorized regex; no Python row loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from geomesa_ray.geo.wkt import parse_points_wkt


def extract_geometry(batch: pa.Table, spans_col: str = "spans", error_mode: str = "mask") -> pa.Table:
    """Adds ``lon``/``lat`` (float64, NaN when absent) and ``has_geom``
    (bool) from the FIRST ``kind == "geo"`` span of each doc (a feature has
    one default geometry, SimpleFeatureTypes.scala:111-125).

    error_mode (the converter ErrorMode, AbstractConverter.scala:152-154):
    - "mask" (skip-and-count analog): unparseable geo spans leave
      has_geom=False.
    - "raise": fail the task on the first unparseable geo span.
    - "dead_letter": also adds ``geo_error`` (the offending span text, null
      when clean) so a downstream filter can route bad rows aside.
    """
    n = batch.num_rows
    spans = batch.column(spans_col)
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    kinds = flat.field("kind")
    geo_mask = pc.equal(kinds, "geo").to_numpy(zero_copy_only=False)

    lon = np.full(n, np.nan, dtype=np.float64)
    lat = np.full(n, np.nan, dtype=np.float64)
    errors = np.full(n, None, dtype=object)
    if geo_mask.any():
        geo_parents = parents[geo_mask]
        # first geo span per doc: parents are nondecreasing -> unique keeps first
        uniq, first_idx = np.unique(geo_parents, return_index=True)
        # stay in Arrow: filter+take the text child, parse with the C++ regex
        geo_texts = flat.field("text").filter(pa.array(geo_mask)).take(pa.array(first_idx))
        plon, plat, valid = parse_points_wkt(geo_texts)
        lon[uniq[valid]] = plon[valid]
        lat[uniq[valid]] = plat[valid]
        if not valid.all():
            bad_docs = uniq[~valid]
            bad_texts = geo_texts.to_numpy(zero_copy_only=False)[~valid]
            if error_mode == "raise":
                raise ValueError(
                    f"unparseable geometry span (doc row {int(bad_docs[0])}): "
                    f"{str(bad_texts[0])[:80]!r}"
                )
            errors[bad_docs] = bad_texts

    has_geom = ~np.isnan(lon)
    out = (
        batch.append_column("lon", pa.array(lon, type=pa.float64()))
        .append_column("lat", pa.array(lat, type=pa.float64()))
        .append_column("has_geom", pa.array(has_geom))
    )
    if error_mode == "dead_letter":
        out = out.append_column("geo_error", pa.array(errors, type=pa.string()))
    return out
