"""Multimodal (image/audio/video) stage plumbing.

Media rides in the corpus as opaque references inside ``kind == "media"``
spans (``media_ref`` like ``img://<hash>``); payload bytes would be a
``binary`` column. The decode libraries are NOT in this container, so the
decode kernel is stubbed two ways:

- ``fake=True`` (default for tests/bench): a deterministic feature vector
  derived from the media_ref hash — exercises the REAL Ray plumbing
  (actor-pool stage, small batches for large payloads, list<float> output
  schema, metadata columns) end to end.
- ``fake=False``: raises NotImplementedError with the dependency note —
  the marked integration point for a real decoder.

Batch sizing: media batches must be small (payload x batch_size x
concurrency bounded by worker heap — SURVEY §4 memory row); default 256.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class MediaFeatureExtract:
    """Actor-pool stage: explode media spans -> one row per media object
    with a feature vector + metadata."""

    def __init__(self, dim: int = 64, fake: bool = True, spans_col: str = "spans",
                 id_col: str = "doc_id"):
        if not fake:
            raise NotImplementedError(
                "real media decode requires an image/audio library not present "
                "in this environment; run with fake=True for deterministic "
                "plumbing-identical features"
            )
        self.dim = dim
        self.spans_col = spans_col
        self.id_col = id_col

    def _features(self, refs: np.ndarray) -> np.ndarray:
        """Deterministic pseudo-features from the ref hash (stand-in for a
        decoded embedding; same shape/dtype as the real path would emit)."""
        from geomesa_ray.cells.shard import fnv1a_str
        from geomesa_ray.stages.stats import _mix64

        h = _mix64(fnv1a_str(refs))
        # expand each 64-bit hash into `dim` floats via a counter hash chain
        out = np.empty((len(refs), self.dim), dtype=np.float32)
        x = h.copy()
        for d in range(self.dim):
            x = _mix64(x + np.uint64(d + 1))
            out[:, d] = (x >> np.uint64(11)).astype(np.float64) / float(1 << 53) - 0.5
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans = batch.column(self.spans_col)
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        is_media = pc.equal(flat.field("kind"), "media").to_numpy(zero_copy_only=False)
        refs = flat.field("media_ref").to_numpy(zero_copy_only=False)[is_media]
        doc_idx = parents[is_media]
        if len(refs) == 0:
            return pa.table({
                self.id_col: pa.array([], batch.schema.field(self.id_col).type),
                "media_ref": pa.array([], pa.string()),
                "features": pa.array([], pa.list_(pa.float32())),
                "feature_dim": pa.array([], pa.int32()),
            })
        feats = self._features(refs.astype(object))
        ids = batch.column(self.id_col).take(pa.array(doc_idx))
        offsets = pa.array(np.arange(0, (len(refs) + 1) * self.dim, self.dim, dtype=np.int32))
        features = pa.ListArray.from_arrays(offsets, pa.array(feats.ravel(), type=pa.float32()))
        return pa.table({
            self.id_col: ids,
            "media_ref": pa.array(refs.astype(str)),
            "features": features,
            "feature_dim": pa.array(np.full(len(refs), self.dim, dtype=np.int32)),
        })


def media_features(ds, dim: int = 64, fake: bool = True, batch_size: int = 256,
                   concurrency=None):
    from geomesa_ray.util import default_concurrency

    return ds.map_batches(
        MediaFeatureExtract,
        fn_constructor_kwargs=dict(dim=dim, fake=fake),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )
