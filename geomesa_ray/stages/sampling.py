"""Deterministic sampling stages.

Parity target: GeoMesa ``SamplingIterator`` / ``FeatureSampler`` (reference
geomesa-index-api/.../iterators/SamplingIterator.scala:22-69): keep 1-in-n
rows, optionally stratified per threading key (e.g. per track) so every key
retains presence. The reference counts per key inside each scan; a
distributed engine can't share counters, so we use the equivalent
deterministic rule ``fnv1a(id) % n == 0`` (plain) and
``rank-within-key % n == 0`` (per-key, computed inside one shuffle group).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from geomesa_ray.cells.shard import fnv1a_str, fnv1a_u64


def sample_one_in_n(ds, n: int, id_col: str = "doc_id"):
    """Deterministic hash-mod sampling — no RNG, stable across retries."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = fnv1a_u64(ids) if ids.dtype.kind in "iu" else fnv1a_str(ids.astype(object))
        return batch.filter(pa.array(h % np.uint64(n) == 0))

    return ds.map_batches(fn, batch_format="pyarrow")


def sample_by_key(ds, n: int, key_col: str, sort_col: str | None = None):
    """1-in-n per key (SAMPLE_BY hint, QueryHints.scala:41-42): each key
    keeps ceil(count/n) rows — rows ranked within the key (by sort_col when
    given) and every n-th kept, so small keys keep >= 1 row.

    Shuffles on hashed coarse buckets (~2x CPUs), never the natural key —
    inside each bucket one stable sort + vectorized per-key cumcount ranks
    every key at once (the repo's standard high-cardinality pattern)."""
    from geomesa_ray.stages.windows import _add_key_bucket, _n_buckets

    sort_cols = [key_col] + ([sort_col] if sort_col else [])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, kind="mergesort")
        rank = g.groupby(key_col, sort=False).cumcount()
        return g[(rank % n == 0).to_numpy()].drop(columns=["__kb"])

    pre = ds.map_batches(_add_key_bucket(key_col, _n_buckets()), batch_format="pyarrow")
    return pre.groupby("__kb").map_groups(fn, batch_format="pandas")
