"""Merged hot/cold store view with last-write-wins semantics.

Parity target: the reference's Lambda store (reference
geomesa-lambda/.../data/LambdaDataStore.scala:52-75 — queries merge a
transient "hot" Kafka tier with the persistent tier) and the merged
datastore view (geomesa-index-api/.../view/MergedDataStoreView*.scala).

Ray shape: union both tiers, then ONE shuffle on hashed coarse buckets
(~2x CPUs, the windows.latest_per_key pattern — never the fine-grained
natural id, whose per-group overhead dominates at 10^8 ids) with a
vectorized sort + drop_duplicates inside each bucket keeping the newest
row per id (ties broken toward the hot tier) — the batch analog of the
cache's upsert-by-id semantics.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def merged_view(hot_ds, cold_ds, id_col: str, ts_col: str):
    """Union hot+cold; per id keep the row with the greatest ts (hot wins
    ties). Schemas must match."""
    import numpy as np

    from geomesa_ray.stages.windows import _add_key_bucket, _n_buckets

    def tag(tier):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("__tier", pa.array(np.full(t.num_rows, tier, dtype=np.int8)))

        return fn

    both = hot_ds.map_batches(tag(1), batch_format="pyarrow").union(
        cold_ds.map_batches(tag(0), batch_format="pyarrow")
    ).map_batches(_add_key_bucket(id_col, _n_buckets()), batch_format="pyarrow")

    def newest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, ts_col, "__tier"], kind="mergesort")
        return g.drop_duplicates(subset=[id_col], keep="last").drop(columns=["__tier", "__kb"])

    return both.groupby("__kb").map_groups(newest, batch_format="pandas")
