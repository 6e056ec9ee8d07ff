"""Merged hot/cold store view with last-write-wins semantics.

Parity target: the reference's Lambda store (reference
geomesa-lambda/.../data/LambdaDataStore.scala:52-75 — queries merge a
transient "hot" Kafka tier with the persistent tier) and the merged
datastore view (geomesa-index-api/.../view/MergedDataStoreView*.scala).

Ray shape: union both tiers, then one groupby(id) keeping the newest row
(ties broken toward the hot tier) — the batch analog of the cache's
upsert-by-id semantics.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def merged_view(hot_ds, cold_ds, id_col: str, ts_col: str):
    """Union hot+cold; per id keep the row with the greatest ts (hot wins
    ties). Schemas must match."""
    import numpy as np

    def tag(tier):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("__tier", pa.array(np.full(t.num_rows, tier, dtype=np.int8)))

        return fn

    both = hot_ds.map_batches(tag(1), batch_format="pyarrow").union(
        cold_ds.map_batches(tag(0), batch_format="pyarrow")
    )

    def newest(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values([ts_col, "__tier"], kind="mergesort").tail(1).drop(columns=["__tier"])

    return both.groupby(id_col).map_groups(newest, batch_format="pandas")
