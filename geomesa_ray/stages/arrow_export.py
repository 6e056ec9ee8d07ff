"""Arrow IPC export with dictionary-encoded string columns.

Parity target: the reference's Arrow aggregating scan (reference
geomesa-index-api/.../iterators/ArrowScan.scala:37-795 +
geomesa-arrow/.../io/DeltaWriter.scala): per-range Arrow batches with
dictionary-encoded strings (dictionaries built from the top-1000 values via
a TopK stats pass, ArrowScan.scala:102), merged client-side into one IPC
stream, optionally sorted.

Ray shape: pass 1 = TopK sketch per dictionary column (stats partials);
pass 2 = stream batches through a fixed dictionary encode into a single
IPC file. Values outside the top-k fall back to null (the bounded-
dictionary trade the reference makes at 1000 values).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from geomesa_ray.stages.stats import TopK, stats_scan


def arrow_export(
    ds,
    path: str,
    dict_cols: list[str] | None = None,
    dict_top: int = 1000,  # geomesa.arrow.dictionary.top analog
    sort_by: str | None = None,
    batch_size: int = 65536,
) -> str:
    """Write the Dataset to one Arrow IPC (Feather v2 / stream) file."""
    dict_cols = dict_cols or []
    dictionaries: dict[str, pa.Array] = {}
    value_maps: dict[str, dict] = {}
    if dict_cols:
        spec = ";".join(f"topk({c},k={dict_top},capacity={max(4 * dict_top, 4096)})" for c in dict_cols)
        stats = stats_scan(ds, spec)
        for c, st in zip(dict_cols, stats):
            values = [k for k, _ in st.result()]
            dictionaries[c] = pa.array(values, type=pa.string())
            value_maps[c] = {v: i for i, v in enumerate(values)}

    if sort_by:
        ds = ds.sort(sort_by)

    writer = None
    try:
        for batch in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
            if dict_cols:
                arrays = []
                fields = []
                for name in batch.column_names:
                    col = batch.column(name)
                    if isinstance(col, pa.ChunkedArray):
                        col = col.combine_chunks()
                    if name in dictionaries:
                        idx = pd.Series(col.to_pandas()).map(value_maps[name])
                        indices = pa.array(idx.astype("Int32"), type=pa.int32())
                        col = pa.DictionaryArray.from_arrays(indices, dictionaries[name])
                    arrays.append(col)
                    fields.append(pa.field(name, arrays[-1].type))
                batch = pa.table(arrays, schema=pa.schema(fields))
            if writer is None:
                writer = pa.ipc.new_file(path, batch.schema)
            for rb in batch.to_batches():
                writer.write_batch(rb)
    finally:
        if writer is not None:
            writer.close()
    return path


def read_arrow_export(path: str) -> pa.Table:
    with pa.ipc.open_file(path) as reader:
        return reader.read_all()
