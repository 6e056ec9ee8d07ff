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


class _DeltaBlockWriter:
    """map_batches stage: write each block as its OWN dictionary-encoded IPC
    file (locally-built dictionaries — the reference DeltaWriter's
    per-partition deltas, DeltaWriter.scala) and emit a manifest row."""

    def __init__(self, out_dir: str, dict_cols: list[str]):
        self.out_dir = out_dir
        self.dict_cols = dict_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os
        import uuid

        arrays, fields = [], []
        for name in batch.column_names:
            col = batch.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if name in self.dict_cols:
                col = col.dictionary_encode()
            arrays.append(col)
            fields.append(pa.field(name, arrays[-1].type))
        t = pa.table(arrays, schema=pa.schema(fields))
        path = os.path.join(self.out_dir, f"delta-{uuid.uuid4().hex}.arrow")
        with pa.ipc.new_file(path, t.schema) as w:
            for rb in t.to_batches():
                w.write_batch(rb)
        return pa.table({"path": pa.array([path]), "rows": pa.array([batch.num_rows])})


def arrow_export_delta(ds, out_dir: str, dict_cols: list[str], batch_size: int = 65536):
    """DELTA mode (ArrowScan delta/batch writers): every block writes its own
    IPC file with LOCAL dictionaries in ONE distributed pass (no global TopK
    pre-scan, no value dropped), unified at merge time. Returns the manifest
    (path, rows) as pandas."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    from geomesa_ray.util import default_concurrency

    manifest = ds.map_batches(
        _DeltaBlockWriter, fn_constructor_kwargs=dict(out_dir=out_dir, dict_cols=dict_cols),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_concurrency(),
    )
    return manifest.to_pandas()


def merge_arrow_deltas(out_dir: str, out_path: str | None = None,
                       sort_by: str | None = None) -> pa.Table:
    """Client-side merge of delta files: concatenate + UNIFY the per-file
    dictionaries into one table (the reference's dictionary-unification
    merge, geomesa-arrow/.../io/DeltaWriter.scala reduce path); optionally
    sort and re-write as a single IPC file."""
    import glob
    import os

    tables = []
    for p in sorted(glob.glob(os.path.join(out_dir, "delta-*.arrow"))):
        with pa.ipc.open_file(p) as r:
            tables.append(r.read_all())
    if not tables:
        return pa.table({})
    merged = pa.concat_tables(tables, promote_options="default")
    merged = merged.unify_dictionaries().combine_chunks()
    if sort_by:
        merged = merged.sort_by(sort_by)
    if out_path:
        with pa.ipc.new_file(out_path, merged.schema) as w:
            for rb in merged.to_batches():
                w.write_batch(rb)
    return merged
