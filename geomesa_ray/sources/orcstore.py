"""ORC file-system storage — read + write.

Parity target: the reference's ORC storage backend
(reference geomesa-fs/geomesa-fs-storage/geomesa-fs-storage-orc/src/main/
scala/org/locationtech/geomesa/fs/storage/orc/OrcFileSystemStorage.scala),
which stores SimpleFeatures as ORC files alongside the parquet backend.
pyarrow ships an ORC reader/writer (pyarrow.orc), so unlike the
shapefile/Avro pair no spec re-implementation is needed — this is the Ray
Data plumbing: Ray 2.49 has no ``read_orc``, so reads fan out one task per
file (the resumable-unit granularity the ingest manifests expect, same
shape as ``sources/avro.py``) and writes are the per-block sink convention
(one part file per block, atomic rename, (path, count) manifest).
"""

from __future__ import annotations

import pyarrow as pa


def read_orc_table(path: str) -> pa.Table:
    import pyarrow.orc as orc

    return orc.read_table(path)


def read_orc(paths, columns: list[str] | None = None):
    """Ray Dataset over ORC files (one read task per file; optional column
    pruning at the read)."""
    import glob
    import os

    import ray.data as rd

    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = sorted(glob.glob(os.path.join(paths, "**", "*.orc"),
                                     recursive=True))
        else:
            paths = [paths]

    def load(batch: pa.Table) -> pa.Table:
        import pyarrow.orc as orc

        out = [orc.read_table(p, columns=columns)
               for p in batch.column("path").to_pylist()]
        return pa.concat_tables(out) if out else pa.table({})

    files = rd.from_items([{"path": p} for p in paths])
    return files.map_batches(load, batch_format="pyarrow", batch_size=1)


def write_orc_dataset(ds, out_dir: str):
    """Distributed ORC export: one file per block under ``out_dir``;
    returns the materialized (path, count) manifest Dataset."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def sink(t: pa.Table) -> pa.Table:
        import pyarrow.orc as orc

        name = f"part-{uuid.uuid4().hex}.orc"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        orc.write_table(t, tmp)
        os.replace(tmp, path)  # atomic per-file commit (resume skips done files)
        return pa.table({"path": pa.array([path]),
                         "count": pa.array([t.num_rows], type=pa.int64())})

    return ds.map_batches(sink, batch_size=None,
                          batch_format="pyarrow").materialize()
