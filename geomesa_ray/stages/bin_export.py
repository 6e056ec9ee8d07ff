"""BIN export: pack features into GeoMesa's compact 16/24-byte records.

Parity target: ``BinAggregatingScan`` + ``BinaryOutputEncoder`` (reference
geomesa-index-api/.../iterators/BinAggregatingScan.scala:26-143,
geomesa-utils/.../bin/BinaryOutputEncoder.scala:65-166): each record is

    [4B track-id hash][4B dtg seconds][4B lat float][4B lon float]
    (+ [8B label] for the 24-byte "extended" variant)

little-endian, used for massive track visualization. Optional global sort
by dtg (BinSorter's chunk merge) maps to ``ds.sort``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geomesa_ray.cells.shard import fnv1a_str, fnv1a_u64


def _track_hash(values: np.ndarray) -> np.ndarray:
    h = fnv1a_u64(values) if values.dtype.kind in "iu" else fnv1a_str(values.astype(object))
    return (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)


class BinPack:
    """map_batches stage -> column ``bin`` of fixed_size_binary(16|24)."""

    def __init__(self, track_col: str, dtg_col: str, lon_col="lon", lat_col="lat",
                 label_col: str | None = None):
        self.track_col = track_col
        self.dtg_col = dtg_col
        self.lon_col = lon_col
        self.lat_col = lat_col
        self.label_col = label_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        track = _track_hash(batch.column(self.track_col).to_numpy(zero_copy_only=False))
        from geomesa_ray.util import ts_to_millis

        secs = ts_to_millis(batch.column(self.dtg_col)) // 1000
        lat = batch.column(self.lat_col).to_numpy(zero_copy_only=False).astype(np.float32)
        lon = batch.column(self.lon_col).to_numpy(zero_copy_only=False).astype(np.float32)

        width = 24 if self.label_col else 16
        buf = np.zeros((n, width), dtype=np.uint8)
        buf[:, 0:4] = track.view(np.uint8).reshape(n, 4)
        buf[:, 4:8] = secs.astype(np.uint32).view(np.uint8).reshape(n, 4)
        buf[:, 8:12] = lat.view(np.uint8).reshape(n, 4)
        buf[:, 12:16] = lon.view(np.uint8).reshape(n, 4)
        if self.label_col:
            label = batch.column(self.label_col).to_numpy(zero_copy_only=False)
            lab64 = fnv1a_u64(label) if label.dtype.kind in "iu" else fnv1a_str(label.astype(object))
            buf[:, 16:24] = lab64.view(np.uint8).reshape(n, 8)
        arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(width), n, [None, pa.py_buffer(buf.tobytes())]
        )
        return batch.append_column("bin", arr)


def decode_bin(records: pa.Array) -> dict:
    """bin column -> dict of numpy arrays (track_hash, dtg_secs, lat, lon)."""
    width = records.type.byte_width
    raw = np.frombuffer(b"".join(records.to_pylist()), dtype=np.uint8).reshape(-1, width)
    return {
        "track_hash": raw[:, 0:4].copy().view(np.uint32).ravel(),
        "dtg_secs": raw[:, 4:8].copy().view(np.uint32).ravel(),
        "lat": raw[:, 8:12].copy().view(np.float32).ravel(),
        "lon": raw[:, 12:16].copy().view(np.float32).ravel(),
    }


def bin_export(ds, track_col: str, dtg_col: str, lon_col="lon", lat_col="lat",
               label_col: str | None = None, sort: bool = False):
    out = ds.map_batches(
        BinPack(track_col, dtg_col, lon_col, lat_col, label_col), batch_format="pyarrow"
    )
    if sort:
        out = out.sort(dtg_col)
    return out.select_columns(["bin"])
