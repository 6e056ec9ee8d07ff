"""Shard / salt assignment for hot-cell skew handling.

Parity target: GeoMesa ``ShardStrategy`` (reference
geomesa-index-api/.../api/ShardStrategy.scala:42-79): a shard byte =
``hash(feature_id) % n_shards`` prepended to every index key, spreading a hot
key range across ``n_shards`` scan ranges. Here the shard column is appended
to the shuffle key of cell-partitioned stages (``(cell_id, shard)``) so hot
cells (cities, coastlines) split into n smaller shuffle partitions.

Hashing is FNV-1a over the little-endian int64 id — deterministic across
processes (unlike Python's seeded ``hash``), vectorized in numpy.
"""

from __future__ import annotations

import numpy as np

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a_u64(values: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a over each int64's 8 little-endian bytes."""
    v = np.asarray(values).astype(np.uint64)
    h = np.full(v.shape, _FNV_OFFSET, dtype=np.uint64)
    for b in range(8):
        byte = (v >> np.uint64(8 * b)) & np.uint64(0xFF)
        h = (h ^ byte) * _FNV_PRIME
    return h


def fnv1a_str(values) -> np.ndarray:
    """FNV-1a over UTF-8 bytes of each string (object/str array). Fast path
    round-trips through Arrow (`fnv1a_arrow` — C-level conversion + one
    buffer-gather, no per-element Python encode); mixed/odd element types
    fall back to the padded-byte-matrix implementation."""
    arr = np.asarray(values, dtype=object)
    try:
        import pyarrow as pa

        return fnv1a_arrow(pa.array(arr.ravel())).reshape(arr.shape)
    except Exception:
        pass
    encoded = [s.encode("utf-8") if isinstance(s, str) else bytes(s) for s in arr.ravel()]
    maxlen = max((len(b) for b in encoded), default=0)
    if maxlen == 0:
        return np.full(arr.shape, _FNV_OFFSET, dtype=np.uint64)
    mat = np.zeros((len(encoded), maxlen), dtype=np.uint8)
    lens = np.array([len(b) for b in encoded], dtype=np.int64)
    for idx, b in enumerate(encoded):  # fill loop; hashing itself is vectorized
        mat[idx, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.full(len(encoded), _FNV_OFFSET, dtype=np.uint64)
    for pos in range(maxlen):
        active = pos < lens
        nh = (h ^ mat[:, pos].astype(np.uint64)) * _FNV_PRIME
        h = np.where(active, nh, h)
    return h.reshape(arr.shape)


def fnv1a_arrow(arr) -> np.ndarray:
    """FNV-1a over the UTF-8 bytes of a pyarrow string array — identical
    output to ``fnv1a_str`` but FULLY vectorized: the padded byte matrix is
    gathered straight from the array's data buffer with one fancy-index
    (no per-element Python encode/fill loop). Nulls hash like ''."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_large_string(arr.type) and not pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.large_string() if pa.types.is_string(arr.type) or
                       pa.types.is_large_string(arr.type) else pa.large_binary())
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset:arr.offset + n + 1]
    data_buf = arr.buffers()[2]
    buf = np.frombuffer(data_buf, dtype=np.uint8) if data_buf is not None else \
        np.empty(0, dtype=np.uint8)
    lens = np.diff(offs)
    has_nulls = bool(arr.null_count)
    if has_nulls:
        valid_mask = ~np.asarray(arr.is_null())
        lens = np.where(valid_mask, lens, 0)
    maxlen = int(lens.max()) if n else 0
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if maxlen == 0:
        return h
    if not has_nulls:
        # O(total_bytes) padded-matrix build: rows are contiguous in the
        # data buffer, so one repeat+arange scatter fills (n, maxlen) —
        # ~8x less memory traffic than an (n, maxlen) fancy-index gather
        start0 = offs[0]
        total = int(offs[-1] - start0)
        # int32 index math while it fits (4x less intermediate traffic)
        idt = np.int32 if n * maxlen < 2**31 and total < 2**31 else np.int64
        dst = np.repeat((np.arange(n, dtype=idt) * idt(maxlen))
                        - (offs[:-1] - start0).astype(idt), lens)
        dst += np.arange(total, dtype=idt)
        flat = np.zeros(n * maxlen, dtype=np.uint8)
        flat[dst] = buf[start0:start0 + total]
        mat = flat.reshape(n, maxlen)
    else:  # nulls leave gaps between offsets; use the explicit gather
        pos = np.arange(maxlen, dtype=np.int64)
        idx = offs[:-1, None] + pos[None, :]
        active = pos[None, :] < lens[:, None]
        mat = buf[np.where(active, idx, 0)]
    for p in range(maxlen):
        nh = (h ^ mat[:, p].astype(np.uint64)) * _FNV_PRIME
        h = np.where(lens > p, nh, h)
    return h


def mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain mixer): FNV alone has weak
    avalanche on sequential keys, which skews sketch/LSH distributions."""
    z = np.asarray(h).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hash64_str(values) -> np.ndarray:
    """Well-mixed deterministic 64-bit hash of a string array — the shared
    content-hash primitive (dedup, fingerprints, media features, id hashing)."""
    return mix64(fnv1a_str(np.asarray(values, dtype=object)))


def shard_of(doc_ids, n_shards: int) -> np.ndarray:
    """doc id (int64 or string array) -> shard in [0, n_shards) (int16)."""
    if n_shards <= 1:
        return np.zeros(len(np.atleast_1d(doc_ids)), dtype=np.int16)
    arr = np.asarray(doc_ids)
    if arr.dtype.kind in ("i", "u"):
        h = fnv1a_u64(arr)
    else:
        h = fnv1a_str(arr)
    return (h % np.uint64(n_shards)).astype(np.int16)
