"""Minimal pure-Python Avro Object Container File reader -> Arrow.

Parity target: the reference's Avro converter family
(reference geomesa-convert/geomesa-convert-avro/.../Avro*.scala) — log
ingest's table-stakes format. No Avro binding exists in this container, so
this implements the PUBLIC Avro 1.x spec (container format + binary
encoding: zigzag varints, length-prefixed bytes/strings, blocked arrays and
maps, unions by branch index; null/deflate codecs via zlib).

Supported schema subset: primitives, record, array, map, enum, fixed,
union (nullable unions map to nullable columns). Decoding is per-record
Python — converters are the parse tier, not the hot analytic path (the
same trade the reference's converter framework makes); downstream stages
get zero-copy Arrow.

``read_avro(paths)`` returns a Ray Dataset (one read task per file —
the resumable-unit granularity the ingest manifests expect).
"""

from __future__ import annotations

import io
import json
import struct
import zlib

import pyarrow as pa

_MAGIC = b"Obj\x01"


def _read_long(buf: io.BufferedReader) -> int:
    """Zigzag varint."""
    shift = 0
    result = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        result |= (byte & 0x7F) << shift
        if not (byte & 0x80):
            break
        shift += 7
    return (result >> 1) ^ -(result & 1)


def _read_bytes(buf) -> bytes:
    n = _read_long(buf)
    return buf.read(n)


def _decode(schema, buf):
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, dict):
        t = schema["type"]
    else:  # union
        idx = _read_long(buf)
        return _decode(schema[idx], buf)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1)[0] == 1
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "record":
        return {f["name"]: _decode(f["type"], buf) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte size
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(_decode(schema["items"], buf))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf)
        return out
    raise ValueError(f"unsupported Avro type: {t!r}")


def read_avro_file(path: str) -> list[dict]:
    """One container file -> list of decoded records (dicts)."""
    with open(path, "rb") as f:
        if f.read(4) != _MAGIC:
            raise ValueError(f"{path}: not an Avro object container file")
        meta = {}
        while True:
            n = _read_long(f)
            if n == 0:
                break
            if n < 0:
                _read_long(f)
                n = -n
            for _ in range(n):
                k = _read_bytes(f).decode("utf-8")
                meta[k] = _read_bytes(f)
        schema = json.loads(meta["avro.schema"])
        codec = meta.get("avro.codec", b"null").decode()
        sync = f.read(16)
        records = []
        while True:
            head = f.read(1)
            if not head:
                break
            f.seek(-1, 1)
            count = _read_long(f)
            blob = f.read(_read_long(f))
            if codec == "deflate":
                blob = zlib.decompress(blob, -15)
            elif codec != "null":
                raise ValueError(f"unsupported codec {codec}")
            buf = io.BytesIO(blob)
            for _ in range(count):
                records.append(_decode(schema, buf))
            if f.read(16) != sync:
                raise ValueError(f"{path}: bad sync marker")
        return records


def avro_to_arrow(path: str) -> pa.Table:
    rows = read_avro_file(path)
    return pa.Table.from_pylist(rows)


def read_avro(paths):
    """Ray Dataset over Avro container files (one task per file)."""
    import ray.data as rd

    if isinstance(paths, str):
        import glob
        import os

        if os.path.isdir(paths):
            paths = sorted(glob.glob(os.path.join(paths, "**", "*.avro"), recursive=True))
        else:
            paths = [paths]

    def load(batch: pa.Table) -> pa.Table:
        out = [avro_to_arrow(p) for p in batch.column("path").to_pylist()]
        return pa.concat_tables(out) if out else pa.table({})

    files = rd.from_items([{"path": p} for p in paths])
    return files.map_batches(load, batch_format="pyarrow", batch_size=1)


# ------------------------------------------------------------- writer (tests)


def _write_long(out: bytearray, v: int):
    v = (v << 1) ^ (v >> 63)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _encode(schema, val, out: bytearray):
    if isinstance(schema, list):
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch["type"]
            if (val is None) == (bt == "null"):
                _write_long(out, i)
                return _encode(branch, val, out)
        raise ValueError("no union branch matched")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if val else 0)
    elif t in ("int", "long"):
        _write_long(out, int(val))
    elif t == "float":
        out.extend(struct.pack("<f", float(val)))
    elif t == "double":
        out.extend(struct.pack("<d", float(val)))
    elif t == "bytes":
        b = bytes(val)
        _write_long(out, len(b))
        out.extend(b)
    elif t == "string":
        b = str(val).encode("utf-8")
        _write_long(out, len(b))
        out.extend(b)
    elif t == "record":
        for f in schema["fields"]:
            _encode(f["type"], val[f["name"]], out)
    elif t == "array":
        if val:
            _write_long(out, len(val))
            for item in val:
                _encode(schema["items"], item, out)
        _write_long(out, 0)
    else:
        raise ValueError(f"writer does not support {t}")


def write_avro_file(path: str, schema: dict, rows: list[dict], codec: str = "null"):
    """Spec-conformant single-block writer (test fixture generator)."""
    body = bytearray()
    for r in rows:
        _encode(schema, r, body)
    blob = bytes(body)
    if codec == "deflate":
        c = zlib.compressobj(wbits=-15)
        blob = c.compress(blob) + c.flush()
    out = bytearray()
    out.extend(_MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_long(out, len(kb))
        out.extend(kb)
        _write_long(out, len(v))
        out.extend(v)
    _write_long(out, 0)
    sync = b"\x00" * 16
    out.extend(sync)
    _write_long(out, len(rows))
    _write_long(out, len(blob))
    out.extend(blob)
    out.extend(sync)
    with open(path, "wb") as f:
        f.write(bytes(out))
