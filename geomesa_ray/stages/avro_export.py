"""Avro export — the writer half of the Avro converter pair.

Parity target: GeoMesa's ``AvroExporter`` (reference
geomesa-tools/src/main/scala/org/locationtech/geomesa/tools/export/formats/
AvroExporter.scala, which serializes SimpleFeatures through
AvroDataFileWriter with deflate). No Avro binding exists in this
container, so this inverts the in-repo spec reader (``sources/avro.py``,
Avro 1.x object container format): Arrow schema -> Avro record schema
(every field a nullable ``["null", T]`` union, the reference writer's
convention for SimpleFeature attributes), rows -> zigzag-varint binary,
blocked container file with null/deflate codec.

Ray Data shape: ``write_avro_dataset`` is a per-block ``map_batches`` sink
— one part-<uuid>.avro per block (partitioned, resumable), blocked at
``block_rows`` records per Avro block so readers stream, atomic rename,
(path, count) manifest Dataset returned. Row encoding is per-record
Python — converters are the parse/serialize tier, not the hot analytic
path (the same trade the reference's converter framework makes and the
reader documents); the blocks run in parallel across tasks.

Type mapping (Arrow -> Avro): int8/16/32->int, int64->long,
float32->float, float64->double, bool->boolean, string->string,
binary->bytes, timestamp->long logicalType timestamp-millis (converted
via ``util.ts_to_millis`` semantics), date32->int logicalType date,
list<T>->array. Unsupported Arrow types raise.
"""

from __future__ import annotations

import json
import struct
import zlib

import pyarrow as pa

from geomesa_ray.sources.avro import _MAGIC, _encode, _write_long


def _avro_type(t: pa.DataType):
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_integer(t) and t.bit_width <= 32 and not pa.types.is_uint32(t):
        return "int"
    if pa.types.is_integer(t):
        return "long"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_floating(t):
        return "double"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_timestamp(t):
        return {"type": "long", "logicalType": "timestamp-millis"}
    if pa.types.is_date32(t):
        return {"type": "int", "logicalType": "date"}
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return {"type": "array", "items": _avro_type(t.value_type)}
    raise ValueError(f"avro export: unsupported Arrow type {t}")


def arrow_to_avro_schema(schema: pa.Schema, name: str = "feature") -> dict:
    """Arrow schema -> Avro record schema with nullable-union fields."""
    fields = [{"name": f.name, "type": ["null", _avro_type(f.type)]}
              for f in schema]
    return {"type": "record", "name": name, "fields": fields}


def _encodable_column(col) -> list:
    """Arrow column -> python values matching the Avro wire type:
    timestamps become epoch-millis ints, dates become epoch-day ints."""
    t = col.type
    if pa.types.is_timestamp(t):
        # us->int64//1000, the util.ts_to_millis convention, null-preserving
        us = col.cast(pa.timestamp("us")).cast(pa.int64()).to_pylist()
        return [None if v is None else v // 1000 for v in us]
    if pa.types.is_date32(t):
        return col.cast(pa.int32()).to_pylist()
    return col.to_pylist()


def write_avro_table(path: str, t: pa.Table, codec: str = "deflate",
                     block_rows: int = 4096):
    """One Arrow table -> one Avro object container file (multi-block)."""
    schema = arrow_to_avro_schema(t.schema)
    cols = [_encodable_column(t.column(i)) for i in range(t.num_columns)]
    names = t.column_names
    out = bytearray()
    out.extend(_MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_long(out, len(kb))
        out.extend(kb)
        _write_long(out, len(v))
        out.extend(v)
    _write_long(out, 0)
    # deterministic sync marker from the content schema (no RNG needed)
    import hashlib

    sync = hashlib.md5(meta["avro.schema"]).digest()
    out.extend(sync)
    fields = schema["fields"]
    for lo in range(0, t.num_rows, block_rows):
        hi = min(lo + block_rows, t.num_rows)
        body = bytearray()
        for i in range(lo, hi):
            for f, col in zip(fields, cols):
                _encode(f["type"], col[i], body)
        blob = bytes(body)
        if codec == "deflate":
            c = zlib.compressobj(wbits=-15)
            blob = c.compress(blob) + c.flush()
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec}")
        _write_long(out, hi - lo)
        _write_long(out, len(blob))
        out.extend(blob)
        out.extend(sync)
    with open(path, "wb") as f:
        f.write(bytes(out))


def write_avro_dataset(ds, out_dir: str, codec: str = "deflate",
                       block_rows: int = 4096):
    """Distributed Avro export: one container file per block under
    ``out_dir``; returns the materialized (path, count) manifest."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def sink(t: pa.Table) -> pa.Table:
        name = f"part-{uuid.uuid4().hex}.avro"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        write_avro_table(tmp, t, codec=codec, block_rows=block_rows)
        os.replace(tmp, path)  # atomic per-file commit (resume skips done files)
        return pa.table({"path": pa.array([path]),
                         "count": pa.array([t.num_rows], type=pa.int64())})

    return ds.map_batches(sink, batch_size=None,
                          batch_format="pyarrow").materialize()
