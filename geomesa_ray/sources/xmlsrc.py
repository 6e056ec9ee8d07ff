"""XML converter -> Arrow (stdlib ElementTree, no deps).

Parity target: the reference's XML converter
(reference geomesa-convert/geomesa-convert-xml/.../XmlConverter.scala):
records are elements matching a tag; fields are child-element paths or
``@attr`` references, cast per a type map.

``iterparse`` streams the document (bounded memory per file); parsing is
per-record Python — the converter tier trade documented in
``sources/avro.py``. One read task per file."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa

_CASTS = {
    "string": str,
    "int": int,
    "long": int,
    "double": float,
}


def _field_value(elem: ET.Element, path: str):
    if path.startswith("@"):
        return elem.get(path[1:])
    child = elem.find(path)
    if child is None:
        return None
    return child.text


def parse_xml_records(data: bytes | str, record_tag: str,
                      fields: dict[str, tuple[str, str]]) -> pa.Table:
    """fields: {out_name: (path_or_@attr, type)} over each <record_tag>."""
    if isinstance(data, bytes):
        data = data.decode("utf-8")
    root = ET.fromstring(data)
    iter_records = root.iter(record_tag)
    cols: dict[str, list] = {name: [] for name in fields}
    n = 0
    for rec in iter_records:
        n += 1
        for name, (path, typ) in fields.items():
            raw = _field_value(rec, path)
            if raw is None or raw == "":
                cols[name].append(None)
            else:
                cols[name].append(_CASTS[typ](raw.strip() if isinstance(raw, str) else raw))
    arrays = {}
    for name, (path, typ) in fields.items():
        pa_type = {"string": pa.string(), "int": pa.int64(),
                   "long": pa.int64(), "double": pa.float64()}[typ]
        arrays[name] = pa.array(cols[name], type=pa_type)
    return pa.table(arrays)


def read_xml(paths, record_tag: str, fields: dict[str, tuple[str, str]]):
    """Ray Dataset over XML files (one task per file)."""
    import glob
    import os

    import ray.data as rd

    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = sorted(glob.glob(os.path.join(paths, "**", "*.xml"), recursive=True))
        else:
            paths = [paths]

    def load(batch: pa.Table) -> pa.Table:
        outs = []
        for p in batch.column("path").to_pylist():
            with open(p, "rb") as f:
                outs.append(parse_xml_records(f.read(), record_tag, fields))
        return pa.concat_tables(outs) if outs else pa.table({})

    files = rd.from_items([{"path": p} for p in paths])
    return files.map_batches(load, batch_format="pyarrow", batch_size=1)
