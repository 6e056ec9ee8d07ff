"""OSM XML converter -> Arrow (stdlib ElementTree, no deps).

Parity target: the reference's OSM converters
(``geomesa-convert/geomesa-convert-osm/.../Osm{Nodes,Ways}Converter.scala``):

- **nodes** -> Point features: id, lon, lat, tags, and (optionally) the
  metadata block (version, timestamp, changeset, uid, user).
- **ways** -> LineString features: the way's ordered ``<nd ref=...>`` list
  resolved against node coordinates, plus tags.

The reference resolves way refs through an in-memory/mapdb node cache; the
Ray-Data-first shape is a JOIN: ``read_osm_ways`` emits exploded
``(way_id, seq, ref)`` rows, and ``ways_to_lines`` joins them to the nodes
Dataset on the node id (the bucketed ``attach`` co-group — no driver-side
node map, so a planet-scale node set stays distributed), then reassembles
each way's LineString in ``seq`` order inside coarse way-id buckets.

One read task per file (``.osm`` XML; pbf needs protobuf — documented out,
same boundary as compressed media codecs).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
import pyarrow as pa

_NODE_SCHEMA = pa.schema([
    ("node_id", pa.int64()),
    ("lon", pa.float64()),
    ("lat", pa.float64()),
    ("tags", pa.string()),       # "k1=v1;k2=v2" (flat string: join-safe)
    ("version", pa.int64()),
    ("timestamp", pa.string()),
    ("changeset", pa.int64()),
    ("uid", pa.int64()),
    ("user", pa.string()),
])

_WAY_SCHEMA = pa.schema([
    ("way_id", pa.int64()),
    ("seq", pa.int64()),
    ("ref", pa.int64()),
    ("tags", pa.string()),
])


def _tags_str(elem: ET.Element) -> str:
    return ";".join(
        f"{t.get('k')}={t.get('v')}" for t in elem.findall("tag")
    )


def parse_osm_nodes(data: bytes | str) -> pa.Table:
    root = ET.fromstring(data.decode("utf-8") if isinstance(data, bytes) else data)
    rows = {name: [] for name in _NODE_SCHEMA.names}
    for n in root.iter("node"):
        rows["node_id"].append(int(n.get("id")))
        rows["lon"].append(float(n.get("lon")))
        rows["lat"].append(float(n.get("lat")))
        rows["tags"].append(_tags_str(n))
        rows["version"].append(int(n.get("version")) if n.get("version") else None)
        rows["timestamp"].append(n.get("timestamp"))
        rows["changeset"].append(int(n.get("changeset")) if n.get("changeset") else None)
        rows["uid"].append(int(n.get("uid")) if n.get("uid") else None)
        rows["user"].append(n.get("user"))
    return pa.table({f.name: pa.array(rows[f.name], type=f.type) for f in _NODE_SCHEMA})


def parse_osm_ways(data: bytes | str) -> pa.Table:
    """Exploded (way_id, seq, ref, tags) rows — one per <nd> reference."""
    root = ET.fromstring(data.decode("utf-8") if isinstance(data, bytes) else data)
    rows = {name: [] for name in _WAY_SCHEMA.names}
    for w in root.iter("way"):
        wid = int(w.get("id"))
        tags = _tags_str(w)
        for i, nd in enumerate(w.findall("nd")):
            rows["way_id"].append(wid)
            rows["seq"].append(i)
            rows["ref"].append(int(nd.get("ref")))
            rows["tags"].append(tags)
    return pa.table({f.name: pa.array(rows[f.name], type=f.type) for f in _WAY_SCHEMA})


def _expand(paths, suffix=".osm"):
    import glob
    import os

    if isinstance(paths, str):
        if os.path.isdir(paths):
            return sorted(glob.glob(os.path.join(paths, "**", f"*{suffix}"), recursive=True))
        return [paths]
    return list(paths)


def _file_ds(paths, parse, empty: pa.Table):
    import ray.data as rd

    def load(batch: pa.Table) -> pa.Table:
        outs = [empty]
        for p in batch.column("path").to_pylist():
            with open(p, "rb") as f:
                outs.append(parse(f.read()))
        return pa.concat_tables(outs)

    files = rd.from_items([{"path": p} for p in _expand(paths)])
    return files.map_batches(load, batch_format="pyarrow", batch_size=1)


def read_osm_nodes(paths):
    """Ray Dataset of OSM nodes (one parse task per file)."""
    return _file_ds(paths, parse_osm_nodes, _NODE_SCHEMA.empty_table())


def read_osm_ways(paths):
    """Ray Dataset of exploded way->node references."""
    return _file_ds(paths, parse_osm_ways, _WAY_SCHEMA.empty_table())


def ways_to_lines(ways_ds, nodes_ds, min_points: int = 2, precision: int = 6):
    """(exploded ways) x (nodes) -> one LineString WKT row per way.

    Distributed: refs join to node coords via the bucketed co-group
    ``attach`` (no driver node cache), then each coarse way-id bucket
    assembles its ways vectorized (sort by (way_id, seq) + groupby-agg).
    Coordinates are printf %.{precision}f for reproducibility."""
    from geomesa_ray.stages.windows import _add_key_bucket, _n_buckets

    coords = _attach_refs(ways_ds, nodes_ds)

    def lines(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["way_id", "seq"], kind="mergesort")
        fmt = f"%.{precision}f"
        coord = np.char.add(
            np.char.add(np.char.mod(fmt, g["lon"].to_numpy(np.float64)), " "),
            np.char.mod(fmt, g["lat"].to_numpy(np.float64)),
        )
        agg = (
            pd.DataFrame({"way_id": g["way_id"].to_numpy(), "__c": coord,
                          "tags": g["tags"].to_numpy()})
            .groupby("way_id", sort=True)
            .agg(coords=("__c", ", ".join), n_points=("__c", "count"), tags=("tags", "first"))
            .reset_index()
        )
        agg = agg[agg["n_points"] >= min_points]
        return pd.DataFrame({
            "way_id": agg["way_id"].to_numpy(),
            "wkt": ("LINESTRING (" + agg["coords"] + ")").to_numpy(),
            "n_points": agg["n_points"].to_numpy(dtype=np.int64),
            "tags": agg["tags"].to_numpy(),
        })

    pre = coords.map_batches(_add_key_bucket("way_id", _n_buckets()), batch_format="pyarrow")
    return pre.groupby("__kb").map_groups(lines, batch_format="pandas")


def _attach_refs(ways_ds, nodes_ds):
    """refs -> coords: rename to a shared key and use the bucketed attach."""
    from geomesa_ray.stages.joins import attach

    nodes = nodes_ds.select_columns(["node_id", "lon", "lat"]).map_batches(
        lambda t: t.rename_columns(["ref", "lon", "lat"]), batch_format="pyarrow"
    )
    return attach(ways_ds, nodes, on="ref")
