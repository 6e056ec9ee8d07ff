"""Checkpoint manifests: resumable partitioned output with lineage + metrics.

Parity target: the reference's file-system storage metadata (reference
geomesa-fs/geomesa-fs-storage-api/.../StorageMetadata.scala:25-115 —
``PartitionMetadata(name, files, bounds, count)`` tracked in an append-only
changelog) and restartable per-split MapReduce ingest.

Design for re-executed tasks (streaming executors retry): each work unit
writes its output under ``<out>/part-<unit>/`` and then commits a manifest
JSON atomically (tmp + rename). A unit is done iff its manifest entry
exists — partial output directories without a manifest are ignored and
overwritten on resume. Manifest entries carry input lineage (the shard
files), row counts in/out, a span checksum (the per-row invariant), and
per-unit wall time + custom metrics.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def span_checksum(table: pa.Table, spans_col: str = "spans") -> int:
    """Order-insensitive checksum over every row's span sequence
    (kind, text, media_ref, offset) — XOR of per-doc FNV hashes, so shard
    ordering doesn't matter but any mutated span flips the sum."""
    from geomesa_ray.cells.shard import fnv1a_str

    col = table.column(spans_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    h = np.zeros(len(flat), dtype=np.uint64)
    for mult, f in ((0x9E3779B97F4A7C15, "kind"), (0xC2B2AE3D27D4EB4F, "text"),
                    (0x165667B19E3779F9, "media_ref")):
        vals = flat.field(f).to_numpy(zero_copy_only=False).astype(object)
        h = h * np.uint64(31) + fnv1a_str(vals) * np.uint64(mult)
    offs = flat.field("offset").to_numpy(zero_copy_only=False).astype(np.uint64)
    h = h * np.uint64(31) + (offs + np.uint64(1)) * np.uint64(0x27D4EB2F165667C5)
    # per-doc rolling combine then global XOR
    doc_acc = np.zeros(table.num_rows, dtype=np.uint64)
    np.bitwise_xor.at(doc_acc, parents, h * np.uint64(0x9E3779B97F4A7C15))
    return int(np.bitwise_xor.reduce(doc_acc))


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def entry_path(self, unit: str) -> str:
        return os.path.join(self.dir, f"{unit}.json")

    def is_done(self, unit: str) -> bool:
        return os.path.exists(self.entry_path(unit))

    def completed(self) -> list[str]:
        return sorted(
            f[:-5] for f in os.listdir(self.dir) if f.endswith(".json")
        )

    def commit(self, unit: str, record: dict) -> None:
        """Atomic: write tmp then rename (idempotent for task retries)."""
        tmp = self.entry_path(unit) + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        os.replace(tmp, self.entry_path(unit))

    def read(self, unit: str) -> dict:
        with open(self.entry_path(unit)) as f:
            return json.load(f)

    def summary(self) -> dict:
        entries = [self.read(u) for u in self.completed()]
        return {
            "units_done": len(entries),
            "rows_in": sum(e.get("rows_in", 0) for e in entries),
            "rows_out": sum(e.get("rows_out", 0) for e in entries),
            "wall_time_s": round(sum(e.get("wall_time_s", 0) for e in entries), 3),
            "files": sum(len(e.get("files", [])) for e in entries),
        }


def run_resumable(
    shards: list[str],
    process,
    out_dir: str,
    unit_size: int = 4,
    verify_spans: bool = False,
    metrics_fn=None,
):
    """Process input shards in resumable units.

    shards: input parquet file paths; grouped ``unit_size`` per work unit
    (resume granularity vs scheduling efficiency — at cluster scale each
    unit still holds enough blocks to saturate the executor).
    process: fn(list_of_paths) -> ray.data.Dataset (a full streaming
    pipeline over just those shards).
    Returns the Manifest. Completed units are skipped on re-run; a unit's
    output directory is fully rewritten before its manifest commit, so a
    crash mid-unit leaves no committed-but-partial state.
    """
    import shutil

    import pyarrow.parquet as pq

    manifest = Manifest(out_dir)
    units = [shards[i : i + unit_size] for i in range(0, len(shards), unit_size)]
    for idx, unit_shards in enumerate(units):
        unit = f"u{idx:05d}"
        if manifest.is_done(unit):
            continue
        unit_dir = os.path.join(out_dir, f"part-{unit}")
        if os.path.exists(unit_dir):
            shutil.rmtree(unit_dir)  # ignore uncommitted partial output
        t0 = time.time()
        ds = process(unit_shards)
        ds.write_parquet(unit_dir)
        wall = time.time() - t0

        files = sorted(
            os.path.join(unit_dir, f) for f in os.listdir(unit_dir) if f.endswith(".parquet")
        )
        rows_out = sum(pq.read_metadata(f).num_rows for f in files)
        rows_in = sum(pq.read_metadata(p).num_rows for p in unit_shards)
        # full output reads only when the caller asked for content checks
        out_tables = (
            [pq.read_table(f) for f in files] if (verify_spans or metrics_fn is not None) else []
        )
        record = {
            "unit": unit,
            "inputs": unit_shards,
            "files": files,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "wall_time_s": round(wall, 3),
        }
        if verify_spans:
            # per-row invariant: every doc SURVIVING into the output carries
            # its span sequence unchanged (pipelines may filter rows, so the
            # input checksum is restricted to the output's doc ids)
            out_ids: set = set()
            out_sum = 0
            for t in out_tables:
                if "spans" in t.column_names:
                    out_sum ^= span_checksum(t)
                    out_ids.update(t.column("doc_id").to_pylist())
            in_sum = 0
            for p in unit_shards:
                t = pq.read_table(p, columns=["doc_id", "spans"])
                keep = pa.array([d in out_ids for d in t.column("doc_id").to_pylist()])
                in_sum ^= span_checksum(t.filter(keep))
            record["span_checksum_in"] = in_sum
            record["span_checksum_out"] = out_sum
            record["span_invariant_ok"] = in_sum == out_sum
        if metrics_fn is not None:
            record["metrics"] = metrics_fn(out_tables)
        manifest.commit(unit, record)
    return manifest
