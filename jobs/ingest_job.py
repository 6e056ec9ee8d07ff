"""Cluster job entrypoint: resumable corpus ingest via ``ray job submit``.

On a real fixed-size cluster:

    ray job submit --working-dir /root/repo -- \
        python jobs/ingest_job.py --input '/data/corpus/*.parquet' \
            --out /data/indexed --level 12 --shards 4

The job connects to the cluster it was submitted to (``RAY_ADDRESS`` is set
by the job server; locally it falls back to a local session), streams every
input shard through extract -> assign, and commits per-unit manifests so a
resubmitted job resumes where the last one stopped. Progress and final
metrics print as JSON lines for the job log.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--level", type=int, default=12)
    p.add_argument("--shards", type=int, default=4)
    p.add_argument("--unit-size", type=int, default=8)
    p.add_argument("--verify-spans", action="store_true")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster; standalone
        # runs get a local session
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True)
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from geomesa_ray.stages.assign import AssignCells
    from geomesa_ray.stages.extract import extract_geometry
    from geomesa_ray.state.manifest import run_resumable

    shards = sorted(glob.glob(args.input))
    if not shards:
        print(json.dumps({"error": f"no inputs match {args.input}"}))
        sys.exit(2)
    print(json.dumps({"event": "start", "shards": len(shards),
                      "cluster_cpus": ray.cluster_resources().get("CPU")}))

    def pipeline(paths):
        return (
            rd.read_parquet(paths)
            .map_batches(extract_geometry, batch_format="pyarrow")
            .map_batches(AssignCells(level=args.level, n_shards=args.shards),
                         batch_format="pyarrow")
        )

    def metrics(tables):
        import numpy as np

        if not tables:
            return {}
        cells = np.concatenate([t.column("cell_id").to_numpy() for t in tables])
        geo = int((cells >= 0).sum())
        return {"geo_rows": geo, "distinct_cells": int(len(np.unique(cells[cells >= 0])))}

    manifest = run_resumable(shards, pipeline, args.out, unit_size=args.unit_size,
                             verify_spans=args.verify_spans,
                             metrics_fn=metrics if args.verify_spans else None)
    print(json.dumps({"event": "done", **manifest.summary()}))
    ray.shutdown()


if __name__ == "__main__":
    main()
