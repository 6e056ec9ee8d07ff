"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "docs_per_sec": ..., "sf": ..., "num_cpus": N}

Headline metric (the north rule): spatial-join + tile-assignment throughput
over the interleaved corpus — read -> extract_geometry -> assign_cells ->
broadcast PIP join (realistic polygon set) -> density tile aggregate,
measured end to end with streaming execution.

``--scaling``: run the same job in fresh subprocesses at 8 and 32 CPUs and
report throughput at both plus scaling efficiency (the sandbox evidence for
the N-vs-4N cluster criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _corpus_docs_for(sf_dir: str) -> int:
    # corpus scale keyed to the TPC-ish sf dir used for relational queries
    if "0.001" in sf_dir:
        return 20_000
    if "0.01" in sf_dir:
        return 100_000
    return 400_000  # sf0.1 bench default


POLYGONS = {
    # realistic AOI mix: country-ish boxes + metro-sized cells around hot cities
    "na_box": "POLYGON ((-130 24, -60 24, -60 50, -130 50, -130 24))",
    "eu_box": "POLYGON ((-10 35, 30 35, 30 60, -10 60, -10 35))",
    "asia_box": "POLYGON ((60 5, 150 5, 150 55, 60 55, 60 5))",
    "nyc": "POLYGON ((-74.3 40.4, -73.7 40.4, -73.7 41.0, -74.3 41.0, -74.3 40.4))",
    "paris": "POLYGON ((2.0 48.6, 2.7 48.6, 2.7 49.1, 2.0 49.1, 2.0 48.6))",
    "tokyo": "POLYGON ((139.4 35.4, 140.0 35.4, 140.0 36.0, 139.4 36.0, 139.4 35.4))",
    "tri_sa": "POLYGON ((-75 -35, -40 -35, -60 0, -75 -35))",
}


def run_bench(num_cpus: int, sf_dir: str) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from geomesa_ray.sources.synth import synthesize_corpus
    from geomesa_ray.stages.assign import AssignCells
    from geomesa_ray.stages.density import density_grid
    from geomesa_ray.stages.extract import extract_geometry
    from geomesa_ray.stages.knn import knn
    from geomesa_ray.stages.pip_join import broadcast_pip_join, partitioned_pip_join

    n_docs = _corpus_docs_for(sf_dir)
    corpus = synthesize_corpus(n_docs, seed=42, n_shards=max(8, num_cpus), use_ray=True)

    # warm the page cache so we measure compute + shuffle, not first-read IO
    rd.read_parquet(corpus).count()

    timings: dict[str, float] = {}

    def extracted():
        return rd.read_parquet(corpus).map_batches(extract_geometry, batch_format="pyarrow")

    # 1. cell assignment only (index-write path)
    t0 = time.time()
    n_assigned = (
        extracted()
        .map_batches(AssignCells(level=12, n_shards=4), batch_format="pyarrow")
        .count()
    )
    timings["cell_assign"] = time.time() - t0

    # 2. headline: extract -> assign -> broadcast PIP join -> density tiles
    t0 = time.time()
    pts = (
        extracted()
        .map_batches(AssignCells(level=12, n_shards=4), batch_format="pyarrow")
        .filter(expr="has_geom")
    )
    joined = broadcast_pip_join(pts, POLYGONS)
    n_matches = joined.count()
    timings["pip_join_broadcast"] = time.time() - t0

    t0 = time.time()
    tiles = density_grid(
        extracted().filter(expr="has_geom"), width=256, height=128
    ).count()
    timings["density_tiles"] = time.time() - t0

    # 3. partitioned (shuffled) join with salting
    t0 = time.time()
    pts2 = extracted().filter(expr="has_geom")
    pj = partitioned_pip_join(pts2, POLYGONS, partition_level=6, n_salts=4, keep_cols=[])
    pj_matches = pj.count()
    timings["pip_join_partitioned"] = time.time() - t0

    # 4. kNN probe set
    import pandas as pd

    t0 = time.time()
    qs = pd.DataFrame(
        {
            "query_id": ["paris", "nyc", "tokyo", "sydney"],
            "lon": [2.35, -74.0, 139.69, 151.21],
            "lat": [48.85, 40.7, 35.68, -33.87],
        }
    )
    knn(extracted().filter(expr="has_geom"), qs, k=10).count()
    timings["knn"] = time.time() - t0

    headline = timings["pip_join_broadcast"] + timings["density_tiles"]
    result = {
        "metric": "spatial-join + tile-assignment wall time (interleaved corpus)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "docs": n_docs,
        "docs_per_sec": round(n_docs / headline, 1),
        "join_matches": int(n_matches),
        "partitioned_matches": int(pj_matches),
        "tiles": int(tiles),
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }
    ray.shutdown()
    return result


def run_scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    r_lo, r_hi = run(lo), run(hi)
    tp_lo = r_lo["docs_per_sec"]
    tp_hi = r_hi["docs_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": "scaling efficiency (N vs 4N CPUs, same input)",
        "value": round(eff, 3),
        "unit": "ratio",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "docs_per_sec_lo": tp_lo,
        "docs_per_sec_hi": tp_hi,
        "queries_lo": r_lo["queries"],
        "queries_hi": r_hi["queries"],
        "sf": sf_dir,
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(num_cpus, sf_dir)))
