"""CLI entry points — the geomesa-tools analog (ingest / query / export / synth).

Usage (each owns its Ray session, like the reference CLI owns its JVM):

  python -m geomesa_ray synth  --docs 100000 --out /tmp/corpus
  python -m geomesa_ray ingest --input "/tmp/corpus/*.parquet" --out /tmp/indexed \
                               --level 12 --shards 4 [--resume]
  python -m geomesa_ray query  --indexed /tmp/indexed \
                               --geometry "POLYGON ((-10 35, 30 35, 30 60, -10 60, -10 35))" \
                               --columns doc_id,lon,lat --limit 20
  python -m geomesa_ray export --indexed /tmp/indexed --format arrow --out /tmp/out.arrow
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_synth(args):
    _init_ray(args.num_cpus)
    from geomesa_ray.sources.synth import synthesize_corpus

    out = synthesize_corpus(args.docs, seed=args.seed, base=args.out,
                            n_shards=args.n_shards, use_ray=True)
    print(json.dumps({"corpus": out, "docs": args.docs, "shards": args.n_shards}))


def cmd_ingest(args):
    _init_ray(args.num_cpus)
    import ray.data as rd

    from geomesa_ray.stages.assign import AssignCells
    from geomesa_ray.stages.extract import extract_geometry
    from geomesa_ray.state.manifest import run_resumable

    shards = sorted(glob.glob(args.input))
    if not shards:
        print(f"no input files match {args.input}", file=sys.stderr)
        sys.exit(2)

    def pipeline(paths):
        ds = rd.read_parquet(paths).map_batches(extract_geometry, batch_format="pyarrow")
        if args.geo_only:
            ds = ds.filter(expr="has_geom")
        return ds.map_batches(
            AssignCells(level=args.level, n_shards=args.shards), batch_format="pyarrow"
        )

    manifest = run_resumable(shards, pipeline, args.out, unit_size=args.unit_size,
                             verify_spans=args.verify_spans)
    print(json.dumps(manifest.summary()))


def cmd_query(args):
    _init_ray(args.num_cpus)
    from geomesa_ray.pipelines.query import QuerySpec, query_indexed

    if args.ecql:
        # text front-end (ECQL.toFilter parity): pushdown + residual mask
        from geomesa_ray.pipelines.query import query_indexed_ecql

        ds = query_indexed_ecql(
            args.indexed, args.ecql, level=args.level, ts_col=args.ts_col,
            columns=args.columns.split(",") if args.columns else None,
            limit=args.limit, sort_by=[args.sort_by] if args.sort_by else None,
        )
    else:
        spec = QuerySpec(
            geometries=[args.geometry] if args.geometry else [],
            intervals=[(args.t0, args.t1)] if args.t0 is not None else [],
            columns=args.columns.split(",") if args.columns else None,
            limit=args.limit,
            sort_by=[args.sort_by] if args.sort_by else None,
        )
        ds = query_indexed(args.indexed, spec, level=args.level, ts_col=args.ts_col)
    if args.out:
        ds.write_parquet(args.out)
        print(json.dumps({"written": args.out}))
    else:
        df = ds.to_pandas()
        print(df.to_string(index=False, max_rows=args.limit or 50))


def cmd_export(args):
    _init_ray(args.num_cpus)
    import ray.data as rd

    ds = rd.read_parquet(args.indexed)
    if args.format == "arrow":
        from geomesa_ray.stages.arrow_export import arrow_export

        arrow_export(ds, args.out, dict_cols=args.dict_cols.split(",") if args.dict_cols else None)
    elif args.format == "bin":
        from geomesa_ray.stages.bin_export import bin_export

        bin_export(ds, args.track_col, args.ts_col).write_parquet(args.out)
    elif args.format == "geojson":
        from geomesa_ray.stages.geojson_export import write_geojson

        write_geojson(ds, args.out, lon_col=args.lon_col, lat_col=args.lat_col)
    elif args.format == "gml":
        from geomesa_ray.stages.gml_export import write_gml

        write_gml(ds, args.out, lon_col=args.lon_col, lat_col=args.lat_col)
    elif args.format == "leaflet":
        from geomesa_ray.stages.geojson_export import write_leaflet

        write_leaflet(ds, args.out, lon_col=args.lon_col, lat_col=args.lat_col)
    elif args.format == "csv":
        ds.write_csv(args.out)
    elif args.format == "json":
        ds.write_json(args.out)
    else:
        print(f"unknown format {args.format}", file=sys.stderr)
        sys.exit(2)
    print(json.dumps({"written": args.out, "format": args.format}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="geomesa_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("synth")
    s.add_argument("--docs", type=int, required=True)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--out", default="/tmp/graft_corpus")
    s.add_argument("--n-shards", type=int, default=8)
    s.set_defaults(fn=cmd_synth)

    s = sub.add_parser("ingest")
    s.add_argument("--input", required=True, help="glob of input parquet shards")
    s.add_argument("--out", required=True)
    s.add_argument("--level", type=int, default=12)
    s.add_argument("--shards", type=int, default=4)
    s.add_argument("--unit-size", type=int, default=4)
    s.add_argument("--geo-only", action="store_true")
    s.add_argument("--verify-spans", action="store_true")
    s.set_defaults(fn=cmd_ingest)

    s = sub.add_parser("query")
    s.add_argument("--indexed", required=True)
    s.add_argument("--ecql", default=None, help="ECQL filter text (overrides --geometry/--t0/--t1)")
    s.add_argument("--geometry", default=None)
    s.add_argument("--t0", type=int, default=None)
    s.add_argument("--t1", type=int, default=None)
    s.add_argument("--ts-col", default=None)
    s.add_argument("--columns", default=None)
    s.add_argument("--limit", type=int, default=None)
    s.add_argument("--sort-by", default=None)
    s.add_argument("--level", type=int, default=12)
    s.add_argument("--out", default=None)
    s.set_defaults(fn=cmd_query)

    s = sub.add_parser("export")
    s.add_argument("--indexed", required=True)
    s.add_argument("--format", default="arrow",
                   choices=["arrow", "bin", "csv", "json", "geojson", "gml", "leaflet"])
    s.add_argument("--out", required=True)
    s.add_argument("--dict-cols", default=None)
    s.add_argument("--track-col", default="doc_id")
    s.add_argument("--ts-col", default="ts")
    s.add_argument("--lon-col", default="lon")
    s.add_argument("--lat-col", default="lat")
    s.set_defaults(fn=cmd_export)

    args = p.parse_args(argv)
    args.fn(args)
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
