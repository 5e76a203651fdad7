"""CLI subcommand registry — the reference's ``bano/bin.py`` surface
re-expressed for the engine (reference commands that are pure DB plumbing
or network downloads have no analog here; everything data-shaped does).

Run as ``python -m bano_ray.cli <command> ...``.  The CLI owns the Ray
session (guarded init, shutdown on exit) — library code never does.
"""

from __future__ import annotations

import argparse
import json
import sys

COMMANDS = {}


def command(name: str):
    def deco(fn):
        COMMANDS[name] = fn
        return fn

    return deco


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, log_to_driver=False)
    return ray


@command("process-zone")
def process_zone(args):
    """Merge pipeline for one zone (or all) → partitioned parquet
    (reference process_commune)."""
    _ray()
    from .pipelines.cumul import cumul_dataset

    ds = cumul_dataset(args.sf_dir)
    if args.insee:
        ds = ds.filter(expr=f"insee == '{args.insee}'")
    ds.write_parquet(args.out)
    print(json.dumps({"out": args.out, "rows": ds.count()}))


@command("pre-process-suffixe")
def pre_process_suffixe(args):
    """Suffix-zone pre-pass → hamlet sample centers (reference
    pre_process_suffixe)."""
    ray = _ray()
    from .pipelines.cumul import suffix_centers_ref

    centers = ray.get(suffix_centers_ref(args.sf_dir))
    print(centers.to_csv(index=False))


@command("export")
def export(args):
    """CSV/JSON/shapefile export (reference export + ogr2ogr path)."""
    _ray()
    from .pipelines.exports import export_csv, street_json

    if args.format == "csv":
        from .pipelines.sinks import write_csv_partitioned

        write_csv_partitioned(export_csv(args.sf_dir), args.out)
    elif args.format == "json":
        from .pipelines.sinks import write_json_partitioned

        write_json_partitioned(street_json(args.sf_dir), args.out)
    elif args.format == "shp":
        from .sources_io_shp import write_shapefile_partitioned

        write_shapefile_partitioned(export_csv(args.sf_dir), args.out).count()
    print(json.dumps({"out": args.out, "format": args.format}))


@command("publish")
def publish(args):
    """Gzip publish + concatenation (reference publish/publish_aggregate)."""
    _ray()
    from .pipelines.exports import export_csv
    from .pipelines.sinks import publish_concat, write_ttl

    parts = write_ttl(export_csv(args.sf_dir), args.out + ".parts")
    path = publish_concat(parts, args.out)
    print(json.dumps({"out": path}))


@command("run-spec")
def run_spec(args):
    """Run a YAML pipeline spec through the step registry (§2.11)."""
    _ray()
    from .registry import build_pipeline

    spec = open(args.spec).read()
    params = dict(kv.split("=", 1) for kv in (args.param or []))
    ds = build_pipeline(spec, **params)
    n = ds.count()
    print(json.dumps({"rows": n, "schema": ds.schema().names}))


@command("list-steps")
def list_steps_cmd(args):
    from .registry import list_steps

    print(json.dumps(list_steps(), indent=2))


@command("bench")
def bench(args):
    import subprocess

    subprocess.run([sys.executable, "bench.py"])


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="bano_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("process-zone")
    sp.add_argument("sf_dir")
    sp.add_argument("out")
    sp.add_argument("--insee", default="")
    sp = sub.add_parser("pre-process-suffixe")
    sp.add_argument("sf_dir")
    sp = sub.add_parser("export")
    sp.add_argument("sf_dir")
    sp.add_argument("out")
    sp.add_argument("--format", choices=["csv", "json", "shp"], default="csv")
    sp = sub.add_parser("publish")
    sp.add_argument("sf_dir")
    sp.add_argument("out")
    sp = sub.add_parser("run-spec")
    sp.add_argument("spec")
    sp.add_argument("--param", action="append")
    sub.add_parser("list-steps")
    sub.add_parser("bench")
    args = p.parse_args(argv)
    COMMANDS[args.cmd](args)
    return 0


if __name__ == "__main__":
    import ray

    rc = main()
    if ray.is_initialized():
        ray.shutdown()
    sys.exit(rc)
