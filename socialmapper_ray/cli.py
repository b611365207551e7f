"""CLI (reference cli.py:39-180 — the §2.10 command surface).

Subcommands mirror the reference's verbs on this engine's pipelines:

    python -m socialmapper_ray.cli run --sf-dir DIR --out DIR
    python -m socialmapper_ray.cli corpus --sf-dir DIR
    python -m socialmapper_ray.cli list-ops
    python -m socialmapper_ray.cli run --dry-run ...

``--dry-run`` prints the stage plan without executing (reference
cli.py --dry-run); ``list-ops`` prints the queries() inventory
(reference --list-variables analogue). Owns its Ray session (library
code does not), guarded for pre-initialised sessions.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_up(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="socialmapper_ray",
                                 description="Ray-Data spatial-join engine",
                                 allow_abbrev=False)
    sub = ap.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="flagship pipeline -> parquet",
                         allow_abbrev=False)
    run.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    run.add_argument("--out", default=None)
    run.add_argument("--replicate", type=int, default=1)
    run.add_argument("--concurrency", type=int, default=4)
    run.add_argument("--num-cpus", type=int, default=None)
    run.add_argument("--dry-run", action="store_true")

    corpus = sub.add_parser("corpus",
                            help="full corpus job (signatures+PIP)",
                            allow_abbrev=False)
    corpus.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    corpus.add_argument("--replicate", type=int, default=1)
    corpus.add_argument("--concurrency", type=int, default=4)
    corpus.add_argument("--num-cpus", type=int, default=None)

    sub.add_parser("list-ops", help="list queries()/oracle coverage")
    sub.add_parser("list-variables",
                   help="census variables + calculated composites "
                        "(reference cli.py --list-variables)")

    args = ap.parse_args(argv)

    if args.cmd == "list-variables":
        # reference cli.py:39-180 prints the census variable catalog;
        # here the catalog is the enrichment stage's variable table
        # (ref variable_service.py:26-43 semantics) — no live API needed
        from socialmapper_ray.stages.enrich import CALCULATED_VARIABLES

        for name, codes in sorted(CALCULATED_VARIABLES.items()):
            print(f"{name:28s} = {' + '.join(codes)}")
        return 0

    if args.cmd == "list-ops":
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import __ray_entry__ as entry

        oracles = set()
        qs = entry.queries()
        # oracle_sql materialises the synth world; list names only
        import inspect

        src = inspect.getsource(entry.oracle_sql)
        for name in qs:
            if f'"{name}":' in src:
                oracles.add(name)
        for name in sorted(qs):
            kind = "sql-oracle" if name in oracles else "rows-only"
            print(f"{name:26s} {kind}")
        return 0

    if args.cmd == "run":
        stages = ["read_pages", "extract", "validate", "tile", "pip_join",
                  "zonal", "enrich"] + (["export"] if args.out else [])
        if args.dry_run:
            print(json.dumps({"plan": stages, "sf_dir": args.sf_dir,
                              "replicate": args.replicate}))
            return 0
        _ray_up(args.num_cpus)
        from socialmapper_ray.pipelines import flagship
        from socialmapper_ray.sources import sinks

        ds = flagship.flagship(args.sf_dir, concurrency=args.concurrency,
                               replicate=args.replicate)
        if args.out:
            path = sinks.export(ds, args.out, fmt="parquet")
            print(json.dumps({"status": "ok", "out": path}))
        else:
            print(json.dumps({"status": "ok", "rows": ds.count()}))
        return 0

    if args.cmd == "corpus":
        _ray_up(args.num_cpus)
        from socialmapper_ray.pipelines import flagship

        n = flagship.full_corpus(args.sf_dir, concurrency=args.concurrency,
                                 replicate=args.replicate).count()
        print(json.dumps({"status": "ok", "zones": n}))
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
