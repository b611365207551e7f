"""``ray job submit`` entry point for the flagship pipeline.

North-rule deployment shape: the engine runs as a Ray job on a fixed
multi-node cluster —

    ray job submit --working-dir /root/repo -- \
        python jobs/run_flagship.py --sf-dir /data/sf0.1 \
        --out /data/out/flagship --replicate 8

In this sandbox there is no multi-node cluster; the script runs
standalone against local mode (``ray.init(address="local")`` when no
cluster address is present — inside ``ray job submit`` the session
already exists and init attaches). Output is a partitioned parquet
directory + lineage manifest, resumable: re-submitting the same job
with unchanged inputs reads the checkpoint instead of recomputing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="flagship spatial-join job")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/smray_job/flagship")
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only for standalone local runs")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 num_cpus=args.num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from socialmapper_ray.pipelines import flagship
    from socialmapper_ray.sources import synth
    from socialmapper_ray.state import manifest

    t0 = time.perf_counter()
    synth.ensure_synth(args.sf_dir, args.replicate)
    out_ds = manifest.checkpoint_stage(
        lambda: flagship.flagship(args.sf_dir,
                                  concurrency=args.concurrency,
                                  replicate=args.replicate),
        args.out,
        stage="flagship",
        inputs=[synth.table_path(args.sf_dir, "pages", args.replicate)],
        params={"replicate": args.replicate},
        partition_col="zone_id",
    )
    n = out_ds.count()
    lineage = manifest.read_lineage(args.out)
    print(json.dumps({
        "status": "ok", "rows": n, "out": args.out,
        "wall_sec": round(time.perf_counter() - t0, 2),
        "lineage_partitions": lineage.count() if lineage is not None else 0,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
