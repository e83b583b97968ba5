"""``ray job submit`` entrypoint for the flagship pipeline
(north_rule: "runs via ray job submit on a fixed-size multi-node Ray
cluster").

Usage (on a cluster):
    ray job submit --working-dir . -- python jobs/run_flagship.py \
        --sf-dir /data/pages --out /data/out --expand 1 --tile-res 6

This script OWNS a Ray session (it is a job driver, not library code):
connects to the cluster it was submitted to (``address='auto'``) or
starts a local one.  Output is written as resumable checkpointed
Parquet partitions with a lineage manifest — re-submitting the same
job after a failure skips completed partitions.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# repo root on the path whether launched via `ray job submit
# --working-dir .` or directly as `python jobs/run_flagship.py`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/rayspatial_flagship")
    ap.add_argument("--expand", type=int, default=1)
    ap.add_argument("--tile-res", type=int, default=6)
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--local-cpus", type=int, default=None,
                    help="force a local session with N CPUs (testing)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        if args.local_cpus:
            ray.init(address="local", num_cpus=args.local_cpus,
                     include_dashboard=False)
        else:
            ray.init()  # job driver: attaches to the submitting cluster

    from rayspatial.pipeline.flagship import flagship
    from rayspatial.state.checkpoint import checkpointed_write

    t0 = time.perf_counter()
    tiles = flagship(args.sf_dir, tile_res=args.tile_res, expand=args.expand)
    manifest, report = checkpointed_write(
        tiles,
        args.out,
        key_col="poly_id",
        stage="flagship",
        num_partitions=args.num_partitions,
    )
    dt = time.perf_counter() - t0
    rows = int(report["rows"].sum())
    skipped = int(report["skipped"].sum())
    print(
        json.dumps(
            {
                "status": "ok",
                "out": args.out,
                "partitions": len(report),
                "partitions_skipped_resume": skipped,
                "tile_rows": rows,
                "wall_sec": round(dt, 2),
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
