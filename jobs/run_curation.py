"""``ray job submit`` entrypoint for the text-curation chain — the LLM
training-data counterpart of jobs/run_flagship.py (north_rule: jobs run
via ray job submit; SURVEY §8.3 curation operators).

Usage (on a cluster):
    ray job submit --working-dir . -- python jobs/run_curation.py \
        --sf-dir /data/docs --out /data/curated --cap-per-host 4

Chain: benchmark decontamination (broadcast eval n-grams) -> quality
filter + exact dedup (one pass + one hash shuffle) -> per-host
contribution cap (one hash shuffle), then a RESUMABLE checkpointed
Parquet write partitioned by host — re-submitting after a failure
skips completed partitions via the lineage manifest.

This script OWNS a Ray session (job driver, not library code).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/rayspatial_curation")
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--max-tokens", type=int, default=400)
    ap.add_argument("--cap-per-host", type=int, default=4)
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--local-cpus", type=int, default=None,
                    help="force a local session with N CPUs (testing)")
    args = ap.parse_args()

    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        if args.local_cpus:
            ray.init(address="local", num_cpus=args.local_cpus,
                     include_dashboard=False)
        else:
            ray.init()  # job driver: attaches to the submitting cluster

    from rayspatial.state.checkpoint import checkpointed_write
    from rayspatial.textops.curation import curate
    from rayspatial.textops.decontam import decontaminate
    from rayspatial.textops.sampling import cap_per_group
    from rayspatial.util import read_parquet_sized

    t0 = time.perf_counter()
    docs = read_parquet_sized(f"{args.sf_dir}/documents.parquet",
                              rows_per_block=4096)

    def split(want_bench: bool):
        def f(batch: pa.Table) -> pa.Table:
            is_bench = batch.column("doc_id").to_numpy() % 23 == 0
            return batch.filter(
                pa.array(is_bench if want_bench else ~is_bench))
        return f

    bench = docs.map_batches(split(True), batch_format="pyarrow")
    train = docs.map_batches(split(False), batch_format="pyarrow")
    clean = decontaminate(train, bench, k=4, keep_cols=("text",))
    kept = curate(clean, min_tokens=args.min_tokens,
                  max_tokens=args.max_tokens, min_uniq_tokens=10)

    def add_host(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        return batch.append_column("host", pa.array(ids % 97))

    capped = cap_per_group(
        kept.map_batches(add_host, batch_format="pyarrow"),
        "host", args.cap_per_host, order_col="doc_id")
    manifest, report = checkpointed_write(
        capped, args.out, key_col="host", stage="curation",
        num_partitions=args.num_partitions)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "status": "ok",
        "out": args.out,
        "partitions": len(report),
        "partitions_skipped_resume": int(report["skipped"].sum()),
        "rows": int(report["rows"].sum()),
        "wall_sec": round(dt, 2),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
