"""Benchmark harness (driver contract).

Runs the headline spatial-join + tiling pipelines over ``$GRAFT_SF_DIR``
(default /root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "rows": R, "rows_per_sec": ...}

``--scaling`` re-runs the headline pipeline in TWO fresh processes
(num_cpus=8 and num_cpus=32, same input) and reports both throughputs
plus scaling efficiency = (thr_hi / thr_lo) / (cpus_hi / cpus_lo) —
the sandbox proxy for the north_rule's N-vs-4N-node cluster criterion.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# headline target row count: documents are expanded deterministically
# (pages.read_pages(expand=K)) so throughput is measured on a corpus big
# enough that per-task overhead is amortized — the sandbox stand-in for
# the 10^12-row Common-Crawl input.
TARGET_ROWS = int(os.environ.get("GRAFT_BENCH_ROWS", "8000000"))


def _expand_for(sf_dir: str) -> tuple[int, int]:
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    expand = max(1, TARGET_ROWS // n_docs)
    return expand, n_docs * expand


def _sf_label(sf_dir: str) -> float | str:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return base


def _consume(res) -> int:
    """Drain a result without driver-side materialization of big data."""
    import pandas as pd
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            # count() consumes the stream; aggregated outputs are small
            return res.count()
    except ImportError:
        pass
    if isinstance(res, (pa.Table, pd.DataFrame)):
        return len(res)
    return 0


def run_suite(sf_dir: str, num_cpus: int) -> dict:
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

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as em

    qs = em.queries()
    expand, n_rows = _expand_for(sf_dir)

    # headline: the flagship pipeline on the EXPANDED corpus
    from rayspatial.pipeline.flagship import flagship

    _consume(flagship(sf_dir, expand=expand))  # warm-up: worker startup
    t0 = time.perf_counter()
    _consume(flagship(sf_dir, expand=expand))
    headline = round(time.perf_counter() - t0, 3)

    timings: dict[str, float] = {"flagship_join_tiles": headline}
    for name, fn in qs.items():
        if name == "flagship_join_tiles":
            continue
        t0 = time.perf_counter()
        try:
            _consume(fn(sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # keep the bench alive per-query
            timings[name] = -1.0
            print(f"# bench query {name} FAILED: {exc!r}", file=sys.stderr)
    out = {
        "metric": "spatial-join + tiling throughput (flagship pipeline, rows/sec)",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_label(sf_dir),
        "num_cpus": num_cpus,
        "rows": n_rows,
        "rows_per_sec": round(n_rows / headline, 1) if headline > 0 else None,
    }
    ray.shutdown()
    return out


def run_scaling(sf_dir: str, cpus_lo: int = 8, cpus_hi: int = 32) -> dict:
    """Same headline job, two fresh processes at two parallelism levels."""
    results = {}
    for cpus in (cpus_lo, cpus_hi):
        env = dict(os.environ)
        env["RAY_GRAFT_CPUS"] = str(cpus)
        env["GRAFT_SF_DIR"] = sf_dir
        env["GRAFT_BENCH_HEADLINE_ONLY"] = "1"
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    thr_lo = results[cpus_lo]["rows_per_sec"]
    thr_hi = results[cpus_hi]["rows_per_sec"]
    eff = (thr_hi / thr_lo) / (cpus_hi / cpus_lo)
    return {
        "metric": "scaling efficiency (flagship pipeline, "
        f"num_cpus {cpus_lo} -> {cpus_hi}, fresh processes, same input)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": _sf_label(sf_dir),
        "throughput_rows_per_sec": {str(cpus_lo): thr_lo, str(cpus_hi): thr_hi},
        "elapsed_sec": {
            str(cpus_lo): results[cpus_lo]["value"],
            str(cpus_hi): results[cpus_hi]["value"],
        },
        "rows": results[cpus_hi]["rows"],
    }


def run_headline_only(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as em

    from rayspatial.pipeline.flagship import flagship

    expand, n_rows = _expand_for(sf_dir)
    # warm-up pass amortizes worker startup so the measurement reflects
    # steady-state throughput (what a long-running cluster job sees)
    _consume(flagship(sf_dir, expand=expand))
    t0 = time.perf_counter()
    _consume(flagship(sf_dir, expand=expand))
    dt = time.perf_counter() - t0
    ray.shutdown()
    return {
        "metric": "flagship throughput",
        "value": round(dt, 3),
        "unit": "sec",
        "queries": {"flagship_join_tiles": round(dt, 3)},
        "sf": _sf_label(sf_dir),
        "num_cpus": num_cpus,
        "rows": n_rows,
        "rows_per_sec": round(n_rows / dt, 1),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
    elif os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        print(json.dumps(run_headline_only(SF_DIR, NUM_CPUS)))
    else:
        print(json.dumps(run_suite(SF_DIR, NUM_CPUS)))
