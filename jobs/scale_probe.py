"""Scale probe: run one shuffle-heavy pipeline at an arbitrary row
count, optionally under a CAPPED object store, and report wall time +
spill stats — the sandbox evidence for the two 100-TB properties the
north rule cares about:

- **memory pressure**: a shuffle whose working set exceeds the object
  store must complete by SPILLING, not OOM (``--store-gb`` caps the
  plasma store; the probe reports ``spilled_mb`` from Ray's own
  memory summary).
- **data-size linearity**: the same op at N and 4N rows should take
  ~4x the wall time (no super-linear shuffle term).

Inputs are synthesized deterministically at any scale (pure function
of the row id via splitmix64 — same schema as the sf tables, no
external data): documents get a 30-word text from a 50k vocabulary
with ~1% planted near-duplicate siblings (id % 100 == 99 copies the
text of id-1 with the last word changed), events get uniform users /
timestamps / types.  The flagship op reuses the bench expansion path
(pages.read_pages(expand=K)) so its numbers stay comparable with
BENCH_r*.json.

Usage (each invocation OWNS a fresh Ray session — run one op per
process, like the scaling bench):

    python jobs/scale_probe.py --op global_rank --rows 8000000
    python jobs/scale_probe.py --op dup_groups --rows 2000000 --store-gb 4

Prints ONE JSON line: {op, rows, store_gb, wall_s, rows_per_s,
out_rows, spilled_mb, restored_mb, num_cpus}.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

VOCAB_SIZE = 50_000
WORDS_PER_DOC = 30


def _splitmix(x: np.ndarray) -> np.ndarray:
    x = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


_VOCAB = np.array([f"w{i}" for i in range(VOCAB_SIZE)])


def _text_for(ids: np.ndarray) -> list[str]:
    """Deterministic 30-word text per id; id % 100 == 99 reproduces the
    text of id-1 with the last word changed (a planted near-dup), which
    works without cross-row data because text is a pure function of the
    seed id."""
    sib = ids % 100 == 99
    seed_ids = np.where(sib, ids - 1, ids)
    # (n, W) word indices
    idx = np.empty((len(ids), WORDS_PER_DOC), dtype=np.uint64)
    for j in range(WORDS_PER_DOC):
        idx[:, j] = _splitmix(seed_ids * np.uint64(WORDS_PER_DOC) + np.uint64(j))
    idx %= np.uint64(VOCAB_SIZE)
    words = _VOCAB[idx.astype(np.int64)]
    # near-dup sibling: last word differs
    if sib.any():
        words[sib, -1] = "zz_changed"
    return [" ".join(row) for row in words]


def synth_docs(n_rows: int, columns=("doc_id", "text")):
    """-> Dataset with the documents schema subset, synthesized
    deterministically; ~1% of rows are near-duplicate siblings."""
    import ray.data

    from rayspatial.util import cluster_cpus

    blocks = max(8, min(4 * cluster_cpus(), n_rows // 8_192 or 1))
    ds = ray.data.range(n_rows, override_num_blocks=blocks)

    def make(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy().astype(np.int64)
        cols = {}
        if "doc_id" in columns:
            cols["doc_id"] = pa.array(ids)
        if "text" in columns:
            cols["text"] = pa.array(_text_for(ids.view(np.uint64)))
        if "n_chars" in columns:
            cols["n_chars"] = pa.array(
                (_splitmix(ids.view(np.uint64)) % np.uint64(20_000))
                .astype(np.int64))
        return pa.table(cols)

    return ds.map_batches(make, batch_format="pyarrow")


def synth_events(n_rows: int):
    """-> Dataset with the events schema subset (event_id, ts, user_id,
    event_type): ~n/500 users, 30 days of EPOCH-SECOND int64
    timestamps roughly ordered by event_id with +-240s jitter (so the
    600s-lateness watermark drops only the jitter tail, not the
    stream — arrival order ~ event time, like a real log), types
    click 40% / purchase 10% / view 50%."""
    import ray.data

    from rayspatial.util import cluster_cpus

    blocks = max(8, min(4 * cluster_cpus(), n_rows // 8_192 or 1))
    ds = ray.data.range(n_rows, override_num_blocks=blocks)
    n_users = max(64, n_rows // 500)
    base_us = 1_700_000_000_000_000  # 2023-11-14, arbitrary fixed epoch
    span_us = 30 * 86_400 * 1_000_000

    def make(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy().astype(np.int64)
        u = ids.view(np.uint64)
        # microseconds: the streaming ops' ts contract (ops/streaming.py
        # converts *_s args to us)
        jitter = ((_splitmix(u) % np.uint64(480)).astype(np.int64)
                  - 240) * 1_000_000
        ts_us = base_us + ids * (span_us // n_rows) + jitter
        user = (_splitmix(u * np.uint64(7)) % np.uint64(n_users)
                ).astype(np.int64)
        k = _splitmix(u * np.uint64(13)) % np.uint64(10)
        etype = np.where(k < 4, "click", np.where(k < 5, "purchase", "view"))
        return pa.table({
            "event_id": pa.array(ids),
            "ts": pa.array(ts_us),
            "user_id": pa.array(user),
            "event_type": pa.array(etype),
        })

    return ds.map_batches(make, batch_format="pyarrow")


def _consume(ds) -> int:
    return ds.count()


def run_op(op: str, rows: int, sf_dir: str) -> int:
    if op == "flagship":
        import pyarrow.parquet as pq

        from rayspatial.pipeline.flagship import flagship

        n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
        return _consume(flagship(sf_dir, expand=max(1, rows // n_docs)))
    if op == "global_rank":
        from rayspatial.ops.quantile import range_partitioned_rank

        ds = synth_docs(rows, columns=("doc_id", "n_chars"))
        return _consume(
            range_partitioned_rank(ds, "n_chars", "doc_id", num_parts=64))
    if op == "dup_groups":
        from rayspatial.textops.components import (
            connected_components_distributed,
        )
        from rayspatial.textops.dedup import ngram_jaccard_dup_pairs

        pairs = ngram_jaccard_dup_pairs(
            synth_docs(rows), k=3, threshold_pct=50
        ).map_batches(lambda b: b.select(["a", "b"]), batch_format="pyarrow")
        return _consume(connected_components_distributed(pairs))
    if op == "span_dedup":
        from rayspatial.textops.spandedup import span_dedup

        return _consume(span_dedup(synth_docs(rows)))
    if op == "canonical_docs":
        # dup groups -> anti-join docs against the labeled drop set;
        # exercises the presence-join broadcast gate with TEXT on the
        # left side (the union-diamond hazard class)
        import pyarrow.compute as pc

        from rayspatial.ops.relational import anti_join
        from rayspatial.textops.components import (
            connected_components_distributed,
        )
        from rayspatial.textops.dedup import ngram_jaccard_dup_pairs

        docs = synth_docs(rows)
        pairs = ngram_jaccard_dup_pairs(docs, k=3, threshold_pct=50
            ).map_batches(lambda b: b.select(["a", "b"]),
                          batch_format="pyarrow")
        labels = connected_components_distributed(pairs)
        drops = labels.map_batches(
            lambda b: pa.table({"doc_id": b.filter(
                pc.less(b.column("rep"), b.column("doc_id"))
            ).column("doc_id")}), batch_format="pyarrow")
        return _consume(anti_join(docs, drops, on="doc_id",
                                  left_cols=["doc_id", "text"]))
    if op == "stream_stream_join":
        import pyarrow.compute as pc

        from rayspatial.ops.streaming import streaming_interval_join

        ds = synth_events(rows)

        def only(kind):
            def fn(batch):
                return batch.filter(
                    pc.equal(batch.column("event_type"), kind))
            return fn

        pur = ds.map_batches(only("purchase"), batch_format="pyarrow")
        clk = ds.map_batches(only("click"), batch_format="pyarrow")
        return _consume(streaming_interval_join(
            pur, clk, before_s=1800, after_s=300, lateness_s=600,
            num_partitions=64))
    raise SystemExit(f"unknown op: {op}")


def _spill_stats() -> tuple[float, float]:
    """(spilled_mb, restored_mb): cumulative totals from the raylet log
    (the session's spilled-object files are deleted as references drop,
    so directory size under-reports; the raylet logs running totals)."""
    import glob

    spilled = restored = 0.0
    for f in glob.glob("/tmp/ray/*/session_latest/logs/raylet.out") + \
            glob.glob("/tmp/ray/session_latest/logs/raylet.out"):
        try:
            txt = open(f, errors="ignore").read()
        except OSError:
            continue
        sp = re.findall(r"Spilled (\d+) MiB", txt)
        rs = re.findall(r"Restored (\d+) MiB", txt)
        if sp:
            spilled = max(spilled, float(sp[-1]))
        if rs:
            restored = max(restored, float(rs[-1]))
    return spilled, restored


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", required=True)
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--store-gb", type=float, default=0.0,
                    help="cap the object store (0 = Ray default)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get(
        "RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--repeat", type=int, default=2,
                    help="measured legs; best is reported (the FIRST "
                    "run at a new scale pays one-time plasma mmap "
                    "growth + page faults — measured 152s first vs "
                    "46s steady for dup_groups@8M — so single-shot "
                    "numbers conflate allocator warmup with the op)")
    args = ap.parse_args()

    import ray

    kw = {}
    if args.store_gb > 0:
        kw["object_store_memory"] = int(args.store_gb * (1 << 30))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR", **kw)
    from ray.data import DataContext

    from rayspatial.util import enable_hash_shuffle

    DataContext.get_current().enable_progress_bars = False
    enable_hash_shuffle()

    # warm-up at small scale: worker startup / module import / codegen
    # must not be charged to the measured leg (same policy as bench.py)
    run_op(args.op, min(args.rows, 200_000), args.sf_dir)

    walls = []
    out_rows = 0
    for _ in range(max(1, args.repeat)):
        t0 = time.perf_counter()
        out_rows = run_op(args.op, args.rows, args.sf_dir)
        walls.append(round(time.perf_counter() - t0, 2))
    wall = min(walls)
    spilled, restored = _spill_stats()
    print(json.dumps({
        "op": args.op, "rows": args.rows, "store_gb": args.store_gb,
        "wall_s": wall, "walls": walls,
        "rows_per_s": round(args.rows / wall),
        "out_rows": out_rows, "spilled_mb": spilled,
        "restored_mb": restored, "num_cpus": args.num_cpus,
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
