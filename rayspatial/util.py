"""Small engine-wide helpers.

Block sizing: Ray Data's default parquet split targets ~2 blocks per
CPU, which is right for big files but pathological for tiny ones — a
500-row table split into 64 blocks makes every downstream all-to-all
pay 64x task-launch overhead for microseconds of work.  We size blocks
by DATA VOLUME (rows/bytes), capped at 4 blocks per CPU: at 100 TB the
cap dominates (same as the default), on test-scale inputs the volume
term collapses to a handful of blocks.
"""

from __future__ import annotations

import math

TARGET_ROWS_PER_BLOCK = 32_768
TARGET_BYTES_PER_BLOCK = 32 << 20


def enable_hash_shuffle() -> bool:
    """OPT-IN (RAYSPATIAL_SHUFFLE=hash): switch Ray Data's groupby/
    aggregate exchange from the default sort shuffle to hash
    partitioning.  On a raw 8M-row groupby(part).map_groups micro the
    hash exchange wins big (15.4s sort -> 2.0s hash at 32 cpus — the
    sort exchange's sample/merge barrier dominates), BUT Ray 2.49.2's
    implementation is not production-safe for this engine, so it stays
    off by default:

    - aggregator actors RESERVE cpus up-front independent of cluster
      size; at <=8 cpus (the driver's correctness harness) the
      reservation starves the map tasks and real pipelines stall
      indefinitely (observed: dup_groups 1.9s sort, >120s hash);
    - ``HashShuffleAggregator.finalize`` sorts each output partition by
      the key column and raises ArrowInvalid on empty blocks whose
      schema lacks it (observed on canonical_docs' tag/union plan at
      32 cpus) — a Ray-side bug the engine cannot work around without
      padding every empty batch.

    Must run BEFORE a Dataset is created (each Dataset snapshots the
    context).  Returns True if applied."""
    import os

    if os.environ.get("RAYSPATIAL_SHUFFLE", "sort") != "hash":
        return False
    try:
        from ray.data import DataContext
        from ray.data.context import ShuffleStrategy

        ctx = DataContext.get_current()
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # The default 64 aggregator actors reserve 16 CPUs (0.25 each)
        # REGARDLESS of cluster size — on a small session (the driver's
        # 8-cpu correctness harness) that deadlocks against the map
        # tasks.  Cap aggregators to the cluster so the reservation is
        # always a fraction of it.
        cpus = cluster_cpus()
        ctx.max_hash_shuffle_aggregators = max(2, min(cpus, 16))
        return True
    except (ImportError, AttributeError):
        return False  # older Ray: keep the default sort shuffle


def cluster_cpus(default: int = 8) -> int:
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default


def num_blocks_for(rows: int, bytes_: int = 0, min_blocks: int = 1,
                   rows_per_block: int | None = None) -> int:
    by_rows = math.ceil(rows / (rows_per_block or TARGET_ROWS_PER_BLOCK))
    by_bytes = math.ceil(bytes_ / TARGET_BYTES_PER_BLOCK) if bytes_ else 1
    cap = 4 * cluster_cpus()
    return max(min_blocks, min(max(by_rows, by_bytes), cap))


def hash_partitioned_agg(ds, key_cols: list[str], pandas_agg,
                         num_partitions: int | None = None,
                         arrow: bool = False):
    """High-cardinality groupby-aggregate: hash-partition rows by key
    (ONE shuffle into ``num_partitions`` groups), then run a vectorized
    pandas aggregation over each partition.

    Ray's built-in sort-based ``groupby().aggregate()`` degrades badly
    when the number of DISTINCT groups approaches the number of rows
    (measured: 1.1M 2-key groups over 1.3M rows = 292s vs 4s this way);
    partition-wise pandas aggregation is the right shape because each
    key lives in exactly one partition.

    ``pandas_agg(df) -> DataFrame`` must aggregate a partition's rows
    (all rows of any key are guaranteed co-partitioned).  Returns a
    Dataset of Arrow blocks.
    """
    import numpy as np
    import pyarrow as pa

    from rayspatial.textops.hashing import hash_int64

    P = num_partitions or 2 * cluster_cpus()

    def _key_u64(col) -> np.ndarray:
        typ = col.type
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            from rayspatial.textops.hashing import hash_strings

            return hash_strings(col)
        v = col.to_numpy(zero_copy_only=False)
        return v.astype(np.int64).view(np.uint64)

    def add_part(batch: pa.Table) -> pa.Table:
        h = np.zeros(len(batch), dtype=np.uint64)
        for c in key_cols:
            h = hash_int64(h ^ _key_u64(batch.column(c)))
        return batch.append_column(
            "_agg_part", pa.array((h % np.uint64(P)).astype(np.int64))
        )

    if arrow:
        # Arrow-format partitions: int64-with-null columns stay int64
        # instead of widening to float64 at the pandas conversion (which
        # silently corrupts values > 2^53); the agg fn splits/converts
        # what it needs itself.
        def agg_partition_arrow(t: pa.Table):
            out = pandas_agg(t.drop_columns(["_agg_part"]))
            if isinstance(out, pa.Table):
                return out
            return pa.Table.from_pandas(out, preserve_index=False)

        return (
            ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("_agg_part")
            .map_groups(agg_partition_arrow, batch_format="pyarrow")
        )

    def agg_partition(df):
        out = pandas_agg(df.drop(columns=["_agg_part"]))
        if isinstance(out, pa.Table):  # typed output (e.g. nullable int64)
            return out
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_agg_part")
        .map_groups(agg_partition, batch_format="pandas")
    )


def read_parquet_sized(path: str, columns: list[str] | None = None,
                       rows_hint: int | None = None,
                       rows_per_block: int | None = None):
    """read_parquet with volume-driven ``override_num_blocks``.

    ``rows_hint``: expected OUTPUT rows if a downstream stage fans out
    (e.g. page expansion) — sizes blocks for the work, not the file.
    ``rows_per_block``: override the 32k default for stages whose
    per-row cost is heavy (signature computation, decode) so a small
    table still splits into parallel tasks.
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    md = pq.read_metadata(path)
    rows = rows_hint if rows_hint is not None else md.num_rows
    nb = num_blocks_for(rows, md.serialized_size, rows_per_block=rows_per_block)
    # Single-file reads split via SplitBlocks inside ONE read task whose
    # streaming generator buffers only ~2 blocks — downstream fan-out is
    # then throttled to the buffer size (measured: 128 blocks x 0.25s
    # map ran at ~3.5-wide instead of 32).  When the split blocks are
    # SMALL (test-scale tables; a real multi-file 100-TB input has one
    # read task per file and never hits this), widen the buffer so every
    # split block is available to the scheduler at once.
    if nb > 8 and md.num_row_groups < nb and md.serialized_size < (64 << 20):
        from ray.data import DataContext

        # Private Ray API (ray 2.49): the streaming-gen buffer size knob.
        # Scoped per-read — the Dataset's ExecutionPlan snapshots a COPY
        # of the current context at creation, so we set it, build the
        # dataset, and restore the process-global context immediately;
        # subsequent (possibly large multi-file) reads keep the default.
        ctx = DataContext.get_current()
        cur = getattr(ctx, "_max_num_blocks_in_streaming_gen_buffer", None)
        if cur is not None and cur < nb:
            try:
                ctx._max_num_blocks_in_streaming_gen_buffer = nb
                return rd.read_parquet(path, columns=columns,
                                       override_num_blocks=nb)
            finally:
                ctx._max_num_blocks_in_streaming_gen_buffer = cur
    return rd.read_parquet(path, columns=columns, override_num_blocks=nb)


def quiet_thp():
    """Best-effort: disable transparent-hugepage merging for this host.

    Measured in this sandbox: khugepaged THP compaction (madvise mode)
    made first-touch page faults intermittently ~150x slower (a 12 MB
    np.arange took 2+ seconds), which dominated fresh-process benchmark
    runs and injected ~30% noise into the scaling ratio.  Writing
    'never' drops first-touch to ~13 ms.  No-op without root or the
    sysfs knobs (containers); harness entrypoints call this, library
    code never does.

    The write is HOST-WIDE, so callers must undo it: returns a
    ``restore()`` callable that puts back the values read before the
    change (no-op if nothing was written).  Harness entrypoints call it
    at teardown/atexit.
    """
    saved: list[tuple[str, str]] = []
    for knob in ("enabled", "defrag"):
        path = f"/sys/kernel/mm/transparent_hugepage/{knob}"
        try:
            with open(path) as f:
                # sysfs format: "always defrag [madvise] never" — the
                # bracketed token is the active value
                cur = f.read()
            active = cur[cur.index("[") + 1 : cur.index("]")] if "[" in cur \
                else cur.strip()
            with open(path, "w") as f:
                f.write("never")
            if active != "never":
                saved.append((path, active))
        except (OSError, ValueError):
            pass

    def restore() -> None:
        for path, val in saved:
            try:
                with open(path, "w") as f:
                    f.write(val)
            except OSError:
                pass

    return restore


def read_csv_sized(path: str, rows_hint: int | None = None,
                   rows_per_block: int | None = None, **kwargs):
    """read_csv with the same volume-driven block sizing contract as
    read_parquet_sized (file bytes stand in for serialized size; row
    count estimated from a 64 KB head sample when no hint is given).
    Extra kwargs pass through to ``ray.data.read_csv`` (e.g.
    arrow-csv parse/convert options)."""
    import os

    import ray.data as rd

    size = os.path.getsize(path)
    rows = rows_hint
    if rows is None:
        with open(path, "rb") as f:
            head = f.read(64 << 10)
        nl = max(head.count(b"\n"), 1)
        rows = max(int(size / max(len(head) / nl, 1)) - 1, 1)
    nb = num_blocks_for(rows, size, rows_per_block=rows_per_block)
    return rd.read_csv(path, override_num_blocks=nb, **kwargs)


def read_json_sized(path: str, rows_hint: int | None = None,
                    rows_per_block: int | None = None, **kwargs):
    """read_json (JSONL) with the volume-driven block sizing contract
    of read_parquet_sized; same head-sample row estimate as
    read_csv_sized."""
    import os

    import ray.data as rd

    size = os.path.getsize(path)
    rows = rows_hint
    if rows is None:
        with open(path, "rb") as f:
            head = f.read(64 << 10)
        nl = max(head.count(b"\n"), 1)
        rows = max(int(size / max(len(head) / nl, 1)), 1)
    nb = num_blocks_for(rows, size, rows_per_block=rows_per_block)
    return rd.read_json(path, override_num_blocks=nb, **kwargs)
