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


def cluster_cpus(default: int = 8) -> int:
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default


def num_blocks_for(rows: int, bytes_: int = 0, min_blocks: int = 1) -> int:
    by_rows = math.ceil(rows / TARGET_ROWS_PER_BLOCK)
    by_bytes = math.ceil(bytes_ / TARGET_BYTES_PER_BLOCK) if bytes_ else 1
    cap = 4 * cluster_cpus()
    return max(min_blocks, min(max(by_rows, by_bytes), cap))


def read_parquet_sized(path: str, columns: list[str] | None = None,
                       rows_hint: int | None = None):
    """read_parquet with volume-driven ``override_num_blocks``.

    ``rows_hint``: expected OUTPUT rows if a downstream stage fans out
    (e.g. page expansion) — sizes blocks for the work, not the file.
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    md = pq.read_metadata(path)
    rows = rows_hint if rows_hint is not None else md.num_rows
    nb = num_blocks_for(rows, md.serialized_size)
    return rd.read_parquet(path, columns=columns, override_num_blocks=nb)
