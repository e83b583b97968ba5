"""rayspatial — a Ray-Data-native spatial join + tiling engine.

A from-scratch engine with the query/data-processing capabilities of the
pygeos reference (vectorized geometry kernels, STRtree spatial join, kNN),
re-expressed Ray-Data-first:

- geometry kernels are pure-numpy batched loops over Arrow buffers,
  invoked via ``Dataset.map_batches(fn, batch_format="pyarrow")``;
- the spatial join is a broadcast-STRtree actor-pool stage over
  cell-partitioned probe points;
- wide steps (tiling, dedup, histograms) are groupby shuffles with
  per-batch partial aggregation.

Reference semantics (what to compute) come from /root/reference
(pygeos 0.14); citations in docstrings are file:line into that tree.
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Keep large allocations on the reusable heap instead of fresh
    mmaps.  glibc mmap()s any allocation over 128 KB and munmap()s it
    on free, so every large numpy temporary re-faults its pages; on
    hosts with slow page faults (this sandbox: ~2 s for a 12 MB
    first-touch, measured) that made allocation-heavy kernels 10-100x
    slower than their compute.  Raising the mmap/trim thresholds makes
    freed pages stay resident and reused.  Runs in every process that
    imports the library (driver AND Ray workers); no-op without glibc."""
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except Exception:
        pass


_tune_malloc()

from rayspatial import cell  # noqa: F401
from rayspatial.geom import wkb  # noqa: F401
