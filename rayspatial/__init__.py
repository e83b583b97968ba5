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

from rayspatial import cell  # noqa: F401
from rayspatial.geom import wkb  # noqa: F401
