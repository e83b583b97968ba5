"""Distributed PCA over an embedding column: exact second moments via
integer-quantized partial sums, eigendecomposition on the driver
(d x d only), projection broadcast back through one streaming pass.

The embedding-whitening / dimensionality-reduction step run before
large-scale clustering or ANN indexing.  Scale shape:

1. moments pass — per-batch partials ``(n, sum_x, sum_xxT)`` over
   embeddings quantized to integer 1e6 units; integer sums are
   ORDER-INDEPENDENT, so the accumulated moments (and therefore the
   fitted components) are bit-identical regardless of partitioning,
   worker count or execution order — the determinism float partial
   sums cannot give.  Gather is d^2-bounded (one small row per block).
2. driver eigen — covariance from the exact moments, ``eigh`` on the
   (d, d) matrix, top-q components, sign-fixed (largest-|.|
   coordinate positive) so the basis itself is deterministic.
3. project pass — one map_batches: ``(x - mean) @ components.T``
   against the ``ray.put`` projection; output quantized to integer
   1e6 units so downstream compares are exact.

int64 headroom: |q(x)| <= 1e6 ==> each product <= 1e12; a single
batch of 2^15 rows sums to <= 3.3e16 per cell and the per-block
partials are summed as Python ints on the driver (arbitrary
precision), so overflow needs a SINGLE block of ~9e6 rows — far above
any sane block size; documented here as the operating envelope.

No reference equivalent (pygeos is geometry-only); driver-brief
training-data family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayspatial.textops.ann import _emb_matrix

__all__ = ["pca_fit", "pca_project", "quantize_int8"]

_Q = 1_000_000  # quantization: 1e-6 embedding units


def pca_fit(ds, n_components: int, col: str = "embedding"):
    """-> (mean_q (d,), components (q, d) float64, eigvals_desc (q,)).

    Moments are exact integer sums of 1e6-quantized embeddings —
    deterministic under any partitioning."""

    def partial(batch: pa.Table) -> pa.Table:
        m = np.round(_emb_matrix(batch, col) * _Q).astype(np.int64)
        s1 = m.sum(axis=0)
        s2 = m.T @ m  # (d, d) int64
        return pa.table({
            "n": pa.array([len(m)]),
            "s1": pa.array([s1.tobytes()]),
            "s2": pa.array([s2.tobytes()]),
            "d": pa.array([m.shape[1]]),
        })

    def combine(batch: pa.Table) -> pa.Table:
        # second-level combine: one moments row per REDUCE TASK, so the
        # driver gather is task-count-bounded, not block-count-bounded.
        # Accumulation and serialization use arbitrary-precision Python
        # ints (pickle payload) — the int64 headroom argument only has
        # to hold within a single map block, never across the combine.
        import pickle

        if not len(batch):
            return pa.table({"moments": pa.array([], type=pa.binary())})
        d_ = batch.column("d")[0].as_py()
        n_ = 0
        cs1 = np.zeros(d_, dtype=object)
        cs2 = np.zeros((d_, d_), dtype=object)
        for i in range(len(batch)):
            n_ += batch.column("n")[i].as_py()
            cs1 = cs1 + np.frombuffer(
                batch.column("s1")[i].as_py(), dtype=np.int64).astype(object)
            cs2 = cs2 + np.frombuffer(
                batch.column("s2")[i].as_py(), dtype=np.int64
            ).reshape(d_, d_).astype(object)
        payload = pickle.dumps(
            (n_, [int(v) for v in cs1],
             [int(v) for v in cs2.reshape(-1)], d_))
        return pa.table({"moments": pa.array([payload])})

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(8)
        .map_batches(combine, batch_size=None, batch_format="pyarrow")
        .take_all()
    )
    if not rows:
        raise ValueError("pca_fit: empty dataset")
    import pickle

    n = 0
    s1 = s2 = None
    for r in rows:
        n_, l1, l2, d = pickle.loads(r["moments"])
        a1 = np.asarray(l1, dtype=object)
        a2 = np.asarray(l2, dtype=object).reshape(d, d)
        n += n_
        s1 = a1 if s1 is None else s1 + a1
        s2 = a2 if s2 is None else s2 + a2
    mean_q = s1.astype(np.float64) / n                     # in q-units
    cov = (s2.astype(np.float64) - np.outer(mean_q, s1.astype(np.float64))) / n
    w, v = np.linalg.eigh(cov)                             # ascending
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order].T                                  # (q, d)
    # deterministic sign: largest-|coeff| coordinate positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean_q, comps, w[order]


def pca_project(ds, mean_q: np.ndarray, components: np.ndarray,
                col: str = "embedding", id_col: str = "vec_id"):
    """-> Dataset (vec_id, pc list<int64>): centered projections in
    integer 1e-6 units (one streaming pass against the broadcast
    basis)."""
    import ray

    ref = ray.put((np.asarray(mean_q, dtype=np.float64),
                   np.asarray(components, dtype=np.float64)))

    def project(batch: pa.Table) -> pa.Table:
        mean_q_, comps = ray.get(ref)
        m = np.round(_emb_matrix(batch, col) * _Q).astype(np.float64)
        proj = (m - mean_q_) @ comps.T                     # q-units
        pc_q = np.round(proj).astype(np.int64)
        n, q = pc_q.shape
        lists = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * q, q, dtype=np.int32)),
            pa.array(pc_q.reshape(-1)),
        )
        return pa.table({id_col: batch.column(id_col), "pc": lists})

    return ds.map_batches(project, batch_format="pyarrow")


def quantize_int8(ds, col: str = "embedding", id_col: str = "vec_id"):
    """Per-dimension int8 scalar quantization of an embedding column —
    the 4x storage/bandwidth cut ANN indexes take before sharding.

    All-integer math end to end: embeddings are first quantized to
    exact 1e-6 integer units (same lattice as pca.py), per-dimension
    integer min/max come from one bounded aggregate pass (one (d,)
    row per block), and the code is
    ``q = (x_q - min_q) * 255 // (max_q - min_q)`` — floor division on
    integers, so a SQL oracle reproduces every byte.  Constant
    dimensions map to 0.  Output rows are exploded scalars
    (vec_id, dim, q) for driver-hash friendliness.
    """
    import ray

    def minmax_partial(batch: pa.Table) -> pa.Table:
        m = np.round(_emb_matrix(batch, col) * _Q).astype(np.int64)
        return pa.table({
            "mn": pa.array([m.min(axis=0).tobytes()]),
            "mx": pa.array([m.max(axis=0).tobytes()]),
        })

    def minmax_combine(batch: pa.Table) -> pa.Table:
        # second-level combine: driver gather is task-count-bounded
        if not len(batch):
            return batch
        mn_ = mx_ = None
        for i in range(len(batch)):
            a = np.frombuffer(batch.column("mn")[i].as_py(), dtype=np.int64)
            b = np.frombuffer(batch.column("mx")[i].as_py(), dtype=np.int64)
            mn_ = a if mn_ is None else np.minimum(mn_, a)
            mx_ = b if mx_ is None else np.maximum(mx_, b)
        return pa.table({"mn": pa.array([mn_.tobytes()]),
                         "mx": pa.array([mx_.tobytes()])})

    rows = (
        ds.map_batches(minmax_partial, batch_format="pyarrow")
        .repartition(8)
        .map_batches(minmax_combine, batch_size=None, batch_format="pyarrow")
        .take_all()
    )
    if not rows:
        raise ValueError("quantize_int8: empty dataset")
    mn = np.frombuffer(rows[0]["mn"], dtype=np.int64).copy()
    mx = np.frombuffer(rows[0]["mx"], dtype=np.int64).copy()
    for r in rows[1:]:
        mn = np.minimum(mn, np.frombuffer(r["mn"], dtype=np.int64))
        mx = np.maximum(mx, np.frombuffer(r["mx"], dtype=np.int64))
    span = mx - mn
    ref = ray.put((mn, span))

    def quant(batch: pa.Table) -> pa.Table:
        mn_, span_ = ray.get(ref)
        m = np.round(_emb_matrix(batch, col) * _Q).astype(np.int64)
        safe = np.where(span_ == 0, 1, span_)
        q = (m - mn_) * 255 // safe
        q[:, span_ == 0] = 0
        n, d = q.shape
        return pa.table({
            id_col: pa.array(np.repeat(
                batch.column(id_col).to_numpy(), d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
            "q": pa.array(q.reshape(-1)),
        })

    return ds.map_batches(quant, batch_format="pyarrow")
