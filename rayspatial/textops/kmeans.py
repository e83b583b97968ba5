"""Distributed Lloyd k-means over an embedding column — the full-corpus
clustering loop (vs the bounded-sample quantizer inside textops/ann):
every iteration is ONE streaming map_batches pass whose per-block
output is k x (d+1) partial sums, gathered result-bounded; the corpus
itself is never materialized to the driver.

Determinism / partitioning-independence: the E-step (cosine argmax
against broadcast centroids) is per-row and identical under any block
split; the M-step accumulates per-vector values quantized to integer
micro-units, so the distributed sum is order-independent and the whole
loop is bit-reproducible by a serial numpy reference using the same
formulas — a float M-step would drift with block boundaries.

Seeding: the k vectors with the smallest ids (a one-pass bounded
top-k merge), so runs are deterministic with no RNG.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["kmeans_labels"]

_Q = 1_000_000  # micro-unit quantization of the M-step sums


def _emb_mat(batch: pa.Table, col: str) -> np.ndarray:
    emb = batch.column(col)
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    d = len(emb[0])
    return (emb.flatten().to_numpy(zero_copy_only=False)
            .astype(np.float64).reshape(len(batch), d))


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _seed_centroids(ds, k, id_col, col):
    """k lowest-id vectors via per-block top-k + one bounded merge."""
    def local(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        keep = np.argsort(ids, kind="stable")[:k]
        return batch.take(pa.array(np.sort(keep)))

    parts = ds.map_batches(local, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        keep = np.argsort(ids, kind="stable")[:k]
        return batch.take(pa.array(np.sort(keep)))

    seeds = merge(pa.concat_tables(
        t for t in parts.repartition(1)
        .iter_batches(batch_format="pyarrow")))
    return _normalize(_emb_mat(seeds, col))


def kmeans_labels(ds, k: int = 8, iterations: int = 5,
                  id_col: str = "vec_id", col: str = "embedding"):
    """embeddings (id, vector) -> (id, cluster) after ``iterations``
    Lloyd rounds of cosine k-means; also returns centroids via the
    second element of the tuple."""
    import ray

    ds = ds.materialize()        # each iteration re-streams the input
    centroids = _seed_centroids(ds, k, id_col, col)

    for _ in range(iterations):
        cref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            import ray as _ray

            c = _ray.get(cref)
            m = _normalize(_emb_mat(batch, col))
            assign = np.argmax(m @ c.T, axis=1)
            q = np.round(m * _Q).astype(np.int64)
            sums = np.zeros((len(c), m.shape[1]), dtype=np.int64)
            np.add.at(sums, assign, q)
            cnt = np.bincount(assign, minlength=len(c)).astype(np.int64)
            return pa.table({
                "c": pa.array(np.arange(len(c), dtype=np.int64)),
                "n": pa.array(cnt),
                "s": pa.array(list(sums)),
            })

        rows = ds.map_batches(partial, batch_format="pyarrow") \
            .take_all()
        d = centroids.shape[1]
        sums = np.zeros((k, d), dtype=np.int64)
        cnt = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[r["c"]] += np.asarray(r["s"], dtype=np.int64)
            cnt[r["c"]] += r["n"]
        new = centroids.copy()
        nz = cnt > 0
        new[nz] = _normalize(sums[nz].astype(np.float64)
                             / (_Q * cnt[nz, None]))
        centroids = new

    cref = ray.put(centroids)

    def final_assign(batch: pa.Table) -> pa.Table:
        import ray as _ray

        c = _ray.get(cref)
        m = _normalize(_emb_mat(batch, col))
        return pa.table({
            id_col: batch.column(id_col),
            "cluster": pa.array(
                np.argmax(m @ c.T, axis=1).astype(np.int64)),
        })

    return ds.map_batches(final_assign, batch_format="pyarrow"), centroids
