"""Benchmark decontamination: drop training documents that share any
word-``k``-gram with a (small) benchmark/eval corpus.

The standard training-data hygiene step (remove eval contamination
before training).  Two passes, no shuffle:

1. benchmark pass — distinct shingle hashes per block (vectorized
   ``word_shingle_hashes``), union-merged and broadcast once via
   ``ray.put``.  Eval corpora are tiny relative to the training set
   (10^5-10^7 n-grams vs 10^12 docs), so the broadcast side is
   bounded by the BENCHMARK size, never the training corpus.
2. filter pass — one streaming ``map_batches`` over the training set:
   per-doc shingle hashes membership-tested against the sorted
   broadcast array with ``np.searchsorted`` (no Python rows).

At larger eval sets, swap the sorted array for a Bloom filter with the
same broadcast shape (the equijoin prefilter in ops/equijoin.py is the
template); exactness then needs an in-bucket verify like dedup.py.

No reference equivalent (pygeos is geometry-only); this is part of the
driver brief's training-data operator family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayspatial.textops.hashing import word_shingle_hashes


def benchmark_ngram_hashes(bench_ds, k: int = 4) -> np.ndarray:
    """Sorted distinct uint64 word-k-gram hashes of the benchmark
    corpus.  Per-block distinct first, so the driver gather is bounded
    by the benchmark's (small) n-gram vocabulary."""

    def block_hashes(batch: pa.Table) -> pa.Table:
        flat, _ = word_shingle_hashes(batch.column("text"), k=k)
        return pa.table({"h": pa.array(np.unique(flat).view(np.int64))})

    parts = bench_ds.map_batches(block_hashes, batch_format="pyarrow").take_all()
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.unique(
        np.fromiter((r["h"] for r in parts), dtype=np.int64)
    ).view(np.uint64)


def decontaminate(
    train_ds,
    bench_ds,
    k: int = 4,
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = ("n_chars",),
):
    """-> Dataset of surviving training rows (id + keep_cols): docs
    with NO word-k-gram occurring anywhere in ``bench_ds``.

    Docs shorter than ``k`` words have no shingles and always survive
    (nothing to match on).
    """
    import ray

    bench_sorted = np.sort(benchmark_ngram_hashes(bench_ds, k=k))
    bench_ref = ray.put(bench_sorted)

    def keep_clean(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        flat, off = word_shingle_hashes(batch.column("text"), k=k)
        if len(flat) and len(bench):
            pos = np.searchsorted(bench, flat)
            pos[pos == len(bench)] = 0
            hit = bench[pos] == flat
            doc_of = np.repeat(np.arange(len(off) - 1), np.diff(off))
            contaminated = (
                np.bincount(doc_of[hit], minlength=len(off) - 1) > 0
            )
        else:
            contaminated = np.zeros(len(off) - 1, dtype=bool)
        return batch.select([id_col, *keep_cols]).filter(
            pa.array(~contaminated)
        )

    return train_ds.map_batches(keep_clean, batch_format="pyarrow")
