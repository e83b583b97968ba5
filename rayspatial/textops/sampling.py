"""Deterministic stratified sampling for training-data curation:
rebalance a corpus by keeping each document with a per-stratum
probability decided by a HASH of its id, not an RNG — so the sample is
reproducible run-to-run, independent of partitioning and execution
order, resumable after failure, and exactly reproducible by a SQL
oracle.

keep(doc)  iff  splitmix64(key + seed) mod 1e6  <  rate[stratum] * 1e6

Scale shape: pure map_batches filter — no shuffle, no state, no
driver-side pass; the rate table is a tiny closure constant.  At
100 TB this is the canonical "downsample English, keep the tail
languages" stage run before expensive dedup/scoring.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayspatial.textops.hashing import hash_int64

__all__ = ["stratified_sample", "cap_per_group", "train_val_test_split"]


def stratified_sample(ds, rates: dict[str, float],
                      default_rate: float = 1.0,
                      strata_col: str = "lang", key_col: str = "doc_id",
                      seed: int = 0):
    """Keep each row iff hash(key) mod 1e6 < round(rate(stratum)*1e6).

    ``rates`` maps stratum value -> keep probability in [0, 1];
    strata not listed use ``default_rate``."""
    thr = {k: int(round(v * 1_000_000)) for k, v in rates.items()}
    dthr = int(round(default_rate * 1_000_000))

    def sample_batch(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy().astype(np.int64)
        strata = batch.column(strata_col)
        # dictionary-encode the stratum column once per batch, then a
        # tiny per-distinct-value threshold lookup (no per-row Python)
        if isinstance(strata, pa.ChunkedArray):
            strata = strata.combine_chunks()
        enc = strata.dictionary_encode()
        vals = enc.dictionary.to_pylist()
        lut = np.array([thr.get(v, dthr) for v in vals], dtype=np.int64)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        h = hash_int64(keys, seed=seed) % np.uint64(1_000_000)
        keep = h.astype(np.int64) < lut[codes]
        return batch.filter(pa.array(keep))

    return ds.map_batches(sample_batch, batch_format="pyarrow")


def cap_per_group(ds, group_col: str, n: int, order_col: str = "doc_id",
                  num_partitions: int | None = None):
    """Domain-contribution capping: keep at most the FIRST ``n`` rows
    per group (ordered by ``order_col`` ascending, deterministic).

    The per-host cap every web-corpus curation pipeline applies so a
    handful of mega-domains cannot dominate the training mix.  One
    hash shuffle keyed by group; per-partition vectorized
    sort + ``groupby.head(n)`` (every row of a group is co-partitioned,
    so the cap is exact).  Output is bounded by ``n x |groups|``.
    """
    from rayspatial.util import hash_partitioned_agg

    def head_n(df):
        df = df.sort_values([group_col, order_col], kind="mergesort")
        return df.groupby(group_col, sort=False).head(n)

    return hash_partitioned_agg(ds, [group_col], head_n,
                                num_partitions=num_partitions)


def train_val_test_split(ds, val_ppm: int = 50_000, test_ppm: int = 50_000,
                         key_col: str = "doc_id", seed: int = 0):
    """Deterministic hash-based dataset split: each row is assigned
    'train' / 'val' / 'test' from ``splitmix64(key) mod 1e6`` — fixed
    by the KEY, so the split is reproducible run-to-run, disjoint by
    construction, stable under re-partitioning/appends, and resumable
    (same properties as ``stratified_sample``).  ``val_ppm``/
    ``test_ppm`` are parts-per-million (defaults: 5% / 5%).

    Pure map_batches (no shuffle, no state); emits the input rows plus
    a ``split`` column.
    """
    if val_ppm + test_ppm > 1_000_000:
        raise ValueError("val_ppm + test_ppm must be <= 1e6")

    def assign(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy().astype(np.int64)
        h = (hash_int64(keys, seed=seed) % np.uint64(1_000_000)).astype(
            np.int64)
        split = np.where(
            h < val_ppm, "val",
            np.where(h < val_ppm + test_ppm, "test", "train"))
        return batch.append_column("split", pa.array(split))

    return ds.map_batches(assign, batch_format="pyarrow")


def weighted_sample(ds, k: int, id_col: str = "doc_id",
                    weight_col: str = "n_chars"):
    """Deterministic weight-proportional sample WITHOUT replacement of
    ``k`` rows (Efraimidis-Spirakis A-ES): each row gets priority
    ``u ** (1/w)`` with ``u`` a hash-derived uniform in (0,1), and the
    global top-``k`` priorities are the sample — the curation shape
    "sample documents proportional to token count" as ONE streaming
    pass + a bounded merge.

    Determinism + SQL reproducibility: ``u`` is a Knuth multiplicative
    mix of the id (``(id*2654435761 + 12345) % 2^32``, exact in int64),
    the priority is quantized to integer micro-units with FLOOR, and
    ties break by ascending id — an ORDER BY ... LIMIT k oracle
    reproduces the selection hash-exactly.

    Shape: per-block vectorized priorities + LOCAL top-k (the
    combiner), one k x blocks merge — the corpus never shuffles and
    the driver never sees it.  Rows with weight <= 0 are excluded.
    """
    import pyarrow as pa

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        w = batch.column(weight_col).to_numpy().astype(np.float64)
        pos = w > 0
        ids_v, w_v = ids[pos], w[pos]
        u = ((ids_v * 2654435761 + 12345) % 4294967296 + 1) / 4294967297.0
        key = np.floor(1e6 * np.power(u, 1.0 / w_v)).astype(np.int64)
        kk = min(k, len(ids_v))
        if kk == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                weight_col: pa.array([], type=pa.int64()),
                "key_micro": pa.array([], type=pa.int64())})
        sel = np.lexsort((ids_v, -key))[:kk]
        return pa.table({
            id_col: pa.array(ids_v[sel]),
            weight_col: pa.array(
                batch.column(weight_col).to_numpy()[pos][sel]),
            "key_micro": pa.array(key[sel]),
        })

    partial = ds.map_batches(local_topk, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas().sort_values(
            ["key_micro", id_col], ascending=[False, True], kind="stable")
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    return partial.repartition(1).map_batches(
        merge, batch_size=None, batch_format="pyarrow")


__all__.append("weighted_sample")
