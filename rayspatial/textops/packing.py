"""Sequence packing: greedy first-fit of documents into fixed
token-budget training sequences.

The op a pretraining pipeline runs right before tokenized-shard
writing: concatenate documents (in a deterministic order) into
sequences of at most ``budget`` tokens, starting a new sequence when
the next document would overflow (an over-budget document gets a
sequence of its own).

Packing is defined WITHIN (group, window) units — ``window`` is a
fixed ``doc_id`` stride — so the operator is embarrassingly parallel
after one hash shuffle and the result is independent of block
boundaries and worker count (real pipelines pack per shard for the
same reason; a single global sequential pack cannot scale and pins
output to one walker).

Greedy rule per unit, docs in ``id_col`` order: the first doc opens
bin 0 with ``run = nt``; each later doc starts a new bin iff
``run + nt > budget`` (then ``run = nt``), else joins the current bin.

Kernel shape: one map_batches token-count pass (Arrow buffers, no
Python rows) -> hash_partitioned_agg on (group, window) -> per
partition, bins assigned with a rounds loop that is VECTORIZED ACROSS
ALL UNITS in the partition (each round = one ``searchsorted`` against
every active unit's cumulative token counts; rounds = max bins per
unit, not rows).

No reference equivalent (pygeos is geometry-only); driver-brief
training-data family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _greedy_bins(nt: np.ndarray, unit_starts: np.ndarray, budget: int) -> np.ndarray:
    """Bin index per row for each unit (rows [unit_starts[u],
    unit_starts[u+1]) form one unit, already in pack order).

    Rounds loop: every active unit advances one bin per round via one
    vectorized searchsorted on the global cumsum.
    """
    n = len(nt)
    bins = np.zeros(n, dtype=np.int64)
    if n == 0:
        return bins
    cum = np.cumsum(nt)  # cum[i] = tokens through row i (global, per-unit via offsets)
    # per-unit cumulative = cum[i] - base[unit]; searchsorted works on the
    # global cum because units are contiguous slices.
    starts = unit_starts[:-1].astype(np.int64)
    ends = unit_starts[1:].astype(np.int64)
    cur = starts.copy()  # first row of the current bin per unit
    binno = np.zeros(len(starts), dtype=np.int64)
    active = cur < ends
    while active.any():
        c, e, b = cur[active], ends[active], binno[active]
        base = np.where(c > 0, cum[np.maximum(c - 1, 0)], 0)
        # largest j >= c with cum[j] - base <= budget; the bin always
        # takes at least the row at c (over-budget doc -> own bin)
        nxt = np.searchsorted(cum, base + budget, side="right")
        nxt = np.maximum(nxt, c + 1)
        nxt = np.minimum(nxt, e)
        # assign bins[c:nxt] = b for each active unit (vectorized repeat)
        lengths = nxt - c
        idx = np.repeat(c, lengths) + _ragged_arange(lengths)
        bins[idx] = np.repeat(b, lengths)
        cur[active] = nxt
        binno[active] = b + 1
        active = cur < ends
    return bins


def _ragged_arange(counts: np.ndarray) -> np.ndarray:
    total = int(counts.sum())
    if not total:
        return np.empty(0, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def pack_sequences(
    ds,
    budget: int = 256,
    window: int = 64,
    group_col: str = "lang",
    id_col: str = "doc_id",
):
    """-> Dataset (doc_id, group, win, bin, n_tokens): training-sequence
    assignment per document.  ``win = doc_id // window``; packing order
    is ``doc_id`` ascending within each (group, win) unit."""
    from rayspatial.textops.hashing import split_words
    from rayspatial.util import hash_partitioned_agg

    def token_counts(batch: pa.Table) -> pa.Table:
        _, off = split_words(batch.column("text"))
        ids = batch.column(id_col).to_numpy()
        return pa.table(
            {
                id_col: batch.column(id_col),
                group_col: batch.column(group_col),
                "win": pa.array(ids // window),
                "n_tokens": pa.array(np.diff(off)),
            }
        )

    counted = ds.map_batches(token_counts, batch_format="pyarrow")

    def pack_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype="int64"),
                    group_col: pd.Series(dtype="object"),
                    "win": pd.Series(dtype="int64"),
                    "bin": pd.Series(dtype="int64"),
                    "n_tokens": pd.Series(dtype="int64"),
                }
            )
        df = df.sort_values([group_col, "win", id_col], kind="mergesort")
        nt = df["n_tokens"].to_numpy(dtype=np.int64)
        # unit boundaries: change of (group, win)
        g = df[group_col].to_numpy()
        w = df["win"].to_numpy()
        newunit = np.r_[True, (g[1:] != g[:-1]) | (w[1:] != w[:-1])]
        unit_starts = np.r_[np.flatnonzero(newunit), len(df)]
        df = df.assign(bin=_greedy_bins(nt, unit_starts, budget))
        return df[[id_col, group_col, "win", "bin", "n_tokens"]]

    return hash_partitioned_agg(counted, [group_col, "win"], pack_partition)
