"""Distributed time-interval (range) join — a custom wide operator Ray
Data lacks (the driver brief lists range joins as a canonical
custom-operator case, alongside the as-of join in ops/asof.py).

Semantics: for every LEFT row, aggregate the RIGHT rows with the same
``by`` key whose ``on`` value lies in the half-open interval
``(left.on, left.on + delta]`` — COUNT plus an exact int64 SUM of a
value column.  Inner semantics: left rows with zero matches drop.

Shape (ONE shuffle, no partial-merge pass):

- bucket ``on`` by ``delta``: a right row with bucket ``b`` can only
  match left rows in buckets ``b`` or ``b-1``, so the RIGHT side is
  replicated to buckets ``{b, b-1}`` while every LEFT row goes to its
  own bucket exactly once.  Because each left row lives in exactly one
  partition, per-partition results are final — no second aggregation
  shuffle (contrast: replicating the LEFT would need a downstream
  per-left-id combine).
- the shuffle key is ``(assigned_bucket, hash(by) % salt)`` so one hot
  time bucket spreads over ``salt`` partitions while all candidates for
  any (left row, key) pair still co-locate.
- per partition the kernel is fully vectorized: lexsort the right rows
  by (bucket, key, on), build a dense-ranked composite int64, then two
  ``np.searchsorted`` probes per left row give the match range; COUNT
  is ``hi - lo`` and SUM is a prefix-sum difference.  No Python row
  loop anywhere.

At 100 TB: partition count scales with (time span / delta) x salt; the
only data motion is the one hash exchange of the two (already
column-pruned) sides, with the right side doubled.  Skewed keys are
absorbed by the salt dimension because the composite probe handles many
keys per partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def interval_agg_join(left_ds, right_ds, by: str, on: str, delta: int,
                      left_id: str, right_value: str,
                      out_count: str = "n_right",
                      out_sum: str = "sum_right",
                      salt: int = 8,
                      num_partitions: int | None = None):
    """LEFT (left_id, by, on) x RIGHT (by, on, right_value) ->
    Dataset (left_id, out_count, out_sum) for left rows with >= 1 match
    in ``(on, on + delta]``.  ``on`` and ``right_value`` must be int64
    (cast timestamps to epoch-us and money to cents upstream — integer
    arithmetic keeps the operator exactly reproducible by SQL).
    """
    from rayspatial.textops.hashing import hash_int64
    from rayspatial.util import hash_partitioned_agg

    delta = int(delta)
    salt_u = np.uint64(max(1, salt))

    def tag_left(batch: pa.Table) -> pa.Table:
        on_v = batch.column(on).to_numpy().astype(np.int64)
        key = batch.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(batch)
        return pa.table({
            "_side": pa.array(np.ones(n, dtype=np.int8)),
            "_bucket": pa.array(on_v // delta),
            "_ksalt": pa.array(
                (hash_int64(key.view(np.uint64)) % salt_u).astype(np.int64)),
            by: batch.column(by),
            on: pa.array(on_v),
            left_id: batch.column(left_id),
            right_value: pa.array(np.zeros(n, dtype=np.int64)),
        })

    def tag_right(batch: pa.Table) -> pa.Table:
        on_v = batch.column(on).to_numpy().astype(np.int64)
        key = batch.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        val = batch.column(right_value).to_numpy().astype(np.int64)
        b = on_v // delta
        n = len(batch)
        # replica 1: own bucket; replica 2: previous bucket (covers left
        # rows of bucket b-1 whose window reaches into bucket b)
        buckets = np.concatenate([b, b - 1])
        rep = np.concatenate([np.arange(n), np.arange(n)])
        ks = (hash_int64(key.view(np.uint64)) % salt_u).astype(np.int64)
        return pa.table({
            "_side": pa.array(np.zeros(2 * n, dtype=np.int8)),
            "_bucket": pa.array(buckets),
            "_ksalt": pa.array(np.concatenate([ks, ks])),
            by: pa.array(key[rep]),
            on: pa.array(on_v[rep]),
            left_id: pa.array(np.zeros(2 * n, dtype=np.int64)),
            right_value: pa.array(val[rep]),
        })

    lt = left_ds.map_batches(tag_left, batch_format="pyarrow")
    rt = right_ds.map_batches(tag_right, batch_format="pyarrow")
    unioned = lt.union(rt)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        side = df["_side"].to_numpy()
        lmask = side == 1
        ln = int(lmask.sum())
        rn = len(df) - ln
        empty = pd.DataFrame({left_id: pd.Series([], dtype=np.int64),
                              out_count: pd.Series([], dtype=np.int64),
                              out_sum: pd.Series([], dtype=np.int64)})
        if ln == 0 or rn == 0:
            return empty
        bkt = df["_bucket"].to_numpy().astype(np.int64)
        key = df[by].to_numpy().astype(np.int64)
        on_v = df[on].to_numpy().astype(np.int64)

        # dense-rank (bucket, key) pairs across BOTH sides so the
        # composite fits int64: composite = pair_rank * span + on_rel
        pair = np.stack([bkt, key], axis=1)
        _, pair_rank = np.unique(pair, axis=0, return_inverse=True)
        # offset within the row's ASSIGNED bucket: left rel in
        # [0, delta), right replicas in [0, 2*delta); left probes add
        # delta — span 3*delta + slack keeps groups disjoint
        rel = on_v - bkt * np.int64(delta)
        span = np.int64(3) * np.int64(delta) + np.int64(2)
        comp = pair_rank.astype(np.int64) * span + rel

        rcomp = comp[~lmask]
        rval = df[right_value].to_numpy().astype(np.int64)[~lmask]
        order = np.argsort(rcomp, kind="stable")
        rcomp = rcomp[order]
        csum = np.concatenate([[0], np.cumsum(rval[order])])

        lcomp = comp[lmask]
        lo = np.searchsorted(rcomp, lcomp, side="right")
        hi = np.searchsorted(rcomp, lcomp + np.int64(delta), side="right")
        cnt = hi - lo
        keep = cnt > 0
        return pd.DataFrame({
            left_id: df[left_id].to_numpy().astype(np.int64)[lmask][keep],
            out_count: cnt[keep].astype(np.int64),
            out_sum: (csum[hi] - csum[lo])[keep].astype(np.int64),
        })

    return hash_partitioned_agg(unioned, ["_bucket", "_ksalt"],
                                per_partition,
                                num_partitions=num_partitions)
