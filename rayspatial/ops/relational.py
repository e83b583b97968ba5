"""Distributed semi/anti join — the key-presence joins Ray Data lacks.

Used by dedup resolution (keep documents NOT named as non-canonical by
the duplicate-group labeling), but generic: filter a big LEFT stream by
key presence/absence in a RIGHT key set without broadcasting it.

Shape: two modes behind a byte-budget gate (ops/equijoin contract).
The right key set is normally SMALL (a labeled drop set, a pair list),
so it is gathered incrementally; if it fits the budget it is ray.put
broadcast and the left stream filters IN PLACE with ``pc.is_in`` — the
left columns never enter a shuffle, and the gather itself serializes
the right side's all-to-alls before the left stream starts (no
union-diamond starvation under a constrained object store; see
textops/spandedup stage 3a for the measured pathology).  If the key
set overflows the budget, fall back to ONE hash shuffle — the left
rows and the right keys are tagged, schema-aligned, unioned and
hash-partitioned by the key, then each partition filters vectorized.
The right side moves only its key column; the left side moves only the
requested output columns; the right key set may be arbitrarily large.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _presence_join(left_ds, right_ds, on: str, left_cols: list[str],
                   keep_present: bool, num_partitions: int | None,
                   broadcast_byte_budget: int = 256 << 20):
    import ray
    import pyarrow.compute as pc

    from rayspatial.util import hash_partitioned_agg

    from rayspatial.ops.equijoin import _pa_type

    out_cols = [c for c in left_cols if c != on]
    sch = left_ds.schema()
    # pandas-block datasets surface numpy dtypes / object — coerce to
    # Arrow types (pa.nulls / empty-keyset construction need DataType)
    left_types = {n: _pa_type(t) for n, t in zip(sch.names, sch.types)}

    # -- broadcast mode: gather right keys under the byte budget -------
    ktabs: list[pa.Table] = []
    total = 0
    fits = True
    for blk_ref in right_ds.map_batches(
            lambda b: b.select([on]),
            batch_format="pyarrow").to_arrow_refs():
        t = ray.get(blk_ref)
        if t.num_rows:
            ktabs.append(t)
            total += t.nbytes
        if total > broadcast_byte_budget:
            fits = False
            break
    if fits:
        if ktabs:
            keyset = pa.concat_tables(ktabs).column(on).combine_chunks()
        else:
            keyset = pa.array([], type=left_types[on])
        key_ref = ray.put(keyset)

        def filter_batch(batch: pa.Table) -> pa.Table:
            ks = ray.get(key_ref)  # zero-copy local-store lookup
            present = pc.is_in(batch.column(on), value_set=ks)
            out = batch.filter(present if keep_present
                               else pc.invert(present))
            return out.select([on] + out_cols)

        return left_ds.map_batches(filter_batch, batch_format="pyarrow")

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {"_side": pa.array(np.ones(len(batch), dtype=np.int8)),
                on: batch.column(on)}
        for c in out_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        cols = {"_side": pa.array(np.zeros(len(batch), dtype=np.int8)),
                on: batch.column(on)}
        for c in out_cols:
            # typed nulls so the two sides union with one schema
            cols[c] = (batch.column(c) if c in batch.column_names
                       else pa.nulls(len(batch), left_types[c]))
        return pa.table(cols)

    lt = left_ds.map_batches(tag_left, batch_format="pyarrow")
    rt = right_ds.map_batches(tag_right, batch_format="pyarrow")

    def per_partition(t: pa.Table) -> pa.Table:
        # Pure-Arrow partition path: the left columns carry typed nulls
        # from the union with the keys-only right side, and the pandas
        # conversion would silently upcast int64-with-null to float64
        # (the canonical_docs n_chars dtype leak).  Arrow filter/is_in
        # keep every column's type exact.
        import pyarrow.compute as pc

        side = t.column("_side")
        left = t.filter(pc.equal(side, 1))
        right_keys = t.filter(pc.equal(side, 0)).column(on).combine_chunks()
        present = pc.is_in(left.column(on), value_set=right_keys)
        out = left.filter(present if keep_present else pc.invert(present))
        # Deterministic output order: the union interleaves left/right
        # blocks nondeterministically, so sort each partition by the key
        # (partition order itself is fixed by the hash; with unique left
        # keys — every current caller — the full output order is fixed).
        out = out.sort_by(on)
        return out.select([on] + out_cols)

    return hash_partitioned_agg(lt.union(rt), [on], per_partition,
                                num_partitions=num_partitions, arrow=True)


def semi_join(left_ds, right_ds, on: str, left_cols: list[str],
              num_partitions: int | None = None,
              broadcast_byte_budget: int = 256 << 20):
    """Left rows whose ``on`` key EXISTS in the right side.
    ``broadcast_byte_budget=0`` forces the shuffle path."""
    return _presence_join(left_ds, right_ds, on, left_cols, True,
                          num_partitions, broadcast_byte_budget)


def anti_join(left_ds, right_ds, on: str, left_cols: list[str],
              num_partitions: int | None = None,
              broadcast_byte_budget: int = 256 << 20):
    """Left rows whose ``on`` key does NOT exist in the right side.
    ``broadcast_byte_budget=0`` forces the shuffle path."""
    return _presence_join(left_ds, right_ds, on, left_cols, False,
                          num_partitions, broadcast_byte_budget)
