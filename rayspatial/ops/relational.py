"""Distributed semi/anti join — the key-presence joins Ray Data lacks.

Used by dedup resolution (keep documents NOT named as non-canonical by
the duplicate-group labeling), but generic: filter a big LEFT stream by
key presence/absence in a RIGHT key set without broadcasting it.

Shape: ONE hash shuffle — the left rows and the right keys are tagged,
schema-aligned, unioned and hash-partitioned by the key, then each
partition filters vectorized (pandas isin over int64/str keys).  The
right side moves only its key column; the left side moves only the
requested output columns.  No broadcast, no driver materialization —
the right key set may be arbitrarily large (contrast a ray.put
broadcast filter, which caps at worker heap).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _presence_join(left_ds, right_ds, on: str, left_cols: list[str],
                   keep_present: bool, num_partitions: int | None):
    from rayspatial.util import hash_partitioned_agg

    out_cols = [c for c in left_cols if c != on]
    sch = left_ds.schema()
    left_types = dict(zip(sch.names, sch.types))

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
              num_partitions: int | None = None):
    """Left rows whose ``on`` key EXISTS in the right side."""
    return _presence_join(left_ds, right_ds, on, left_cols, True,
                          num_partitions)


def anti_join(left_ds, right_ds, on: str, left_cols: list[str],
              num_partitions: int | None = None):
    """Left rows whose ``on`` key does NOT exist in the right side."""
    return _presence_join(left_ds, right_ds, on, left_cols, False,
                          num_partitions)
