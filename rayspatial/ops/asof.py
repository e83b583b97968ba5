"""Distributed as-of join — a custom operator Ray Data lacks (the
driver brief lists as-of joins as a canonical custom-operator case).

Semantics: for every LEFT row, attach the RIGHT row of the same ``by``
key with the greatest ``on`` value <= the left row's ``on``
(``allow_exact_matches``), ties on ``on`` broken by the greatest
``id_col`` — fully deterministic, reproducible by a
ROW_NUMBER-over-(on DESC, id DESC) SQL oracle.

Shape: ONE hash shuffle — both sides are tagged, schema-aligned and
unioned, the union is hash-partitioned by ``by`` (every key's rows
co-locate), and each partition runs a vectorized ``pandas.merge_asof``
(C merge over sorted arrays).  No broadcast, no driver materialization;
partition count scales with the key cardinality.  Skewed keys salt the
same way as the spatial join (a key's rows must stay together, so salt
only composite (by, time-bucket) keys and stitch across buckets —
documented, not needed for the test corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join(left_ds, right_ds, by: str, on: str, id_col: str,
              left_keep: list[str] | None = None,
              right_suffix: str = "_right",
              num_partitions: int | None = None):
    """-> Dataset of left rows (left_keep columns) + the matched right
    row's ``id_col``/``on`` (suffixed); left rows with no match drop
    (inner as-of)."""
    from rayspatial.util import hash_partitioned_agg

    left_keep = left_keep or [id_col]

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            cols = {
                "_side": pa.array(np.full(len(batch), side, dtype=np.int8)),
                by: batch.column(by),
                on: batch.column(on),
                id_col: batch.column(id_col),
            }
            for c in left_keep:
                if c not in cols:
                    cols[c] = (
                        batch.column(c)
                        if side == 1
                        else pa.nulls(len(batch), batch.schema.field(c).type)
                        if c in batch.column_names
                        else pa.nulls(len(batch), pa.null())
                    )
            return pa.table(cols)

        return fn

    # align schemas: left carries keep-columns, right gets nulls for them
    lt = left_ds.map_batches(tag(1), batch_format="pyarrow")
    rt = right_ds.map_batches(tag(0), batch_format="pyarrow")
    unioned = lt.union(rt)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["_side"] == 1].drop(columns=["_side"])
        right = df[df["_side"] == 0][[by, on, id_col]]
        if not len(left) or not len(right):
            return pd.DataFrame(
                columns=list(left.columns) + [id_col + right_suffix,
                                              on + right_suffix]
            )
        # merge_asof takes the LAST right row among equal `on` values,
        # so sorting right by (on, id) makes the tie-break 'greatest id'
        left = left.sort_values([on, id_col], kind="stable")
        right = right.sort_values([on, id_col], kind="stable").rename(
            columns={id_col: id_col + right_suffix,
                     on: on + right_suffix}
        )
        out = pd.merge_asof(
            left,
            right,
            left_on=on,
            right_on=on + right_suffix,
            left_by=by,
            right_by=by,
            allow_exact_matches=True,
            direction="backward",
        )
        out = out[~out[id_col + right_suffix].isna()]
        out[id_col + right_suffix] = out[id_col + right_suffix].astype(np.int64)
        return out

    return hash_partitioned_agg(unioned, [by], per_partition)
