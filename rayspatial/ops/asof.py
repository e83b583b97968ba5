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


def _left_types(left_ds, left_keep: list[str]) -> dict:
    """Declared Arrow types of the left keep-columns (for typed nulls on
    the right side of the union and the final output-schema cast)."""
    sch = left_ds.schema()
    types = dict(zip(sch.names, sch.types))
    return {c: types[c] for c in left_keep}


def _split_sides(t: pa.Table, right_cols: list[str]):
    """Split a tagged partition into (left_df, right_df) converting each
    side SEPARATELY — the left rows carry no nulls in the keep columns,
    so their int64 columns survive the pandas conversion as int64
    (a joint conversion widens int64-with-null to float64, silently
    corrupting values > 2^53)."""
    import pyarrow.compute as pc

    side = t.column("_side")
    lcols = [c for c in t.column_names if c != "_side"]
    left = t.filter(pc.equal(side, 1)).select(lcols).to_pandas()
    right = t.filter(pc.equal(side, 0)).select(right_cols).to_pandas()
    return left, right


def _nullable_dtype(dtype):
    """pandas nullable equivalent for concat-with-missing columns."""
    if pd.api.types.is_integer_dtype(dtype):
        return pd.array([], dtype=str(dtype).capitalize()).dtype
    if pd.api.types.is_bool_dtype(dtype):
        return pd.BooleanDtype()
    return dtype


def asof_join(left_ds, right_ds, by: str, on: str, id_col: str,
              left_keep: list[str] | None = None,
              right_suffix: str = "_right",
              num_partitions: int | None = None):
    """-> Dataset of left rows (left_keep columns) + the matched right
    row's ``id_col``/``on`` (suffixed); left rows with no match drop
    (inner as-of)."""
    from rayspatial.util import hash_partitioned_agg

    left_keep = left_keep or [id_col]
    ltypes = _left_types(left_ds, left_keep)

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
                    # right side gets the LEFT's declared type for its
                    # nulls (a pa.null() column forces schema
                    # unification per block downstream)
                    cols[c] = (batch.column(c) if side == 1
                               else pa.nulls(len(batch), ltypes[c]))
            return pa.table(cols)

        return fn

    # align schemas: left carries keep-columns, right gets nulls for them
    lt = left_ds.map_batches(tag(1), batch_format="pyarrow")
    rt = right_ds.map_batches(tag(0), batch_format="pyarrow")
    unioned = lt.union(rt)

    def per_partition(t: pa.Table) -> pd.DataFrame:
        # split sides in ARROW, convert separately: the left rows have
        # no nulls in the keep columns, so int64 stays int64 (a joint
        # pandas conversion would widen int64-with-null to float64 and
        # corrupt values > 2^53)
        left, right = _split_sides(t, [by, on, id_col])
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
        # nullable Int64 keeps unmatched-row NAs integer-exact (plain
        # int64 NaN-fill would widen the whole column to float64 and
        # corrupt values > 2^53); merge_asof requires BOTH merge keys
        # to share a dtype, so the left key casts too
        casts = {id_col + right_suffix: "Int64"}
        on_int = pd.api.types.is_integer_dtype(right[on + right_suffix])
        if on_int:
            casts[on + right_suffix] = "Int64"
            left = left.astype({on: "Int64"})
        right = right.astype(casts)
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
        if on_int:
            out[on] = out[on].astype(np.int64)
            out[on + right_suffix] = out[on + right_suffix].astype(np.int64)
        return out

    return hash_partitioned_agg(unioned, [by], per_partition, arrow=True)


def asof_join_salted(left_ds, right_ds, by: str, on: str, id_col: str,
                     left_keep: list[str] | None = None,
                     right_suffix: str = "_right",
                     bucket_s: int = 21_600):
    """Hot-key-safe as-of join: the shuffle key is salted with a time
    bucket ``(by, on // bucket_s)`` so one hot ``by`` key (bot user)
    spreads over #buckets partitions instead of one.

    Pass 1 (salted): merge_asof WITHIN each (key, bucket); rows that
    match are final.  Each bucket also emits one SUMMARY row — its last
    right row by (on, id).
    Pass 2 (by key, bounded): only UNMATCHED lefts + the per-bucket
    summaries re-shuffle by ``by``; merge_asof against the summaries
    finds the latest right row in any earlier bucket.  Correctness of
    matching summaries on plain ``on``: an unmatched left has no right
    row at or before it in its OWN bucket, so every summary with
    ``on <= left.on`` is from an earlier bucket, and the greatest one
    is exactly the global backward match.  Equal ``on`` values share a
    bucket, so the (on, id) tie-break is decided in pass 1.

    Output equals :func:`asof_join` row-for-row (asserted in tests);
    the pass-2 volume is #unmatched-lefts + #buckets-per-key — for a
    hot key with dense right traffic, almost nothing."""
    from rayspatial.util import hash_partitioned_agg

    left_keep = left_keep or [id_col]
    ltypes = _left_types(left_ds, left_keep)
    bucket_us = bucket_s * 1_000_000

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            onv = batch.column(on).cast(pa.int64()).to_numpy()
            cols = {
                "_side": pa.array(np.full(len(batch), side, dtype=np.int8)),
                "_bucket": pa.array(onv // bucket_us),
                by: batch.column(by),
                on: batch.column(on),
                id_col: batch.column(id_col),
            }
            for c in left_keep:
                if c not in cols:
                    cols[c] = (batch.column(c) if side == 1
                               else pa.nulls(len(batch), ltypes[c]))
            return pa.table(cols)

        return fn

    lt = left_ds.map_batches(tag(1), batch_format="pyarrow")
    rt = right_ds.map_batches(tag(0), batch_format="pyarrow")
    unioned = lt.union(rt)

    idr = id_col + right_suffix
    onr = on + right_suffix

    def pass1(t: pa.Table) -> pd.DataFrame:
        left, right = _split_sides(t, [by, "_bucket", on, id_col])
        left = left.drop(columns=["_side"], errors="ignore")
        extra = [c for c in left.columns
                 if c not in (by, "_bucket", on, id_col)]
        outs = []
        if len(left):
            if len(right):
                ls = left.sort_values([on, id_col], kind="stable")
                rs = right.sort_values([on, id_col], kind="stable").rename(
                    columns={id_col: idr, on: onr}
                )
                # nullable Int64 so unmatched-row NAs stay integer-exact
                # (both merge keys must share a dtype; timestamp `on`
                # NaT-fills without widening, so only int needs this)
                on_int = pd.api.types.is_integer_dtype(rs[onr])
                rs = rs.astype({idr: "Int64",
                                **({onr: "Int64"} if on_int else {})})
                if on_int:
                    ls = ls.astype({on: "Int64"})
                # match STRICTLY within the (key, bucket) group: a hash
                # partition holds many groups, and a cross-bucket match
                # here could finalize a stale right row whose bucket's
                # true latest lives in another partition
                m = pd.merge_asof(
                    ls, rs, left_on=on, right_on=onr,
                    left_by=[by, "_bucket"], right_by=[by, "_bucket"],
                    allow_exact_matches=True, direction="backward",
                )
                if on_int:
                    m[on] = m[on].astype(np.int64)
            else:
                m = left.copy()
                m[idr] = pd.array([pd.NA] * len(m), dtype="Int64")
                m[onr] = (pd.array([pd.NA] * len(m), dtype="Int64")
                          if pd.api.types.is_integer_dtype(left[on])
                          else pd.Series(pd.NaT, index=m.index,
                                         dtype=left[on].dtype))
            matched = m[~m[idr].isna()].copy()
            matched["_final"] = np.int8(1)
            outs.append(matched)
            unmatched = m[m[idr].isna()].drop(columns=[idr, onr]).copy()
            unmatched["_final"] = np.int8(0)
            unmatched["_side"] = np.int8(1)
            outs.append(unmatched)
        if len(right):
            # one summary per (by, bucket): the last right row
            rs = right.sort_values([on, id_col], kind="stable")
            summ = rs.groupby([by, "_bucket"], sort=False).tail(1).copy()
            summ["_final"] = np.int8(0)
            summ["_side"] = np.int8(0)
            # typed-null extra keep-columns so the concat below does NOT
            # NaN-fill them (which would widen every row's int64 keep
            # column to float64 — ADVICE r3)
            for c in extra:
                summ[c] = pd.array([pd.NA] * len(summ),
                                   dtype=_nullable_dtype(left[c].dtype))
            outs.append(summ)
        if not outs:
            return pd.DataFrame()
        return pd.concat(outs, ignore_index=True)

    stage1 = hash_partitioned_agg(unioned, [by, "_bucket"], pass1,
                                  arrow=True).materialize()

    import pyarrow.compute as pc

    def keep_final(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("_final"), 1))
        drop = [c for c in ("_final", "_side", "_bucket") if c in t.column_names]
        t = t.drop_columns(drop)
        # pass1's pending/summary rows NaN-filled idr/onr in the concat,
        # widening their dtypes — restore them on the final rows
        i = t.column_names.index(idr)
        t = t.set_column(i, idr, t.column(idr).cast(pa.int64()))
        j = t.column_names.index(onr)
        t = t.set_column(j, onr, t.column(onr).cast(t.schema.field(on).type))
        return t

    def keep_pending(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("_final"), 0))
        drop = [c for c in (idr, onr) if c in t.column_names]
        return t.drop_columns([c for c in drop] + ["_final"])

    final1 = stage1.map_batches(keep_final, batch_format="pyarrow")
    pending = stage1.map_batches(keep_pending, batch_format="pyarrow")

    def pass2(t: pa.Table) -> pd.DataFrame:
        left, right = _split_sides(t, [by, on, id_col])
        left = left.drop(columns=["_side", "_bucket"], errors="ignore")
        if "_bucket" in right.columns:
            right = right.drop(columns=["_bucket"])
        if not len(left) or not len(right):
            return pd.DataFrame(
                columns=[c for c in left.columns] + [idr, onr]
            )
        on_int = pd.api.types.is_integer_dtype(left[on])
        ls = left.sort_values([on, id_col], kind="stable")
        rs = right.sort_values([on, id_col], kind="stable").rename(
            columns={id_col: idr, on: onr}
        ).astype({idr: "Int64", **({onr: "Int64"} if on_int else {})})
        if on_int:
            ls = ls.astype({on: "Int64"})
        out = pd.merge_asof(
            ls, rs, left_on=on, right_on=onr,
            left_by=by, right_by=by,
            allow_exact_matches=True, direction="backward",
        )
        out = out[~out[idr].isna()].copy()
        out[idr] = out[idr].astype(np.int64)
        if on_int:
            out[on] = out[on].astype(np.int64)
            out[onr] = out[onr].astype(np.int64)
        return out

    final2 = hash_partitioned_agg(pending, [by], pass2, arrow=True)

    def canon(batch: pa.Table) -> pa.Table:
        cols = list(left_keep)
        for c in (by, on):
            if c not in cols:
                cols.append(c)
        cols += [idr, onr]
        t = batch.select([c for c in cols if c in batch.column_names])
        # restore every keep-column's DECLARED left type — pass1's
        # concat path may have emitted nullable variants (ADVICE r3:
        # output schema must equal asof_join's)
        for c in left_keep:
            if c in t.column_names and t.schema.field(c).type != ltypes[c]:
                i = t.column_names.index(c)
                t = t.set_column(i, c, t.column(c).cast(ltypes[c]))
        # drop embedded pandas metadata: pass1's nullable-Int64 frames
        # stamp 'Int64' dtypes that a downstream to_pandas would
        # otherwise resurrect
        return t.replace_schema_metadata(None)

    return final1.map_batches(canon, batch_format="pyarrow").union(
        final2.map_batches(canon, batch_format="pyarrow")
    )
