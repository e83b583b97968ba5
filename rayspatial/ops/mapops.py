"""Generic Dataset adapters for geometry kernels over WKB columns —
the bridge that lets a reference (pygeos) user run their existing
vectorized call sites distributed: any ``GeomArray -> ndarray`` or
``GeomArray -> GeomArray`` kernel becomes a zero-copy ``map_batches``
stage.

    from rayspatial import geom
    ds = geom_map(ds, geom.area, "wkb", out="area")          # scalar out
    ds = geom_map(ds, lambda g: geom.buffer(g, 1.0), "wkb")  # geometry out
    ds = geom_map2(ds, geom.distance, "wkb_a", "wkb_b", out="d")
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_arrow(result, out_col: str):
    from rayspatial.geom.array import GeomArray
    from rayspatial.geom.wkb import to_wkb

    if isinstance(result, GeomArray):
        return out_col, pa.array(to_wkb(result), type=pa.binary())
    arr = np.asarray(result)
    if arr.dtype == object:
        return out_col, pa.array(arr.tolist())
    return out_col, pa.array(arr)


def geom_map(ds, kernel, wkb_col: str = "wkb", out: str | None = None,
             keep_input: bool = True):
    """Unary kernel over a WKB column.  Geometry-valued kernels write
    WKB back (default out = wkb_col); scalar kernels append ``out``."""
    from rayspatial.geom.wkb import parse_wkb

    out_col = out or (wkb_col if out is None else out)

    def per_batch(batch: pa.Table) -> pa.Table:
        ga = parse_wkb(batch.column(wkb_col))
        name, arr = _to_arrow(kernel(ga), out_col)
        if name in batch.column_names:
            return batch.set_column(batch.column_names.index(name), name, arr)
        if not keep_input:
            batch = batch.drop_columns([wkb_col])
        return batch.append_column(name, arr)

    return ds.map_batches(per_batch, batch_format="pyarrow")


def geom_map2(ds, kernel, wkb_col_a: str, wkb_col_b: str, out: str):
    """Binary kernel over two WKB columns of the same Dataset."""
    from rayspatial.geom.wkb import parse_wkb

    def per_batch(batch: pa.Table) -> pa.Table:
        ga = parse_wkb(batch.column(wkb_col_a))
        gb = parse_wkb(batch.column(wkb_col_b))
        name, arr = _to_arrow(kernel(ga, gb), out)
        if name in batch.column_names:
            return batch.set_column(batch.column_names.index(name), name, arr)
        return batch.append_column(name, arr)

    return ds.map_batches(per_batch, batch_format="pyarrow")


def geom_map_broadcast(ds, kernel, other, wkb_col: str = "wkb", out: str = "result"):
    """Binary kernel vs ONE broadcast geometry array (``ray.put`` once,
    parsed once per worker) — the pygeos column-vs-scalar broadcasting
    form (README.rst:73-86) at Dataset scale."""
    import ray

    from rayspatial.geom.wkb import parse_wkb, to_wkb

    ref = ray.put(to_wkb(other))
    cache: dict = {}

    def per_batch(batch: pa.Table) -> pa.Table:
        key = ref.hex()
        gb = cache.get(key)
        if gb is None:
            cache.clear()
            gb = parse_wkb(ray.get(ref))
            cache[key] = gb
        ga = parse_wkb(batch.column(wkb_col))
        # broadcast: tile the single-row other to the batch length
        from rayspatial.geom.setops import _slice_rows

        if len(gb) == 1 and len(ga) != 1:
            gbx = _slice_rows(gb, [0] * len(ga))
        else:
            gbx = gb
        name, arr = _to_arrow(kernel(ga, gbx), out)
        if name in batch.column_names:
            return batch.set_column(batch.column_names.index(name), name, arr)
        return batch.append_column(name, arr)

    return ds.map_batches(per_batch, batch_format="pyarrow")


def rollup_agg(ds, group_cols: list[str], value_col: str,
               total_marker: str = "ALL",
               num_partitions: int | None = None):
    """GROUP BY ROLLUP(group_cols): SUM(value) + COUNT(*) at every
    prefix level (full key, each prefix, grand total) in ONE pass —
    the map side emits each row's partials once per level (levels =
    len(group_cols)+1, a small constant), rolled-up columns take
    ``total_marker``, and one hash shuffle finishes every level
    together.  ``value_col`` must be integer (quantize upstream).

    An explicit ``_lv`` level tag rides the shuffle so a GENUINE group
    value equal to ``total_marker`` never merges with rollup totals
    (the SQL analogue: ROLLUP's NULLs are level-tagged before the
    COALESCE relabeling) — such rows come out as distinct output rows
    with identical visible labels, exactly like the COALESCE oracle.
    Group columns must be strings (the marker is a string label).
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from rayspatial.util import hash_partitioned_agg

    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))

    def _stringy(t) -> bool:
        if isinstance(t, pa.DataType):
            return pa.types.is_string(t) or pa.types.is_large_string(t)
        # pandas-block datasets surface numpy dtypes: object is how
        # pandas stores strings; anything numeric is rejected
        return np.dtype(t).kind in ("O", "U", "S")

    for c in group_cols:
        if not _stringy(types[c]):
            raise ValueError(
                f"rollup_agg group column {c!r} is {types[c]} — the "
                "rolled-up marker is a string label; cast group columns "
                "to string upstream")

    levels = len(group_cols) + 1

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            **{c: batch.column(c).to_numpy(zero_copy_only=False)
               for c in group_cols},
            "_v": batch.column(value_col).to_numpy().astype(np.int64),
        })
        outs = []
        for lv in range(levels):
            g = df.copy()
            # level lv rolls up the LAST lv grouping columns
            for c in group_cols[len(group_cols) - lv:]:
                g[c] = total_marker
            g["_lv"] = np.int8(lv)
            agg = (g.groupby(group_cols + ["_lv"], sort=False)["_v"]
                   .agg([("sum_v", "sum"), ("n_rows", "size")])
                   .reset_index())
            outs.append(agg)
        out = pd.concat(outs, ignore_index=True)
        out["sum_v"] = out["sum_v"].astype(np.int64)
        out["n_rows"] = out["n_rows"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(group_cols + ["_lv"], sort=False)
               [["sum_v", "n_rows"]].sum().reset_index())
        return out.drop(columns=["_lv"])

    return hash_partitioned_agg(partials, group_cols + ["_lv"], combine,
                                num_partitions=num_partitions)
