"""Distributed triangle counting (graph analytics next to
ops/pagerank.py and textops/components.py).

Compact-forward / node-iterator shape, three bounded exchanges:

1. canonicalize: every directed edge becomes the undirected pair
   ``(a, b) = (min, max)``, self-loops drop, duplicates collapse in a
   hash-partitioned dedup (16-byte rows).
2. wedge generation: one hash exchange by the LOW endpoint; each
   partition emits, per node, every ordered neighbor pair
   ``(b, c), b < c`` — a vectorized stride sweep (loop over pair
   distance, each step one numpy mask over the partition), never a
   per-node Python loop.  Wedge count is sum_a d(a)^2/2 on the
   min-endpoint orientation — the standard mitigation for skewed
   degree is orienting by (degree, id); with id orientation a hot
   MAX-degree hub contributes no wedges unless it is the smallest id,
   which the caller can arrange by renumbering ids by descending
   degree (documented contract, cheap at ingest).
3. closure test: a wedge (b, c) is a triangle iff the edge (b, c)
   exists — ONE semi-join on the packed ``b * 2^32 + c`` key
   (ops/relational.semi_join, hash co-location, no broadcast), then a
   two-level count reduce.

Every triangle {a < b < c} is generated exactly once (wedge at its
minimum vertex), so the count is exact with no division-by-3 step.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["triangle_count"]

_PACK = np.int64(1) << np.int64(32)


def triangle_count(edges_ds, src: str = "src", dst: str = "dst",
                   num_partitions: int | None = None):
    """Directed/undirected edge list -> one-row Dataset
    ``(n_triangles,)``.  Node ids must fit int32 (packed closure key).
    """
    from rayspatial.ops.relational import semi_join
    from rayspatial.util import hash_partitioned_agg

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column(src).to_numpy().astype(np.int64)
        d = batch.column(dst).to_numpy().astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        df = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    canon_ds = edges_ds.map_batches(canon, batch_format="pyarrow")

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates().sort_values(["a", "b"], kind="stable")

    edges = hash_partitioned_agg(canon_ds, ["a"], dedup,
                                 num_partitions=num_partitions)

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        # rows sorted by (a, b); neighbors of each a are contiguous.
        # stride sweep: pair row r with row r+o while both share `a` —
        # o runs to the partition's max degree, each step vectorized.
        df = df.sort_values(["a", "b"], kind="stable")
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        outs_b, outs_c = [], []
        o = 1
        while True:
            if o >= len(a):
                break
            same = a[:-o] == a[o:]
            if not same.any():
                break
            outs_b.append(b[:-o][same])
            outs_c.append(b[o:][same])
            o += 1
        if not outs_b:
            return pd.DataFrame({"key": np.array([], dtype=np.int64)})
        wb = np.concatenate(outs_b)
        wc = np.concatenate(outs_c)
        return pd.DataFrame({"key": wb * _PACK + wc})

    wedge_ds = hash_partitioned_agg(edges, ["a"], wedges,
                                    num_partitions=num_partitions)

    def edge_keys(batch: pa.Table) -> pa.Table:
        return pa.table({"key": pa.array(
            batch.column("a").to_numpy() * _PACK
            + batch.column("b").to_numpy())})

    closed = semi_join(wedge_ds, edges.map_batches(
        edge_keys, batch_format="pyarrow"), "key", ["key"],
        num_partitions=num_partitions)

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({"n_triangles": pa.array([len(batch)], pa.int64())})

    def final(batch: pa.Table) -> pa.Table:
        return pa.table({"n_triangles": pa.array(
            [int(batch.column("n_triangles").to_numpy().sum())])})

    import ray.data as rd

    # zero-seed row: a triangle-free graph must still emit (0,), and a
    # fully-empty closure dataset has no blocks for the reduce to run on
    seed = rd.from_arrow(pa.table({"n_triangles": pa.array([0], pa.int64())}))
    return (closed.map_batches(partial, batch_format="pyarrow")
            .union(seed)
            .repartition(1)
            .map_batches(final, batch_size=None, batch_format="pyarrow"))
