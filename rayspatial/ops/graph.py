"""Distributed triangle counting (graph analytics next to
ops/pagerank.py and textops/components.py).

Compact-forward / node-iterator shape, TWO bounded exchanges:

1. canonicalize + dedup + wedge generation fused in one hash exchange
   by the LOW endpoint (dedup and wedges share the partitioning key):
   every directed edge becomes the undirected ``(a, b) = (min, max)``
   pair (self-loops drop, duplicates collapse per partition), then
   each partition emits, per node, every ordered neighbor pair
   ``(b, c), b < c`` — a vectorized stride sweep (loop over pair
   distance, each step one numpy mask over the partition), never a
   per-node Python loop.  Deduped edge keys and wedge keys leave the
   pass side-tagged in one (materialized, spillable) table.  Wedge
   count is sum_a d(a)^2/2 on the min-endpoint orientation — the
   standard mitigation for skewed degree is orienting by (degree, id);
   with id orientation a hot MAX-degree hub contributes no wedges
   unless it is the smallest id, which the caller can arrange by
   renumbering ids by descending degree (documented contract, cheap at
   ingest).
2. closure test: a wedge (b, c) is a triangle iff the edge (b, c)
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

    def dedup_and_wedge(df: pd.DataFrame) -> pd.DataFrame:
        """One co-located pass per a-partition: dedup, then the wedge
        stride sweep (pair row r with row r+o while both share `a`; o
        runs to the partition's max degree, each step one numpy mask)
        — dedup and wedge generation share the same partitioning key,
        so fusing them saves a whole all-to-all.  Output rows carry a
        side tag: 0 = deduped edge key (for the closure probe),
        1 = wedge key."""
        df = df.drop_duplicates().sort_values(["a", "b"], kind="stable")
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        outs_b, outs_c = [], []
        o = 1
        while o < len(a):
            same = a[:-o] == a[o:]
            if not same.any():
                break
            outs_b.append(b[:-o][same])
            outs_c.append(b[o:][same])
            o += 1
        ekeys = a * _PACK + b
        if outs_b:
            wkeys = np.concatenate(outs_b) * _PACK + np.concatenate(outs_c)
        else:
            wkeys = np.array([], dtype=np.int64)
        return pd.DataFrame({
            "key": np.concatenate([ekeys, wkeys]),
            "side": np.concatenate([
                np.zeros(len(ekeys), np.int8),
                np.ones(len(wkeys), np.int8)]).astype(np.int64),
        })

    # materialize once: both closure sides read it, and the lazy plan
    # would otherwise re-run canon + dedup + wedge per consumer
    tagged = hash_partitioned_agg(canon_ds, ["a"], dedup_and_wedge,
                                  num_partitions=num_partitions
                                  ).materialize()

    def split(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(
                pc.equal(batch.column("side"), side)).select(["key"])
        return fn

    closed = semi_join(tagged.map_batches(split(1), batch_format="pyarrow"),
                       tagged.map_batches(split(0), batch_format="pyarrow"),
                       "key", ["key"], num_partitions=num_partitions)

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
