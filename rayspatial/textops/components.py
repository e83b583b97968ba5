"""Distributed connected components over a duplicate-pair table
(min-label propagation) — the scale path for turning verified
near-duplicate PAIRS into duplicate GROUPS (each doc labeled with the
min doc id of its component).

Each round: every edge proposes its endpoints' current labels to the
other side; labels are re-minimized per node (hash-partitioned
aggregation); stop at fixpoint.  Rounds needed = graph diameter in
label-hops (duplicate clusters are small and dense, so 2-4 rounds in
practice; ``max_rounds`` bounds pathological chains).

Two propagation modes:

- ``mode='broadcast'`` (default): the label table lives in the OBJECT
  STORE as materialized blocks; each worker assembles a sorted
  (doc_id, label) array pair from the block refs ONCE per round
  (per-worker cache) and edge batches look labels up with
  ``np.searchsorted`` — no driver materialization, no Python dict, no
  per-edge generator.  Valid while the label table (nodes that appear
  in some pair — a tiny subset of the corpus for real dedup workloads)
  fits a worker's heap.
- ``mode='bucket'``: no broadcast at all — labels and edge endpoints
  are co-partitioned by node id (the ``hash_partitioned_agg``
  machinery) and each partition resolves lookups locally, then
  proposals are re-minimized by a second hash partition.  Two shuffles
  per round, unbounded label-table size.

Fixpoint detection is a distributed checksum (sum of
``splitmix64(doc_id ^ mix(label))`` over the label table): one tiny
aggregate per round instead of pulling both label tables to the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_LABEL_CACHE: dict = {}


def _assemble_labels(round_key, refs):
    """Per-worker: gather label blocks -> sorted (keys, vals) arrays."""
    import ray

    hit = _LABEL_CACHE.get(round_key)
    if hit is None:
        ks, vs = [], []
        for tab in ray.get(list(refs)):
            # all-to-all stages (the hash-partitioned min-agg) can emit
            # empty blocks with NO schema; map_batches passes them
            # through without calling the UDF, but raw block refs see
            # them — skip (ray plan_udf_map_op.py notes the behavior)
            if tab.num_rows == 0:
                continue
            ks.append(tab.column("doc_id").to_numpy())
            vs.append(tab.column("label").to_numpy())
        k = np.concatenate(ks) if ks else np.empty(0, dtype=np.int64)
        v = np.concatenate(vs) if vs else np.empty(0, dtype=np.int64)
        order = np.argsort(k, kind="stable")
        if len(_LABEL_CACHE) > 4:
            _LABEL_CACHE.clear()
        hit = (k[order], v[order])
        _LABEL_CACHE[round_key] = hit
    return hit


def _label_checksum(labels_ds) -> int:
    """Order-independent 64-bit checksum of the (doc_id, label) table."""
    from rayspatial.textops.hashing import hash_int64

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy().astype(np.uint64)
        lb = batch.column("label").to_numpy().astype(np.uint64)
        h = hash_int64(d ^ hash_int64(lb, seed=7))
        s = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
        return pa.table({"x": pa.array([int(s)], type=pa.uint64()),
                         "n": pa.array([len(h)], type=pa.int64())})

    parts = labels_ds.map_batches(partial, batch_format="pyarrow").take_all()
    x = 0
    n = 0
    for row in parts:
        x ^= int(row["x"])
        n += int(row["n"])
    return (x << 20) ^ n


def _min_label(df: pd.DataFrame) -> pd.DataFrame:
    return df.groupby("doc_id", sort=False)["label"].min().reset_index()


def _unionfind_components(batch: pa.Table) -> pa.Table:
    """Single-task union-find with path halving over one edge block —
    the small-graph fast path (identical semantics: rep = min member
    id of the component)."""
    a = batch.column("a").to_numpy()
    b = batch.column("b").to_numpy()
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a):]
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(ia, ib):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            # union by min node id keeps the rep deterministic
            if nodes[rx] < nodes[ry]:
                parent[ry] = rx
            else:
                parent[rx] = ry
    roots = np.array([find(int(x)) for x in range(len(nodes))])
    return pa.table({
        "doc_id": pa.array(nodes),
        "rep": pa.array(nodes[roots]),
    })


def connected_components_distributed(pairs_ds, max_rounds: int = 16,
                                     mode: str = "broadcast",
                                     small_edge_limit: int = 1 << 22):
    """pairs Dataset (a, b) -> Dataset (doc_id, rep): component
    representative (min member id) per node.

    Adaptive execution: once the edge list is materialized its size is
    known; a graph with <= ``small_edge_limit`` edges is resolved by a
    single union-find task over the gathered edge blocks (one Dataset
    execution instead of 2-3 per propagation round — label rounds on a
    tiny graph are pure scheduling overhead).  Larger graphs run the
    distributed min-label fixpoint.  ``small_edge_limit=0`` forces the
    distributed path (used by its tests)."""
    from rayspatial.util import hash_partitioned_agg

    # materialize the edge list ONCE: every propagation round re-reads
    # it, and without this the entire upstream pair pipeline (shingling,
    # bucketing, ...) would re-execute per round
    pairs_ds = pairs_ds.materialize()
    if small_edge_limit and pairs_ds.count() <= small_edge_limit:
        return pairs_ds.repartition(1).map_batches(
            _unionfind_components, batch_size=None, batch_format="pyarrow"
        )

    def init_labels(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        nodes = np.concatenate([a, b])
        return pa.table({"doc_id": pa.array(nodes), "label": pa.array(nodes)})

    labels = hash_partitioned_agg(
        pairs_ds.map_batches(init_labels, batch_format="pyarrow"),
        ["doc_id"],
        _min_label,
    ).materialize()
    checksum = _label_checksum(labels)

    for rnd in range(max_rounds):
        if mode == "broadcast":
            refs = tuple(labels.to_arrow_refs())
            round_key = (refs[0].hex() if refs else "", rnd)

            def propose(batch: pa.Table, _refs=refs, _rk=round_key) -> pa.Table:
                keys, vals = _assemble_labels(_rk, _refs)
                a = batch.column("a").to_numpy()
                b = batch.column("b").to_numpy()
                la = vals[np.searchsorted(keys, a)]
                lb = vals[np.searchsorted(keys, b)]
                m = np.minimum(la, lb)
                return pa.table({
                    "doc_id": pa.array(np.concatenate([a, b])),
                    "label": pa.array(np.concatenate([m, m])),
                })

            proposed = pairs_ds.map_batches(propose, batch_format="pyarrow")
        else:  # bucket: co-partition labels and edge endpoints by node
            proposed = _propose_bucketed(pairs_ds, labels)
        new_labels = hash_partitioned_agg(
            proposed, ["doc_id"], _min_label
        ).materialize()
        new_checksum = _label_checksum(new_labels)
        labels = new_labels
        if new_checksum == checksum:
            break
        checksum = new_checksum
    return labels.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("doc_id"), "rep": b.column("label")}
        ),
        batch_format="pyarrow",
    )


def _propose_bucketed(pairs_ds, labels_ds):
    """One propagation round with NO broadcast: rows (node, other) from
    each edge direction union with label rows (node, label), the union
    is hash-partitioned by node (each node's label and all its edge
    slots co-locate), and every partition resolves its lookups with a
    local sorted-array join, emitting (doc_id=other, label) proposals
    plus the self-label rows."""
    from rayspatial.util import hash_partitioned_agg

    def edge_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        return pa.table({
            "doc_id": pa.array(np.concatenate([a, b])),
            "other": pa.array(np.concatenate([b, a])),
            "label": pa.array(np.full(2 * len(a), -1, dtype=np.int64)),
        })

    def label_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "other": pa.array(np.full(n, -1, dtype=np.int64)),
            "label": batch.column("label"),
        })

    unioned = pairs_ds.map_batches(edge_rows, batch_format="pyarrow").union(
        labels_ds.map_batches(label_rows, batch_format="pyarrow")
    )

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        is_lab = df["label"].to_numpy() >= 0
        keys = df.loc[is_lab, "doc_id"].to_numpy()
        vals = df.loc[is_lab, "label"].to_numpy()
        order = np.argsort(keys, kind="stable")
        keys, vals = keys[order], vals[order]
        enode = df.loc[~is_lab, "doc_id"].to_numpy()
        eother = df.loc[~is_lab, "other"].to_numpy()
        lab_of_node = vals[np.searchsorted(keys, enode)]
        return pd.DataFrame({
            "doc_id": np.concatenate([eother, keys]),
            "label": np.concatenate([lab_of_node, vals]),
        })

    return hash_partitioned_agg(unioned, ["doc_id"], resolve)
