"""Distributed connected components over a duplicate-pair table
(min-label propagation) — the scale path for turning verified
near-duplicate PAIRS into duplicate GROUPS (each doc labeled with the
min doc id of its component).

Each round: every edge proposes its endpoints' current labels to the
other side; labels are re-minimized per node (hash-partitioned
aggregation); stop at fixpoint.  Rounds needed = graph diameter in
label-hops (duplicate clusters are small and dense, so 2-4 rounds in
practice; ``max_rounds`` bounds pathological chains).

Partitioning note: the per-round label table is broadcast
(``ray.put``) — it holds only nodes that appear in SOME pair, a tiny
subset of the corpus for real dedup workloads.  For adversarial cases
where even that does not fit, swap the broadcast for a bucket join on
node id (same groupby machinery as ``hash_partitioned_agg``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def connected_components_distributed(pairs_ds, max_rounds: int = 16):
    """pairs Dataset (a, b) -> Dataset (doc_id, rep): component
    representative (min member id) per node."""
    import ray

    from rayspatial.util import hash_partitioned_agg

    # initial labels: every node labels itself
    def init_labels(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        nodes = np.concatenate([a, b])
        return pa.table({"doc_id": pa.array(nodes), "label": pa.array(nodes)})

    def min_label(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc_id", sort=False)["label"].min().reset_index()

    labels = hash_partitioned_agg(
        pairs_ds.map_batches(init_labels, batch_format="pyarrow"),
        ["doc_id"],
        min_label,
    ).materialize()

    for _ in range(max_rounds):
        lab_df = labels.to_pandas()  # broadcast-small by assumption
        lab_map_ref = ray.put(
            dict(zip(lab_df["doc_id"].tolist(), lab_df["label"].tolist()))
        )

        def propose(batch: pa.Table, _ref=lab_map_ref) -> pa.Table:
            lm = ray.get(_ref)
            a = batch.column("a").to_numpy()
            b = batch.column("b").to_numpy()
            la = np.fromiter((lm[x] for x in a), dtype=np.int64, count=len(a))
            lb = np.fromiter((lm[x] for x in b), dtype=np.int64, count=len(b))
            m = np.minimum(la, lb)
            return pa.table(
                {
                    "doc_id": pa.array(np.concatenate([a, b])),
                    "label": pa.array(np.concatenate([m, m])),
                }
            )

        proposed = pairs_ds.map_batches(propose, batch_format="pyarrow")
        new_labels = hash_partitioned_agg(proposed, ["doc_id"], min_label).materialize()

        # fixpoint check (tiny driver-side compare of the label tables)
        old = (
            labels.to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        new = (
            new_labels.to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        labels = new_labels
        if len(old) == len(new) and (old["label"].to_numpy() == new["label"].to_numpy()).all():
            break
    return labels.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("doc_id"), "rep": b.column("label")}
        ),
        batch_format="pyarrow",
    )
