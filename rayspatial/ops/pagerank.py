"""Distributed PageRank in exact integer fixed-point arithmetic.

The web-graph primitive for a Common-Crawl-style corpus (rank hosts /
pages for crawl prioritization and quality weighting).  All math is
scaled-integer with floor division:

    r0(v)   = S // N
    share_u = r(u) // outdeg(u)
    r'(v)   = (15 * S) // (100 * N)  +  (85 * sum_in shares) // 100

(damping 0.85 as the rational 85/100) so every distributed sum is an
order-independent int64 reduction and a SQL oracle reproduces each
iteration bit-for-bit — float PageRank could never hash-match across
different summation orders.

Shape per iteration: TWO hash-partition shuffles (ranks co-located
with edges by src -> contribution rows; contributions summed by dst),
chained LAZILY so the whole k-iteration computation is one streaming
Dataset execution.  The edge list is materialized once up front;
ranks never touch the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["pagerank"]

SCALE = 10 ** 12


def pagerank(edges_ds, n_nodes: int, iterations: int = 10,
             src_col: str = "src", dst_col: str = "dst",
             num_partitions: int | None = None):
    """edges (src, dst — every node must appear as a src; multi-edges
    and self-loops allowed and counted) -> (node, rank_scaled) after
    ``iterations`` rounds.  Nodes are assumed to be 0..n_nodes-1 with
    every node having at least one outgoing edge (constant-degree
    synthetic graphs satisfy this by construction)."""
    from rayspatial.util import hash_partitioned_agg

    base = (15 * SCALE) // (100 * n_nodes)

    edges_ds = edges_ds.materialize()

    # out-degree per src, attached once (stays constant)
    def edge_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch.column(src_col),
            "dst": batch.column(dst_col),
            "r": pa.nulls(len(batch), pa.int64()),
        })

    def deg_attach(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["deg"] = pdf.groupby("node", sort=False)["dst"] \
            .transform("size").astype(np.int64)
        return pdf

    edges = hash_partitioned_agg(
        edges_ds.map_batches(edge_rows, batch_format="pyarrow")
        .map_batches(lambda b: b.drop_columns(["r"]),
                     batch_format="pyarrow"),
        ["node"], deg_attach, num_partitions=num_partitions,
    ).materialize()

    # initial ranks from the edge src set (every node appears as src)
    def init_ranks(pdf: pd.DataFrame) -> pd.DataFrame:
        nodes = pdf["node"].drop_duplicates()
        return pd.DataFrame({
            "node": nodes.to_numpy(),
            "r": np.full(len(nodes), SCALE // n_nodes, dtype=np.int64),
        })

    ranks = hash_partitioned_agg(edges, ["node"], init_ranks,
                                 num_partitions=num_partitions)

    for _ in range(iterations):
        # co-locate ranks with edges by src; emit (dst, share)
        def tag_rank(batch: pa.Table) -> pa.Table:
            return pa.table({
                "node": batch.column("node"),
                "dst": pa.nulls(len(batch), pa.int64()),
                "deg": pa.nulls(len(batch), pa.int64()),
                "r": batch.column("r"),
            })

        def tag_edge(batch: pa.Table) -> pa.Table:
            return pa.table({
                "node": batch.column("node"),
                "dst": batch.column("dst"),
                "deg": batch.column("deg"),
                "r": pa.nulls(len(batch), pa.int64()),
            })

        tagged = ranks.map_batches(tag_rank, batch_format="pyarrow") \
            .union(edges.map_batches(tag_edge, batch_format="pyarrow"))

        def contribs(pdf: pd.DataFrame) -> pd.DataFrame:
            rmask = pdf["dst"].isna()
            rmap = pdf[rmask].set_index("node")["r"]
            e = pdf[~rmask]
            share = (e["node"].map(rmap).to_numpy(dtype=np.int64)
                     // e["deg"].to_numpy(dtype=np.int64))
            # zero-contribution row per node (from its rank row) so
            # in-link-free nodes keep a rank (= base) next round
            return pd.DataFrame({
                "node": np.concatenate([
                    e["dst"].to_numpy(dtype=np.int64),
                    pdf.loc[rmask, "node"].to_numpy(dtype=np.int64),
                ]),
                "c": np.concatenate([
                    share, np.zeros(int(rmask.sum()), dtype=np.int64),
                ]),
            })

        csums = hash_partitioned_agg(tagged, ["node"], contribs,
                                     num_partitions=num_partitions)

        def new_rank(pdf: pd.DataFrame) -> pd.DataFrame:
            g = pdf.groupby("node", sort=False)["c"].sum()
            return pd.DataFrame({
                "node": g.index.to_numpy(dtype=np.int64),
                "r": (base + (85 * g.to_numpy(dtype=np.int64)) // 100),
            })

        ranks = hash_partitioned_agg(csums, ["node"], new_rank,
                                     num_partitions=num_partitions)

    return ranks.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "rank_scaled": b.column("r")}),
        batch_format="pyarrow",
    )
