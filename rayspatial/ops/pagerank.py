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

Execution: this is the one operator family (iterative fixpoint over a
partitioned mutable table) where the Dataset API is the wrong tool —
each Ray Data groupby is a sort-based all-to-all with per-execution
sampling overhead, and k iterations would chain 2k of them (measured:
~3 s/shuffle of fixed cost regardless of rows).  Instead the classic
raw-task shuffle (SURVEY.md §2.12 escape hatch (c)):

- edges are hash-partitioned by src ONCE into P arrow shards (object
  store refs; the driver only ever holds refs);
- per iteration, task A_p joins rank shard p to edge shard p (same
  hash -> same shard id co-locates them without motion), pre-AGGREGATES
  contributions by dst inside the task (combiner), and emits P
  dst-partitioned pieces (``num_returns=P``);
- task B_q concat-sums its P pieces + base into the new rank shard q.

P^2 small objects per iteration — the textbook shuffle; shards never
visit the driver; at 10^9 nodes P scales with cluster cores and every
piece stays bounded by (nodes-in-shard x 16 B).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["pagerank"]

SCALE = 10 ** 12


def _part_of(v: np.ndarray, P: int) -> np.ndarray:
    from rayspatial.textops.hashing import hash_int64

    return (hash_int64(v) % np.uint64(P)).astype(np.int64)


def pagerank(edges_ds, n_nodes: int, iterations: int = 10,
             src_col: str = "src", dst_col: str = "dst",
             num_partitions: int | None = None,
             checkpoint_dir: str | None = None,
             checkpoint_every: int = 2):
    """edges (src, dst — every node must appear as a src; multi-edges
    and self-loops allowed and counted) -> Dataset (node, rank_scaled)
    after ``iterations`` rounds.

    With ``checkpoint_dir`` the rank shards are written to parquet
    every ``checkpoint_every`` iterations under a per-iteration stage
    name, each shard guarded by the manifest's input fingerprint
    (hash of that shard's edges + the run constants).  A restarted job
    resumes from the highest iteration whose P shards are all complete
    and fingerprint-matched — mid-computation recovery for the one
    operator whose state lives outside any single Dataset execution
    (north_rule: resumable with per-partition lineage)."""
    import ray
    import ray.data as rd

    from rayspatial.util import cluster_cpus

    # default P is modest: the driver dispatches O(P^2) piece refs per
    # iteration, so P should track cluster size, not row count (8 is
    # ample below ~10^8 edges; raise num_partitions on a real cluster)
    P = num_partitions or min(8, cluster_cpus())
    base = (15 * SCALE) // (100 * n_nodes)
    r0 = SCALE // n_nodes

    @ray.remote
    def split_block(tbl: pa.Table, P: int):
        if tbl.num_rows == 0:  # schema-less empty block (all-to-all)
            empty = pa.table({src_col: pa.array([], type=pa.int64()),
                              dst_col: pa.array([], type=pa.int64())})
            return tuple([empty] * P) if P > 1 else empty
        src = tbl.column(src_col).to_numpy().astype(np.int64)
        part = _part_of(src, P)
        out = []
        order = np.argsort(part, kind="stable")
        bounds = np.searchsorted(part[order], np.arange(P + 1))
        t = tbl.take(pa.array(order))
        for p in range(P):
            out.append(t.slice(bounds[p], bounds[p + 1] - bounds[p]))
        return tuple(out) if P > 1 else out[0]

    @ray.remote
    def build_shard(*pieces: pa.Table):
        """Concat edge pieces of one partition; attach out-degree and
        the initial rank table (all srcs of this shard live here)."""
        t = pa.concat_tables([p.select([src_col, dst_col]) for p in pieces])
        src = t.column(src_col).to_numpy().astype(np.int64)
        dst = t.column(dst_col).to_numpy().astype(np.int64)
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        uniq, starts = np.unique(src, return_index=True)
        deg = np.diff(np.r_[starts, len(src)]).astype(np.int64)
        edges = {
            "src": src, "dst": dst,
            "deg": np.repeat(deg, deg),
            "dst_part": _part_of(dst, P),
        }
        ranks = {"node": uniq,
                 "r": np.full(len(uniq), r0, dtype=np.int64)}
        return edges, ranks

    @ray.remote
    def contrib(shard, ranks):
        edges, _ = shard
        rmap = pd.Series(ranks["r"], index=ranks["node"])
        share = (rmap.loc[edges["src"]].to_numpy(dtype=np.int64)
                 // edges["deg"])
        out = []
        dp = edges["dst_part"]
        for q in range(P):
            m = dp == q
            d = edges["dst"][m]
            # in-task combiner: pre-sum by dst before shipping
            u, inv = np.unique(d, return_inverse=True)
            s = np.zeros(len(u), dtype=np.int64)
            np.add.at(s, inv, share[m])
            out.append({"node": u, "c": s})
        return tuple(out) if P > 1 else out[0]

    @ray.remote
    def apply_rank(ranks, *pieces):
        nodes = ranks["node"]
        total = np.zeros(len(nodes), dtype=np.int64)
        for pc_ in pieces:
            pos = np.searchsorted(nodes, pc_["node"])
            # a contribution targeting a node with no out-edges means
            # the caller violated the every-node-is-a-src contract;
            # fail loudly rather than silently dropping rank mass
            bad = (pos >= len(nodes)) | (
                nodes[np.clip(pos, 0, len(nodes) - 1)] != pc_["node"])
            if bad.any():
                raise ValueError("pagerank: contribution to unknown "
                                 "node (dst never appears as src)")
            total[pos] += pc_["c"]
        return {"node": nodes,
                "r": base + (85 * total) // 100}

    # one-time partition of the edge list (refs only on the driver)
    block_refs = edges_ds.to_arrow_refs()
    nb = len(block_refs)
    pieces = [split_block.options(
        num_returns=P if P > 1 else 1).remote(ref, P)
        for ref in block_refs]
    if P == 1:
        pieces = [[p] for p in pieces]
    shards = [build_shard.remote(*[pieces[b][p] for b in range(nb)])
              for p in range(P)]

    @ray.remote
    def init_ranks(shard):
        return shard[1]

    ranks = [init_ranks.remote(s) for s in shards]
    start_it = 0
    fps = None
    if checkpoint_dir is not None:
        from rayspatial.state.checkpoint import CheckpointManifest

        @ray.remote
        def shard_fp(shard):
            from rayspatial.textops.hashing import hash_int64

            edges, _ = shard
            h = (hash_int64(edges["src"], seed=1)
                 ^ hash_int64(edges["dst"], seed=2))
            acc = int(np.bitwise_xor.reduce(h)) if len(h) else 0
            # process-stable run-constant mix (NOT Python hash(), which
            # is salted per process and would defeat cross-run resume)
            const = int(np.bitwise_xor.reduce(hash_int64(
                np.array([n_nodes, P, SCALE], dtype=np.int64), seed=7)))
            return acc ^ const

        fps = ray.get([shard_fp.remote(s) for s in shards])

        @ray.remote
        def load_shard(path):
            import pyarrow.parquet as pq

            t = pq.read_table(path)
            return {"node": t.column("node").to_numpy().astype(np.int64),
                    "r": t.column("r").to_numpy().astype(np.int64)}

        for k in range(iterations, 0, -1):
            man_k = CheckpointManifest(checkpoint_dir, f"pr-it{k}")
            if all(man_k.is_complete(p, input_fingerprint=fps[p])
                   for p in range(P)):
                ranks = [load_shard.remote(man_k.data_path(p))
                         for p in range(P)]
                start_it = k
                break

    @ray.remote
    def save_shard(ranks, path):
        import pyarrow.parquet as pq

        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(
            pa.table({"node": pa.array(ranks["node"]),
                      "r": pa.array(ranks["r"])}), tmp)
        os.replace(tmp, path)
        return len(ranks["node"])

    for it in range(start_it, iterations):
        outs = [contrib.options(
            num_returns=P if P > 1 else 1).remote(shards[p], ranks[p])
            for p in range(P)]
        if P == 1:
            outs = [[o] for o in outs]
        ranks = [apply_rank.remote(ranks[q],
                                   *[outs[p][q] for p in range(P)])
                 for q in range(P)]
        done = it + 1
        if (checkpoint_dir is not None
                and (done % checkpoint_every == 0
                     or done == iterations)):
            from rayspatial.state.checkpoint import CheckpointManifest

            man_k = CheckpointManifest(checkpoint_dir, f"pr-it{done}")
            rows = ray.get([
                save_shard.remote(ranks[p], man_k.data_path(p))
                for p in range(P)])
            for p in range(P):
                man_k.record(p, {
                    "pid": p, "iteration": done, "rows": rows[p],
                    "input_fingerprint": fps[p],
                })

    @ray.remote
    def to_table(ranks):
        return pa.table({"node": pa.array(ranks["node"]),
                         "rank_scaled": pa.array(ranks["r"])})

    return rd.from_arrow_refs([to_table.remote(r) for r in ranks])
