"""Fuzzy string-similarity join over the corpus vocabulary: all
unordered term pairs within a Levenshtein edit-distance threshold,
found via SymSpell-style deletion-neighborhood blocking (Garbe 2012,
public SymSpell algorithm) instead of the quadratic all-pairs scan.

Why this blocking is EXACT for plain Levenshtein <= d: any edit script
of cost <= d transforming a into b can be decomposed into <= d
deletions from a and <= d deletions from b that meet at a common
subsequence (a substitution is one deletion on each side at the same
position; an insert/delete is one deletion on the longer side).  So
every qualifying pair shares at least one deletion-variant key, and
candidate verification with an exact distance kernel loses nothing.

Scale shape (corpus -> vocab -> pairs):
1. distinct terms: per-batch np.unique partials, ONE hash shuffle by
   term — the only corpus-sized exchange.
2. key expansion runs over the (much smaller) vocabulary: each term
   emits its O(len^d) deletion variants; a second hash shuffle groups
   candidate terms per key.  Hot keys are bounded by min_len (no empty
   key) and by the alphabet for the shortest terms.
3. candidate pairs dedup through a third small shuffle keyed by the
   pair, then a vectorized DP verifies exact distance <= max_dist.

No Python loop touches corpus-sized data: the only per-element loops
run over vocabulary terms (key generation) and candidate pairs (padded
char-code matrices; the DP loops over the <=L x L character grid with
all pairs vectorized per cell).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["edit_distance_pairs"]


def _deletion_keys(term: str, max_dist: int) -> set[str]:
    """All strings reachable from term by deleting up to max_dist chars."""
    out = {term}
    frontier = {term}
    for _ in range(max_dist):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                nxt.add(t[:i] + t[i + 1:])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


def levenshtein_batch(a_terms, b_terms) -> np.ndarray:
    """Exact Levenshtein distance for aligned term lists, vectorized
    ACROSS pairs: the DP grid is looped cell-by-cell (<= maxlen^2 tiny
    iterations) with every pair's cell computed in one numpy op."""
    n = len(a_terms)
    if n == 0:
        return np.zeros(0, np.int64)
    la = np.fromiter((len(t) for t in a_terms), np.int64, n)
    lb = np.fromiter((len(t) for t in b_terms), np.int64, n)
    La, Lb = int(la.max()), int(lb.max())
    A = np.full((n, La), -1, np.int32)
    B = np.full((n, Lb), -2, np.int32)  # distinct pads never match
    for r, t in enumerate(a_terms):
        A[r, :len(t)] = np.frombuffer(t.encode("utf-32-le"),
                                      np.uint32).astype(np.int32)
    for r, t in enumerate(b_terms):
        B[r, :len(t)] = np.frombuffer(t.encode("utf-32-le"),
                                      np.uint32).astype(np.int32)

    res = np.where(la == 0, lb, -1).astype(np.int64)
    prev = np.tile(np.arange(Lb + 1, dtype=np.int32), (n, 1))
    done0 = la == 0
    if done0.any():
        res[done0] = lb[done0]
    for i in range(1, La + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, Lb + 1):
            cost = (ai != B[:, j - 1]).astype(np.int32)
            cur[:, j] = np.minimum(np.minimum(prev[:, j] + 1,
                                              cur[:, j - 1] + 1),
                                   prev[:, j - 1] + cost)
        hit = la == i
        if hit.any():
            res[hit] = cur[hit, lb[hit]]
        prev = cur
    return res


def edit_distance_pairs(docs_ds, text_col: str = "text",
                        max_dist: int = 2, min_len: int = 3,
                        num_partitions: int | None = None):
    """All unordered vocabulary term pairs (a < b) with Levenshtein
    distance <= ``max_dist`` over whitespace-split terms of length >=
    ``min_len``.  Output columns: term_a, term_b, dist (int64), one
    row per pair.  See module docstring for the three-shuffle shape."""
    from rayspatial.util import hash_partitioned_agg

    def toks(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pandas()
        terms = texts.str.strip().str.split(r"\s+", regex=True).explode()
        terms = terms[terms.str.len() >= min_len]
        return pa.table({"term": pa.array(np.unique(terms.to_numpy()))})

    term_partials = docs_ds.map_batches(toks, batch_format="pyarrow")

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("term", ignore_index=True)

    vocab = hash_partitioned_agg(term_partials, ["term"], distinct,
                                 num_partitions=num_partitions)

    def expand(batch: pa.Table) -> pa.Table:
        keys, terms = [], []
        for t in batch.column("term").to_pylist():
            for k in _deletion_keys(t, max_dist):
                keys.append(k)
                terms.append(t)
        return pa.table({"key": pa.array(keys, pa.string()),
                         "term": pa.array(terms, pa.string())})

    keyed = vocab.map_batches(expand, batch_format="pyarrow")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        m = d.merge(d, on="key", suffixes=("_a", "_b"))
        m = m[m["term_a"] < m["term_b"]]
        return (m[["term_a", "term_b"]]
                .drop_duplicates(ignore_index=True))

    cand = hash_partitioned_agg(keyed, ["key"], pairs,
                                num_partitions=num_partitions)

    def verify(df: pd.DataFrame) -> pa.Table:
        d = df.drop_duplicates(ignore_index=True)
        if not len(d):
            return pa.table({"term_a": pa.array([], pa.string()),
                             "term_b": pa.array([], pa.string()),
                             "dist": pa.array([], pa.int64())})
        dist = levenshtein_batch(d["term_a"].tolist(), d["term_b"].tolist())
        keep = dist <= max_dist
        d = d[keep].reset_index(drop=True)
        d["dist"] = dist[keep]
        d = d.sort_values(["term_a", "term_b"], ignore_index=True)
        return pa.Table.from_pandas(d, preserve_index=False)

    return hash_partitioned_agg(cand, ["term_a", "term_b"], verify,
                                num_partitions=num_partitions)
