"""Deduplication operators over a documents table.

Five families (SURVEY.md §2.12 / driver brief), each a composition of
vectorized map_batches stages + one keyed shuffle:

- exact:     128-bit content hash -> groupby(hash) -> keep min id
- n-gram Jaccard (exact): inverted shingle index -> per-shingle pair
  emission (doc metadata carried through, so NO second join) ->
  groupby(pair) intersection counts -> integer-exact Jaccard filter
- MinHash+LSH (approximate): signature via segmented-min permutations
  -> banding -> bucket groupby -> candidate pairs
- SimHash: 64-bit simhash -> 4x16-bit block buckets (pigeonhole:
  complete for hamming<=3) -> exact hamming verify in-bucket
- embedding cosine: see textops.ann (same bucket-verify shape)

Scale notes: every shuffle key is a hash (uniform); per-shingle pair
emission is capped (``max_bucket`` guard) against degenerate hot
shingles, with dropped buckets logged; pair tables carry only ids +
small ints.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rayspatial.textops.hashing import (
    hash_int64,
    hash_strings,
    word_shingle_hashes,
)

MERSENNE61 = np.uint64((1 << 61) - 1)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_hash_partials(batch: pa.Table, key_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """Map-side combiner for exact dedup: one (h1, h2, min-id, count)
    row per DISTINCT key in the batch, so any key — including a
    mega-duplicate spanning the whole corpus — ships at most one
    shuffle row per input block."""
    from rayspatial.textops.hashing import rolling_fingerprint

    h1 = hash_strings(batch.column(key_col)).view(np.int64)
    h2 = rolling_fingerprint(batch.column(key_col))  # independent algo
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    # Sort by (h1, h2, id), boundary-scan groups.
    order = np.lexsort((ids, h2, h1))
    h1s, h2s, idss = h1[order], h2[order], ids[order]
    new = np.r_[True, (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])]
    starts = np.flatnonzero(new)
    counts = np.diff(np.r_[starts, len(h1s)])
    return pa.table(
        {
            "h1": pa.array(h1s[starts]),
            "h2": pa.array(h2s[starts]),
            "rep": pa.array(idss[starts]),  # min id (ids sorted last)
            "cnt": pa.array(counts.astype(np.int64)),
        }
    )


def exact_dedup_groups(ds, key_col: str = "text", id_col: str = "doc_id"):
    """-> Dataset (doc_id, n_copies): representative (min id) + copy
    count per distinct ``key_col`` value.

    Map side emits two independent 64-bit content hashes (128 bits
    total — collision-free in practice at 10^12 rows) so the shuffle
    moves 24 bytes/row instead of the text payload, AND pre-combines
    per batch (min id + count per key) so a mega-duplicate key — the
    boilerplate page repeated 10^9× in a real web corpus — contributes
    at most ONE shuffle row per input block instead of one per copy.
    """
    from rayspatial.util import hash_partitioned_agg

    def to_hash_partials(batch: pa.Table) -> pa.Table:
        return exact_hash_partials(batch, key_col, id_col)

    hashed = ds.map_batches(to_hash_partials, batch_format="pyarrow")

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["h1", "h2"], sort=False)
            .agg(**{id_col: ("rep", "min"), "n_copies": ("cnt", "sum")})
            .reset_index(drop=True)
        )
        return out[[id_col, "n_copies"]]

    return hash_partitioned_agg(hashed, ["h1", "h2"], agg)


def exact_dedup(ds, key_col: str = "text", id_col: str = "doc_id"):
    """-> Dataset of surviving rows (first id per distinct key).

    Full-row variant: shuffles (hash, row) and keeps the min-id row per
    group via map_groups.  Map side pre-combines per batch (keep only
    the min-id row per hash before the shuffle) so a mega-duplicate key
    ships at most one full row per input block; min-of-mins is still
    the global min.
    """

    def add_hash_combine(batch: pa.Table) -> pa.Table:
        h = hash_strings(batch.column(key_col)).view(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        hs = h[order]
        first = np.r_[True, hs[1:] != hs[:-1]]
        keep_idx = np.sort(order[first])  # min-id row per in-batch hash
        kept = batch.take(pa.array(keep_idx))
        return kept.append_column("_h", pa.array(h[keep_idx]))

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return (
        ds.map_batches(add_hash_combine, batch_format="pyarrow")
        .groupby("_h")
        .map_groups(first_per_group, batch_format="pandas")
        .drop_columns(["_h"])
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, via inverted shingle index)
# ---------------------------------------------------------------------------


def _shingle_rows(batch: pa.Table, k: int, id_col: str) -> pa.Table:
    """Explode: one row per (distinct shingle hash, doc) + the doc's
    shingle-set size (carried so the pair stage needs no second join)."""
    texts = batch.column("text")
    flat, off = word_shingle_hashes(texts, k=k)
    n_sh = np.diff(off)
    ids = batch.column(id_col).to_numpy()
    doc_rep = np.repeat(ids, n_sh)
    nsh_rep = np.repeat(n_sh, n_sh)
    return pa.table(
        {
            "g": pa.array(flat.view(np.int64)),
            id_col: pa.array(doc_rep),
            "nsh": pa.array(nsh_rep),
        }
    )


def pairs_from_buckets(ds, key_cols: list[str], id_col: str,
                       carry_cols: list[str] | None = None,
                       max_bucket: int = 10_000,
                       num_partitions: int | None = None):
    """Generic bucket -> candidate-pair stage.

    Rows sharing identical values in ``key_cols`` form a bucket; all
    a<b id pairs per bucket are emitted (with ``carry_cols`` values of
    both sides as ``<col>_a``/``<col>_b``).

    Implementation note: one ``map_groups`` call PER BUCKET costs
    milliseconds of Python overhead each — ruinous with millions of
    tiny buckets.  Instead buckets are hash-PARTITIONED (one shuffle,
    ``num_partitions`` groups) and each partition emits pairs for all
    its buckets in one vectorized pass (sort by key, boundary scan,
    per-bucket numpy pair expansion).
    """
    from rayspatial.util import cluster_cpus

    carry = carry_cols or []
    P = num_partitions or 2 * cluster_cpus()

    def add_part(batch: pa.Table) -> pa.Table:
        h = np.zeros(len(batch), dtype=np.uint64)
        for c in key_cols:
            h = hash_int64(h ^ batch.column(c).to_numpy().view(np.uint64))
        return batch.append_column("_part", pa.array((h % np.uint64(P)).astype(np.int64)))

    def emit_partition(g: pd.DataFrame) -> pa.Table:
        key_mat = np.column_stack([g[c].to_numpy() for c in key_cols])
        order = np.lexsort([g[id_col].to_numpy()] + [key_mat[:, i] for i in range(key_mat.shape[1] - 1, -1, -1)])
        km = key_mat[order]
        ids = g[id_col].to_numpy()[order]
        carried = {c: g[c].to_numpy()[order] for c in carry}
        bounds = np.flatnonzero(
            np.r_[True, (km[1:] != km[:-1]).any(axis=1)]
        )
        bounds = np.append(bounds, len(ids))
        out = {k: [] for k in ["a", "b", *(f"{c}_a" for c in carry), *(f"{c}_b" for c in carry)]}
        # singleton buckets dominate (most shingles are unique): filter
        # them vectorized so the Python loop touches only REAL buckets
        sizes = np.diff(bounds)
        dropped = int((sizes > max_bucket).sum())
        for s in np.flatnonzero((sizes >= 2) & (sizes <= max_bucket)):
            lo, hi = bounds[s], bounds[s + 1]
            sz = hi - lo
            ii, jj = np.triu_indices(sz, k=1)
            out["a"].append(ids[lo:hi][ii])
            out["b"].append(ids[lo:hi][jj])
            for c in carry:
                out[f"{c}_a"].append(carried[c][lo:hi][ii])
                out[f"{c}_b"].append(carried[c][lo:hi][jj])
        if dropped:
            print(f"# pairs_from_buckets: dropped {dropped} hot buckets (> {max_bucket})")
        # return ARROW, not pandas: pandas blocks entering a downstream
        # Ray sort/aggregate are ~20x slower than Arrow blocks
        if not out["a"]:
            return pa.table({k: pa.array([], type=pa.int64()) for k in out})
        return pa.table({k: pa.array(np.concatenate(v)) for k, v in out.items()})

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(emit_partition, batch_format="pandas")
    )


def ngram_jaccard_dup_pairs(
    ds,
    k: int = 3,
    threshold_pct: int = 50,
    id_col: str = "doc_id",
    max_bucket: int = 10_000,
):
    """EXACT near-duplicate pairs: Jaccard similarity of the distinct
    word-k-gram shingle sets >= threshold_pct/100.

    inverted index (groupby shingle) -> pair emission with carried set
    sizes -> groupby(pair) intersection count -> integer-exact filter
    ``100*inter >= pct*(na+nb-inter)`` (no float compare — the DuckDB
    oracle uses the same integers).  Output (a, b, inter) sorted keys.
    """
    from rayspatial.util import hash_partitioned_agg

    sh = ds.map_batches(
        lambda b: _shingle_rows(b, k, id_col), batch_format="pyarrow"
    )
    pairs = pairs_from_buckets(
        sh, ["g"], id_col, carry_cols=["nsh"], max_bucket=max_bucket
    )

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["a", "b"], sort=False)
            .agg(inter=("nsh_a", "size"), na=("nsh_a", "first"), nb=("nsh_b", "first"))
            .reset_index()
        )

    agg = hash_partitioned_agg(pairs, ["a", "b"], pair_counts)

    def jfilter(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        inter = batch.column("inter").to_numpy()
        na = batch.column("na").to_numpy()
        nb = batch.column("nb").to_numpy()
        keep = 100 * inter >= threshold_pct * (na + nb - inter)
        return pa.table(
            {"a": a[keep], "b": b[keep], "inter": inter[keep]}
        )

    return agg.map_batches(jfilter, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _minhash_signatures(flat: np.ndarray, off: np.ndarray, num_perm: int) -> np.ndarray:
    """(ndocs, num_perm) uint64 — min over universal-hash permutations,
    one segmented ``minimum.reduceat`` per permutation (vectorized)."""
    n = len(off) - 1
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    nonempty = np.flatnonzero(np.diff(off) > 0)
    if len(flat) == 0 or len(nonempty) == 0:
        return sig
    starts = off[:-1][nonempty]
    for p in range(num_perm):
        hp = hash_int64(flat, seed=p)
        sig[nonempty, p] = np.minimum.reduceat(hp, starts)
    return sig


def _band_rows(batch: pa.Table, k: int, num_perm: int, bands: int,
               id_col: str) -> pa.Table:
    flat, off = word_shingle_hashes(batch.column("text"), k=k)
    sig = _minhash_signatures(flat, off, num_perm)
    r = num_perm // bands
    ids = batch.column(id_col).to_numpy()
    n = len(ids)
    # polynomial combine of each band's r signature values -> bucket key
    out_band = np.repeat(np.arange(bands, dtype=np.int64), n)
    out_key = np.empty(bands * n, dtype=np.uint64)
    for b in range(bands):
        seg = sig[:, b * r : (b + 1) * r]
        key = np.zeros(n, dtype=np.uint64)
        for j in range(r):
            key = key * np.uint64(0x100000001B3) + seg[:, j]
        out_key[b * n : (b + 1) * n] = hash_int64(key, seed=b)
    return pa.table(
        {
            "band": pa.array(out_band),
            "key": pa.array(out_key.view(np.int64)),
            id_col: pa.array(np.tile(ids, bands)),
        }
    )


def minhash_lsh_candidates(
    ds,
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    max_bucket: int = 10_000,
):
    """Near-duplicate CANDIDATE pairs via MinHash banding: docs sharing
    any of ``bands`` band-buckets.  Probability a pair with Jaccard s
    surfaces: 1-(1-s^r)^b (r=num_perm/bands) — the classic LSH curve.
    Output (a, b) distinct pairs.  Verify with ngram_jaccard_dup_pairs
    semantics downstream if exactness is required.
    """
    from rayspatial.util import hash_partitioned_agg

    rows = ds.map_batches(
        lambda b: _band_rows(b, k, num_perm, bands, id_col),
        batch_format="pyarrow",
    )
    pairs = pairs_from_buckets(rows, ["band", "key"], id_col, max_bucket=max_bucket)

    def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df[["a", "b"]].drop_duplicates()

    return hash_partitioned_agg(pairs, ["a", "b"], distinct_pairs)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(texts: pa.Array, id_col_vals: np.ndarray) -> np.ndarray:
    """64-bit simhash per doc over whitespace tokens (count-weighted)."""
    from rayspatial.textops.hashing import split_words

    flat, off = split_words(texts)
    counts = np.diff(off)
    th = hash_strings(flat)
    out = np.zeros(len(off) - 1, dtype=np.uint64)
    if len(th) == 0:
        return out.view(np.int64)
    # bit matrix (T, 64) in +-1, segment-summed per doc, sign -> bit.
    # unpackbits/packbits, NOT broadcast uint64 shifts (numpy's u8
    # broadcast shift is ~50x slower than the C bit twiddles)
    bits = np.unpackbits(
        th.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    ).astype(np.int16)
    nonempty = np.flatnonzero(counts > 0)
    ones = np.add.reduceat(bits, off[:-1][nonempty], axis=0).astype(np.int64)
    # sign of sum(+-1) == (2*ones > count)
    simbits = (2 * ones > counts[nonempty, None]).astype(np.uint8)
    vals = np.packbits(simbits, axis=1, bitorder="little").view(np.uint64).ravel()
    out[nonempty] = vals
    return out.view(np.int64)


def simhash_dup_pairs(ds, hamming_k: int = 3, id_col: str = "doc_id",
                      max_bucket: int = 10_000):
    """EXACT pairs with simhash hamming distance <= hamming_k (<=3):
    4x16-bit block buckets guarantee completeness by pigeonhole, exact
    hamming verified in-bucket (simhashes carried with the rows — no
    second join).  Output (a, b, hamming)."""
    from ray.data.aggregate import Min

    def rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        sh = simhash_batch(batch.column("text"), ids).view(np.uint64)
        n = len(ids)
        blocks = np.empty(4 * n, dtype=np.int64)
        for blk in range(4):
            blocks[blk * n : (blk + 1) * n] = (
                (sh >> np.uint64(16 * blk)) & np.uint64(0xFFFF)
            ).astype(np.int64)
        return pa.table(
            {
                "blk": pa.array(np.repeat(np.arange(4, dtype=np.int64), n)),
                "key": pa.array(blocks),
                id_col: pa.array(np.tile(ids, 4)),
                "sh": pa.array(np.tile(sh.view(np.int64), 4)),
            }
        )

    cand = pairs_from_buckets(
        ds.map_batches(rows, batch_format="pyarrow"),
        ["blk", "key"], id_col, carry_cols=["sh"], max_bucket=max_bucket,
    )

    def verify(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        x = batch.column("sh_a").to_numpy().view(np.uint64) ^ batch.column(
            "sh_b"
        ).to_numpy().view(np.uint64)
        # vectorized popcount via unpackbits (no slow u64 shift loop)
        ham = (
            np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
            .sum(axis=1)
            .astype(np.int64)
        )
        keep = ham <= hamming_k
        return pa.table(
            {"a": pa.array(a[keep]), "b": pa.array(b[keep]),
             "hamming": pa.array(ham[keep])}
        )

    # a pair can match in several blocks -> dedup
    from rayspatial.util import hash_partitioned_agg

    def min_ham(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["a", "b"], sort=False)["hamming"].min().reset_index()
        )

    return hash_partitioned_agg(
        cand.map_batches(verify, batch_format="pyarrow"), ["a", "b"], min_ham
    )


def connected_duplicate_groups(pairs_df: pd.DataFrame) -> dict[int, int]:
    """Driver-side union-find over a (small) verified pair table:
    doc_id -> group representative (min id).  At web scale this becomes
    iterative label propagation (groupby-min until fixpoint); pair
    tables after verification are tiny relative to the corpus."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs_df["a"], pairs_df["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


# ---------------------------------------------------------------------------
# incremental dedup against a persisted hash index
# ---------------------------------------------------------------------------

N_HASH_BUCKETS = 64


def build_hash_index(ds, index_dir: str, key_col: str = "text"):
    """Materialize the corpus content-hash index: (h1, h2) pairs,
    Hive-partitioned by ``bucket = h1 mod 64`` — the artifact an
    INCREMENTAL curation run dedups new shards against without
    re-reading the old corpus.

    24 bytes/row regardless of document size; per-bucket files mean a
    new shard's bucket b only ever opens ``bucket=<b>/`` (read-time
    skipping, the ivf_build_index pattern)."""

    def to_hashes(batch: pa.Table) -> pa.Table:
        from rayspatial.textops.hashing import rolling_fingerprint

        h1 = hash_strings(batch.column(key_col)).view(np.int64)
        h2 = rolling_fingerprint(batch.column(key_col))
        return pa.table({
            "h1": pa.array(h1),
            "h2": pa.array(h2),
            "bucket": pa.array(
                (h1.view(np.uint64) % np.uint64(N_HASH_BUCKETS))
                .astype(np.int64)),
        })

    ds.map_batches(to_hashes, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"])


_INDEX_BUCKET_CACHE: dict = {}


def dedup_against_index(new_ds, index_dir: str, key_col: str = "text",
                        id_col: str = "doc_id"):
    """-> surviving rows of ``new_ds``: docs whose content hash does
    NOT appear in the persisted index, deduplicated within the shard
    (min id per distinct text).

    One hash shuffle of (hash, id) rows keyed by the index bucket;
    each group task reads ONLY its own ``bucket=<b>/`` partition
    (cached per worker — a shard touches each bucket once per worker,
    not once per group)."""
    import pyarrow.parquet as pq

    def to_hashes(batch: pa.Table) -> pa.Table:
        from rayspatial.textops.hashing import rolling_fingerprint

        h1 = hash_strings(batch.column(key_col)).view(np.int64)
        h2 = rolling_fingerprint(batch.column(key_col))
        return pa.table({
            "h1": pa.array(h1),
            "h2": pa.array(h2),
            id_col: batch.column(id_col),
            "bucket": pa.array(
                (h1.view(np.uint64) % np.uint64(N_HASH_BUCKETS))
                .astype(np.int64)),
        })

    hashed = new_ds.map_batches(to_hashes, batch_format="pyarrow")

    def anti_filter(df: pd.DataFrame) -> pd.DataFrame:
        import os

        if not len(df):
            return df[[id_col]]
        b = int(df["bucket"].iloc[0])
        part_dir = os.path.join(index_dir, f"bucket={b}")
        files = (tuple(sorted(os.listdir(part_dir)))
                 if os.path.isdir(part_dir) else ())
        # file list in the key: an appended shard (append_hash_index)
        # invalidates stale worker caches without any coordination
        key = (index_dir, b, files)
        idx = _INDEX_BUCKET_CACHE.get(key)
        if idx is None:
            import os

            part = os.path.join(index_dir, f"bucket={b}")
            if os.path.isdir(part):
                t = pq.read_table(part, columns=["h1", "h2"])
                a1 = t.column("h1").to_numpy()
                a2 = t.column("h2").to_numpy()
                o = np.lexsort((a2, a1))
                idx = (a1[o], a2[o])
            else:
                idx = (np.empty(0, np.int64), np.empty(0, np.int64))
            if len(_INDEX_BUCKET_CACHE) > 2 * N_HASH_BUCKETS:
                _INDEX_BUCKET_CACHE.clear()
            _INDEX_BUCKET_CACHE[key] = idx
        ih1, ih2 = idx
        # within-shard dedup first (min id per distinct hash), then
        # drop anything already in the index — vectorized 128-bit
        # membership: searchsorted on h1, h2 verified in the (almost
        # always singleton) equal-h1 span
        df = df.sort_values(id_col, kind="mergesort")
        df = df.drop_duplicates(["h1", "h2"], keep="first")
        h1 = df["h1"].to_numpy()
        h2 = df["h2"].to_numpy()
        seen = np.zeros(len(df), dtype=bool)
        if len(ih1):
            lo = np.searchsorted(ih1, h1, side="left")
            hi = np.searchsorted(ih1, h1, side="right")
            one = hi - lo == 1
            seen[one] = ih2[lo[one]] == h2[one]
            for i in np.flatnonzero(hi - lo > 1):  # h1 collisions: rare
                seen[i] = h2[i] in ih2[lo[i]:hi[i]]
        return df.loc[~seen, [id_col]]

    return (
        hashed.groupby("bucket")
        .map_groups(anti_filter, batch_format="pandas")
    )


def normalize_text(col):
    """Canonical text normalization for dedup: Unicode lowercase +
    whitespace runs collapsed to single spaces + trim — one Arrow
    kernel chain, no Python rows.  The standard pre-hash step that
    catches case/格式 near-identical copies exact hashing misses."""
    import pyarrow.compute as pc

    lowered = pc.utf8_lower(col)
    collapsed = pc.replace_substring_regex(lowered, r"\s+", " ")
    return pc.utf8_trim_whitespace(collapsed)


def exact_dedup_groups_normalized(ds, id_col: str = "doc_id"):
    """exact_dedup_groups over normalized text (lowercase, collapsed
    whitespace): same 24-byte shuffle rows, same min-id representative
    semantics, but case/spacing variants now collapse into one group."""
    import pyarrow as pa

    def add_norm(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("text"), "text",
            normalize_text(batch.column("text")))

    return exact_dedup_groups(
        ds.map_batches(add_norm, batch_format="pyarrow"), id_col=id_col)


def snapshot_diff(old_ds, new_ds, id_col: str = "doc_id",
                  key_col: str = "text",
                  num_partitions: int | None = None):
    """Corpus-version diff: -> Dataset (id, status) with status in
    {'added', 'removed', 'changed', 'same'} — the bookkeeping step an
    incremental crawl pipeline runs between snapshots to reprocess
    only what moved.

    Both sides are reduced to (id, h1, h2) 24-byte rows (content never
    shuffles), tagged, and resolved in ONE hash exchange keyed by id —
    a full-outer-join-with-classification specialization.
    """
    from rayspatial.textops.hashing import rolling_fingerprint
    from rayspatial.util import hash_partitioned_agg

    def to_hashes(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            h1 = hash_strings(batch.column(key_col)).view(np.int64)
            h2 = rolling_fingerprint(batch.column(key_col))
            return pa.table({
                id_col: batch.column(id_col),
                "h1": pa.array(h1),
                "h2": pa.array(h2),
                "_side": pa.array(np.full(len(batch), side, np.int8)),
            })

        return fn

    tagged = old_ds.map_batches(to_hashes(0), batch_format="pyarrow").union(
        new_ds.map_batches(to_hashes(1), batch_format="pyarrow"))

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        old = df[df["_side"] == 0].set_index(id_col)
        new = df[df["_side"] == 1].set_index(id_col)
        ids = old.index.union(new.index)
        in_old = ids.isin(old.index)
        in_new = ids.isin(new.index)
        status = np.where(
            ~in_old, "added",
            np.where(~in_new, "removed", "same"))
        both = in_old & in_new
        if both.any():
            bid = ids[both]
            same = ((old.loc[bid, "h1"].to_numpy()
                     == new.loc[bid, "h1"].to_numpy())
                    & (old.loc[bid, "h2"].to_numpy()
                       == new.loc[bid, "h2"].to_numpy()))
            status[both] = np.where(same, "same", "changed")
        return pd.DataFrame({id_col: ids.to_numpy(), "status": status})

    return hash_partitioned_agg(tagged, [id_col], classify,
                                num_partitions=num_partitions)


def append_hash_index(ds, index_dir: str, key_col: str = "text"):
    """Incremental index REFRESH: append a (new, already-accepted)
    shard's content hashes into the existing bucket-partitioned index
    so the NEXT shard dedups against old corpus + this shard without
    any rebuild.

    ``write_parquet`` adds uniquely named files inside each
    ``bucket=<b>/`` directory (append semantics); readers pick them up
    automatically because the worker bucket cache is keyed by the
    bucket's file list."""

    def to_hashes(batch: pa.Table) -> pa.Table:
        from rayspatial.textops.hashing import rolling_fingerprint

        h1 = hash_strings(batch.column(key_col)).view(np.int64)
        h2 = rolling_fingerprint(batch.column(key_col))
        return pa.table({
            "h1": pa.array(h1),
            "h2": pa.array(h2),
            "bucket": pa.array(
                (h1.view(np.uint64) % np.uint64(N_HASH_BUCKETS))
                .astype(np.int64)),
        })

    ds.map_batches(to_hashes, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"])
