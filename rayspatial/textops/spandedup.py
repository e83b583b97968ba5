"""Span-level corpus deduplication (C4 / Lee et al. style): every
occurrence of a repeated unit except the globally FIRST one (ordered by
(doc_id, unit_idx)) is removed, and documents are rebuilt from their
surviving units.

Units are either fixed-width word spans (``span_dedup``, the shape used
for web-text training corpora where exact duplicated passages recur
across pages) or physical lines (``line_dedup``, the C4 newline rule).

Scale shape (100-TB), three bounded stages:

1. map_batches: vectorized unit extraction (Arrow split + list-offset
   arithmetic); ships ONLY ``(h1, h2, doc_id, unit_idx)`` — 28 B per
   unit, never the text — into
2. one hash-partition shuffle by the 128-bit unit hash; each partition
   keeps the lexicographic first (doc_id, unit_idx) per hash and emits
   the complement as the DROP set (16 B rows); then
3. rebuild — two modes behind a byte-budget gate (same contract as
   ops/equijoin._broadcast_join): the drop set is normally minuscule,
   so it is gathered once, ``ray.put`` broadcast, and every document
   is rebuilt IN PLACE by a ``map_batches`` over the source — the
   text never enters a shuffle.  If the drop set overflows the budget
   (adversarial: nearly-all-repeated corpus), fall back to one
   hash-partition shuffle by doc_id co-locating each document row
   with its drop rows (union-tag, same shape as ops/relational); the
   text moves exactly once, units are re-extracted in-partition and
   the document is rebuilt with ``pc.binary_join`` — no per-row
   Python.

Collisions: unit identity is the 128-bit pair (FNV-1a, rolling
fingerprint) — the same identity exact_dedup uses (textops/dedup.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from rayspatial.textops.hashing import (
    _ragged_arange,
    hash_strings,
    rolling_fingerprint,
    split_words,
)

__all__ = ["span_dedup", "line_dedup"]


def _span_units(texts: pa.Array, span_w: int) -> tuple[pa.Array, np.ndarray]:
    """(flat span StringArray, int64 offsets[n+1]) — doc i owns spans
    ``flat[off[i]:off[i+1]]``; span = ``span_w`` consecutive
    whitespace-split words joined by ' ' (last span may be shorter)."""
    flat_words, woff = split_words(texts)
    wcounts = np.diff(woff)
    scounts = -(-wcounts // span_w)  # ceil
    soff = np.zeros(len(wcounts) + 1, dtype=np.int64)
    np.cumsum(scounts, out=soff[1:])
    # word-offset boundary of every span: doc word_start + span_i*W,
    # plus each doc's terminal boundary
    total_spans = int(soff[-1])
    span_word_starts = (
        np.repeat(woff[:-1], scounts)
        + _ragged_arange(scounts) * span_w
    )
    # list offsets over flat_words: span k covers
    # [span_word_starts[k], min(start + W, doc_word_end))
    doc_word_end = np.repeat(woff[1:], scounts)
    span_word_ends = np.minimum(span_word_starts + span_w, doc_word_end)
    # build Arrow list offsets: starts are monotone and each span's end
    # equals the next span's start within a doc, so offsets =
    # [starts..., last_end]
    if total_spans:
        list_off = np.append(span_word_starts, span_word_ends[-1])
    else:
        list_off = np.zeros(1, dtype=np.int64)
    lw = flat_words
    if isinstance(lw, pa.ChunkedArray):
        lw = lw.combine_chunks()
    spans_list = pa.LargeListArray.from_arrays(
        pa.array(list_off, type=pa.int64()), lw.cast(pa.large_string())
    )
    spans = pc.binary_join(spans_list,
                           pa.scalar(" ", type=pa.large_string()))
    return spans, soff


def _line_units(texts: pa.Array, sep: str = "\n") \
        -> tuple[pa.Array, np.ndarray]:
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern(texts, sep)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    counts = (pc.fill_null(pc.list_value_length(toks), 0)
              .to_numpy(zero_copy_only=False).astype(np.int64))
    off = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=off[1:])
    return flat, off


def _unit_dedup(docs_ds, units_fn, join_sep: str, id_col: str,
                text_col: str, dedupable, out_dropped: str,
                num_partitions: int | None,
                broadcast_byte_budget: int = 256 << 20):
    from rayspatial.util import hash_partitioned_agg

    # -- stage 1: unit hashes ------------------------------------------
    def to_hashes(batch: pa.Table) -> pa.Table:
        units, off = units_fn(batch.column(text_col))
        doc_ids = np.repeat(
            batch.column(id_col).to_numpy(zero_copy_only=False),
            np.diff(off))
        unit_idx = _ragged_arange(np.diff(off))
        mask = dedupable(units)
        t = pa.table({
            "h1": pa.array(hash_strings(units).view(np.int64)),
            "h2": pa.array(rolling_fingerprint(units)),
            id_col: pa.array(doc_ids),
            "_uidx": pa.array(unit_idx),
        })
        return t.filter(pa.array(mask)) if mask is not None else t

    hashed = docs_ds.map_batches(to_hashes, batch_format="pyarrow")

    # -- stage 2: first-occurrence per hash -> DROP set ----------------
    def drops_of(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["h1", "h2", id_col, "_uidx"], kind="stable")
        first = (df["h1"].ne(df["h1"].shift())
                 | df["h2"].ne(df["h2"].shift()))
        return df.loc[~first, [id_col, "_uidx"]]

    drops = hash_partitioned_agg(hashed, ["h1", "h2"], drops_of,
                                 num_partitions=num_partitions)

    # -- stage 3a: BROADCAST rebuild (the common case) -----------------
    # The drop set is typically minuscule vs the corpus (only the
    # complements of repeated units), while the union+shuffle fallback
    # below ships ALL text through a second all-to-all AND forms a
    # diamond over docs_ds — under a constrained object store the
    # rebuild shuffle buffers the whole text stream waiting for the
    # drops branch (observed: UnionOperator starved 60s+ at an 8M-doc /
    # 4 GiB-store probe, >880s wall vs 38s unconstrained).  So, same
    # gate as ops/equijoin._broadcast_join: gather drop blocks
    # incrementally; if they fit the budget, ray.put them ONCE and
    # rebuild docs IN PLACE — the text never moves, no second shuffle,
    # and the gather itself is the barrier that serializes the two
    # all-to-alls.  An adversarial corpus (nearly everything repeated)
    # overflows the budget and falls back to the shuffle path.
    import ray

    dtabs: list[pa.Table] = []
    total = 0
    fits = True
    for blk_ref in drops.to_arrow_refs():
        t = ray.get(blk_ref)
        if t.num_rows:
            dtabs.append(t.select([id_col, "_uidx"]))
            total += t.nbytes
        if total > broadcast_byte_budget:
            fits = False
            break
    if fits:
        if dtabs:
            dtab = pa.concat_tables(dtabs).sort_by(
                [(id_col, "ascending"), ("_uidx", "ascending")])
            dr_ids = dtab.column(id_col).to_numpy().astype(np.int64)
            dr_uidx = dtab.column("_uidx").to_numpy().astype(np.int64)
        else:
            dr_ids = np.empty(0, dtype=np.int64)
            dr_uidx = np.empty(0, dtype=np.int64)
        drops_ref = ray.put((dr_ids, dr_uidx))

        def rebuild_batch(batch: pa.Table) -> pa.Table:
            b_ids, b_uidx = ray.get(drops_ref)  # zero-copy, per-node
            texts = batch.column(text_col).cast(pa.large_string())
            ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            units, off = units_fn(texts)
            counts = np.diff(off)
            keep = np.ones(int(off[-1]), dtype=bool)
            lo = np.searchsorted(b_ids, ids, "left")
            hi = np.searchsorted(b_ids, ids, "right")
            ndr = hi - lo
            if ndr.any():
                # ragged gather of this batch's drop rows
                dpos = np.repeat(lo, ndr) + _ragged_arange(ndr)
                unit_base = np.repeat(off[:-1], ndr)
                keep[unit_base + b_uidx[dpos]] = False
            n_dropped = np.bincount(
                np.repeat(np.arange(len(ids)), counts)[~keep],
                minlength=len(ids)).astype(np.int64)
            kept_counts = counts - n_dropped
            new_off = np.zeros(len(ids) + 1, dtype=np.int64)
            np.cumsum(kept_counts, out=new_off[1:])
            if isinstance(units, pa.ChunkedArray):
                units = units.combine_chunks()
            kept_list = pa.LargeListArray.from_arrays(
                pa.array(new_off, type=pa.int64()),
                units.cast(pa.large_string()).filter(pa.array(keep)))
            return pa.table({
                id_col: pa.array(ids),
                text_col: pc.binary_join(
                    kept_list, pa.scalar(join_sep, type=pa.large_string())
                ).cast(pa.string()),
                out_dropped: pa.array(n_dropped),
            })

        return docs_ds.map_batches(rebuild_batch, batch_format="pyarrow")

    # -- stage 3b: shuffle rebuild (drop set exceeded the budget) ------
    def tag_doc(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch.column(id_col),
            text_col: batch.column(text_col).cast(pa.large_string()),
            "_uidx": pa.nulls(len(batch), pa.int64()),
        })

    def tag_drop(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch.column(id_col),
            text_col: pa.nulls(len(batch), pa.large_string()),
            "_uidx": batch.column("_uidx"),
        })

    tagged = docs_ds.map_batches(tag_doc, batch_format="pyarrow").union(
        drops.map_batches(tag_drop, batch_format="pyarrow"))

    def rebuild(df: pd.DataFrame) -> pa.Table:
        docs = df[df["_uidx"].isna()]
        dr = df[df["_uidx"].notna()]
        texts = pa.array(docs[text_col], type=pa.large_string())
        ids = docs[id_col].to_numpy()
        units, off = units_fn(texts)
        counts = np.diff(off)
        keep = np.ones(int(off[-1]), dtype=bool)
        if len(dr):
            order = np.argsort(ids, kind="stable")
            dr_ids = dr[id_col].to_numpy(dtype=np.int64)
            dpos = order[np.searchsorted(ids[order], dr_ids)]
            keep[off[:-1][dpos] + dr["_uidx"].to_numpy(dtype=np.int64)] \
                = False
        n_dropped = np.bincount(
            np.repeat(np.arange(len(ids)), counts)[~keep],
            minlength=len(ids)).astype(np.int64)
        kept_counts = counts - n_dropped
        new_off = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=new_off[1:])
        if isinstance(units, pa.ChunkedArray):
            units = units.combine_chunks()
        kept_list = pa.LargeListArray.from_arrays(
            pa.array(new_off, type=pa.int64()),
            units.cast(pa.large_string()).filter(pa.array(keep)))
        return pa.table({
            id_col: pa.array(ids),
            text_col: pc.binary_join(
                kept_list, pa.scalar(join_sep, type=pa.large_string())
            ).cast(pa.string()),
            out_dropped: pa.array(n_dropped),
        })

    return hash_partitioned_agg(tagged, [id_col], rebuild,
                                num_partitions=num_partitions)


def span_dedup(docs_ds, span_w: int = 3, id_col: str = "doc_id",
               text_col: str = "text", num_partitions: int | None = None,
               broadcast_byte_budget: int = 256 << 20):
    """Remove repeated ``span_w``-word spans corpus-wide (keep first
    occurrence by (doc_id, span_idx)); rebuild docs with ' '.
    ``broadcast_byte_budget=0`` forces the shuffle rebuild path."""
    return _unit_dedup(
        docs_ds, lambda t: _span_units(t, span_w), " ", id_col, text_col,
        dedupable=lambda units: None, out_dropped="n_spans_dropped",
        num_partitions=num_partitions,
        broadcast_byte_budget=broadcast_byte_budget)


def line_dedup(docs_ds, id_col: str = "doc_id", text_col: str = "text",
               num_partitions: int | None = None,
               broadcast_byte_budget: int = 256 << 20):
    """C4 newline rule: duplicate non-empty LINES are removed corpus-
    wide (first occurrence kept; empty lines always kept); docs are
    rebuilt with '\\n'.  ``broadcast_byte_budget=0`` forces the
    shuffle rebuild path."""
    def dedupable(units):
        return (pc.greater(pc.utf8_length(units), 0)
                .to_numpy(zero_copy_only=False))

    return _unit_dedup(
        docs_ds, _line_units, "\n", id_col, text_col,
        dedupable=dedupable, out_dropped="n_lines_dropped",
        num_partitions=num_partitions,
        broadcast_byte_budget=broadcast_byte_budget)
