"""Distributed BM25 retrieval: top-k documents for a fixed query term
set — the ranked-search primitive next to textops/tfidf.py (keyword
extraction) and textops/index.py (posting lists).

Scale shape (the part that must survive 100 TB):

1. ONE tokenization pass over the corpus (map_batches, Arrow
   ``split_pattern_regex`` via textops/hashing.split_words).  Each
   batch emits two kinds of rows into one table: per-(doc, query-term)
   rows ``(doc_id, term, tf, dl)`` — bounded by |docs containing a
   query term| x |Q|, NOT by corpus token count — and one per-batch
   summary row (term='') carrying ``(n_docs, total_tokens)`` partials.
   The corpus is never re-read and raw tokens never leave the stage.
2. Stats + per-term document frequencies are bounded gathers: the
   summary rows are P rows (one per block); df is a per-batch partial
   count over |Q| distinct terms, combined driver-side into a
   broadcast dict of |Q| entries.
3. Scoring is a streaming map over the (doc, term) rows with the
   broadcast idf table, then ops/window.top_k_by_group sums per-doc
   contributions and selects the global top-k with bounded combines
   (k rows survive per partition; k x P final gather).

Exactness: the Okapi saturation factor tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
with k1=1.2, b=0.75 and avgdl = T/N is the rational
    2.2 * tf * 10T / (10T*tf + 3T + 9*dl*N)
so ``sat_micro = (tf * 22000 * T) // (10T*tf + 3T + 9*dl*N)`` is exact
int64 floor arithmetic a SQL oracle reproduces bit-for-bit, and
``idf_micro = round(ln((N - df + 0.5)/(df + 0.5) + 1) * 1e6)`` (the
Lucene BM25 idf) quantizes the only transcendental once per distinct
df.  score_scaled = sum over query terms of idf_micro * sat_micro.
Exact-integer contract needs ``max_tf * 22000 * T < 2**63`` (T = corpus
token count) — beyond ~10^12 tokens switch the saturation to float and
accept last-ulp ranking ties, or rescale 22000 -> 22.

Reference: tf/df semantics per pygeos-era text pipelines; tokenizer
contract shared with textops/tfidf.py (str.split() semantics).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from rayspatial.textops.hashing import split_words

__all__ = ["bm25_topk"]


def bm25_topk(docs_ds, query_terms: list[str], k: int = 20,
              id_col: str = "doc_id", text_col: str = "text",
              num_partitions: int | None = None):
    """docs (id, text) -> top-``k`` docs by BM25 score against
    ``query_terms``: (id, score_scaled), score desc / id asc.  Docs
    matching no query term score 0 and are not emitted."""
    import ray

    from rayspatial.ops.window import top_k_by_group

    qset = frozenset(query_terms)
    if not qset:
        raise ValueError("bm25_topk: query_terms must be non-empty")

    def tf_rows(batch: pa.Table) -> pa.Table:
        # |Q| strings ride the task closure; only the idf table below
        # (still bounded by |Q|) goes through ray.put.
        words, off = split_words(batch.column(text_col))
        dl = np.diff(off)
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        w = words.to_pandas().to_numpy()
        doc_of = np.repeat(np.arange(len(ids)), dl)
        keep = pd.Series(w).isin(qset).to_numpy()
        df = pd.DataFrame({id_col: ids[doc_of[keep]], "term": w[keep],
                           "dl": dl[doc_of[keep]]})
        tf = (df.groupby([id_col, "term"], sort=False)
              .agg(tf=("dl", "size"), dl=("dl", "first")).reset_index())
        out = pa.table({
            id_col: pa.array(
                np.concatenate([tf[id_col].to_numpy(), [-1]]), pa.int64()),
            "term": pa.array(list(tf["term"]) + [""], pa.string()),
            "tf": pa.array(
                np.concatenate([tf["tf"].to_numpy().astype(np.int64),
                                [len(ids)]]), pa.int64()),
            "dl": pa.array(
                np.concatenate([tf["dl"].to_numpy().astype(np.int64),
                                [int(dl.sum())]]), pa.int64()),
        })
        return out

    # Materialize the REDUCED rows once (object store, spillable):
    # they are consumed twice (stats gather + scoring), and without
    # this the lazy plan would re-run corpus tokenization per consumer.
    # Size is O(|docs with a query term| x |Q| + blocks), not corpus
    # tokens — the one thing that is safe to pin at 100 TB.
    rows = docs_ds.map_batches(tf_rows, batch_format="pyarrow").materialize()
    # the summary gather is bounded: |Q| df-partials + 1 stats row per
    # BLOCK (not per doc/token), so the driver sees O(P * |Q|) rows.
    def summarize(batch: pa.Table) -> pa.Table:
        t = batch.to_pandas()
        stats = t[t["term"] == ""]
        dfp = (t[t["term"] != ""].groupby("term", sort=False)
               .size().reset_index(name="c"))
        return pa.table({
            "term": pa.array(list(dfp["term"]) + [""] * len(stats)),
            "c": pa.array(np.concatenate([
                dfp["c"].to_numpy().astype(np.int64),
                np.zeros(len(stats), np.int64)])),
            "n_docs": pa.array(np.concatenate([
                np.zeros(len(dfp), np.int64),
                stats["tf"].to_numpy()])),
            "toks": pa.array(np.concatenate([
                np.zeros(len(dfp), np.int64), stats["dl"].to_numpy()])),
        })

    summ = rows.map_batches(summarize, batch_format="pyarrow").to_pandas()
    if summ.empty:          # zero input blocks: no schema, no corpus
        raise ValueError("bm25_topk: empty corpus")
    n_docs = int(summ["n_docs"].sum())
    total_toks = int(summ["toks"].sum())
    dfmap = summ[summ["term"] != ""].groupby("term")["c"].sum()
    if total_toks == 0:
        raise ValueError("bm25_topk: empty corpus")
    idf = {t: np.int64(round(math.log(
        (n_docs - int(c) + 0.5) / (int(c) + 0.5) + 1.0) * 1e6))
        for t, c in dfmap.items()}
    idf_ref = ray.put((idf, np.int64(n_docs), np.int64(total_toks)))

    def contrib(batch: pa.Table) -> pa.Table:
        idfm, n, tt = ray.get(idf_ref)
        t = batch.to_pandas()
        t = t[t["term"] != ""]
        tf = t["tf"].to_numpy().astype(np.int64)
        dl = t["dl"].to_numpy().astype(np.int64)
        sat = (tf * 22000 * tt) // (10 * tt * tf + 3 * tt + 9 * dl * n)
        im = t["term"].map(idfm).to_numpy().astype(np.int64)
        return pa.table({id_col: pa.array(t[id_col].to_numpy()),
                         "contrib": pa.array(im * sat)})

    scored = rows.map_batches(contrib, batch_format="pyarrow")
    out = top_k_by_group(scored, [id_col], "contrib", k=k, agg="sum")
    return out.map_batches(
        lambda b: b.rename_columns([id_col, "score_scaled"]),
        batch_format="pyarrow")
