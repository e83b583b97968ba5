"""Bigram language-model quality scoring (CCNet-style perplexity
filter): score each document under an add-one-smoothed bigram LM whose
counts come from the corpus itself.

The curation signal behind "perplexity bucketing": documents whose
token transitions are unlike the corpus (spam, gibberish, boilerplate
soup) score low and can be filtered or bucketed.

Two passes:

1. model pass — corpus unigram/bigram counts.  Per-batch partial
   counts (documents never split across batches) -> one hash shuffle
   keyed by term hash -> totals gathered and broadcast via ``ray.put``.
   The broadcast is bounded by the VOCABULARY (plus observed bigrams),
   not the corpus; at open-web scale the model is pruned to the top-M
   n-grams with a documented cap (same shape as lang_id's broadcast
   model in textops/analysis.py).
2. score pass — one streaming map_batches: per-doc
   ``sum round(ln((c12 + 1) / (c1 + V)) * 1e6)`` over consecutive
   token pairs, vectorized (Arrow-buffer tokenization, searchsorted
   model lookup, reduceat per doc).

Exactness: each bigram's log-probability is quantized to integer
micro-nats BEFORE the per-doc sum (same trick as textops/tfidf.py), so
the emitted scores are integers a SQL oracle reproduces bit-for-bit.

No reference equivalent (pygeos is geometry-only); driver-brief
training-data family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rayspatial.textops.hashing import (
    _ragged_arange,
    hash_strings,
    split_words,
)

__all__ = ["bigram_lm_scores"]


def _batch_ngrams(batch: pa.Table, text_col: str):
    """(flat words, word offsets, bigram-hash array, first-word-hash
    array, bigrams-per-doc) for one batch."""
    import pyarrow.compute as pc

    flat, off = split_words(batch.column(text_col))
    counts = np.diff(off)
    m = np.maximum(counts - 1, 0)
    if m.sum() == 0:
        e = np.empty(0, dtype=np.uint64)
        return flat, off, e, e, m
    doc_of = np.repeat(np.arange(len(m)), m)
    starts = off[:-1][doc_of] + _ragged_arange(m)
    w1 = flat.take(pa.array(starts))
    w2 = flat.take(pa.array(starts + 1))
    bigram = pc.binary_join_element_wise(w1, w2, " ")
    return flat, off, hash_strings(bigram), hash_strings(w1), m


def _corpus_counts(docs_ds, text_col: str):
    """-> (sorted uni hashes, uni counts, sorted bi hashes, bi counts,
    V) — exact corpus totals, one hash shuffle, driver gather bounded
    by vocabulary size."""
    from rayspatial.util import hash_partitioned_agg

    def partial(batch: pa.Table) -> pa.Table:
        flat, off, bh, _, _ = _batch_ngrams(batch, text_col)
        uh = hash_strings(flat)
        ku, cu = np.unique(uh, return_counts=True)
        kb, cb = np.unique(bh, return_counts=True)
        return pa.table(
            {
                "kind": pa.array(
                    np.r_[np.zeros(len(ku), np.int64), np.ones(len(kb), np.int64)]
                ),
                "h": pa.array(np.r_[ku, kb].view(np.int64)),
                "cnt": pa.array(np.r_[cu, cb].astype(np.int64)),
            }
        )

    partials = docs_ds.map_batches(partial, batch_format="pyarrow")

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["kind", "h"], sort=False)["cnt"].sum().reset_index()
        )

    rows = hash_partitioned_agg(partials, ["kind", "h"], total).take_all()
    kind = np.fromiter((r["kind"] for r in rows), dtype=np.int64)
    h = np.fromiter((r["h"] for r in rows), dtype=np.int64).view(np.uint64)
    cnt = np.fromiter((r["cnt"] for r in rows), dtype=np.int64)
    uni, bi = kind == 0, kind == 1
    ou, ob = np.argsort(h[uni]), np.argsort(h[bi])
    return (
        h[uni][ou],
        cnt[uni][ou],
        h[bi][ob],
        cnt[bi][ob],
        int(uni.sum()),
    )


def _lookup(sorted_keys: np.ndarray, counts: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """counts[key] with 0 default, vectorized."""
    if not len(sorted_keys) or not len(keys):
        return np.zeros(len(keys), dtype=np.int64)
    pos = np.searchsorted(sorted_keys, keys)
    pos[pos == len(sorted_keys)] = 0
    out = counts[pos].copy()
    out[sorted_keys[pos] != keys] = 0
    return out


def bigram_lm_scores(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """-> Dataset (doc_id, n_bigrams, lm_score_micro): add-one-smoothed
    bigram log-likelihood in integer micro-nats (0 for docs with fewer
    than two tokens)."""
    import ray

    uh, uc, bh, bc, vocab = _corpus_counts(docs_ds, text_col)
    model_ref = ray.put((uh, uc, bh, bc, vocab))

    def score(batch: pa.Table) -> pa.Table:
        uh, uc, bh, bc, vocab = ray.get(model_ref)
        _, off, bhash, w1hash, m = _batch_ngrams(batch, text_col)
        c12 = _lookup(bh, bc, bhash)
        c1 = _lookup(uh, uc, w1hash)
        terms = np.round(
            np.log((c12 + 1.0) / (c1 + float(vocab))) * 1e6
        ).astype(np.int64)
        scores = np.zeros(len(m), dtype=np.int64)
        nz = m > 0
        if nz.any():
            bnd = np.zeros(len(m), dtype=np.int64)
            np.cumsum(m, out=bnd)
            starts = bnd - m
            scores[nz] = np.add.reduceat(terms, starts[nz])
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_bigrams": pa.array(m.astype(np.int64)),
                "lm_score_micro": pa.array(scores),
            }
        )

    return docs_ds.map_batches(score, batch_format="pyarrow")
