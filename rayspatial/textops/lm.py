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

__all__ = ["bigram_lm_scores", "pmi_collocations"]


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


def _corpus_counts(docs_ds, text_col: str, min_model_count: int = 1,
                   min_unigram_count: int = 1):
    """-> (sorted uni hashes, uni counts, sorted bi hashes, bi counts,
    V) — exact corpus totals, one hash shuffle, driver gather bounded
    by the PRUNED model size.

    ``min_model_count`` > 1 is the open-web scale knob for bigrams:
    bigrams below the threshold are pruned from the broadcast model
    (per-partition, after exact totals — deterministic) and score
    through the +1 smoothing path instead, bounding the model by the
    HEAD of the bigram distribution rather than its unbounded tail.

    ``min_unigram_count`` > 1 bounds the UNIGRAM dimension the same way
    (round-3 verdict: on 100-TB web text the raw-token unigram table is
    billions of rows — a driver OOM without this).  The vocabulary size
    V stays EXACT regardless: each partition emits one sideband row
    carrying its distinct-unigram count (every unigram lives in exactly
    one hash partition, so the sum is the global V).  Score contract
    for a pruned unigram: c1 reads as 0 — its transitions get the pure
    +V smoothing floor, the CCNet-style "unknown" bucket.  Choose
    ``min_unigram_count <= min_model_count`` so every broadcast bigram
    keeps its exact c1 (a bigram seen >= t times implies its first word
    was too).  Thresholds of 1 reproduce the unpruned model bit-exact.
    """
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
        out = df.groupby(["kind", "h"], sort=False)["cnt"].sum().reset_index()
        # sideband: exact distinct-unigram count of this partition
        # (kind=2) so V survives the pruning below
        n_uni = int((out["kind"] == 0).sum())
        if min_model_count > 1:
            out = out[(out["kind"] != 1) | (out["cnt"] >= min_model_count)]
        if min_unigram_count > 1:
            out = out[(out["kind"] != 0) | (out["cnt"] >= min_unigram_count)]
        return pd.concat(
            [out, pd.DataFrame({"kind": [2], "h": [0], "cnt": [n_uni]})],
            ignore_index=True)

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
        int(cnt[kind == 2].sum()),
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


def bigram_lm_scores(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                     min_model_count: int = 1,
                     min_unigram_count: int = 1):
    """-> Dataset (doc_id, n_bigrams, lm_score_micro): add-one-smoothed
    bigram log-likelihood in integer micro-nats (0 for docs with fewer
    than two tokens).  ``min_model_count`` / ``min_unigram_count``: see
    ``_corpus_counts`` — the broadcast-model size knobs for open-web
    corpora (bigram tail / unigram tail; V stays exact)."""
    import ray

    uh, uc, bh, bc, vocab = _corpus_counts(docs_ds, text_col,
                                           min_model_count,
                                           min_unigram_count)
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


def pmi_collocations(docs_ds, k: int = 25, min_count: int = 5,
                     text_col: str = "text"):
    """Top-``k`` bigram collocations by pointwise mutual information:
    ``PMI = ln( (c12 / N12) / ((c1 / N1) * (c2 / N1)) )`` over
    whitespace bigrams with ``c12 >= min_count``.

    The phrase-mining step (new-terminology detection, tokenizer merge
    candidates).  Stages, all bounded:

    1. per-batch partial unigram + bigram STRING counts (rows out =
       distinct n-grams in the block),
    2. TWO shuffles total: pass 1 keys everything by w1 — exact
       totals and the c1 attach share that one exchange (all (w1, *)
       partials co-partition); pass 2 re-keys by w2, attaches c2, and
       scores + top-ks in place (the tfidf df-attach pattern, never a
       driver-side lookup),
    3. integer micro-nat PMI + min-count filter, per-partition top-k,
       final head over k x P rows.

    Ties (pmi desc, w1 asc, w2 asc) are deterministic and
    SQL-comparable.
    """
    import pyarrow.compute as pc

    from rayspatial.util import hash_partitioned_agg

    # ---- totals -----------------------------------------------------------
    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        flat, off = split_words(batch.column(text_col))
        counts = np.diff(off)
        m = np.maximum(counts - 1, 0)
        words = flat.to_numpy(zero_copy_only=False)
        ku, cu = np.unique(words, return_counts=True)
        rows = {"w1": ku.astype(str), "w2": np.full(len(ku), "", dtype=object),
                "cnt": cu.astype(np.int64), "kind": np.zeros(len(ku), np.int8)}
        if m.sum():
            doc_of = np.repeat(np.arange(len(m)), m)
            starts = off[:-1][doc_of] + _ragged_arange(m)
            w1a = flat.take(pa.array(starts))
            w2a = flat.take(pa.array(starts + 1))
            big = _pc.binary_join_element_wise(
                w1a, w2a, "\x1f").to_numpy(zero_copy_only=False)
            kb, cb = np.unique(big, return_counts=True)
            sp = np.char.partition(kb.astype(str), "\x1f")  # distinct only
            rows = {
                "w1": np.r_[rows["w1"], sp[:, 0]],
                "w2": np.r_[rows["w2"], sp[:, 2]],
                "cnt": np.r_[rows["cnt"], cb.astype(np.int64)],
                "kind": np.r_[rows["kind"], np.ones(len(kb), np.int8)],
            }
        return pa.table({k2: pa.array(v) for k2, v in rows.items()})

    partials = docs_ds.map_batches(partial, batch_format="pyarrow")

    # ---- corpus scalars (tiny gather: 1 row per block) ---------------------
    def scalar_partial(batch: pa.Table) -> pa.Table:
        _, off = split_words(batch.column(text_col))
        counts = np.diff(off)
        return pa.table({
            "n1": pa.array([int(counts.sum())]),
            "n12": pa.array([int(np.maximum(counts - 1, 0).sum())]),
        })

    sc = docs_ds.map_batches(scalar_partial, batch_format="pyarrow").take_all()
    N1 = sum(r["n1"] for r in sc)
    N12 = sum(r["n12"] for r in sc)

    # ---- PMI + per-partition top-k (runs inside pass 2) ---------------------
    def score_topk(df: pd.DataFrame) -> pd.DataFrame:
        bi = df[df["cnt"] >= min_count].copy()
        if not len(bi):
            return pd.DataFrame({
                "w1": pd.Series(dtype=str), "w2": pd.Series(dtype=str),
                "c12": pd.Series(dtype=np.int64),
                "pmi_micro": pd.Series(dtype=np.int64)})
        # exact integer products first, ONE int64->float64 conversion —
        # the same rounding path as SQL's BIGINT arithmetic + float
        # division (guard: fits int64 up to N1 ~ 3e6 tokens x c12 1e3;
        # quantize counts upstream beyond that)
        num = (bi["cnt"].to_numpy(np.int64) * np.int64(N1) * np.int64(N1)
               ).astype(np.float64)
        den = (np.int64(N12) * bi["c1"].to_numpy(np.int64)
               * bi["c2"].to_numpy(np.int64)).astype(np.float64)
        bi["pmi_micro"] = np.round(np.log(num / den) * 1e6).astype(np.int64)
        bi = bi.rename(columns={"cnt": "c12"})
        bi = bi.sort_values(["pmi_micro", "w1", "w2"],
                            ascending=[False, True, True], kind="stable")
        return bi.head(k)[["w1", "w2", "c12", "pmi_micro"]]

    # ---- pass 1: ONE shuffle by w1 does totals + c1 attach ------------------
    # all partial rows of (w1, *) — bigram partials AND the w1 unigram
    # partials — co-partition by w1, so exact totals and the c1 attach
    # happen in the same exchange (no separate totals shuffle)
    def total_attach_c1(df: pd.DataFrame) -> pd.DataFrame:
        tot = (df.groupby(["kind", "w1", "w2"], sort=False)["cnt"]
               .sum().reset_index())
        uni = tot[tot["kind"] == 0]
        lut = dict(zip(uni["w1"], uni["cnt"]))
        bi = tot[tot["kind"] == 1].copy()
        bi["c1"] = bi["w1"].map(lut).astype(np.int64)
        return pd.concat([uni, bi], ignore_index=True)

    p1 = hash_partitioned_agg(partials, ["w1"], total_attach_c1)

    # ---- pass 2: re-key unigram rows onto the w2 axis, attach c2 -----------
    def rekey(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        is_uni = df["kind"] == 0
        df.loc[is_uni, "w2"] = df.loc[is_uni, "w1"]
        return pa.Table.from_pandas(df, preserve_index=False)

    def attach_c2(df: pd.DataFrame) -> pd.DataFrame:
        uni = df[df["kind"] == 0]
        lut = dict(zip(uni["w2"], uni["cnt"]))
        bi = df[df["kind"] == 1].copy()
        bi["c2"] = bi["w2"].map(lut).astype(np.int64)
        return score_topk(bi)

    p2 = hash_partitioned_agg(
        p1.map_batches(rekey, batch_format="pyarrow"),
        ["w2"], attach_c2)

    def final_head(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["pmi_micro", "w1", "w2"], ascending=[False, True, True],
            kind="stable")
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    return p2.repartition(1).map_batches(
        final_head, batch_size=None, batch_format="pyarrow")
