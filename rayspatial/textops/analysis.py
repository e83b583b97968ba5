"""Text analysis operators: token counts, quality metrics, language-ID
(char-n-gram profile scorer), document fingerprints.

Everything integer-valued where the DuckDB oracle compares exactly;
stateful scoring (the lang-ID profile) is built once and broadcast
(``ray.put``), scored per batch vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from rayspatial.textops.hashing import hash_strings, rolling_fingerprint


def token_counts(ds, id_col: str = "doc_id"):
    """-> (doc_id, n_tokens): whitespace-token count per document —
    pure Arrow kernels (split_pattern_regex + list_value_length)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch.column("text")), r"\s+"
        )
        n = pc.list_value_length(toks)
        # empty text -> split gives [''] -> count 0
        empty = pc.equal(pc.utf8_length(pc.utf8_trim_whitespace(batch.column("text"))), 0)
        n = pc.if_else(empty, pa.scalar(0, type=pa.int32()), n)
        return pa.table({id_col: batch.column(id_col), "n_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(per_batch, batch_format="pyarrow")


def text_stats(ds, id_col: str = "doc_id"):
    """-> (doc_id, n_chars, n_tokens, n_uniq_tokens, n_spaces):
    integer quality features per document (all SQL-reproducible)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        trimmed = pc.utf8_trim_whitespace(text)
        toks = pc.split_pattern_regex(trimmed, r"\s+")
        n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
        empty = pc.equal(pc.utf8_length(trimmed), 0)
        n_tokens = pc.if_else(empty, pa.scalar(0, type=pa.int64()), n_tokens)
        uniq = pa.array(
            [len(set(x)) if x else 0 for x in toks.to_pylist()], type=pa.int64()
        )
        n_spaces = pc.cast(
            pc.count_substring(text, " "), pa.int64()
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "n_uniq_tokens": uniq,
                "n_spaces": n_spaces,
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")


def fingerprints(ds, id_col: str = "doc_id"):
    """-> (doc_id, fp): deterministic 64-bit polynomial rolling hash of
    the utf-8 text bytes (document fingerprinting primitive)."""

    def per_batch(batch: pa.Table) -> pa.Table:
        fp = rolling_fingerprint(batch.column("text"))
        return pa.table({id_col: batch.column(id_col), "fp": pa.array(fp)})

    return ds.map_batches(per_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# language identification (char-n-gram profile heuristic)
# ---------------------------------------------------------------------------


def _char_ngrams(text: str, n: int = 2) -> list[str]:
    t = " " + " ".join(text.split()) + " "
    return [t[i : i + n] for i in range(max(len(t) - n + 1, 0))]


def train_lang_profiles(sample: pd.DataFrame, n: int = 2, top: int = 300):
    """Per-language char-n-gram log-frequency profiles from a labeled
    sample (driver-side; the sample is small by construction).  Returns
    {lang: {ngram_hash: log_prob}} encoded as parallel numpy arrays for
    vectorized scoring."""
    profiles = {}
    for lang, g in sample.groupby("lang"):
        counts: dict[str, int] = {}
        for t in g["text"]:
            for ng in _char_ngrams(t, n):
                counts[ng] = counts.get(ng, 0) + 1
        items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
        total = sum(v for _, v in items)
        grams = pa.array([k for k, _ in items], type=pa.string())
        h = hash_strings(grams)
        order = np.argsort(h)
        logp = np.log(np.array([v for _, v in items], dtype=np.float64) / total)
        profiles[lang] = (h[order], logp[order])
    return profiles


class LangScorer:
    """map_batches stage: score each doc against broadcast profiles,
    emit argmax language.  Profiles resolved from an ObjectRef once per
    worker (task mode) or per actor."""

    def __init__(self, profiles_ref, n: int = 2, floor: float = -12.0,
                 id_col: str = "doc_id"):
        import ray

        self.profiles = (
            profiles_ref if isinstance(profiles_ref, dict) else ray.get(profiles_ref)
        )
        self.langs = sorted(self.profiles)
        self.n = n
        self.floor = floor
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        # flatten all docs' ngrams, hash once, score per language with
        # searchsorted lookups + segmented sums
        grams: list[str] = []
        counts = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            ng = _char_ngrams(t or "", self.n)
            counts[i] = len(ng)
            grams.extend(ng)
        gh = hash_strings(pa.array(grams, type=pa.string()))
        off = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(counts, out=off[1:])
        scores = np.full((len(texts), len(self.langs)), -np.inf)
        for li, lang in enumerate(self.langs):
            hs, logp = self.profiles[lang]
            idx = np.searchsorted(hs, gh)
            idx_c = np.clip(idx, 0, len(hs) - 1)
            val = np.where(hs[idx_c] == gh, logp[idx_c], self.floor)
            nonempty = np.flatnonzero(counts > 0)
            if len(nonempty):
                sums = np.add.reduceat(val, off[:-1][nonempty])
                scores[nonempty, li] = sums / counts[nonempty]
        best = np.argmax(scores, axis=1)
        pred = pa.array([self.langs[i] for i in best], type=pa.string())
        return pa.table({self.id_col: batch.column(self.id_col), "pred_lang": pred})


def lang_id(ds, sample_df: pd.DataFrame, n: int = 2, id_col: str = "doc_id"):
    """-> (doc_id, pred_lang).  ``sample_df``: labeled (text, lang)
    training sample (deterministic slice of the corpus)."""
    import ray

    ref = ray.put(train_lang_profiles(sample_df, n=n))

    _cache: dict = {}

    def score(batch: pa.Table) -> pa.Table:
        key = ref.hex()
        sc = _cache.get(key)
        if sc is None:
            _cache.clear()
            sc = LangScorer(ref, n=n, id_col=id_col)
            _cache[key] = sc
        return sc(batch)

    return ds.map_batches(score, batch_format="pyarrow")
