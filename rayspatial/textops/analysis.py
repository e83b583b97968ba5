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
        from rayspatial.textops.hashing import uniq_token_counts

        uniq = pa.array(uniq_token_counts(text), type=pa.int64())
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


def _byte_ngram_hashes(texts, n: int = 2):
    """(flat uint64 n-gram hashes, int64 offsets[n_docs+1]) of the
    whitespace-normalized (' ' + joined words + ' ') utf-8 BYTE n-grams
    per doc — one vectorized pass over the concatenated Arrow byte
    buffer (no per-doc Python loop).  Identical to char n-grams for
    ASCII; for multi-byte scripts byte n-grams remain a valid language
    signal (train and score use the same basis)."""
    from rayspatial.textops.hashing import (
        _ragged_arange,
        _string_bytes_offsets,
        hash_int64,
    )

    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), type=pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    norm = pc.binary_join_element_wise(
        " ",
        pc.replace_substring_regex(
            pc.utf8_trim_whitespace(pc.fill_null(texts, "")), r"\s+", " "
        ),
        " ",
        "",
    )
    data, offsets = _string_bytes_offsets(norm)
    lengths = np.diff(offsets)
    m = np.maximum(lengths - n + 1, 0)
    out_off = np.zeros(len(m) + 1, dtype=np.int64)
    np.cumsum(m, out=out_off[1:])
    if not m.sum():
        return np.empty(0, dtype=np.uint64), out_off
    doc_of = np.repeat(np.arange(len(m)), m)
    starts = offsets[:-1][doc_of] + _ragged_arange(m)
    acc = np.zeros(len(starts), dtype=np.uint64)
    for d in range(n):
        acc |= data[starts + d].astype(np.uint64) << np.uint64(8 * d)
    return hash_int64(acc), out_off


def train_lang_profiles(sample: pd.DataFrame, n: int = 2, top: int = 300):
    """Per-language char-n-gram log-frequency profiles from a labeled
    sample (driver-side; the sample is small by construction).  Returns
    {lang: {ngram_hash: log_prob}} encoded as parallel numpy arrays for
    vectorized scoring."""
    profiles = {}
    for lang, g in sample.groupby("lang"):
        gh, _ = _byte_ngram_hashes(list(g["text"]), n)
        uniq, cnt = np.unique(gh, return_counts=True)
        sel = np.lexsort((uniq, -cnt))[:top]
        h_sel, c_sel = uniq[sel], cnt[sel]
        total = c_sel.sum()
        order = np.argsort(h_sel)
        logp = np.log(c_sel.astype(np.float64) / total)
        profiles[lang] = (h_sel[order], logp[order])
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
        # flatten all docs' ngrams, hash once, score per language with
        # searchsorted lookups + segmented sums (fully vectorized)
        gh, off = _byte_ngram_hashes(batch.column("text"), self.n)
        counts = np.diff(off)
        n_docs = len(off) - 1
        scores = np.full((n_docs, len(self.langs)), -np.inf)
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


def repetition_stats(ds, id_col: str = "doc_id",
                     min_words: int = 20,
                     top_word_den: int = 8,
                     uniq_num: int = 5, uniq_den: int = 2):
    """Gopher-style repetition/quality scoring -> (doc_id, n_words,
    n_uniq_words, top_word_n, top_bigram_n, keep).

    All outputs are exact integers (SQL-reproducible); ``keep`` is the
    all-integer filter rule

        n_words >= min_words
        AND top_word_n * top_word_den <= n_words       (top-word share)
        AND n_uniq_words * uniq_num >= n_words * uniq_den  (unique ratio)

    Fully vectorized per batch: one Arrow dictionary-encode of the
    token stream, then np.unique / reduceat group kernels — no Python
    row loop (the repetition rules of Gopher Appx. A / C4 expressed as
    integer numerators so the DuckDB oracle hashes exactly)."""
    from rayspatial.textops.hashing import split_words

    def per_batch(batch: pa.Table) -> pa.Table:
        n = len(batch)
        flat, offsets = split_words(batch.column("text"))
        counts = np.diff(offsets)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.int64(len(enc.dictionary)) + 1

        n_uniq = np.zeros(n, dtype=np.int64)
        top_word = np.zeros(n, dtype=np.int64)
        if len(codes):
            key = doc_of * V + codes
            uk, uc = np.unique(key, return_counts=True)
            udoc = uk // V
            n_uniq = np.bincount(udoc, minlength=n).astype(np.int64)
            starts = np.flatnonzero(np.r_[True, np.diff(udoc) != 0])
            top_word[udoc[starts]] = np.maximum.reduceat(uc, starts)

        top_bigram = np.zeros(n, dtype=np.int64)
        if len(codes) > 1:
            same = doc_of[1:] == doc_of[:-1]
            if same.any():
                bg = codes[:-1][same] * V + codes[1:][same]
                # dense-rank bigrams so (doc, bigram) fits int64
                ubg, binv = np.unique(bg, return_inverse=True)
                B = np.int64(len(ubg)) + 1
                bkey = doc_of[:-1][same] * B + binv
                ubk, ubc = np.unique(bkey, return_counts=True)
                bdoc = ubk // B
                bstarts = np.flatnonzero(np.r_[True, np.diff(bdoc) != 0])
                top_bigram[bdoc[bstarts]] = np.maximum.reduceat(ubc, bstarts)

        n_words = counts.astype(np.int64)
        keep = (
            (n_words >= min_words)
            & (top_word * top_word_den <= n_words)
            & (n_uniq * uniq_num >= n_words * uniq_den)
        ).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "n_words": pa.array(n_words),
            "n_uniq_words": pa.array(n_uniq),
            "top_word_n": pa.array(top_word),
            "top_bigram_n": pa.array(top_bigram),
            "keep": pa.array(keep),
        })

    return ds.map_batches(per_batch, batch_format="pyarrow")


def top_terms(ds, k: int = 20, text_col: str = "text"):
    """Corpus-wide top-``k`` most frequent whitespace tokens — the
    heavy-hitters shape with a BOUNDED combine at every stage:

    1. per-batch partial term counts (``np.unique`` over the block's
       tokens; rows out = distinct terms in the block, NEVER the token
       stream — the combiner that makes the shuffle tractable at
       100 TB),
    2. one hash-partition of the partials by term (each term lands in
       exactly one partition -> per-partition sums are EXACT),
    3. per-partition top-k (<= k rows survive per partition),
    4. final head over k x P rows only.

    Ties broken (count desc, term asc) so the result is deterministic
    and SQL-comparable.  Tokenization is ``str.split()`` semantics
    (textops/hashing.split_words)."""
    from rayspatial.textops.hashing import split_words
    from rayspatial.util import hash_partitioned_agg

    def partial(batch: pa.Table) -> pa.Table:
        flat, _off = split_words(batch.column(text_col))
        terms, counts = np.unique(
            flat.to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({
            "term": pa.array(terms.astype(str)),
            "cnt": pa.array(counts.astype(np.int64)),
        })

    part = ds.map_batches(partial, batch_format="pyarrow")

    def per_partition_topk(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("term", sort=False)["cnt"].sum().reset_index()
        out = out.sort_values(["cnt", "term"], ascending=[False, True],
                              kind="stable")
        return out.head(k)

    survivors = hash_partitioned_agg(part, ["term"], per_partition_topk)

    def final_head(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # terms are disjoint across partitions -> no re-reduction
        df = df.sort_values(["cnt", "term"], ascending=[False, True],
                            kind="stable")
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    return survivors.repartition(1).map_batches(
        final_head, batch_size=None, batch_format="pyarrow"
    )


def build_vocab(ds, min_count: int = 2, text_col: str = "text"):
    """Tokenizer-vocabulary build: corpus term counts -> drop terms
    below ``min_count`` -> contiguous token ids by rank
    (count desc, term asc).

    Same bounded-combine shape as ``top_terms`` (per-batch distinct
    partials, one hash shuffle for exact totals, min-count filter per
    partition); the final rank runs over the SURVIVING vocabulary only
    — result-bounded (a tokenizer vocab is ~1e5-1e7 rows regardless of
    corpus size), so the single-task id assignment is the standard
    materialize-the-vocab step, not an unbounded gather."""
    from rayspatial.textops.hashing import split_words
    from rayspatial.util import hash_partitioned_agg

    def partial(batch: pa.Table) -> pa.Table:
        flat, _off = split_words(batch.column(text_col))
        terms, counts = np.unique(
            flat.to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({
            "term": pa.array(terms.astype(str)),
            "cnt": pa.array(counts.astype(np.int64)),
        })

    part = ds.map_batches(partial, batch_format="pyarrow")

    def exact_filter(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("term", sort=False)["cnt"].sum().reset_index()
        return out[out["cnt"] >= min_count]

    vocab = hash_partitioned_agg(part, ["term"], exact_filter)

    def assign_ids(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["cnt", "term"], ascending=[False, True], kind="stable"
        )
        df["token_id"] = np.arange(len(df), dtype=np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    return vocab.repartition(1).map_batches(
        assign_ids, batch_size=None, batch_format="pyarrow"
    )


def heavy_hitters_topk(ds, k: int = 25, m: int = 512, text_col: str = "text"):
    """EXACT corpus top-``k`` terms via sketch-then-verify: per-block
    Misra-Gries summaries (``m`` counters) -> merged summary -> a
    provably sufficient candidate set -> exact re-count of CANDIDATE
    terms only.

    Why it matters at 100 TB: ``top_terms`` shuffles every distinct
    term of every block; this path shuffles at most ``m`` rows per
    block regardless of vocabulary, then one candidate-filtered count
    pass.  The summary merge itself is a hash shuffle (m x blocks rows
    never hit the driver); the only gathers are per-partition top-k
    shortlists and the within-slack candidate set, both bounded.
    Exactness argument (MG guarantee: summary count >=
    true - N/m per stream of N tokens, summed over blocks):

    - every true top-k term t has merged(t) >= f(t) - N/m,
    - at least k terms have merged >= f_k - N/m, so the k-th largest
      merged value >= f_k - N/m and also <= f_k,
    - therefore threshold = (k-th largest merged) - N/m <= f_k - N/m
      <= merged(t): every true top-k term is a candidate.

    The exact re-count then orders candidates correctly; ties
    (count desc, term asc) deterministic.  Same output schema/oracle
    as ``top_terms``.
    """
    import ray

    from rayspatial.textops.hashing import split_words

    # ---- pass 1: per-block MG summaries + token counts ---------------------
    def mg_partial(batch: pa.Table) -> pa.Table:
        flat, _off = split_words(batch.column(text_col))
        words = flat.to_numpy(zero_copy_only=False)
        terms, counts = np.unique(words, return_counts=True)
        n_tok = int(counts.sum())
        if len(terms) > m:
            # batch-level MG: subtract the (m+1)-th largest count,
            # keep strictly positive survivors (<= m of them)
            cut = np.partition(counts, -(m + 1))[-(m + 1)]
            keep = counts > cut
            terms, counts = terms[keep], counts[keep] - cut
        # flag row carries the block's token count (a typed flag, not a
        # sentinel string — numpy fixed-width unicode truncates at NUL)
        return pa.table({
            "term": pa.array(list(terms.astype(str)) + [""]),
            "mg": pa.array(np.r_[counts.astype(np.int64),
                                 [np.int64(n_tok)]]),
            "is_tok_total": pa.array(np.r_[np.zeros(len(terms), np.int8),
                                           [np.int8(1)]]),
        })

    from rayspatial.util import hash_partitioned_agg

    summ = ds.map_batches(mg_partial, batch_format="pyarrow")

    # ---- merge summaries via ONE hash shuffle (never the driver: the
    # summary table is m x blocks rows, unbounded at corpus scale) ----
    def merge_totals(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["is_tok_total", "term"], sort=False)["mg"]
                .sum().reset_index())

    merged = hash_partitioned_agg(
        summ, ["is_tok_total", "term"], merge_totals).materialize()

    # ---- bounded gather #1: per-partition top-k + the token total ----
    def shortlist(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        flags = df[df["is_tok_total"] == 1]
        top = df[df["is_tok_total"] == 0].nlargest(k, "mg", keep="all")
        return pa.Table.from_pandas(
            pd.concat([flags, top.head(k)], ignore_index=True),
            preserve_index=False)

    short = merged.map_batches(
        shortlist, batch_size=None, batch_format="pyarrow").take_all()
    sdf = pd.DataFrame(short)
    n_total = int(sdf.loc[sdf["is_tok_total"] == 1, "mg"].sum())
    tops = np.sort(sdf.loc[sdf["is_tok_total"] == 0, "mg"].to_numpy())[::-1]
    if not len(tops):
        raise ValueError("heavy_hitters_topk: empty vocabulary")
    # global top-k is contained in the union of per-partition top-k,
    # so the k-th largest gathered value IS the global k-th largest
    kth = tops[min(k, len(tops)) - 1]
    slack = n_total // m
    if kth <= slack:
        # Flat-distribution regime: a true top-k term with f(t) <= N/m
        # can be absent from EVERY block summary (merged(t) = 0), so no
        # threshold over `merged` can guarantee it enters the candidate
        # set — the sketch is uninformative here.  Fall back to the
        # exact full-vocabulary path (correct for any distribution;
        # costs one distinct-term shuffle instead of the m-row one).
        return top_terms(ds, k=k, text_col=text_col)
    thresh_ref = ray.put(np.int64(kth - slack))

    # ---- bounded gather #2: candidates = merged >= threshold ----------
    def cand_filter(batch: pa.Table) -> pa.Table:
        import ray as _ray

        thresh = int(_ray.get(thresh_ref))
        df = batch.to_pandas()
        out = df[(df["is_tok_total"] == 0) & (df["mg"] >= thresh)]
        return pa.Table.from_pandas(out[["term"]], preserve_index=False)

    cand_rows = merged.map_batches(
        cand_filter, batch_size=None, batch_format="pyarrow").take_all()
    cand = [r["term"] for r in cand_rows]
    cand_ref = ray.put(np.sort(np.asarray(cand, dtype=str)))

    # ---- pass 2: exact re-count of candidates only -------------------------
    from rayspatial.util import hash_partitioned_agg

    def exact_partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        cands = _ray.get(cand_ref)
        flat, _off = split_words(batch.column(text_col))
        words = flat.to_numpy(zero_copy_only=False)
        terms, counts = np.unique(words, return_counts=True)
        pos = np.searchsorted(cands, terms)
        pos[pos == len(cands)] = 0
        hit = cands[pos] == terms
        return pa.table({
            "term": pa.array(terms[hit].astype(str)),
            "cnt": pa.array(counts[hit].astype(np.int64)),
        })

    part = ds.map_batches(exact_partial, batch_format="pyarrow")

    def totals(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("term", sort=False)["cnt"].sum().reset_index()

    exact = hash_partitioned_agg(part, ["term"], totals)

    def head(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["cnt", "term"], ascending=[False, True], kind="stable")
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    return exact.repartition(1).map_batches(
        head, batch_size=None, batch_format="pyarrow")
