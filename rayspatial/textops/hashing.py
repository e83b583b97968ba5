"""Deterministic vectorized hashing primitives shared by the dedup /
fingerprint operators.

All hashes are pure functions of the input bytes (no per-session salt),
so results are stable across runs, workers and retries — required for
idempotent shuffles and resumable checkpoints.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# 64-bit FNV-1a over utf-8 bytes, vectorized over a string column via
# the Arrow buffer layout (one pass over the concatenated byte buffer,
# segment-combined with multiply-fold per position).
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)

# polynomial rolling-hash base (odd => invertible mod 2^64)
_POLY_BASE = np.uint64(0x9E3779B97F4A7C15)


def _string_bytes_offsets(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(concatenated utf-8 bytes as uint8[], int64 offsets[n+1]) for a
    pyarrow string array — zero-copy views of the Arrow buffers."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.large_string()) if pa.types.is_string(arr.type) else arr
    buf_off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data[buf_off[0] : buf_off[-1]], (buf_off - buf_off[0]).astype(np.int64)


def hash_strings(values) -> np.ndarray:
    """Deterministic 64-bit hash per string (FNV-1a), vectorized.

    Accepts a pyarrow string array/chunked array, numpy object array or
    list of str.  ~50M bytes/s python-free inner loop via byte-column
    strides: we process position j of every string simultaneously
    (hash = (hash ^ byte_j) * prime), masking finished strings — cost
    O(max_len) numpy passes instead of a per-row Python loop.
    """
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(list(values), type=pa.string())
    data, offsets = _string_bytes_offsets(values)
    n = len(offsets) - 1
    lengths = np.diff(offsets)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n == 0 or lengths.max(initial=0) == 0:
        return h
    max_len = int(lengths.max())
    starts = offsets[:-1]
    for j in range(max_len):
        alive = lengths > j
        idx = starts[alive] + j
        b = data[idx].astype(np.uint64)
        h[alive] = (h[alive] ^ b) * _FNV_PRIME
    return h


def hash_int64(v: np.ndarray, seed: int = 0) -> np.ndarray:
    """splitmix64 finalizer — deterministic 64-bit mix of int64/uint64."""
    x = np.asarray(v).astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15) * np.uint64(seed + 1)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def rolling_fingerprint(values) -> np.ndarray:
    """Polynomial rolling hash (mod 2^64) of each string's utf-8 bytes:
    fp = sum(byte_i * BASE^(L-1-i)).  Fully vectorized: one power-table
    lookup + one segmented sum over the concatenated byte buffer."""
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(list(values), type=pa.string())
    data, offsets = _string_bytes_offsets(values)
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.uint64)
    if len(data) == 0:
        return out.view(np.int64)
    lengths = np.diff(offsets)
    max_len = int(lengths.max())
    powers = np.empty(max_len, dtype=np.uint64)
    powers[0] = np.uint64(1)
    with np.errstate(over="ignore"):  # wrap mod 2^64 is the point
        for i in range(1, max_len):
            powers[i] = powers[i - 1] * _POLY_BASE
    # exponent of byte at absolute position p in doc d: end_d - 1 - p
    doc_of = np.repeat(np.arange(n), lengths)
    exp = (offsets[1:][doc_of] - 1 - np.arange(len(data))).astype(np.int64)
    terms = data.astype(np.uint64) * powers[exp]
    nonempty = lengths > 0
    sums = np.add.reduceat(terms, offsets[:-1][nonempty])
    out[nonempty] = sums
    return out.view(np.int64)


def split_words(texts):
    """Whitespace tokenization with a Python-free inner loop:
    trim + ``pc.split_pattern_regex`` and read the Arrow list buffers
    directly.  Returns (flat word StringArray, int64 offsets[n+1]) —
    doc ``i`` owns ``flat[offsets[i]:offsets[i+1]]``.  Matches
    ``str.split()`` semantics (runs of whitespace, no empty tokens;
    null/empty docs own zero tokens)."""
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(texts)
    # RE2's \s is [\t\n\f\r ] only; str.split() breaks on the full
    # Python isspace() set.  Add \v, \p{Zs} (NBSP, ideographic space,
    # ...), the Zl/Zp separators U+2028/29 and the isspace controls
    # 1C-1F / 85.  (Empties from any trim/split mismatch drop below.)
    toks = pc.split_pattern_regex(
        trimmed, r"[\s\x{0b}\x{1c}-\x{1f}\x{85}\x{2028}\x{2029}\p{Zs}]+"
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    counts = (
        pc.fill_null(pc.list_value_length(toks), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    # empty-trimmed docs split to [''] — drop those tokens
    emptytok = pc.equal(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    if emptytok.any():
        doc_of = np.repeat(np.arange(len(counts)), counts)
        counts = counts - np.bincount(
            doc_of[emptytok], minlength=len(counts)
        ).astype(np.int64)
        flat = flat.filter(pa.array(~emptytok))
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return flat, offsets


def _ragged_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated (vectorized)."""
    total = int(counts.sum())
    if not total:
        return np.empty(0, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def word_shingle_hashes(texts: pa.Array, k: int = 3):
    """Distinct word-``k``-gram shingle hashes per document.

    Returns (flat uint64 hashes, int64 offsets[n+1]): doc ``i`` owns
    ``flat[offsets[i]:offsets[i+1]]`` (sorted, deduplicated).  Shingle
    = k consecutive whitespace-split words joined by a single space —
    the exact definition the DuckDB oracle reproduces.  Fully
    vectorized: Arrow-buffer tokenization (split_words), one
    ``binary_join_element_wise`` over the k shifted word columns, one
    lexsort dedupe."""
    import pyarrow.compute as pc

    flat, offsets = split_words(texts)
    n = len(offsets) - 1
    counts = np.diff(offsets)
    m = np.maximum(counts - k + 1, 0)  # shingles per doc
    out_off = np.zeros(n + 1, dtype=np.int64)
    if m.sum() == 0:
        return np.empty(0, dtype=np.uint64), out_off
    doc_of = np.repeat(np.arange(n), m)
    starts = offsets[:-1][doc_of] + _ragged_arange(m)
    cols = [flat.take(pa.array(starts + d)) for d in range(k)]
    shingle = pc.binary_join_element_wise(*cols, " ")
    all_h = hash_strings(shingle)
    # per-doc sorted unique
    order = np.lexsort((all_h, doc_of))
    d_s, h_s = doc_of[order], all_h[order]
    first = np.r_[True, (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])]
    out_flat = h_s[first]
    np.cumsum(np.bincount(d_s[first], minlength=n), out=out_off[1:])
    return out_flat, out_off


def uniq_token_counts(texts) -> np.ndarray:
    """Distinct whitespace-token count per document (vectorized:
    tokenize via Arrow buffers, hash, lexsort-dedupe)."""
    flat, offsets = split_words(texts)
    n = len(offsets) - 1
    counts = np.diff(offsets)
    if not counts.sum():
        return np.zeros(n, dtype=np.int64)
    th = hash_strings(flat)
    doc_of = np.repeat(np.arange(n), counts)
    order = np.lexsort((th, doc_of))
    d_s, h_s = doc_of[order], th[order]
    first = np.r_[True, (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])]
    return np.bincount(d_s[first], minlength=n).astype(np.int64)
