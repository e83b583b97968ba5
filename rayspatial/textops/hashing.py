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


def word_shingle_hashes(texts: pa.Array, k: int = 3):
    """Distinct word-``k``-gram shingle hashes per document.

    Returns (flat uint64 hashes, int64 offsets[n+1]): doc ``i`` owns
    ``flat[offsets[i]:offsets[i+1]]`` (sorted, deduplicated).  Shingle
    = k consecutive whitespace-split words joined by a single space —
    the exact definition the DuckDB oracle reproduces.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    shingles: list[str] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    py = texts.to_pylist()
    for i, t in enumerate(py):
        words = t.split() if t else []
        m = max(len(words) - k + 1, 0)
        counts[i] = m
        for j in range(m):
            shingles.append(" ".join(words[j : j + k]))
    all_h = hash_strings(pa.array(shingles, type=pa.string()))
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    out_flat = np.empty_like(all_h)
    out_off = np.zeros(len(texts) + 1, dtype=np.int64)
    pos = 0
    for i in range(len(texts)):
        seg = np.unique(all_h[offsets[i] : offsets[i + 1]])
        out_flat[pos : pos + len(seg)] = seg
        pos += len(seg)
        out_off[i + 1] = pos
    return out_flat[:pos], out_off
