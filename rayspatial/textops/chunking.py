"""Document chunking: split documents into overlapping token windows
— the shard/RAG preprocessing step that turns long documents into
fixed-size training or retrieval units.

Chunk ``i`` of a document covers tokens ``[i*stride, i*stride +
window)``; the last chunk may be short; documents shorter than one
window yield exactly one chunk (empty docs yield none).  Pure
map_batches — no shuffle, no state; chunk text is reassembled
zero-copy-ish by building ONE Arrow list array over the flat token
buffer and applying ``pc.binary_join`` (no Python per-chunk loop).

No reference equivalent (pygeos is geometry-only); driver-brief
training-data family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayspatial.textops.hashing import _ragged_arange, split_words

__all__ = ["chunk_documents"]


def chunk_documents(ds, window: int = 64, stride: int = 48,
                    id_col: str = "doc_id", text_col: str = "text"):
    """-> Dataset (doc_id, chunk_id, n_tokens, chunk): overlapping
    token windows per document (``stride <= window`` gives overlap
    ``window - stride``)."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")

    import pyarrow.compute as pc

    def chunk(batch: pa.Table) -> pa.Table:
        flat, off = split_words(batch.column(text_col))
        counts = np.diff(off)
        # chunks per doc: ceil((n - window) / stride) + 1 for n > 0
        m = np.where(counts > 0,
                     np.maximum(-(-(counts - window) // stride), 0) + 1,
                     0).astype(np.int64)
        total = int(m.sum())
        ids = batch.column(id_col).to_numpy()
        if not total:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "chunk_id": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "chunk": pa.array([], type=pa.string()),
            })
        doc_of = np.repeat(np.arange(len(m)), m)
        chunk_id = _ragged_arange(m)
        starts = off[:-1][doc_of] + chunk_id * stride
        ends = np.minimum(starts + window, off[1:][doc_of])
        n_tok = ends - starts
        # ONE list array over the flat token buffer: offsets are the
        # interleaved (start, end) pairs — each chunk's tokens are a
        # contiguous flat slice, so a take + ListArray rebuild suffices
        tok_idx = np.repeat(starts, n_tok) + _ragged_arange(n_tok)
        toks = flat.take(pa.array(tok_idx))
        loff = np.zeros(total + 1, dtype=np.int32)
        np.cumsum(n_tok, out=loff[1:])
        lists = pa.ListArray.from_arrays(pa.array(loff), toks)
        text = pc.binary_join(lists, " ")
        return pa.table({
            id_col: pa.array(np.repeat(ids, m)),
            "chunk_id": pa.array(chunk_id),
            "n_tokens": pa.array(n_tok),
            "chunk": text,
        })

    return ds.map_batches(chunk, batch_format="pyarrow")
