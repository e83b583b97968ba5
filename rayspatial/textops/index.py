"""Distributed inverted-index construction: term -> sorted posting
list of the documents containing it (plus df).  The IR-scale building
block behind corpus search, candidate generation, and boilerplate
mining over web text.

Shape: ONE shuffle.  map_batches emits distinct (term, doc) pairs per
batch (documents are whole rows, so per-batch dedup is global dedup);
a hash partition by term co-locates each term's postings; inside the
partition the posting strings are assembled with Arrow list offsets +
``binary_join`` — no per-row or per-term Python string building.

Postings are emitted as a comma-joined string keyed by ascending
doc id (the canonical delta-encodable layout); at 100 TB the same
layout writes straight to partitioned Parquet as the index shards.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from rayspatial.textops.hashing import split_words

__all__ = ["inverted_index"]


def inverted_index(docs_ds, id_col: str = "doc_id",
                   text_col: str = "text", min_df: int = 1,
                   num_partitions: int | None = None):
    """docs (id, text) -> (term, df, postings) with postings the
    ','-joined ascending doc ids containing term; terms with
    df < ``min_df`` dropped."""
    from rayspatial.util import hash_partitioned_agg

    def term_docs(batch: pa.Table) -> pa.Table:
        words, off = split_words(batch.column(text_col))
        ids = np.repeat(
            batch.column(id_col).to_numpy().astype(np.int64),
            np.diff(off))
        t = pa.table({"term": words, id_col: pa.array(ids)})
        df = t.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = docs_ds.map_batches(term_docs, batch_format="pyarrow")

    def build_postings(pdf: pd.DataFrame) -> pa.Table:
        pdf = pdf.sort_values(["term", id_col], kind="stable")
        terms = pdf["term"].to_numpy()
        ids = pdf[id_col].to_numpy()
        bounds = np.flatnonzero(
            np.r_[True, terms[1:] != terms[:-1], True])
        dfc = np.diff(bounds).astype(np.int64)
        ids_str = pc.cast(pa.array(ids), pa.large_string())
        lists = pa.LargeListArray.from_arrays(
            pa.array(bounds, type=pa.int64()), ids_str)
        postings = pc.binary_join(
            lists, pa.scalar(",", type=pa.large_string()))
        out = pa.table({
            "term": pa.array(terms[bounds[:-1]]),
            "df": pa.array(dfc),
            "postings": postings.cast(pa.string()),
        })
        if min_df > 1:
            out = out.filter(pc.greater_equal(out.column("df"),
                                              pa.scalar(min_df)))
        return out

    return hash_partitioned_agg(pairs, ["term"], build_postings,
                                num_partitions=num_partitions)
