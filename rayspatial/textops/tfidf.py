"""Distributed TF-IDF: per-document top-k terms by
``tf * ln(N_docs / df)``.

The retrieval/quality-filter primitive for web-corpus curation
(keyword extraction, topic tagging, boilerplate detection by low-idf
mass).  Three bounded stages, two shuffles, integer-exact output:

1. map_batches: vectorized whitespace tokenization (Arrow
   ``split_pattern_regex`` via textops/hashing.split_words) and
   per-batch (doc, term, tf) counting — documents never split across
   batches, so tf is complete per batch and only distinct
   (doc, term) rows leave the stage.
2. one hash-partition shuffle by TERM: each partition holds every
   occurrence of its terms, so document frequency is a per-partition
   ``transform('size')`` and is attached in place — df computation and
   the df join are ONE exchange, not a groupby followed by a join.
3. one hash-partition shuffle by DOC: per-document top-k selection by
   (score desc, term asc).

Exactness: score_micro = tf * round(ln(N/df) * 1e6) — the log is
quantized to integer micro-nats per DISTINCT df before multiplying,
so scores, ordering, and the emitted values are integers that a SQL
oracle reproduces bit-for-bit (a raw float score would be at the
mercy of libm last-ulp differences).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rayspatial.textops.hashing import split_words

__all__ = ["tfidf_topk"]


def tfidf_topk(docs_ds, n_docs: int, k: int = 3, id_col: str = "doc_id",
               text_col: str = "text", num_partitions: int | None = None):
    """docs (id, text) -> top-``k`` terms per doc:
    (id, term, tf, df, score_micro).  ``n_docs`` is the corpus size
    (pass ``docs_ds.count()`` or the known table cardinality)."""
    from rayspatial.util import hash_partitioned_agg

    def doc_tf(batch: pa.Table) -> pa.Table:
        words, off = split_words(batch.column(text_col))
        ids = np.repeat(
            batch.column(id_col).to_numpy().astype(np.int64),
            np.diff(off))
        df = pd.DataFrame({
            id_col: ids,
            "term": words.to_pandas().to_numpy(),
        })
        tf = (df.groupby([id_col, "term"], sort=False)
              .size().reset_index(name="tf"))
        tf["tf"] = tf["tf"].astype(np.int64)
        return pa.Table.from_pandas(tf, preserve_index=False)

    tf_ds = docs_ds.map_batches(doc_tf, batch_format="pyarrow")

    def attach_df(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["df"] = pdf.groupby("term", sort=False)[id_col] \
            .transform("size").astype(np.int64)
        return pdf

    with_df = hash_partitioned_agg(tf_ds, ["term"], attach_df,
                                   num_partitions=num_partitions)

    ilog = float(n_docs)

    def topk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["score_micro"] = pdf["tf"].to_numpy() * np.round(
            np.log(ilog / pdf["df"].to_numpy()) * 1e6).astype(np.int64)
        pdf = pdf.sort_values(
            [id_col, "score_micro", "term"],
            ascending=[True, False, True], kind="stable")
        return pdf.groupby(id_col, sort=False).head(k)

    return hash_partitioned_agg(with_df, [id_col], topk,
                                num_partitions=num_partitions)
