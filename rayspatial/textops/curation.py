"""End-to-end training-data curation pipeline: quality filter +
exact dedup in one streaming chain (the composition a 100 TB corpus
run would execute per epoch).

docs -> vectorized stats + content hash (one map_batches pass, no
extra scan) -> quality filter -> hash-partitioned dedup keeping the
min-id representative per distinct text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from rayspatial.textops.hashing import hash_strings, rolling_fingerprint


def curate(ds, min_tokens: int = 20, max_tokens: int = 400,
           min_uniq_tokens: int = 10, id_col: str = "doc_id"):
    """-> Dataset (doc_id,): surviving representative documents."""
    from rayspatial.util import hash_partitioned_agg

    def stats_and_hash(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        trimmed = pc.utf8_trim_whitespace(text)
        toks = pc.split_pattern_regex(trimmed, r"\s+")
        n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
        empty = pc.equal(pc.utf8_length(trimmed), 0)
        n_tokens = pc.if_else(empty, pa.scalar(0, type=pa.int64()), n_tokens)
        from rayspatial.textops.hashing import uniq_token_counts

        uniq = pa.array(uniq_token_counts(text), type=pa.int64())
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(n_tokens, min_tokens),
                pc.less_equal(n_tokens, max_tokens),
            ),
            pc.greater_equal(uniq, min_uniq_tokens),
        )
        sub = batch.filter(keep)
        h1 = hash_strings(sub.column("text")).view(np.int64)
        h2 = rolling_fingerprint(sub.column("text"))
        return pa.table(
            {
                "h1": pa.array(h1),
                "h2": pa.array(h2),
                id_col: sub.column(id_col),
            }
        )

    hashed = ds.map_batches(stats_and_hash, batch_format="pyarrow")

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["h1", "h2"], sort=False)[id_col]
            .min()
            .reset_index(drop=True)
            .to_frame(id_col)
        )

    return hash_partitioned_agg(hashed, ["h1", "h2"], dedup)
