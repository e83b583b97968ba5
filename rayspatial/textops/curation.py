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


def canonical_urls(ds, url_col: str = "url", id_col: str = "doc_id"):
    """URL canonicalization + dedup: lowercase scheme/host, strip
    fragment, query string, default port and trailing slash, then keep
    the min-id page per canonical URL.  The crawl-frontier dedup step
    (the same page crawled as http://Host/x?utm=.. and https://host/x
    must collapse).

    One Arrow regex chain per batch (no Python rows), 16-byte
    (hash, id) shuffle rows, min-id representative per group.
    """
    import pyarrow.compute as pc

    from rayspatial.textops.hashing import hash_strings
    from rayspatial.util import hash_partitioned_agg

    def canon(batch: pa.Table) -> pa.Table:
        u = batch.column(url_col)
        u = pc.replace_substring_regex(u, r"[#?].*$", "")        # query/frag
        u = pc.replace_substring_regex(                          # default port
            u, r"(?i)^(https?://[^/:]*):(?:80|443)(/|$)", r"\1\2")
        # lowercase ONLY the scheme://host prefix, preserve path case
        pref = pc.extract_regex(u, r"(?i)^(?P<sh>https?://[^/]*)")
        if isinstance(pref, pa.ChunkedArray):
            pref = pref.combine_chunks()
        sh = pc.utf8_lower(pref.field("sh"))
        path = pc.replace_substring_regex(u, r"(?i)^https?://[^/]*", "")
        path = pc.replace_substring_regex(path, r"/$", "")
        cu = pc.binary_join_element_wise(sh, path, "")
        return pa.table({
            "h": pa.array(hash_strings(cu).view(np.int64)),
            "canon_url": cu,
            id_col: batch.column(id_col),
        })

    hashed = ds.map_batches(canon, batch_format="pyarrow")

    def first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort")
        out = df.drop_duplicates("h", keep="first")
        return out[[id_col, "canon_url"]]

    return hash_partitioned_agg(hashed, ["h"], first)


def redact_pattern(ds, pattern: str, replacement: str,
                   text_col: str = "text"):
    """PII-style scrub pass: replace every regex match in ``text_col``
    with ``replacement`` and count the redactions per row — the
    email/phone/SSN removal stage every shipped corpus needs.  Pure
    Arrow (``replace_substring_regex`` + ``count_substring_regex``):
    no per-row Python, content never shuffles, composes in front of
    any downstream dedup/quality stage (run BEFORE hashing so
    redaction-equal docs dedup together)."""
    import pyarrow.compute as pc

    def scrub(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col)
        red = pc.replace_substring_regex(t, pattern, replacement)
        n = pc.cast(pc.count_substring_regex(t, pattern), pa.int64())
        i = batch.column_names.index(text_col)
        out = batch.set_column(i, text_col, red)
        return out.append_column("n_redacted", n)

    return ds.map_batches(scrub, batch_format="pyarrow")


def phrase_docs(ds, phrase: str, id_col: str = "doc_id",
                text_col: str = "text"):
    """Corpus grep: ids of documents containing the literal
    ``phrase`` (Arrow ``match_substring`` — memchr-class scan per
    batch, streaming filter, no shuffle)."""
    import pyarrow.compute as pc

    def flt(batch: pa.Table) -> pa.Table:
        keep = pc.match_substring(batch.column(text_col), phrase)
        return batch.filter(keep).select([id_col])

    return ds.map_batches(flt, batch_format="pyarrow")
