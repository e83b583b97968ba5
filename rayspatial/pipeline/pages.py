"""Deterministic Common-Crawl-style pages table (BASELINE.json input_hint:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``).

The sandbox has no real web corpus, so pages are synthesized
deterministically from the driver's ``documents`` parquet (doc_id, text,
lang): every derived value is a pure integer function of ``doc_id``, so
the DuckDB oracle can reproduce the pipeline outputs with plain SQL on
the ``documents`` view (see __ray_entry__.oracle_sql).

Derivations (all integer arithmetic, exact in both numpy and SQL):

    url      = 'https://site-' || (doc_id % 97) || '.example.com/page/' || doc_id
    warc_ts  = TIMESTAMP '2024-01-01 00:00:00' + (doc_id * 37 % 31536000) seconds
    lat_num  = (doc_id * 2246822519) % 170000000      # microdegrees + 85e6
    lon_num  = (doc_id * 2654435761) % 360000000      # microdegrees + 180e6
    lat      = lat_num / 1000000.0 - 85.0
    lon      = lon_num / 1000000.0 - 180.0

The geo tag is embedded in the html as integer microdegrees
(``<meta name="geo" content="{lat_num},{lon_num}">``) so the float
parse is exact; ``text`` is recoverable byte-identically from ``html``
(the per-row invariant the rule checks: extracted text is byte-identical
per url).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

URL_PREFIX = "https://site-"
EPOCH = np.datetime64("2024-01-01T00:00:00", "us")

LAT_MULT = 2246822519
LON_MULT = 2654435761
LAT_MOD = 170_000_000
LON_MOD = 360_000_000


def geo_nums(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Integer microdegree offsets (lat_num, lon_num) per doc_id."""
    d = np.asarray(doc_id, dtype=np.int64)
    lat_num = (d * LAT_MULT) % LAT_MOD
    lon_num = (d * LON_MULT) % LON_MOD
    return lat_num, lon_num


def nums_to_lonlat(lat_num: np.ndarray, lon_num: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact float mapping — the same expression the oracle SQL uses."""
    lat = np.asarray(lat_num, dtype=np.float64) / 1000000.0 - 85.0
    lon = np.asarray(lon_num, dtype=np.float64) / 1000000.0 - 180.0
    return lon, lat


def make_pages_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> pages batch (fully vectorized Arrow kernels)."""
    doc_id = batch.column("doc_id").to_numpy()
    lang = batch.column("lang")
    lat_num, lon_num = geo_nums(doc_id)
    url = pc.binary_join_element_wise(
        pa.scalar(URL_PREFIX),
        pc.cast(pa.array(doc_id % 97), pa.string()),
        pa.scalar(".example.com/page/"),
        pc.cast(pa.array(doc_id), pa.string()),
        "",
    )
    ts = EPOCH + ((doc_id * 37) % 31_536_000).astype("timedelta64[s]")
    # fully vectorized html assembly; constant pieces are SCALARS (the
    # kernel broadcasts them — materializing n-length constant arrays
    # per batch doubled the synth cost)
    html = pc.binary_join_element_wise(
        pa.scalar(b'<html><head><meta charset="utf-8"><meta name="geo" content="',
                  type=pa.binary()),
        pc.cast(pc.cast(pa.array(lat_num), pa.string()), pa.binary()),
        pa.scalar(b",", type=pa.binary()),
        pc.cast(pc.cast(pa.array(lon_num), pa.string()), pa.binary()),
        pa.scalar(b'"></head><body><p>', type=pa.binary()),
        pc.cast(batch.column("text"), pa.binary()),
        pa.scalar(b"</p></body></html>", type=pa.binary()),
        b"",
    )
    return pa.table(
        {
            "url": url,
            "warc_ts": pa.array(ts.astype("datetime64[us]")),
            "html": html,
            "text": batch.column("text"),
            "lang": lang,
            "doc_id": batch.column("doc_id"),  # carried for oracle joins
        }
    )


def read_pages(sf_dir: str, drop_doc_id: bool = False, expand: int = 1):
    """documents parquet -> pages Dataset (streaming map_batches).

    ``expand`` (bench-only): synthesize ``expand`` pages per document —
    virtual ``doc_id' = doc_id * expand + j`` (unique, deterministic,
    SQL-reproducible via ``CROSS JOIN range(expand)``); url/warc_ts/geo
    derive from the virtual id, text repeats the base document's text.
    This is how the sandbox approximates the 10^12-row corpus: same
    schema, same derivations, any row count.  Blocks are sized for the
    EXPANDED row count so each map task does real work.
    """
    from rayspatial.util import cluster_cpus, read_parquet_sized

    rows_hint = None if expand <= 1 else _doc_rows(sf_dir) * expand
    rows_per_block = None
    if rows_hint is not None:
        # compute-bound fused chain: ~2 blocks per CPU amortizes the
        # executor's per-task dispatch (measured at sf0.1/32cpus: 64
        # blocks 2.65s vs 128 blocks 2.9s vs 32 blocks oversized-alloc
        # stalls); floor keeps small corpora from under-splitting
        rows_per_block = max(32_768, rows_hint // (2 * cluster_cpus()))
    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang"],
        rows_hint=rows_hint,
        rows_per_block=rows_per_block,
    )
    if expand <= 1:
        ds = ds.map_batches(make_pages_batch, batch_format="pyarrow")
    else:
        def expand_batch(batch: pa.Table):
            doc_id = batch.column("doc_id").to_numpy()
            n = len(doc_id)
            # chunk the replication factor so each yielded batch is
            # ~32k rows (one call into the vectorized synthesizer)
            step = max(1, 32_768 // max(n, 1))
            rep = np.arange(n)
            for j0 in range(0, expand, step):
                js = np.arange(j0, min(j0 + step, expand), dtype=np.int64)
                idx = pa.array(np.tile(rep, len(js)))
                vids = (doc_id[None, :] * expand + js[:, None]).ravel()
                vb = pa.table(
                    {
                        "doc_id": pa.array(vids),
                        "text": batch.column("text").take(idx),
                        "lang": batch.column("lang").take(idx),
                    }
                )
                yield make_pages_batch(vb)

        ds = ds.map_batches(expand_batch, batch_format="pyarrow")
    if drop_doc_id:
        ds = ds.select_columns(["url", "warc_ts", "html", "text", "lang"])
    return ds


def _doc_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
