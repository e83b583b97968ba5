"""Point extraction from pages (the pipeline's 'geocode' stage).

Stateful actor-pool stage (compiled regexes built once per actor, like
the reference's prepare-once pattern, src/ufuncs.c:461-476): parses the
html binary column, recovers

- ``text``  — byte-identical body text per url (the rule's per-row
  invariant; verified in tests against the pages synthesizer), and
- ``lon``/``lat`` — exact doubles from the integer-microdegree geo tag.

Emits a narrow table (url, doc_id, lon, lat) — the html/text columns
are dropped before any shuffle (SURVEY.md §7.4 item 5: project columns
early; a 100 KB html blob must never enter an all-to-all exchange).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayspatial.pipeline.pages import nums_to_lonlat

# RE2 patterns for pc.extract_regex — ONE vectorized kernel call per
# batch over the binary column (no Python row loop; this is stage 1 of
# the flagship at every row of the corpus)
_GEO_PAT = r'<meta name="geo" content="(?P<lat>-?\d+),(?P<lon>-?\d+)">'
_TEXT_PAT = r"(?s)<p>(?P<t>.*?)</p>"


def _geo_fields(html: pa.ChunkedArray | pa.Array):
    ex = pc.extract_regex(html, pattern=_GEO_PAT)
    ok = pc.is_valid(ex)
    lat = pc.cast(pc.cast(pc.struct_field(ex, "lat"), pa.string()), pa.int64())
    lon = pc.cast(pc.cast(pc.struct_field(ex, "lon"), pa.string()), pa.int64())
    return ok, lat, lon


class ExtractPoints:
    """map_batches stage: pages batch -> (url, doc_id, lon, lat).
    Fully vectorized (pyarrow.compute extract_regex + casts)."""

    def __init__(self, keep_text: bool = False):
        self.keep_text = keep_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch.column("html")
        ok, lat_a, lon_a = _geo_fields(html)
        lat_num = pc.fill_null(lat_a, 0).to_numpy().astype(np.int64)
        lon_num = pc.fill_null(lon_a, 0).to_numpy().astype(np.int64)
        lon, lat = nums_to_lonlat(lat_num, lon_num)
        cols = {
            "url": batch.column("url"),
            "doc_id": batch.column("doc_id"),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
        }
        if self.keep_text:
            tex = pc.extract_regex(html, pattern=_TEXT_PAT)
            cols["text"] = pc.cast(
                pc.fill_null(pc.struct_field(tex, "t"), b""), pa.string()
            )
        out = pa.table(cols)
        if not pc.all(ok).as_py():
            out = out.filter(ok)
        return out


def extract_text(batch: pa.Table) -> pa.Table:
    """html -> text re-extraction only (url, text); used by the
    byte-identity check."""
    tex = pc.extract_regex(batch.column("html"), pattern=_TEXT_PAT)
    texts = pc.cast(pc.struct_field(tex, "t"), pa.string())
    return pa.table({"url": batch.column("url"), "text": texts})


def extract_points(pages_ds, concurrency: int | None = None, batch_size: int | None = None):
    """pages Dataset -> points Dataset (url, doc_id, lon, lat)."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency:
        return pages_ds.map_batches(ExtractPoints, concurrency=concurrency, **kwargs)
    # stateless-task form (regex compile is module-level cached anyway)
    return pages_ds.map_batches(ExtractPoints(), **kwargs)
