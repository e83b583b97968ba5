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

import re

import numpy as np
import pyarrow as pa

from rayspatial.pipeline.pages import nums_to_lonlat

_GEO_RE = re.compile(rb'<meta name="geo" content="(-?\d+),(-?\d+)">')
_TEXT_RE = re.compile(rb"<p>(.*?)</p>", re.S)


class ExtractPoints:
    """map_batches actor: pages batch -> (url, doc_id, lon, lat)."""

    def __init__(self, keep_text: bool = False):
        self.geo_re = _GEO_RE
        self.text_re = _TEXT_RE
        self.keep_text = keep_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch.column("html").to_pylist()
        n = len(html)
        lat_num = np.zeros(n, dtype=np.int64)
        lon_num = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        texts: list[bytes | None] = [None] * n
        for i, h in enumerate(html):
            m = self.geo_re.search(h)
            if m:
                lat_num[i] = int(m.group(1))
                lon_num[i] = int(m.group(2))
                ok[i] = True
            if self.keep_text:
                tm = self.text_re.search(h)
                texts[i] = tm.group(1) if tm else b""
        lon, lat = nums_to_lonlat(lat_num, lon_num)
        cols = {
            "url": batch.column("url"),
            "doc_id": batch.column("doc_id"),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
        }
        if self.keep_text:
            cols["text"] = pa.array(
                [t.decode("utf-8") if t is not None else None for t in texts]
            )
        out = pa.table(cols)
        if not ok.all():
            out = out.filter(pa.array(ok))
        return out


def extract_text(batch: pa.Table) -> pa.Table:
    """html -> text re-extraction only (url, text); used by the
    byte-identity check."""
    html = batch.column("html").to_pylist()
    texts = []
    for h in html:
        m = _TEXT_RE.search(h)
        texts.append(m.group(1).decode("utf-8") if m else None)
    return pa.table({"url": batch.column("url"), "text": pa.array(texts, type=pa.string())})


def extract_points(pages_ds, concurrency: int | None = None, batch_size: int | None = None):
    """pages Dataset -> points Dataset (url, doc_id, lon, lat)."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency:
        return pages_ds.map_batches(ExtractPoints, concurrency=concurrency, **kwargs)
    # stateless-task form (regex compile is module-level cached anyway)
    return pages_ds.map_batches(ExtractPoints(), **kwargs)
