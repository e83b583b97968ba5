"""Vectorized extraction of scalar fields from flat JSON string
columns (event properties, crawl metadata sidecars) — the
semi-structured column shape web-event tables carry at 10^12 rows.

``extract_json_int`` stays fully inside Arrow compute
(``pc.extract_regex``): no per-row Python, no JSON parser allocation
per value.  The regex contract is exact for FLAT objects with
non-nested, non-string-embedded fields (the common telemetry shape);
nested objects where the key also appears inside a string value need a
real parser — callers with that shape should decode in an actor-pool
stage instead.  Missing field / null input -> null (caller decides the
sentinel).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["extract_json_int"]


def extract_json_int(col, field: str):
    """Arrow string array/chunked-array of flat JSON objects ->
    int64 array of ``field``'s integer value (null where absent)."""
    import re

    pat = '"' + re.escape(field) + r'"\s*:\s*(?P<v>-?\d+)'
    ex = pc.extract_regex(col, pattern=pat)
    # struct_field on a null row yields null; cast string -> int64
    v = pc.struct_field(ex, "v")
    return pc.cast(v, pa.int64())
