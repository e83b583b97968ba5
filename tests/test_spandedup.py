"""Span/line corpus dedup (textops/spandedup.py)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rayspatial.textops.spandedup import (
    _span_units,
    line_dedup,
    span_dedup,
)


def test_span_units_shapes():
    texts = pa.array(["a b c d e", "x y", ""], type=pa.string())
    spans, off = _span_units(texts, 3)
    assert spans.to_pylist() == ["a b c", "d e", "x y"]
    assert off.tolist() == [0, 2, 3, 3]


@pytest.mark.usefixtures("ray_session")
def test_line_dedup_c4_rule():
    """Duplicate non-empty lines removed corpus-wide; first occurrence
    and empty lines kept; doc structure preserved."""
    import ray.data as rd

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            "alpha\nbeta\n\ngamma",
            "beta\ndelta\nalpha",   # beta+alpha are dups of doc 0
            "\n\nbeta",             # all content lines are dups
        ],
    })
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))
    got = line_dedup(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    # survivors re-joined with '\n': doc 2's lines ["", "", "beta"]
    # lose "beta" -> ["", ""] -> "\n"
    assert got["text"].tolist() == [
        "alpha\nbeta\n\ngamma",
        "delta",
        "\n",
    ]
    assert got["n_lines_dropped"].tolist() == [0, 2, 1]


@pytest.mark.usefixtures("ray_session")
def test_span_dedup_matches_duckdb():
    import ray.data as rd

    rng = np.random.default_rng(9)
    vocab = np.array(["aa", "bb", "cc", "dd"])
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 15)))
             for _ in range(120)]
    docs = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                         "text": texts})
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)) \
        .repartition(5)
    got = span_dedup(ds, span_w=2).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(r"""
        WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
                   FROM documents),
        wi AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
               FROM w),
        spans AS (SELECT doc_id, (i-1)//2 AS span_idx,
                  string_agg(ws[i], ' ' ORDER BY i) AS span
                  FROM wi GROUP BY doc_id, (i-1)//2),
        ranked AS (SELECT doc_id, span_idx, span, ROW_NUMBER() OVER
                   (PARTITION BY span ORDER BY doc_id, span_idx) AS rn
                   FROM spans),
        agg AS (SELECT doc_id, string_agg(span, ' ' ORDER BY span_idx) AS text
                FROM ranked WHERE rn = 1 GROUP BY doc_id),
        drops AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM ranked
                  WHERE rn > 1 GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(a.text, '') AS text,
               COALESCE(dr.n, 0) AS n_spans_dropped
        FROM documents d LEFT JOIN agg a USING(doc_id)
        LEFT JOIN drops dr USING(doc_id) ORDER BY doc_id
    """).df()
    assert got["text"].tolist() == want["text"].tolist()
    assert got["n_spans_dropped"].tolist() == want["n_spans_dropped"].tolist()
    assert int(want["n_spans_dropped"].sum()) > 0  # dedup actually fired


@pytest.mark.usefixtures("ray_session")
def test_span_dedup_idempotent():
    """Running span_dedup on its own output drops nothing new."""
    import ray.data as rd

    docs = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "text": ["p q r s " * 3] * 10 + ["u v w x y z"] * 10,
    })
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))
    once = span_dedup(ds, span_w=2).to_pandas()
    ds2 = rd.from_arrow(pa.Table.from_pandas(
        once[["doc_id", "text"]], preserve_index=False))
    twice = span_dedup(ds2, span_w=2).to_pandas()
    assert int(twice["n_spans_dropped"].sum()) == 0


@pytest.mark.usefixtures("ray_session")
def test_rebuild_paths_agree():
    """The broadcast in-place rebuild (default) and the forced
    union+shuffle rebuild (broadcast_byte_budget=0) produce identical
    documents — span and line variants, multi-block input."""
    import ray.data as rd

    rng = np.random.default_rng(31)
    vocab = np.array(["aa", "bb", "cc", "dd", "ee"])
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 18)))
             for _ in range(300)]
    # plant exact repeated passages across blocks
    for i in range(0, 300, 17):
        texts[i] = "dup passage here " + texts[i]
    docs = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                         "text": texts})
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)) \
        .repartition(7)
    a = span_dedup(ds, span_w=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = span_dedup(ds, span_w=2, broadcast_byte_budget=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert int(a["n_spans_dropped"].sum()) > 0

    ltexts = ["\n".join(rng.choice(vocab, rng.integers(1, 6)))
              for _ in range(120)]
    ldocs = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                          "text": ltexts})
    lds = rd.from_arrow(pa.Table.from_pandas(ldocs, preserve_index=False)) \
        .repartition(5)
    la = line_dedup(lds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    lb = line_dedup(lds, broadcast_byte_budget=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(la, lb)
