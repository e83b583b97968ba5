"""edit_distance_pairs / levenshtein_batch vs a reference DP oracle."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from rayspatial.textops.fuzzy import edit_distance_pairs, levenshtein_batch


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_batch_matches_reference():
    rng = np.random.default_rng(7)
    alpha = list("abcde")
    terms = ["".join(rng.choice(alpha, rng.integers(0, 9)))
             for _ in range(400)]
    a = terms[:200]
    b = terms[200:]
    got = levenshtein_batch(a, b)
    want = np.array([_lev_ref(x, y) for x, y in zip(a, b)], np.int64)
    assert np.array_equal(got, want)


def test_levenshtein_batch_unicode_and_empty():
    a = ["", "naïve", "abc"]
    b = ["abc", "naive", ""]
    assert levenshtein_batch(a, b).tolist() == [3, 1, 3]


def test_edit_distance_pairs_end_to_end(ray_session):
    # vocab with planted typo neighborhoods + far-apart terms
    words = ["table", "tables", "tbale", "cable", "fable",
             "spark", "shark", "spa", "hash", "fast", "mast",
             "zzzzzzz", "qqqqqq"]
    rng = np.random.default_rng(3)
    docs = [" ".join(rng.choice(words, 8)) for _ in range(60)]
    ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(4)

    got = (edit_distance_pairs(ds, "text", max_dist=2, min_len=3)
           .to_pandas().sort_values(["term_a", "term_b"],
                                    ignore_index=True))

    vocab = sorted({t for d in docs for t in d.split() if len(t) >= 3})
    want_rows = []
    for i, x in enumerate(vocab):
        for y in vocab[i + 1:]:
            dist = _lev_ref(x, y)
            if dist <= 2:
                want_rows.append((x, y, dist))
    want = pd.DataFrame(want_rows, columns=["term_a", "term_b", "dist"])
    want["dist"] = want["dist"].astype(np.int64)
    assert len(want) > 5          # the fixture really has neighborhoods
    pd.testing.assert_frame_equal(got, want)


def test_edit_distance_pairs_empty(ray_session):
    ds = rd.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    out = edit_distance_pairs(ds, "text").to_pandas()
    assert out.empty
