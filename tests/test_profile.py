"""profile_table vs pandas ground truth (nulls, distinct, min/max)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from rayspatial.ops.profile import profile_table


def test_profile_table(ray_session):
    rng = np.random.default_rng(2)
    n = 5000
    df = pd.DataFrame({
        "s": rng.choice(["a", "b", "c", None], n, p=[.4, .3, .2, .1]),
        "k": rng.integers(-50, 50, n).astype(np.int64),
    })
    out = (profile_table(rd.from_pandas(df).repartition(6), ["k"], ["s"])
           .to_pandas().set_index("column"))
    s = df["s"].dropna()
    assert out.loc["s", "n"] == len(s)
    assert out.loc["s", "n_null"] == int(df["s"].isna().sum())
    assert out.loc["s", "n_distinct"] == s.nunique()
    assert out.loc["s", "min_s"] == "a" and out.loc["s", "max_s"] == "c"
    assert out.loc["k", "n"] == n and out.loc["k", "n_null"] == 0
    assert out.loc["k", "n_distinct"] == df["k"].nunique()
    # numeric min/max compared NUMERICALLY (string compare would pick
    # "-1" < "-50"), then emitted as strings
    assert out.loc["k", "min_s"] == str(df["k"].min())
    assert out.loc["k", "max_s"] == str(df["k"].max())


def test_profile_table_all_null_column(ray_session):
    df = pd.DataFrame({"s": pd.Series([None, None], dtype=object),
                       "k": np.array([1, 2], np.int64)})
    out = (profile_table(rd.from_pandas(df), ["k"], ["s"])
           .to_pandas().set_index("column"))
    assert out.loc["s", "n"] == 0 and out.loc["s", "n_null"] == 2
    assert out.loc["s", "n_distinct"] == 0
    assert out.loc["s", "min_s"] is None or pd.isna(out.loc["s", "min_s"])
